package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization profiler: time the stages INSIDE the
  * historically expensive derivations (ppjoin tier, pipe_manifest,
  * graph iteration rounds) through the noop sink (guide §1.4 — every
  * column of every row computed, nothing collected), each labelled via
  * `setJobDescription` so UI/event-log reads attribute time correctly.
  * Run: `sbt "runMain graft.tools.ProfileR16 [sfDir] [section]"`. */
object ProfileR16 {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val section = args.lift(1).getOrElse("ppjoin")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"[p16] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    t("warmup lineitem")(
      noop(spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_orderkey") > 0)))

    section match {
      case "ppjoin" => ppjoin(spark, dir, t)
      case "manifest" => manifest(spark, dir, t)
      case "plansplit" =>
        // split Catalyst time from execution time for named queries:
        // build (DataFrame construction incl. any eager loop work),
        // plan (analysis+optimization+physical planning), run (noop)
        val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
          "pipe_manifest", "rfm_segments", "graph_assortativity",
          "maint_column_stats", "dedup_containment", "weighted_median"))
        names.foreach { n =>
          val fn = graft.SparkEntry.queries(n)
          var df: DataFrame = null
          t(s"$n build") { df = fn(spark, dir) }
          t(s"$n plan")(df.queryExecution.executedPlan: Unit)
          t(s"$n run(noop)")(noop(df))
          t(s"$n run2(noop)")(noop(fn(spark, dir)))
          graft.core.CacheBay.drain()
          graft.core.CheckpointBay.drain()
        }
      case "bfs" =>
        // eager per-round localCheckpoint vs lazy CacheBay persist for
        // a FIXED-depth frontier loop (4 rounds): is the per-round
        // materialization barrier worth its job overhead at this depth?
        val (edges, deg) = graft.graph.PageRank.sharedPurchaseGraph(
          spark, dir)
        t("tier warm")(edges.count(): Unit)
        t("seedHops current (checkpoint/round)")(noop(
          graft.graph.BfsHops.seedHops(null, null,
            graph = Some((edges, deg)))))
        graft.core.CheckpointBay.drain()
        t("seedHops current AGAIN")(noop(
          graft.graph.BfsHops.seedHops(null, null,
            graph = Some((edges, deg)))))
        graft.core.CheckpointBay.drain()
        // lazy variant
        def lazyBfs(): DataFrame = {
          var dist = graft.core.CacheBay.register(
            deg.select(col("src").as("node"))
              .filter(col("node") % 2 === 1 &&
                expr("(node div 2) % 10") === 0)
              .withColumn("hops", lit(0L)))
          var frontier = dist.select(col("node"))
          for (i <- 1 to graft.graph.BfsHops.Rounds) {
            val reached = graft.core.CacheBay.register(edges
              .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
              .select(col("dst").as("node")).distinct()
              .join(dist, Seq("node"), "left_anti")
              .withColumn("hops", lit(i.toLong)))
            dist = dist.unionByName(reached)
            frontier = reached.select(col("node"))
          }
          dist.select(
            when(col("node") % 2 === 0, lit("customer"))
              .otherwise(lit("supplier")).as("kind"),
            expr("node div 2").cast("long").as("id"),
            col("hops").cast("long").as("hops"))
        }
        t("seedHops lazy-persist variant")(noop(lazyBfs()))
        graft.core.CacheBay.drain()
        t("seedHops lazy-persist AGAIN")(noop(lazyBfs()))
        graft.core.CacheBay.drain()
        t("harmonic current")(noop(
          graft.graph.BfsHops.harmonicSampled(null, null,
            graph = Some((edges, deg)))))
        graft.core.CheckpointBay.drain()
      case s => println(s"unknown section $s")
    }
    graft.core.SessionCache.clear(spark)
    spark.stop()
  }

  /** Stage costs inside [[graft.dedup.Dedup.prefixFilterPairs]]. */
  def ppjoin(spark: SparkSession, dir: String,
      t: String => (=> Unit) => Unit): Unit = {
    import graft.dedup.Dedup._
    val docs = graft.core.Tables(spark, dir, "documents")
    t("shingleSets tier")(
      sharedShingles(spark, dir).count(): Unit)
    val ss = sharedShingles(spark, dir)
      .filter(size(col("shingles")) > 0)
    val ex = ss.select(col("doc_id"), explode(col("shingles")).as("sh"))
    t("explode (doc,sh)")(noop(ex))
    val exC = graft.core.CacheBay.register(ex)
    t("explode persist+count")(exC.count(): Unit)
    val dfreq = exC.groupBy(col("sh"))
      .agg(count(lit(1)).cast("long").as("dfc"))
    t("dfreq groupBy")(noop(dfreq))
    val tauE6 = math.round(MinJaccard * 1e6)
    val pfx = exC.join(dfreq, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("dfc").as("dfc"),
        col("sh").as("sh")))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_sh"),
        col("toks"))
      .select(col("doc_id"), col("n_sh"),
        expr(s"slice(toks, 1, cast(n_sh - " +
          s"((n_sh * $tauE6 + 999999) div 1000000) + 1 as int))")
          .as("pfx"))
      .select(col("doc_id"), col("n_sh"), explode(col("pfx")).as("t"))
      .select(col("doc_id"), col("n_sh"), col("t.sh").as("sh"))
    t("prefix build (join+collect+sort+slice)")(noop(pfx))
    val pfxC = graft.core.CacheBay.register(pfx)
    t("prefix persist+count")(pfxC.count(): Unit)
    val cands = pfxC
      .select(col("doc_id").as("a_id"), col("n_sh").as("na"), col("sh"))
      .join(pfxC.select(col("doc_id").as("b_id"), col("n_sh").as("nb"),
        col("sh")), Seq("sh"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("na"), col("nb")) * lit(1000000L) >=
        greatest(col("na"), col("nb")) * lit(tauE6))
      .select(col("a_id"), col("b_id")).distinct()
    t("candidate self-join + distinct")(noop(cands))
    val arrays = ss.select(col("doc_id"), col("shingles"))
    val verified = cands
      .join(arrays.select(col("doc_id").as("a_id"),
        col("shingles").as("ash")), Seq("a_id"))
      .join(arrays.select(col("doc_id").as("b_id"),
        col("shingles").as("bsh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("ash"), col("bsh"))).cast("long")
          .as("inter"))
    t("verify (2 array joins + intersect)")(noop(verified))
    t("full prefixFilterPairs (fresh)")(noop(
      prefixFilterPairs(docs,
        shingles = Some(sharedShingles(spark, dir)))))
    graft.core.CacheBay.drain()
    t("full prefixFilterPairs AGAIN (post-drain)")(noop(
      prefixFilterPairs(docs,
        shingles = Some(sharedShingles(spark, dir)))))
    graft.core.CacheBay.drain()
  }

  /** Stage costs inside pipe_manifest. */
  def manifest(spark: SparkSession, dir: String,
      t: String => (=> Unit) => Unit): Unit = {
    import graft.pipeline.Pipeline._
    val docs = graft.core.Tables(spark, dir, "documents")
    t("curatedCorpus")(noop(curatedCorpus(docs)))
    graft.core.CacheBay.drain()
    t("paragraphDedup")(noop(graft.dedup.Dedup.paragraphDedup(docs)))
    graft.core.CacheBay.drain()
    val cleaned = graft.core.CacheBay.register(
      graft.dedup.Dedup.paragraphDedup(docs)
        .join(curatedCorpus(docs).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        .join(docs.select(col("doc_id"), col("lang"), col("source")),
          Seq("doc_id"))
        .filter(col("clean_text") =!= "")
        .select(col("doc_id"), col("lang"), col("source"),
          col("clean_text").as("text")))
    t("cleaned persist+count")(cleaned.count(): Unit)
    val keep2 = graft.dedup.Dedup.exactDedup(cleaned)
      .select(col("keep_id").as("doc_id"))
    val selected = tokenBudgetSelect(
      cleaned.join(keep2, Seq("doc_id"), "left_semi"))
      .select(col("doc_id"), col("n_tokens"))
    t("selected (tokenBudget)")(noop(selected))
    t("selected AGAIN (the duplicated subtree)")(noop(selected))
    t("shuffleShards(selected)")(noop(shuffleShards(selected)))
    graft.core.CacheBay.drain()
    t("pipe_manifest full")(noop(
      graft.SparkEntry.queries("pipe_manifest")(spark, dir)))
    graft.core.CacheBay.drain()
    t("pipe_manifest full AGAIN")(noop(
      graft.SparkEntry.queries("pipe_manifest")(spark, dir)))
    graft.core.CacheBay.drain()
  }
}
