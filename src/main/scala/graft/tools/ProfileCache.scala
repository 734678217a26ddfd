package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Diagnostic main for the Bench cache pre-build (VERDICT r6 #3/#4):
  * times each stage of the dedup family chain in isolation — scan,
  * shingle compute with no persist, persist+count at both storage
  * levels, pairs and clusters off the persisted tier — so a pre-build
  * regression is attributable to a STAGE, not a 75-second blur.
  * Run: `sbt "runMain graft.tools.ProfileCache /root/testdata/sf0.1"`. */
object ProfileCache {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    t("warmup lineitem count")(
      spark.read.parquet(s"$dir/lineitem.parquet").count())
    // SPARK_GRAFT_PROFILE_STAR=1 reproduces the Bench pre-build order
    // (star fact + calendar resident first) to expose cache-pressure
    // interactions between the families
    if (sys.env.get("SPARK_GRAFT_PROFILE_STAR").contains("1")) {
      t("star.siop count")(graft.core.Star.siop(spark, dir).count())
      t("star.calendar count")(graft.core.Star.calendar(spark, dir).count())
    }
    val docs = graft.core.Tables(spark, dir, "documents")
    t("documents scan count")(docs.count())
    t("shingleSets no-persist count")(
      graft.dedup.Dedup.shingleSets(docs).count())
    t("shingleSets no-persist count AGAIN")(
      graft.dedup.Dedup.shingleSets(docs).count())
    val memDisk = graft.dedup.Dedup.shingleSets(docs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("shingleSets persist(MEMORY_AND_DISK) count")(memDisk.count())
    t("read-back count")(memDisk.count())
    memDisk.unpersist(true)
    val memOnly = graft.dedup.Dedup.shingleSets(docs)
      .persist(StorageLevel.MEMORY_ONLY)
    t("shingleSets persist(MEMORY_ONLY) count")(memOnly.count())
    memOnly.unpersist(true)
    t("sharedShingles (SessionCache) count")(
      graft.dedup.Dedup.sharedShingles(spark, dir).count())
    t("sharedPairs count")(
      graft.dedup.Dedup.sharedPairs(spark, dir).count())
    t("sharedClusters count")(
      graft.dedup.Dedup.sharedClusters(spark, dir).count())
    graft.core.SessionCache.clear(spark)
    spark.stop()
  }
}
