package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Join strategies for fact-scale inputs — the two standard answers to
  * "what happens to the lineitem⋈orders shuffle at 100 TB" (SURVEY §2.3
  * scale notes, [[Star.siop]] doc):
  *
  *  - '''Bucketed co-located join''': both fact tables written
  *    pre-hashed into the same bucket count on the join key. Spark's
  *    bucketed scan then satisfies the join's distribution requirement
  *    from the LAYOUT, so the sort-merge join plans with NO Exchange on
  *    either side — the shuffle is paid once at write time and
  *    amortized over every subsequent join ([[BucketedJoinSpec]]
  *    asserts the exchange-free plan).
  *
  *  - '''Salted join''': when one join key is hot enough that a single
  *    reduce task would own it (AQE's skew split handles moderate skew;
  *    extreme single-key skew wants salting), split the hot side's rows
  *    across `salts` sub-keys and replicate the other side once per
  *    sub-key. Results are identical to the plain join; the hot key's
  *    work spreads over `salts` tasks.
  */
object ScaleJoins {

  /** Write `df` as a bucketed+sorted managed table on `bucketCol` —
    * the one-time shuffle that makes later equi-joins on that column
    * exchange-free. Both join sides must use the same bucket count. */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Equi-join with the skewed (left) side salted across `salts`
    * sub-keys and the right side replicated per sub-key. The salt is a
    * deterministic hash of the whole left row — any assignment works
    * (the join result never depends on which salt a row gets); a hash
    * avoids a nondeterministic rand() column in the plan. Use when one
    * key dominates; for the general case let AQE's skew-join handle it. */
  def saltedJoin(skewed: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val sl = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew profile: the top-k hottest keys with their row
    * share in integer ppm — the diagnostic that DECIDES between the
    * plain join, AQE skew split, and [[saltedJoin]] (a key holding >
    * a few percent of a 100 TB fact means one reduce task owns TBs).
    * One key-aggregate shuffle; the global top-k goes through
    * `orderBy.limit` (planned as TakeOrdered: per-partition top-k +
    * driver merge of k·partitions rows, never a full sort) and the
    * rank window runs over exactly k rows — same shape as
    * [[graft.text.CorpusStats.vocabTopK]]. */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val total = df.agg(count(lit(1)).as("n_rows"))
    counts.orderBy(col("c").desc, col(key)).limit(topK)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col(key))).cast("long"))
      .crossJoin(broadcast(total))
      .select(col("rk"), col(key), col("c"),
        expr("(c * 1000000) div n_rows").as("share_e6"))
  }

  /** Hot-key share bar for [[autoSaltedJoin]]: 5% of the rows on one
    * key is where a single reduce task starts to own the join. */
  val AutoSaltSharePpm = 50000L

  /** X318 driver face: [[keySkewProfile]] measured, hot keys
    * REGISTERED for [[graft.plans.SaltedJoinRewrite]], and the PLAIN
    * equi-join returned — the rewrite to the salted form happens in
    * the optimizer, result-identically. The profile collect is the
    * bounded top-k (≤ topK rows). The plan is optimized EAGERLY under
    * the registration and the confs are cleared before returning
    * (conf hygiene — a lingering registration must not rewrite
    * unrelated joins later in the session; `QueryExecution` memoizes
    * the optimized plan, so the returned frame keeps the salted shape
    * through its actions). When no key clears the share bar the plain
    * join returns un-rewritten — the uniform fixture costs nothing. */
  def autoSaltedJoin(skewed: DataFrame, right: DataFrame, key: String,
      minSharePpm: Long = AutoSaltSharePpm, salts: Int = 8): DataFrame = {
    import graft.plans.SaltedJoinRewrite.{EnabledKey, HotKeysPrefix, SaltsKey}
    val spark = skewed.sparkSession
    val hot = keySkewProfile(skewed, key)
      .filter(col("share_e6") >= minSharePpm)
      .select(col(key).cast("string")).collect().map(_.getString(0))
    val joined = skewed.join(right, Seq(key))
    if (hot.isEmpty) joined
    else {
      spark.conf.set(EnabledKey, "true")
      spark.conf.set(SaltsKey, salts.toString)
      spark.conf.set(HotKeysPrefix + key, hot.mkString(","))
      try { joined.queryExecution.optimizedPlan; joined }
      finally {
        spark.conf.unset(HotKeysPrefix + key)
        spark.conf.unset(SaltsKey)
        spark.conf.unset(EnabledKey)
      }
    }
  }

  /** Bucket count for [[bitmapPrunedJoin]]'s key bitmap: false-positive
    * rate ≈ \|dim key set\| / buckets (one hash, no bit packing — the
    * broadcast is a distinct-bucket list, bounded by this constant no
    * matter how large the dim grows). */
  val BitmapBuckets = 1 << 20

  /** Bitmap (single-hash Bloom) semi-prune join: when the dim side is
    * too big to broadcast ITSELF but the fact side is mostly non-
    * matching rows, broadcast the dim's hashed key-bucket SET and
    * left-semi prune the fact BEFORE its join shuffle — non-matching
    * fact rows (minus the bounded false-positive share) never enter
    * the exchange. The final equi-join re-checks real keys, so false
    * positives cost only wasted shuffle bytes, never wrong rows:
    * result-identical to the plain join by construction. This is the
    * static, engine-visible form of Spark's runtime bloom-filter join;
    * spelling it as a broadcast left-semi on `pmod(xxhash64(key), m)`
    * keeps the whole prune inside codegen'd built-ins and makes the
    * plan assertable (the semi-join must sit BELOW the join's
    * exchange). */
  def bitmapPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int = BitmapBuckets): DataFrame = {
    val bb = pmod(xxhash64(col(key)), lit(buckets.toLong))
    val dimBuckets = dim.select(bb.as("__bb")).distinct()
    fact.withColumn("__bb", bb)
      .join(broadcast(dimBuckets), Seq("__bb"), "left_semi")
      .drop("__bb")
      .join(dim, Seq(key))
  }
}
