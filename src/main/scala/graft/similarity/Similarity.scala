package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.{dotProduct, l2Norm}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), per the training-data-pipeline surface:
  *
  *  - brute-force cosine top-k — the exact baseline. The (small) query
  *    set is broadcast against the corpus, so the scan parallelizes over
  *    corpus partitions with no shuffle of the corpus itself; the only
  *    shuffle is the final per-query top-k.
  *  - random-hyperplane LSH ANN — the scale path. Each vector gets an
  *    nBits-bit bucket from the signs of dot products with deterministic
  *    pseudo-random hyperplanes; candidates come from an equi-join on
  *    the bucket — sub-linear candidate sets instead of n² pairs. On a
  *    1000-executor cluster the same shape extends to IVF: replace the
  *    hyperplane bucket with a coarse k-means cell id (MLlib KMeans)
  *    and probe neighboring cells for recall.
  *
  * Hot-path math uses the codegen'd [[graft.functions.DotProduct]] /
  * [[graft.functions.L2Norm]] expressions (a tight primitive loop per
  * pair) instead of interpreted zip_with/aggregate lambdas, and norms
  * are computed ONCE per vector before any join — the per-pair work is
  * exactly one dot product. Hyperplane coefficients are integer-
  * arithmetic pseudo-randoms so DuckDB replays them exactly.
  */
object Similarity {

  val TopK = 5
  val NumHyperplanes = 8
  val Dim = 64
  /** Query subset: vec_id % QueryMod == 0 (keeps brute force bounded). */
  val QueryMod = 25

  /** Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    * c(j, d) = ((j*64 + d) * 2654435761 mod 1000003) / 1000003 - 0.5
    * (d is 1-based; same expression in the oracle SQL). */
  def hyperplaneCoef(j: Int, d: Int): Double =
    ((j * 64L + d) * 2654435761L % 1000003L) / 1000003.0 - 0.5

  private def asDouble(c: Column): Column = c.cast("array<double>")

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dotProduct(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** nBits-bit LSH bucket string: bit j = sign of dot(v, hyperplane_j).
    * Hyperplanes are literal arrays — each bit is one codegen'd dot. */
  def lshBucket(v: Column, nBits: Int = NumHyperplanes,
      dim: Int = Dim): Column = {
    val vd = asDouble(v)
    concat((0 until nBits).map { j =>
      val hp = array((1 to dim).map(d => lit(hyperplaneCoef(j, d))): _*)
      when(dotProduct(vd, hp) > 0, lit("1")).otherwise(lit("0"))
    }: _*)
  }

  /** Corpus/query frames with the norm computed once per vector. The
    * repartition spreads the pair loops across cores — the small-SF
    * parquet arrives as one partition, which would pin the whole
    * cosine join to a single task. */
  private def withNorm(emb: DataFrame, idAs: String, embAs: String,
      normAs: String): DataFrame =
    emb.repartition(col("vec_id"))
      .select(col("vec_id").as(idAs),
        asDouble(col("embedding")).as(embAs),
        l2Norm(asDouble(col("embedding"))).as(normAs))

  private def topKOf(pairs: DataFrame, k: Int): DataFrame =
    pairs.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), asc("nn_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), round(col("cos"), 6).as("cos"))

  private def pairCos: Column =
    dotProduct(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm"))

  /** Exact brute-force cosine top-k for the query subset. */
  def bruteForceTopK(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod): DataFrame = {
    val q = withNorm(emb.filter(col("vec_id") % queryMod === 0),
      "q_id", "q_emb", "q_norm")
    val c = withNorm(emb, "nn_id", "c_emb", "c_norm")
    val pairs = broadcast(q).join(c, col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
    topKOf(pairs, k)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's
    * bucket; ranking identical to brute force within the bucket. */
  def lshTopK(emb: DataFrame, k: Int = TopK, queryMod: Int = QueryMod,
      nBits: Int = NumHyperplanes): DataFrame = {
    val bucketed = emb.repartition(col("vec_id"))
      .select(col("vec_id"),
        asDouble(col("embedding")).as("v"),
        l2Norm(asDouble(col("embedding"))).as("nrm"),
        lshBucket(col("embedding"), nBits).as("bucket"))
    val q = bucketed.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_emb"),
        col("nrm").as("q_norm"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("nn_id"),
      col("v").as("c_emb"), col("nrm").as("c_norm"), col("bucket"))
    val pairs = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
    topKOf(pairs, k)
  }

  /** Per-vector nearest neighbor (top-1 over the whole corpus) — the
    * embedding-cosine near-duplicate detector: near-dup pairs at
    * threshold t are exactly the rows of this result with cos ≥ t. */
  def nearestNeighbor(emb: DataFrame): DataFrame = {
    val a = withNorm(emb, "q_id", "q_emb", "q_norm")
    val b = withNorm(emb, "nn_id", "c_emb", "c_norm")
    a.join(broadcast(b), col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), asc("nn_id"))))
      .filter(col("rank") === 1)
      .select(col("q_id"), col("nn_id"), round(col("cos"), 6).as("cos"))
  }
}
