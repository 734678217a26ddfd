package graft.similarity

import graft.core.CheckpointBay.Checkpointable
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
  *    hyperplane bucket with a coarse k-means cell id (deterministic
  *    integer Lloyd, [[lloydCentersE6]]) and probe neighboring cells
  *    for recall.
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
  /** Target mean bucket occupancy for size-scaled LSH. */
  val TargetBucket = 16

  /** Hyperplane count scaled to corpus size: the smallest k with
    * 2^k ≥ ⌈n / TargetBucket⌉, floored at [[NumHyperplanes]] — bucket
    * population stays ~constant as n grows instead of growing linearly
    * (the round-1 weakness of a fixed 8-bit code). Integer-only (binary
    * digit count, no float log2) so the DuckDB oracle derives the
    * identical value at power-of-two boundaries. */
  def scaledNBits(n: Long): Int = {
    val m = (n + TargetBucket - 1) / TargetBucket
    math.max(NumHyperplanes,
      java.lang.Long.toBinaryString(math.max(m - 1, 0)).length)
  }

  /** The same derivation in DuckDB SQL, over the live row count. */
  val ScaledNBitsSql: String =
    s"""GREATEST($NumHyperplanes, length(format('{:b}',
       | GREATEST(((SELECT COUNT(*) FROM embeddings) + ${TargetBucket - 1})
       |   // $TargetBucket - 1, 0))))""".stripMargin.replace("\n", "")

  /** Hyperplane count for the FILTERED variant ([[filteredTopK]]):
    * the same [[TargetBucket]] rule applied to the PER-LABEL corpus
    * (the label filter already divides the candidate space by
    * |labels|), with a 2-bit floor instead of [[NumHyperplanes]] —
    * under the global floor a 50-vector label partition would spread
    * over 256 buckets and the result would be pathologically sparse.
    * Integer-only, mirrored by [[FilteredNBitsSql]]. */
  def filteredNBits(n: Long, nLabels: Long): Int = {
    val per = n / math.max(nLabels, 1L)
    val m = (per + TargetBucket - 1) / TargetBucket
    math.max(2, java.lang.Long.toBinaryString(math.max(m - 1, 0)).length)
  }

  /** The same derivation in DuckDB SQL, over the live counts. */
  val FilteredNBitsSql: String =
    s"""GREATEST(2, length(format('{:b}',
       | GREATEST((((SELECT COUNT(*) FROM embeddings)
       |   // (SELECT COUNT(DISTINCT label) FROM embeddings))
       |   + ${TargetBucket - 1}) // $TargetBucket - 1, 0))))"""
      .stripMargin.replace("\n", "")

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

  /** Corpus/query frames with the norm computed once per vector.
    * [[graft.core.Spread]] repairs local parallelism only when the scan
    * is materially under-split (the small-SF parquet arrives as ONE
    * partition, which would pin the whole cosine join to a single
    * task); on an already-split cluster table it is the identity and
    * no Exchange enters the plan. */
  private def withNorm(emb: DataFrame, idAs: String, embAs: String,
      normAs: String): DataFrame =
    graft.core.Spread(emb)
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

  /** Deepest rung any recall audit asks of the exact ground truth —
    * [[sharedExactTopK]] materializes to THIS depth so every consumer
    * (k ≤ this) is a rank filter over one session-cached frame. */
  lazy val SharedExactK: Int = (RecallKs.max.toInt).max(TopK)

  /** Session-cached [[bruteForceTopK]] at depth [[SharedExactK]] for
    * the `embeddings` table at `dir` — the exact-cosine ground truth
    * every recall audit (brute-force listing, LSH curve, IVF, PQ,
    * matryoshka) re-derived per query: ONE bounded |Q|×N dot-product
    * pass per sweep instead of five (r16, guide §2.4). A consumer at
    * k ≤ [[SharedExactK]] filters `rank <= k` — identical rows by
    * construction (per-query ranking is a prefix property). */
  def sharedExactTopK(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.core.SessionCache.cached(spark, s"exacttopk:$dir")(
      bruteForceTopK(graft.core.Tables(spark, dir, "embeddings"),
        SharedExactK))

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

  /** TwoNN intrinsic-dimension profile (X255, Facco et al. 2017,
    * Scientific Reports — "Estimating the intrinsic dimension of
    * datasets by a minimal neighborhood information"): the effective
    * dimensionality an embedding space ACTUALLY uses, from nothing but
    * each point's two nearest neighbors. Under a locally-uniform
    * density the ratio µ = d₂/d₁ follows P(µ) = d·µ^−(d+1), so the
    * MLE is d = N / Σ ln µ — an anisotropic, curved manifold of
    * intrinsic dim 8 embedded in 512-d reports ≈ 8. A LOW estimate on
    * a high-d embedding column means the model collapsed dimensions
    * (the sibling read to [[dimStats]]' per-dim variance: TwoNN sees
    * nonlinear collapse that per-dim variance can't); an estimate near
    * the ambient dim means distance concentration and every ANN index
    * degrades. The engine emits the per-point EXACT integer evidence —
    * cosine distances quantized e6 (`floor((1−cos)·10⁶+0.5)`, the
    * shared device) and µ_ppm = d₂·10⁶ div max(d₁,1) — the float
    * ln/MLE step belongs to the consumer (X129 moments discipline).
    * Ranking happens ON the quantized distance (asc, nn_id tiebreak),
    * so the picked neighbors replay bit-identically in the oracle.
    *
    * Scale: the exact-2-NN pass shares [[bruteForceTopK]]'s shape —
    * broadcast query subset (|Q| = n/queryMod) against the corpus,
    * corpus never shuffled; at 100 TB swap the candidate generator for
    * the multi-probe LSH / IVF tier (top-2 of candidates) exactly as
    * the top-k family documents — the µ math is identical. */
  def twoNNProfile(emb: DataFrame, queryMod: Int = QueryMod): DataFrame = {
    val q = withNorm(emb.filter(col("vec_id") % queryMod === 0),
      "q_id", "q_emb", "q_norm")
    val c = withNorm(emb, "nn_id", "c_emb", "c_norm")
    val pairs = broadcast(q).join(c, col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"),
        floor((lit(1.0) - pairCos) * 1000000.0 + 0.5)
          .cast("long").as("d_e6"))
    val ranked = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(asc("d_e6"), asc("nn_id"))))
      .filter(col("rk") <= 2)
    ranked.groupBy(col("q_id"))
      .agg(min(when(col("rk") === 1, col("nn_id"))).as("nn1_id"),
        min(when(col("rk") === 1, col("d_e6"))).as("d1_e6"),
        min(when(col("rk") === 2, col("nn_id"))).as("nn2_id"),
        min(when(col("rk") === 2, col("d_e6"))).as("d2_e6"))
      .withColumn("mu_ppm", expr("d2_e6 * 1000000 div greatest(d1_e6, 1)"))
  }

  /** LSH-bucketed approximate top-k: candidates share the query's
    * bucket; ranking identical to brute force within the bucket. */
  def lshTopK(emb: DataFrame, k: Int = TopK, queryMod: Int = QueryMod,
      nBits: Int = NumHyperplanes): DataFrame = {
    // both join sides read this lineage — persist via CacheBay
    val bucketed = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"),
          asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm"),
          lshBucket(col("embedding"), nBits).as("bucket")))
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

  /** Predicate-FILTERED ANN top-k (X275) — the tenant/category-
    * partitioned vector search every production vector store serves
    * ("neighbors of q AMONG ITS OWN label's vectors"): post-filtering
    * a plain ANN result loses recall exactly when the filter is
    * selective (the classic filtered-ANN failure), so the filter
    * composes INTO the candidate key — the bucket equi-join runs on
    * the COMPOUND (label, bucket) key and a query physically never
    * meets another label's candidates. Within the partition the
    * ranking is identical to [[lshTopK]].
    *
    * Scale: same shuffle shape as [[lshTopK]] (one equi-join, now on
    * a strictly finer key → smaller buckets, never bigger); the label
    * column rides the one bucketed cache. At 100 TB a per-tenant
    * corpus skew shows up as bucket skew on (label, bucket) — AQE
    * skew-join or per-label nBits scaling are the standard
    * treatments, both compatible with this key. */
  def filteredTopK(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod, nBits: Int = NumHyperplanes): DataFrame = {
    val bucketed = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm"),
          lshBucket(col("embedding"), nBits).as("bucket")))
    val q = bucketed.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("label"),
        col("v").as("q_emb"), col("nrm").as("q_norm"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("nn_id"), col("label"),
      col("v").as("c_emb"), col("nrm").as("c_norm"), col("bucket"))
    q.join(c, Seq("label", "bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("label"), col("nn_id"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), asc("nn_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("label"),
        col("rank").cast("long").as("rank"),
        col("nn_id"), round(col("cos"), 6).as("cos"))
  }

  /** Per-vector approximate nearest neighbor — the embedding-cosine
    * near-duplicate detector: near-dup pairs at threshold t are exactly
    * the rows of this result with cos ≥ t.
    *
    * Multi-probe LSH, never all-pairs: every vector is bucketed by an
    * nBits-bit hyperplane code; the query side probes its own bucket
    * plus the nBits buckets at Hamming distance 1 (the standard
    * multi-probe recall boost), the corpus side is keyed by its own
    * bucket only, and candidates come from the bucket equi-join — a
    * shuffle on the bucket key with per-query candidate counts around
    * (nBits+1)·n/2^nBits ≈ (log n)·[[TargetBucket]] when nBits =
    * [[scaledNBits]]. Nothing is broadcast and no O(n²) pair set ever
    * materializes, so the shape survives a 100× corpus. A vector whose
    * probes find no occupied bucket drops out (standard ANN semantics;
    * [[nearestNeighborExact]] remains the test oracle). */
  def nearestNeighbor(emb: DataFrame,
      nBits: Int = NumHyperplanes): DataFrame = {
    val bucketed = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"),
          asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm"),
          lshBucket(col("embedding"), nBits).as("bucket")))
    // own bucket + each single-bit flip (nBits+1 probe keys per vector)
    val flips = (0 until nBits).map { j =>
      concat(
        col("bucket").substr(1, j),
        when(col("bucket").substr(j + 1, 1) === "1", lit("0"))
          .otherwise(lit("1")),
        col("bucket").substr(j + 2, nBits - j - 1))
    }
    val probes = bucketed.select(col("vec_id").as("q_id"),
        col("v").as("q_emb"), col("nrm").as("q_norm"),
        explode(array(col("bucket") +: flips: _*)).as("bucket"))
    val corpus = bucketed.select(col("vec_id").as("nn_id"),
      col("v").as("c_emb"), col("nrm").as("c_norm"), col("bucket"))
    probes.join(corpus, Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), asc("nn_id"))))
      .filter(col("rank") === 1)
      .select(col("q_id"), col("nn_id"), round(col("cos"), 6).as("cos"))
  }

  /** Hard-negative mining for contrastive/metric training — the
    * curation step that decides what a embedding model trains AGAINST:
    * for each query vector, the most similar candidate with a
    * DIFFERENT label (highest cosine = the negative the current
    * embedding most confuses — random negatives are trivially easy and
    * teach nothing; the hard ones carry the gradient signal).
    *
    * Candidates come from the single-bucket LSH equi-join ([[lshTopK]]'s
    * exact shape — no all-pairs), the different-label gate is a plain
    * predicate on the joined rows, and the per-query argmax is
    * `row_number` over (cos desc, id asc) — the family's standard
    * tie-break, oracle-identical. A query whose bucket holds no
    * other-label member drops out (same semantics as every ANN leg;
    * the spec pins the planted-geometry case). */
  def hardNegatives(emb: DataFrame, queryMod: Int = QueryMod,
      nBits: Int = NumHyperplanes): DataFrame = {
    val bucketed = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm"),
          lshBucket(col("embedding"), nBits).as("bucket")))
    val q = bucketed.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("v").as("q_emb"), col("nrm").as("q_norm"), col("bucket"))
    val c = bucketed.select(col("vec_id").as("nn_id"),
      col("label").as("nn_label"),
      col("v").as("c_emb"), col("nrm").as("c_norm"), col("bucket"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id") &&
        col("q_label") =!= col("nn_label"))
      .select(col("q_id"), col("q_label"), col("nn_id"),
        col("nn_label"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("cos"), asc("nn_id"))))
      .filter(col("rank") === 1)
      .select(col("q_id"), col("q_label"), col("nn_id"),
        col("nn_label"), round(col("cos"), 6).as("cos"))
  }

  /** Per-center distance-rank structs over literal center arrays
    * (d = |c|² − 2v·c; |v|² is constant per row so it cannot change
    * the order) — the centroid table never joins, it folds into the
    * plan as codegen'd expressions. |c|² is a Scala left-fold sum, the
    * same sequential order DuckDB's `list_sum` accumulates in, so the
    * audit oracle reproduces the doubles bit-exactly. */
  private def centerDistStructs(centers: Array[Array[Double]]): Seq[Column] =
    centers.zipWithIndex.map { case (c, j) =>
      val cArr = array(c.toIndexedSeq.map(lit): _*)
      val d = lit(c.map(x => x * x).sum) - lit(2.0) * dotProduct(col("v"), cArr)
      struct(d.as("d"), lit(j).as("cell"))
    }.toIndexedSeq

  /** IVF probe + rank against a FIXED center set: every vector is
    * assigned to its nearest center (ties → lowest cell id, both
    * engines); each query probes its nProbe nearest cells and ranks
    * only those cells' members — candidate count ≈ nProbe·n/nCells,
    * via one bucket equi-join, never all-pairs. `feat` must carry
    * (vec_id, v, nrm). */
  def ivfTopKFromCenters(feat: DataFrame, centers: Array[Array[Double]],
      k: Int = TopK, queryMod: Int = QueryMod, nProbe: Int = 2): DataFrame = {
    require(centers.nonEmpty, "ivfTopKFromCenters: empty center set")
    val sorted = array_sort(array(centerDistStructs(centers): _*))
    val assigned = feat.withColumn("cells",
      slice(sorted, 1, math.min(math.max(nProbe, 1), centers.length)))
    val corpus = assigned.select(col("vec_id").as("nn_id"),
      col("v").as("c_emb"), col("nrm").as("c_norm"),
      col("cells").getItem(0).getField("cell").as("cell"))
    val probes = assigned.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_emb"),
        col("nrm").as("q_norm"), explode(col("cells.cell")).as("cell"))
    val pairs = probes.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
    topKOf(pairs, k)
  }

  /** Fixed Lloyd-iteration count for [[lloydCentersE6]] — part of the
    * operator's definition (the oracle unrolls exactly this many
    * rounds), not a convergence knob. */
  val LloydIters = 2

  /** Deterministic k-means centers via [[LloydIters]] integer Lloyd
    * rounds (VERDICT r13 #1) — the coarse-quantizer TRAINING step for
    * [[ivfTopK]], built so the whole fit is SQL-replayable (unlike an
    * MLlib KMeans fit, whose k-means|| init and double accumulation
    * order are engine-private):
    *
    *  - components quantize to e6 integer micro-units
    *    (`floor(x·10⁶ + 0.5)`, the operator-level spelling both
    *    engines evaluate identically), so every distance is EXACT
    *    integer arithmetic and every sum is order-free;
    *  - seeds are the [[seedCenters]] first-16 rule (bounded,
    *    replayable ORDER BY/LIMIT);
    *  - assignment = argmin over exact integer dist² (ties → lowest
    *    cell, `array_sort` on (d2, cell) structs = the oracle's
    *    `ORDER BY d2, cell`);
    *  - recenter = the order-free quantized mean `floor(sum/n)` via
    *    one exact IEEE double division (the [[labelCentroids]]
    *    spelling — NOT integer `div`, whose negative-operand semantics
    *    differ between engines); an empty cell keeps its previous
    *    center (oracle: COALESCE over a left join).
    *
    * Scale shape: per round, one narrow map computing nCells integer
    * distances per vector (centers fold in as literal arrays — no
    * join, no explode on the assignment side) plus one posexplode +
    * hash aggregate for the means — rows·dim records through a single
    * shuffle, exactly the [[labelCentroids]] shape. The per-round
    * collect is ≤ nCells·dim rows (16·64 here), not data-dependent.
    * Overflow: per-dim diff² of two e6 quantities needs |x| below
    * ~3.8e2 for dim·(2·maxAbs·10⁶)² to stay under Long.Max; the
    * one-pass witness below asserts it BEFORE any sum (the r12/r13
    * pre-overflow-witness rule), rather than testing a possibly
    * wrapped result after. */
  def lloydCentersE6(emb: DataFrame, nCells: Int = 16,
      iters: Int = LloydIters): Array[Array[Long]] = {
    val q = graft.core.CacheBay.register(graft.core.Spread(emb)
      .select(col("vec_id"),
        transform(asDouble(col("embedding")),
          x => floor(x * lit(1000000.0) + lit(0.5)).cast("long"))
          .as("q")))
    // pre-overflow witness: max |component| such that a full dist²
    // sum (dim terms of (2·maxAbs)²) provably fits a Long
    val w = q.agg(max(aggregate(col("q"), lit(0L),
        (a, e) => greatest(a, abs(e)))).as("m"),
      count(lit(1)).as("n")).head()
    val (maxAbsQ, nRows) = (w.getLong(0), w.getLong(1))
    require(maxAbsQ < math.sqrt(Long.MaxValue.toDouble / Dim) / 2.0,
      s"lloydCentersE6: |q| up to $maxAbsQ could wrap dist² past Long")
    require(maxAbsQ.toDouble * nRows < Long.MaxValue.toDouble * 0.99,
      s"lloydCentersE6: per-cell component sum ($nRows rows × |q| ≤ " +
        s"$maxAbsQ) could wrap a Long")
    var centers: Array[Array[Long]] = seedCenters(emb, nCells)
      .map(_.map(x => math.floor(x * 1000000.0 + 0.5).toLong))
    require(centers.nonEmpty, "lloydCentersE6: empty seed set")
    for (_ <- 1 to iters) {
      val structs: Seq[Column] = centers.zipWithIndex.map { case (c, j) =>
        val cArr = array(c.toIndexedSeq.map(lit): _*)
        val d2 = aggregate(
          zip_with(col("q"), cArr, (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, e) => acc + e)
        struct(d2.as("d2"), lit(j).as("cell"))
      }.toIndexedSeq
      val assigned = q.withColumn("cell",
        array_sort(array(structs: _*)).getItem(0).getField("cell"))
      val means = assigned.select(col("cell"), posexplode(col("q")))
        .groupBy(col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("col")).cast("long").as("s"))
        .select(col("cell"), col("pos"),
          floor(col("s").cast("double") / col("n")).cast("long").as("c"))
        .collect() // bounded: ≤ nCells·dim rows, not data-dependent
      val next = centers.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      centers = next
    }
    centers
  }

  /** IVF (inverted-file) ANN over deterministic integer-Lloyd cells —
    * the classic cluster-scale alternative to hyperplane LSH: a coarse
    * quantizer partitions the corpus into nCells — tune nCells ~√n for
    * √n-ish work per query. Probe/rank mechanics in
    * [[ivfTopKFromCenters]]; the quantizer is [[lloydCentersE6]]
    * (seed-center init + [[LloydIters]] exact-integer Lloyd rounds),
    * so the FULL pipeline — fit, assignment, probe, rank — is replayed
    * verbatim by the DuckDB oracle as unrolled MATERIALIZED CTEs (the
    * PageRank/BPE loop device); final centers enter the distance
    * expressions as e6/10⁶ doubles, bit-identical on both engines.
    *
    * `centersE6` hands in an already-trained quantizer (the registry
    * memoizes the deterministic fit per session+dir — the BPE-merges
    * precedent: a train-once artifact is not refit per query); None
    * trains inline. */
  def ivfTopK(emb: DataFrame, k: Int = TopK, queryMod: Int = QueryMod,
      nCells: Int = 16, nProbe: Int = 2,
      iters: Int = LloydIters,
      centersE6: Option[Array[Array[Long]]] = None): DataFrame = {
    val feat = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"),
          asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm")))
    val centers = centersE6.getOrElse(lloydCentersE6(emb, nCells, iters))
      .map(_.map(_.toDouble / 1000000.0))
    ivfTopKFromCenters(feat, centers, k, queryMod, nProbe)
  }

  /** Top-1 cell assignment `(vec_id, cell)` of `emb` against explicit
    * centers — the per-row arrival step shared by [[ivfIncremental]]
    * and the streaming leg ([[graft.streaming.StreamIvf]]); ties →
    * lowest cell, the [[ivfTopKFromCenters]] total order. */
  def assignCells(emb: DataFrame,
      centers: Array[Array[Double]]): DataFrame = {
    val sorted = array_sort(array(centerDistStructs(centers): _*))
    graft.core.Spread(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        sorted.getItem(0).getField("cell").cast("long").as("cell"))
  }

  /** X316: INCREMENTAL IVF index maintenance — the one 100 TB story a
    * rebuild-per-run index lacks: a production corpus grows by
    * batches, and re-assigning the whole corpus per arrival is a full
    * scan the arithmetic doesn't need. The stored index is the
    * `(vec_id, cell)` assignment table against centers FROZEN at
    * build time (the production IVF contract — FAISS `add()` after
    * `train()`: an arrival re-assigns nothing), persisted through the
    * X68 [[graft.streaming.VersionedState]] commit pattern:
    *
    *  - v0 = the BASE corpus (`vec_id % 4 ≠ 0`) assigned against
    *    centers trained on the base ([[lloydCentersE6]]); the
    *    quantizer itself commits beside the assignments (a
    *    `(cell, dim, c_e6)` frame under `root/quantizer`) and is
    *    READ, never retrained, by every later arrival or query;
    *  - the arrival batch (`vec_id % 4 = 0`) assigns ONLY ITSELF
    *    against the same centers and commits v1 = v0 ∪ batch — cost
    *    \|batch\|·nCells distances + one append, never \|corpus\|;
    *  - a REPLAYED arrival is a no-op (`currentVersion ≥ 1` guard —
    *    the X94/X147 incremental discipline), which
    *    `SimilaritySpec` proves by mtime identity;
    *  - the probe/rank query runs off the STORED index joined back to
    *    the vector table (the index persists assignments, not
    *    vectors). Because assignment is per-row against the same
    *    frozen centers, the stored index ≡ assigning the merged
    *    corpus in one shot, so the query result is EXACTLY
    *    [[ivfTopKFromCenters]] over the full corpus — which is what
    *    the DuckDB oracle recomputes (the sim_ivf_topk pipeline with
    *    the fit restricted to the base split).
    *
    * Probe cells are computed fresh per query vector (query-time
    * probe selection is always computed, never stored). */
  def ivfIncremental(emb: DataFrame, root: String, k: Int = TopK,
      queryMod: Int = QueryMod, nCells: Int = 16, nProbe: Int = 2,
      iters: Int = LloydIters): DataFrame = {
    import graft.streaming.VersionedState
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    // the quantizer IS part of the stored index (what "frozen at
    // build time" means operationally): trained once, committed
    // beside the assignments, and READ — not retrained — on every
    // later arrival or query. The (cell, dim, c_e6) frame is
    // nCells·dim rows; the read-back collect is bounded by it.
    val qRoot = s"$root/quantizer"
    val centersE6: Array[Array[Long]] =
      if (VersionedState.currentVersion(spark, qRoot) < 0L) {
        val c = lloydCentersE6(base, nCells, iters)
        VersionedState.commit(
          c.zipWithIndex.flatMap { case (row, cell) =>
            row.zipWithIndex.map { case (v, dim) => (cell, dim, v) }
          }.toSeq.toDF("cell", "dim", "c_e6"), 0L, qRoot)
        c
      } else {
        val rows = VersionedState.current(spark, qRoot).get
          .select(col("cell").cast("int"), col("dim").cast("int"),
            col("c_e6").cast("long"))
          .collect() // bounded: nCells·dim rows
        val dim = rows.map(_.getInt(1)).max + 1
        val out = Array.ofDim[Long](rows.map(_.getInt(0)).max + 1, dim)
        rows.foreach(r => out(r.getInt(0))(r.getInt(1)) = r.getLong(2))
        out
      }
    val centers = centersE6.map(_.map(_.toDouble / 1000000.0))
    val sorted = array_sort(array(centerDistStructs(centers): _*))
    def assignTop1(df: DataFrame): DataFrame = assignCells(df, centers)
    if (VersionedState.currentVersion(spark, root) < 0L)
      VersionedState.commit(assignTop1(base), 0L, root)
    if (VersionedState.currentVersion(spark, root) < 1L)
      VersionedState.commit(
        spark.read.parquet(s"$root/v0").unionByName(assignTop1(batch)),
        1L, root)
    val idx = VersionedState.current(spark, root).get
    val feat = graft.core.CacheBay.register(
      graft.core.Spread(emb).select(col("vec_id"),
        asDouble(col("embedding")).as("v"),
        l2Norm(asDouble(col("embedding"))).as("nrm")))
    val corpus = feat.join(idx, Seq("vec_id"))
      .select(col("vec_id").as("nn_id"), col("v").as("c_emb"),
        col("nrm").as("c_norm"), col("cell"))
    val probes = feat.filter(col("vec_id") % queryMod === 0)
      .withColumn("cells",
        slice(sorted, 1, math.min(math.max(nProbe, 1), centers.length)))
      .select(col("vec_id").as("q_id"), col("v").as("q_emb"),
        col("nrm").as("q_norm"),
        explode(col("cells.cell")).as("cell0"))
      .select(col("q_id"), col("q_emb"), col("q_norm"),
        col("cell0").cast("long").as("cell"))
    val pairs = probes.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
    topKOf(pairs, k)
  }

  val PqM = 8
  val PqCodes = 16

  /** Product-quantization ANN — the memory-compression leg of the ANN
    * family (IVF partitions the corpus; PQ shrinks what each candidate
    * COSTS): every corpus vector is encoded as `m` sub-space code
    * bytes (here m=8 codes over 8-dim sub-vectors, 16 centroids each),
    * and query-to-candidate distance is estimated by asymmetric
    * distance computation (ADC) — the query keeps its full sub-vectors
    * and sums its squared distance to each candidate's RECONSTRUCTED
    * sub-centroids. At cluster scale the candidate side of the join
    * carries m bytes per vector instead of 4·dim — the difference
    * between an index that fits executor memory at 10⁹ vectors and one
    * that doesn't.
    *
    * Candidates come from the same scaled LSH bucket equi-join as
    * [[lshTopK]] (PQ is a ranking compression, not a pruning
    * structure — production systems pair it with a coarse index, here
    * the hyperplane buckets; never all-pairs). The codebook is the
    * [[seedCenters]] family sliced per sub-space — deterministic and
    * bounded, so the FULL pipeline (codebook, encoding, ADC ranking)
    * is replayed verbatim by the DuckDB oracle; every double fold is
    * spelled in ascending index order on both engines. Encoding ties
    * break to the lowest code (array_sort on (dist, j) structs =
    * the oracle's `ORDER BY dd, j`). */
  def pqTopK(emb: DataFrame, k: Int = TopK, queryMod: Int = QueryMod,
      m: Int = PqM, kCodes: Int = PqCodes,
      nBits: Int = NumHyperplanes): DataFrame =
    pqTopKWithSeeds(emb, seedCenters(emb, kCodes), k, queryMod, m,
      kCodes, nBits)

  /** [[pqTopK]] against an EXPLICIT codebook — the seam
    * [[pqIncremental]] shares, so "incremental ≡ one-shot with the
    * same frozen codebook" is assertable as frame equality. */
  def pqTopKWithSeeds(emb: DataFrame, seeds: Array[Array[Double]],
      k: Int = TopK, queryMod: Int = QueryMod,
      m: Int = PqM, kCodes: Int = PqCodes,
      nBits: Int = NumHyperplanes): DataFrame = {
    require(seeds.length == kCodes && seeds.head.length % m == 0,
      s"pqTopK: need $kCodes seeds and dim divisible by $m")
    // encode and ADC run as the native PqEncode/PqAdc expressions: the
    // same arithmetic spelled as literal expression trees is m·k·sub ≈
    // 1000+ leaf terms — past the whole-stage-codegen method limits,
    // i.e. interpreted tree-walking per row (measured 6.8 s at sf0.1
    // vs sub-second native)
    val bucketed = graft.core.CacheBay.register(
      emb.select(col("vec_id"),
        asDouble(col("embedding")).as("v"),
        lshBucket(col("embedding"), nBits).as("bucket")))
    // multi-probe query side (own bucket + every Hamming-1 flip, the
    // [[nearestNeighbor]] recall boost): a single-bucket cut at scaled
    // nBits keeps only ~n/2^nBits candidates and the ADC layer has
    // almost nothing to rank — measured recall@5 on the (unstructured)
    // fixture: 3.25% single-bucket → 5.25% multi-probe, with the
    // corpus side still single-keyed. On near-random vectors recall
    // tracks the candidate fraction ((nBits+1)/2^nBits ≈ 0.6% here);
    // the planted-structure spec shows the mechanism at full strength.
    val flips = (0 until nBits).map { j =>
      concat(
        col("bucket").substr(1, j),
        when(col("bucket").substr(j + 1, 1) === "1", lit("0"))
          .otherwise(lit("1")),
        col("bucket").substr(j + 2, nBits - j - 1))
    }
    val q = bucketed.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(array(col("bucket") +: flips: _*)).as("bucket"))
    val c = bucketed.select(col("vec_id").as("nn_id"),
      graft.functions.VectorExpressions.pqEncode(col("v"), seeds, m)
        .as("codes"),
      col("bucket"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"),
        graft.functions.VectorExpressions.pqAdc(col("qv"), col("codes"),
          seeds, m).as("adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(asc("adc"), asc("nn_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), round(col("adc"), 6).as("adc"))
  }

  /** X320: incremental PQ code maintenance — [[ivfIncremental]]'s
    * X316 discipline applied to the COMPRESSION leg: the codebook is
    * FROZEN at build time ([[seedCenters]] of the base split — the
    * train-then-add contract), the stored index is the
    * `(vec_id, bucket, codes)` table (bucket at the index's
    * configured hyperplane count, codes = the m sub-space bytes —
    * what a 10⁹-vector deployment actually persists), an arrival
    * batch encodes ONLY itself and commits v_prev ∪ batch through the
    * X68 versioned-state pattern (replay-guarded). Per-row encoding
    * against a frozen codebook makes the merged index ≡ the one-shot
    * full encode, so the ADC ranking equals [[pqTopKWithSeeds]] on
    * the full corpus — the oracle replays the X8 PQ pipeline with the
    * codebook restricted to the base split. */
  def pqIncremental(emb: DataFrame, root: String, k: Int = TopK,
      queryMod: Int = QueryMod, m: Int = PqM, kCodes: Int = PqCodes,
      nBits: Int = NumHyperplanes): DataFrame = {
    import graft.streaming.VersionedState
    val spark = emb.sparkSession
    val base = emb.filter(col("vec_id") % 4 =!= 0)
    val batch = emb.filter(col("vec_id") % 4 === 0)
    val seeds = seedCenters(base, kCodes)
    require(seeds.length == kCodes && seeds.head.length % m == 0,
      s"pqIncremental: need $kCodes seeds and dim divisible by $m")
    def encode(df: DataFrame): DataFrame =
      graft.core.Spread(df)
        .select(col("vec_id"),
          asDouble(col("embedding")).as("v"),
          lshBucket(col("embedding"), nBits).as("bucket"))
        .select(col("vec_id"), col("bucket"),
          graft.functions.VectorExpressions.pqEncode(col("v"), seeds, m)
            .as("codes"))
    if (VersionedState.currentVersion(spark, root) < 0L)
      VersionedState.commit(encode(base), 0L, root)
    if (VersionedState.currentVersion(spark, root) < 1L)
      VersionedState.commit(
        spark.read.parquet(s"$root/v0").unionByName(encode(batch)),
        1L, root)
    val idx = graft.core.CacheBay.register(
      VersionedState.current(spark, root).get)
    val feat = graft.core.Spread(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val flips = (0 until nBits).map { j =>
      concat(
        col("bucket").substr(1, j),
        when(col("bucket").substr(j + 1, 1) === "1", lit("0"))
          .otherwise(lit("1")),
        col("bucket").substr(j + 2, nBits - j - 1))
    }
    val q = feat.filter(col("vec_id") % queryMod === 0)
      .join(idx.select(col("vec_id"), col("bucket")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(array(col("bucket") +: flips: _*)).as("bucket"))
    val c = idx.select(col("vec_id").as("nn_id"), col("codes"),
      col("bucket"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"),
        graft.functions.VectorExpressions.pqAdc(col("qv"), col("codes"),
          seeds, m).as("adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(asc("adc"), asc("nn_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), round(col("adc"), 6).as("adc"))
  }

  /** Mutual-nearest-neighbor rate (X250) — the HUBNESS screen for an
    * embedding space: in a healthy space most top-1 relations are
    * symmetric (my nearest neighbor's nearest neighbor is me); a low
    * mutual rate means a few hub vectors are everyone's neighbor
    * while being close to none of them — the high-dimensional
    * pathology that silently poisons kNN labels, dedup keeper picks
    * and retrieval ranking (Radovanović et al. 2010). One number over
    * the existing multi-probe top-1 frame: vectors with a top-1, the
    * mutual pairs among them, integer-ppm mutual rate. Vectors whose
    * probes found no candidate carry no top-1 row — the same contract
    * the top-1 query itself has.
    *
    * Scale shape: rides [[nearestNeighbor]] unchanged, then ONE
    * self-equi-join of the |V|-row top-1 frame on the reversed pair
    * key and two 1-row counts — no new corpus work. */
  def mutualNeighborRate(emb: DataFrame,
      nBits: Int = NumHyperplanes): DataFrame = {
    val nn = graft.core.CacheBay.register(
      nearestNeighbor(emb, nBits).select(col("q_id"), col("nn_id")))
    val mutual = nn.join(
      nn.select(col("nn_id").as("q_id"), col("q_id").as("nn_id")),
      Seq("q_id", "nn_id"), "left_semi")
    nn.agg(count(lit(1)).cast("long").as("n_vectors"))
      .crossJoin(broadcast(
        mutual.agg(count(lit(1)).cast("long").as("n_mutual"))))
      .select(col("n_vectors"), col("n_mutual"),
        expr("(n_mutual * 1000000) div greatest(n_vectors, 1)")
          .cast("long").as("mutual_ppm"))
  }

  /** Bucket-size cap for [[lshSplitTopK]]: 4× the target mean
    * occupancy — past it, one bucket's candidate pairs dominate one
    * reduce task. */
  val SplitCap = 4 * TargetBucket

  /** X317: ADAPTIVE bucket splitting — the mitigation X248 diagnoses
    * the need for but nothing acted on: a mega-bucket (collinear /
    * duplicated embeddings all hashing alike) puts its entire
    * quadratic candidate load on ONE reduce task. Each bucket over
    * [[SplitCap]] splits into `fan` sub-buckets, `fan` = the smallest
    * power of two with n/fan ≤ cap (the X92 size-scaling device made
    * adaptive PER BUCKET, binary-digit-count integer form — no float
    * log); healthy buckets keep fan = 1 and pay nothing.
    *
    * The sub-key is `vec_id % fan` — deterministic and replayable —
    * and NOT more hyperplane bits: an exactly-collinear bucket (the
    * pathological case this exists for) gives IDENTICAL signs on
    * every further hyperplane, so semantic splitting provably cannot
    * bound it; id-spreading always can. The query side probes ALL
    * `fan` sub-buckets of its bucket (bounded replication,
    * `Σ fan ≈ n/cap` probe rows), so the candidate PAIR SET — and
    * therefore recall — is EXACTLY [[lshTopK]]'s (the result-identity
    * bar, spec-proven as full equality), while the per-task bucket
    * population is ≤ cap by construction. The same trade as the X47
    * salted join, applied to the ANN candidate join. */
  def lshSplitBuckets(emb: DataFrame, nBits: Int = NumHyperplanes,
      cap: Int = SplitCap): DataFrame = {
    val bucketed = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"),
          asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm"),
          lshBucket(col("embedding"), nBits).as("bucket")))
    val fans = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(col("bucket"),
        expr(s"case when n <= $cap then cast(1 as bigint) else " +
          s"cast(shiftleft(1, length(bin((n + $cap - 1) div $cap - 1)))" +
          " as bigint) end").as("fan"))
    bucketed.join(fans, Seq("bucket"))
      .select(col("vec_id"), col("v"), col("nrm"), col("bucket"),
        col("fan"), (col("vec_id") % col("fan")).as("sub"))
  }

  /** Top-k over the split buckets — result-identical to [[lshTopK]]
    * (see [[lshSplitBuckets]]); the join key is (bucket, sub). */
  def lshSplitTopK(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod, nBits: Int = NumHyperplanes,
      cap: Int = SplitCap): DataFrame = {
    val b = graft.core.CacheBay.register(lshSplitBuckets(emb, nBits, cap))
    val q = b.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_emb"),
        col("nrm").as("q_norm"), col("bucket"),
        explode(sequence(lit(0L), col("fan") - 1L)).as("sub"))
    val c = b.select(col("vec_id").as("nn_id"), col("v").as("c_emb"),
      col("nrm").as("c_norm"), col("bucket"), col("sub"))
    val pairs = q.join(c, Seq("bucket", "sub"))
      .filter(col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos"))
    topKOf(pairs, k)
  }

  /** LSH bucket-occupancy profile (X248) — the index-health read for
    * the HASH side of the ANN family (X207 covers the IVF side): the
    * bucket-size distribution in power-of-2 buckets says whether the
    * hyperplane family actually splits the corpus (one mega-bucket =
    * the vectors are collinear along the hyperplanes — candidate
    * generation degenerates toward all-pairs) or shatters it (all
    * singletons = no candidate ever found; lower the bit count). Per
    * size class (bit_length of the bucket's occupancy, the X110
    * device): number of buckets, vectors carried, integer-ppm vector
    * share.
    *
    * Scale: one bucket aggregate over the linear bucket pass, one
    * ≤64-row rollup, 1-row total broadcast. */
  def lshBucketProfile(emb: DataFrame,
      nBits: Int = NumHyperplanes): DataFrame = {
    val occ = graft.core.Spread(emb)
      .select(lshBucket(asDouble(col("embedding")), nBits).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))
    val cls = occ
      .select(length(bin(col("n"))).cast("long").as("size_class"),
        col("n"))
      .groupBy(col("size_class"))
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum(col("n")).cast("long").as("n_vecs"))
    cls.crossJoin(broadcast(
        cls.agg(sum(col("n_vecs")).cast("long").as("n_total"))))
      .select(col("size_class"), col("n_buckets"), col("n_vecs"),
        expr("(n_vecs * 1000000) div greatest(n_total, 1)")
          .cast("long").as("share_ppm"))
  }

  /** Assignment-margin screen (X244) — the silhouette-lite clustering
    * confidence read per vector: the gap between the squared distance
    * to the nearest and second-nearest center. A thin margin means
    * the assignment is arbitrary (boundary vector — IVF must probe
    * more cells to find its true neighbors; a k-means iteration would
    * flip it), so the corpus-wide margin distribution is the "trust
    * the cells?" dashboard next to [[ivfBalanceAudit]] /
    * [[cellPurityAudit]]. Per vector: its cell (ties → lowest), both
    * distances rounded to 6 decimals (the float-emission contract the
    * ranked-distance family already uses), and the rounded margin.
    *
    * Scale: the same broadcast-center linear scan as every seed-IVF
    * audit — sorting a 16-element literal struct array per row is map
    * work; no shuffle at all (output is vector grain). */
  def centerMarginAudit(emb: DataFrame, nCells: Int = 16): DataFrame = {
    val centers = seedCenters(emb, nCells)
    require(centers.length >= 2, "centerMarginAudit: need >= 2 centers")
    val sorted = array_sort(array(centerDistStructs(centers): _*))
    graft.core.Spread(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        sorted.getItem(0).getField("cell").cast("long").as("cell"),
        round(sorted.getItem(0).getField("d"), 6).as("d_best"),
        round(sorted.getItem(1).getField("d"), 6).as("d_second"),
        round(sorted.getItem(1).getField("d") -
          sorted.getItem(0).getField("d"), 6).as("margin"))
  }

  /** PQ codebook-usage balance audit (X240) — [[ivfBalanceAudit]]'s
    * read applied to the quantizer's OTHER half: a sub-space whose
    * vectors all map to one code contributes zero bits to the ADC
    * distance (that sub-space is dead weight in every code byte), and
    * a hot code is the PQ analogue of a hot IVF cell — both say
    * re-train the codebook. Per (subspace, code) of the deterministic
    * [[seedCenters]]-sliced codebook (encoding ties → lowest code,
    * both engines): occupancy, integer-ppm share of the sub-space
    * (every vector emits exactly one code per sub-space, so the
    * sub-space total IS the corpus count), and the hot flag at 2× the
    * uniform share of the codes that exist.
    *
    * Scale: one linear encode pass (the native PqEncode expression),
    * a bounded ×m posexplode, one (subspace, code)-grain map-side-
    * combinable aggregate, ≤ m·k output rows, 1-row total broadcast. */
  def pqCodeBalance(emb: DataFrame, m: Int = PqM,
      kCodes: Int = PqCodes): DataFrame = {
    val seeds = seedCenters(emb, kCodes)
    require(seeds.nonEmpty && seeds.head.length % m == 0,
      s"pqCodeBalance: dim must divide into $m sub-spaces")
    val mCodes = seeds.length.toLong
    val g = graft.core.Spread(emb)
      .select(posexplode(graft.functions.VectorExpressions.pqEncode(
        asDouble(col("embedding")), seeds, m)).as(Seq("sub", "cd")))
      .select(col("sub").cast("long").as("subspace"),
        col("cd").cast("long").as("code"))
      .groupBy(col("subspace"), col("code"))
      .agg(count(lit(1)).cast("long").as("n_vecs"))
    g.crossJoin(broadcast(
        emb.agg(count(lit(1)).cast("long").as("n_total"))))
      .select(col("subspace"), col("code"), col("n_vecs"),
        expr("(n_vecs * 1000000) div greatest(n_total, 1)")
          .cast("long").as("share_ppm"),
        when(col("n_vecs") * lit(mCodes) > lit(2L) * col("n_total"), 1L)
          .otherwise(0L).as("is_hot"))
  }

  /** Deterministic seed centers: the embeddings of the first nCells
    * vectors with vec_id ≡ 2 (mod 5), in vec_id order — a bounded
    * nCells-row collect (16 vectors, not data-dependent), replayable
    * verbatim by the oracle's ORDER BY/LIMIT CTE. */
  def seedCenters(emb: DataFrame, nCells: Int): Array[Array[Double]] =
    emb.filter(col("vec_id") % 5 === 2).orderBy(col("vec_id"))
      .limit(nCells).select(asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** IVF recall audit (VERDICT r4 #2, the X45 pattern): run the exact
    * [[ivfTopKFromCenters]] pipeline with [[seedCenters]] instead of
    * learned ones, join its top-k against [[bruteForceTopK]] ground
    * truth, and emit per-query recall@k as integer ppm. Every number
    * is deterministic arithmetic on both engines, so the DuckDB
    * oracle recomputes the full audit — assignment, probes,
    * candidate ranking, recall — from the raw table. */
  def ivfRecallAudit(emb: DataFrame, k: Int = TopK, queryMod: Int = QueryMod,
      nCells: Int = 16, nProbe: Int = 2,
      exactIn: Option[DataFrame] = None): DataFrame = {
    val feat = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"),
          l2Norm(asDouble(col("embedding"))).as("nrm")))
    val ivf = ivfTopKFromCenters(feat, seedCenters(emb, nCells), k,
      queryMod, nProbe)
    recallOf(exactIn.map(_.filter(col("rank") <= k))
      .getOrElse(bruteForceTopK(emb, k, queryMod)), ivf, k)
  }

  /** The k ladder [[recallCurve]] sweeps. */
  val RecallKs: Seq[Long] = Seq(1L, 3L, 5L, 10L)

  /** Recall@k CURVE for LSH vs brute force (X231) — the fixed-k
    * recall audits answer "is the index OK at the k we run"; the
    * curve answers the tuning question "WHERE does it degrade" (high
    * recall@1 with collapsing recall@10 = buckets too small — raise
    * probes or lower bits; uniformly low = the hash family doesn't
    * fit the geometry). Both rankings compute ONCE at max(k); a hit
    * counts at rung k iff max(exact_rank, approx_rank) ≤ k, so the
    * ladder is a bounded ×|ks| explode over the hit pairs — never a
    * per-k recompute. Query grid = the deterministic query subset, so
    * zero-hit queries report 0, not absence.
    *
    * Scale shape: one brute-force ground truth (broadcast query
    * subset, the documented bounded all-pairs leg every recall audit
    * pays), one LSH bucket join, one pair-key equi-join, two
    * broadcast crosses against the |ks|-row ladder. */
  def recallCurve(emb: DataFrame, ks: Seq[Long] = RecallKs,
      queryMod: Int = QueryMod,
      nBits: Int = NumHyperplanes,
      exactIn: Option[DataFrame] = None): DataFrame = {
    import emb.sparkSession.implicits._
    val maxK = ks.max.toInt
    val exact = exactIn
      .map(_.filter(col("rank") <= maxK)
        .select(col("q_id"), col("nn_id"), col("rank").as("e_rank")))
      .getOrElse(graft.core.CacheBay.register(
        bruteForceTopK(emb, maxK, queryMod)
          .select(col("q_id"), col("nn_id"), col("rank").as("e_rank"))))
    val approx = lshTopK(emb, maxK, queryMod, nBits)
      .select(col("q_id"), col("nn_id"), col("rank").as("a_rank"))
    val hitAt = exact.join(approx, Seq("q_id", "nn_id"))
      .select(col("q_id"),
        greatest(col("e_rank"), col("a_rank")).as("r"))
    val kFrame = ks.toDF("k")
    val hits = hitAt.crossJoin(broadcast(kFrame))
      .filter(col("r") <= col("k"))
      .groupBy(col("q_id"), col("k"))
      .agg(count(lit(1)).cast("long").as("h"))
    emb.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"))
      .crossJoin(broadcast(kFrame))
      .join(hits, Seq("q_id", "k"), "left")
      .select(col("q_id"), col("k"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        expr("(coalesce(h, 0) * 1000000) div k")
          .cast("long").as("recall_ppm"))
  }

  /** Per-query recall@k of `approx` against the `exact` ground truth,
    * as integer ppm — the shared audit tail of every recall query. */
  private def recallOf(exact: DataFrame, approx: DataFrame,
      k: Int): DataFrame =
    exact.select(col("q_id"), col("nn_id"))
      .join(approx.select(col("q_id"), col("nn_id"), lit(1L).as("hit")),
        Seq("q_id", "nn_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        expr(s"(n_hits * 1000000) div $k").as("recall_ppm"))

  /** PQ recall audit (the [[ivfRecallAudit]] pattern applied to
    * [[pqTopK]]): join the PQ/ADC top-k against [[bruteForceTopK]]
    * exact-cosine ground truth and emit per-query recall@k as integer
    * ppm. Quantifies BOTH approximation layers at once — the LSH
    * candidate cut and the ADC distance distortion — which is the
    * number an index operator actually tunes against. Deterministic
    * end to end, so the oracle recomputes the full audit. */
  def pqRecallAudit(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod,
      nBits: Int = NumHyperplanes,
      exactIn: Option[DataFrame] = None): DataFrame = {
    val pq = pqTopK(emb, k, queryMod, nBits = nBits)
    recallOf(exactIn.map(_.filter(col("rank") <= k))
      .getOrElse(bruteForceTopK(emb, k, queryMod)), pq, k)
  }

  /** Matryoshka prefix dimensionality for [[matryoshkaRecallAudit]]:
    * the first quarter of the embedding (64 → 16 dims). */
  val MatryoshkaDims = 16

  /** Matryoshka-truncation recall audit (X192) — how much top-k
    * quality survives ranking on only the first [[MatryoshkaDims]]
    * embedding components (the matryoshka-representation-learning
    * deployment question: a 4× dimension cut is a 4× cut in dot-product
    * flops, shuffle bytes, and index memory for EVERY downstream ANN
    * pass, if recall holds). Candidate ranking is brute-force cosine
    * over the PREFIX slice, judged against full-dimension
    * [[bruteForceTopK]] ground truth via the shared per-query ppm
    * audit. Deterministic end to end — the truncation is a `slice`,
    * the cosine is the same codegen'd dot product — so the DuckDB
    * oracle recomputes the full audit from the raw embeddings. */
  def matryoshkaRecallAudit(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod,
      prefixDims: Int = MatryoshkaDims,
      exactIn: Option[DataFrame] = None): DataFrame = {
    val feat = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"),
          slice(asDouble(col("embedding")), 1, prefixDims).as("fv")))
    recallOf(exactIn.map(_.filter(col("rank") <= k))
      .getOrElse(bruteForceTopK(emb, k, queryMod)),
      featureTopK(feat, k, queryMod), k)
  }

  /** One ranked candidate list from a derived feature frame
    * `(vec_id, fv: array<double>)`: all-pairs cosine over the bounded
    * query subset (the [[bruteForceTopK]] shape), ranked per query by
    * `(cos desc, nn_id)`. Shared by the matryoshka audit and every
    * [[rrfFusion]] leg. */
  private[graft] def featureTopK(feat: DataFrame, k: Int,
      queryMod: Int): DataFrame = {
    val q = feat.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("fv").as("q_emb"),
        l2Norm(col("fv")).as("q_norm"))
    val c = feat.select(col("vec_id").as("nn_id"), col("fv").as("c_emb"),
      l2Norm(col("fv")).as("c_norm"))
    topKOf(broadcast(q).join(c, col("q_id") =!= col("nn_id"))
      .select(col("q_id"), col("nn_id"), pairCos.as("cos")), k)
  }

  /** Reciprocal-rank-fusion constant (Cormack et al. 2009's k=60). */
  val RrfC = 60

  /** The matryoshka prefix / int8-quantized / JL-projected feature
    * frames [[rrfFusion]] ranks over — session-transient, registered
    * with [[graft.core.CacheBay]] so the three ranking legs don't
    * re-derive them. */
  private def fusionFeatures(emb: DataFrame): Seq[DataFrame] = {
    val base = graft.core.Spread(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    Seq(
      base.select(col("vec_id"),
        slice(col("v"), 1, MatryoshkaDims).as("fv")),
      base
        .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
        .withColumn("scale", when(col("mx") > 0, lit(127.0) / col("mx"))
          .otherwise(lit(1.0)))
        .select(col("vec_id"),
          transform(col("v"), x => floor(x * col("scale") + 0.5))
            .cast("array<double>").as("fv")),
      randomProjection(emb).select(col("vec_id"),
        array((0 until 8).map(j => col(s"p$j").cast("double")): _*)
          .as("fv"))
    ).map(graft.core.CacheBay.register(_))
  }

  /** Reciprocal-rank fusion of compressed retrieval rankings (X195) —
    * the hybrid-retrieval combiner (Cormack/Clarke/Büttcher 2009)
    * applied to the deployment question "which COMPRESSED index do I
    * trust": the matryoshka prefix (X192), int8 quantization (X27) and
    * JL projection (X75) each produce a cheap ranking with a different
    * error profile; RRF fuses them with NO scores crossing lists —
    * only ranks — so the fusion is scale-free and integer-exact:
    * contribution = `10⁶ div (60 + rank)`, summed per candidate,
    * re-ranked by `(Σ desc, nn_id)`. A candidate surfaced by all
    * three compressions outranks one a single compression favored —
    * the standard robustness argument for hybrid retrieval.
    *
    * Scale shape: three bounded all-pairs legs (the documented
    * [[bruteForceTopK]] shape over the query subset — in production
    * each leg would be that index's ANN lookup; the FUSION math is
    * identical either way), then one `(q, candidate)` grain aggregate
    * (map-side combinable, ≤ 3k rows per query) and one per-query
    * window over ≤ 3k candidates. All integers after the per-list
    * ranks, so the oracle replays every step. */
  def rrfFusion(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod): DataFrame = {
    val contrib = fusionFeatures(emb)
      .map(f => featureTopK(f, k, queryMod)
        .select(col("q_id"), col("nn_id"),
          expr(s"1000000 div ($RrfC + rank)").cast("long").as("rrf")))
      .reduce(_ unionByName _)
    contrib.groupBy(col("q_id"), col("nn_id"))
      .agg(sum(col("rrf")).cast("long").as("rrf_e6"),
        count(lit(1)).cast("long").as("n_lists"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(desc("rrf_e6"), asc("nn_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("nn_id"), col("rrf_e6"), col("n_lists"))
  }

  /** Candidate-pool size per query for [[mmrTopK]]. */
  val MmrCand = 20
  /** Pairwise-frame row bound under which the MMR greedy runs on the
    * driver (≈48 MB of Long tuples at the bound; |Q| grows with the
    * corpus, so the distributed loop engages past it). */
  val MmrLocalMaxRows = 2000000L
  /** MMR trade-off λ numerator over a denominator of 10 (λ = 0.5):
    * `score = λnum·rel_e6 − (10−λnum)·maxsim_e6`. */
  val MmrLambdaNum = 5L

  /** Maximal-marginal-relevance diversified top-k (X196) — Carbonell &
    * Goldstein 1998's re-ranker, the standard answer to "my top-k is
    * five near-duplicates of the same document" when building eval
    * sets or retrieval contexts: greedily pick the candidate
    * maximizing `λ·relevance − (1−λ)·max-similarity-to-already-
    * picked`. Round 1 is pure relevance; each later round re-scores
    * the remaining pool against the growing selection.
    *
    * Determinism: relevance and pairwise similarity quantize to
    * integer micro-units (`floor(cos·10⁶ + 0.5)`, the operator-level
    * rounding spelling) BEFORE any ranking, the λ mix is integer
    * (`5·rel − 5·maxsim` at the default λ=0.5), ties break on the
    * candidate id — so the greedy trajectory is replayable anywhere
    * and the DuckDB oracle unrolls the k rounds as MATERIALIZED CTEs
    * (the X184 device).
    *
    * Scale shape: the candidate pool is top-[[MmrCand]] per query
    * (bounded — in production the ANN index's answer), the pairwise
    * sim frame is candK² per query (bounded, computed ONCE and
    * reused by every round), and each greedy round is two key
    * equi-joins + one per-query window over ≤ candK rows; the
    * selection frame stays ≤ k·|queries|. Nothing rescans the corpus
    * after the pool builds. */
  def mmrTopK(emb: DataFrame, k: Int = TopK, candK: Int = MmrCand,
      queryMod: Int = QueryMod,
      lambdaNum: Long = MmrLambdaNum,
      localMaxRows: Long = MmrLocalMaxRows): DataFrame = {
    val feat = graft.core.CacheBay.register(
      graft.core.Spread(emb).select(col("vec_id"),
        asDouble(col("embedding")).as("v"),
        l2Norm(asDouble(col("embedding"))).as("nrm")))
    val q = feat.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_emb"),
        col("nrm").as("q_norm"))
    val c = feat.select(col("vec_id").as("nn_id"), col("v").as("c_emb"),
      col("nrm").as("c_norm"))
    val byQ = Window.partitionBy(col("q_id"))
    val cand = graft.core.CacheBay.register(
      broadcast(q).join(c, col("q_id") =!= col("nn_id"))
        .select(col("q_id"), col("nn_id"),
          floor(pairCos * 1000000.0 + 0.5).cast("long").as("rel_e6"))
        .withColumn("rn", row_number().over(
          byQ.orderBy(desc("rel_e6"), asc("nn_id"))))
        .filter(col("rn") <= candK).drop("rn"))
    val ca = cand.select(col("q_id"), col("nn_id").as("a_id"))
      .join(feat.select(col("vec_id").as("a_id"), col("v").as("q_emb"),
        col("nrm").as("q_norm")), Seq("a_id"))
    val cb = cand.select(col("q_id"), col("nn_id").as("b_id"))
      .join(feat.select(col("vec_id").as("b_id"), col("v").as("c_emb"),
        col("nrm").as("c_norm")), Seq("b_id"))
    val cc = graft.core.CacheBay.register(
      ca.join(cb, Seq("q_id")).filter(col("a_id") =!= col("b_id"))
        .select(col("q_id"), col("a_id"), col("b_id"),
          floor(pairCos * 1000000.0 + 0.5).cast("long").as("sim_e6")))
    // Small-pool fast path (the UnionFind/nearDupClusters gate): the
    // greedy state is |Q|·candK² integer rows — when that fits the
    // driver comfortably, k−1 rounds of joins + windows +
    // localCheckpoints are pure scheduling overhead (measured 4.4 s →
    // sub-second at sf0.1) and one in-memory greedy over the SAME
    // integer scores picks identically (every score and tie-break is
    // integer by construction). |Q| grows with the corpus, so the
    // distributed loop below stays and engages past the gate.
    if (cc.count() <= localMaxRows) {
      val spark = emb.sparkSession
      import spark.implicits._
      val candRows = cand.as[(Long, Long, Long)].collect()
      val sims = cc.as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => ((r._2, r._3), r._4))
          .toMap).toMap
      val out = candRows.groupBy(_._1).toSeq.flatMap { case (qId, cs) =>
        val pool = cs.map(r => (r._2, r._3)) // (nn_id, rel_e6)
        val sim = sims.getOrElse(qId, Map.empty)
        val picked = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        val remaining = scala.collection.mutable.Set(pool.map(_._1): _*)
        val rel = pool.toMap
        (1 to k).foreach { r =>
          if (remaining.nonEmpty) {
            val best =
              if (r == 1) remaining.maxBy(id => (rel(id), -id))
              else remaining.maxBy { id =>
                val maxsim = picked.map(p => sim((id, p._1))).max
                (lambdaNum * rel(id) - (10 - lambdaNum) * maxsim, -id)
              }
            picked += ((best, r.toLong))
            remaining -= best
          }
        }
        picked.map { case (id, r) => (qId, r, id, rel(id)) }
      }
      return out.toDF("q_id", "rank", "nn_id", "rel_e6")
    }
    // eager localCheckpoint per round: without it, round r re-executes
    // every earlier round's pick tree (the plan doubles per round —
    // the iterative-loop discipline the graph family follows; measured
    // 20.8 s → ~2 s at sf0.1)
    var sel = cand
      .withColumn("rn", row_number().over(
        byQ.orderBy(desc("rel_e6"), asc("nn_id"))))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("nn_id"), col("rel_e6"),
        lit(1L).as("rank"))
      .trackedCheckpoint()
    for (r <- 2 to k) {
      val mx = cc
        .join(sel.select(col("q_id"), col("nn_id").as("b_id")),
          Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id"))
        .agg(max(col("sim_e6")).as("maxsim_e6"))
      val pick = cand
        .join(sel.select(col("q_id"), col("nn_id")),
          Seq("q_id", "nn_id"), "left_anti")
        .join(mx.withColumnRenamed("a_id", "nn_id"),
          Seq("q_id", "nn_id"))
        .withColumn("score", expr(
          s"$lambdaNum * rel_e6 - ${10 - lambdaNum} * maxsim_e6"))
        .withColumn("rn", row_number().over(
          byQ.orderBy(desc("score"), asc("nn_id"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("nn_id"), col("rel_e6"),
          lit(r.toLong).as("rank"))
      sel = sel.unionByName(pick).trackedCheckpoint()
    }
    sel.select(col("q_id"), col("rank"), col("nn_id"), col("rel_e6"))
  }

  /** Johnson–Lindenstrauss random projection of the embedding column
    * to kDims dimensions — the dimensionality cut a 100 TB embedding
    * corpus takes before clustering/ANN (distance-preserving within
    * 1±ε, 8× less data through every downstream shuffle). The
    * projection matrix is the SAME deterministic hyperplane family the
    * LSH bucketer uses ([[hyperplaneCoef]] — an LSH bit is exactly the
    * SIGN of one of these components), so there is no model artifact to
    * ship and the oracle replays the matrix from the constants. Each
    * component is one codegen'd dot product against a literal array;
    * output quantized to integer micro-units via the cross-engine-exact
    * `floor(x·10⁶ + 0.5)` spelling. Pure map work — shuffle-free on a
    * multi-split table ([[graft.core.Spread]] only spreads the
    * single-file small-SF input, same note as [[withNorm]]). */
  def randomProjection(emb: DataFrame, kDims: Int = 8,
      dim: Int = Dim): DataFrame =
    graft.core.Spread(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id") +: (0 until kDims).map { j =>
        val hp = array((1 to dim).map(d => lit(hyperplaneCoef(j, d))): _*)
        floor(dotProduct(col("v"), hp) * 1000000.0 + 0.5).cast("long")
          .as(s"p$j")
      }: _*)

  /** Symmetric int8 quantization of the embedding column — the storage
    * shrink a 100 TB embedding corpus ships with (4× smaller than
    * float32, dot products stay SIMD-friendly): per-vector scale
    * 127/max|v|, q_i = floor(v_i·scale + 0.5). The rounding is spelled
    * floor(x + 0.5) — NOT the engine's round() — because DuckDB and
    * Spark disagree on round-half semantics but floor is IEEE-exact in
    * both; deterministic cross-engine beats round-half-even purism
    * here. Emits the reconstruction max-error per vector as the audit
    * column. Per-row map work; the leading [[graft.core.Spread]] only
    * spreads the single-file small-SF input across cores (same note as
    * [[withNorm]]) — on a multi-split cluster table it is the identity
    * and the operator is shuffle-free. */
  def quantizeInt8(emb: DataFrame): DataFrame =
    graft.core.Spread(emb)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale",
        when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(1.0)))
      .withColumn("q", transform(col("v"),
        x => floor(x * col("scale") + 0.5).cast("long")))
      .select(col("vec_id"),
        array_join(col("q").cast("array<string>"), ",").as("q_str"),
        round(col("scale"), 6).as("scale"),
        round(aggregate(
          zip_with(col("q"), col("v"), (q, x) => abs(q / col("scale") - x)),
          lit(0.0), (a, e) => greatest(a, e)), 6).as("max_err"))

  /** Per-label embedding centroids — the class-prototype primitive
    * (semantic-cluster reports, classifier-based quality filters, and
    * the coarse-quantizer training step IVF builds on). One narrow
    * posexplode to (label, dim, component) then one hash aggregate —
    * rows × dim records through a single shuffle, no vector state on
    * the driver, linear at any corpus size.
    *
    * Cross-engine determinism: float components are quantized to
    * integer micro-units with `floor(x·1e6 + 0.5)` (the operator-level
    * rounding spelling both engines evaluate identically) BEFORE the
    * sum, so accumulation is integer-exact in any order; the mean is
    * then `floor(sum/n)` via one exact IEEE double division — NOT
    * integer `div`, whose negative-operand semantics differ between
    * Spark (truncate) and DuckDB (floor). */
  def labelCentroids(emb: DataFrame): DataFrame =
    graft.core.Spread(emb)
      .select(col("label").cast("long").as("label"),
        posexplode(asDouble(col("embedding"))))
      .select(col("label"), col("pos").cast("long").as("dim"),
        floor(col("col") * lit(1000000.0) + lit(0.5)).cast("long").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).cast("long").as("sum_q"))
      .select(col("label"), col("dim"), col("n"),
        floor(col("sum_q").cast("double") / col("n")).cast("long")
          .as("centroid_e6"))

  /** Cross-label centroid distance matrix (X181) — which classes are
    * CONFUSABLE in embedding space: two labels whose prototypes sit
    * close will trade members under any nearest-centroid rule, so
    * this matrix is the label-taxonomy review (merge candidates,
    * mislabel hotspots) and the IVF/routing sanity check. Exact
    * integer arithmetic on [[labelCentroids]]' e6 micro-unit
    * components: per-dim diff, squared, summed — order-free, so the
    * SQL replay is bit-identical.
    *
    * Shape: the centroid frame is |labels|·dim rows; the pair matrix
    * is its dim-keyed self-join (|labels|²·dim intermediate — label
    * counts are taxonomy-sized, never corpus-sized). */
  def centroidDistances(emb: DataFrame): DataFrame = {
    val c = graft.core.CacheBay.register(labelCentroids(emb)
      .select(col("label"), col("dim"), col("centroid_e6")))
    c.select(col("label").as("label_a"), col("dim"),
        col("centroid_e6").as("ca"))
      .join(c.select(col("label").as("label_b"), col("dim"),
        col("centroid_e6").as("cb")), Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
        .cast("long").as("dist2_e12"))
  }

  /** Per-vector squared distance to its label centroid, with a
    * per-label outlier flag — mislabeled-example / embedding-drift
    * detection (the vector sits far from its class prototype). Builds
    * on [[labelCentroids]]' integer micro-unit components so the
    * distance is EXACT integer arithmetic end to end: per-dim diff of
    * two e6-quantized integers, squared and summed (order-free), then
    * flagged when dist² exceeds 2× the label's mean dist² — the mean
    * via integer div FIRST, so nothing approaches Long overflow at any
    * corpus size.
    *
    * Shape: centroids are |labels|×dim rows (broadcast); the probe is
    * one posexplode join + per-vector rollup + one label-level rollup
    * joined back — all linear, one hash shuffle each. */
  def centroidOutliers(emb: DataFrame): DataFrame = {
    val cent = labelCentroids(emb)
      .select(col("label"), col("dim"), col("centroid_e6"))
    val q = graft.core.Spread(emb)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(asDouble(col("embedding"))))
      .select(col("vec_id"), col("label"),
        col("pos").cast("long").as("dim"),
        floor(col("col") * lit(1000000.0) + lit(0.5)).cast("long").as("q"))
    val perVec = graft.core.CacheBay.register(
      q.join(broadcast(cent), Seq("label", "dim"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum((col("q") - col("centroid_e6")) *
          (col("q") - col("centroid_e6"))).cast("long").as("dist2")))
    val perLabel = perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_label"),
        sum(col("dist2")).cast("long").as("sum_d2"))
      .select(col("label"), expr("sum_d2 div n_label").as("mean_d2"))
    perVec.join(broadcast(perLabel), Seq("label"))
      .select(col("vec_id"), col("label"), col("dist2"),
        col("mean_d2"),
        when(col("dist2") > lit(2L) * col("mean_d2"), 1L).otherwise(0L)
          .as("is_outlier"))
  }

  /** X286: simplified (centroid-based) silhouette per label — the
    * clustering-quality read beside X181's confusability matrix and
    * the outlier flags: for each vector, `a` = squared distance to its
    * OWN label centroid, `b` = squared distance to the nearest OTHER
    * centroid, and the silhouette `s = (b−a)/max(a,b)` (Hruschka et
    * al.'s simplified silhouette — centroid distances instead of the
    * O(n²) pairwise mean, the standard large-scale variant). Exact
    * integers on [[labelCentroids]]' e6 components: squared distances
    * are order-free integer sums, the ratio is quantized
    * `sign(b−a)·(|b−a|·10⁶ div max(a,b))` with the sign split off so
    * truncate-vs-floor never sees a negative operand, and the
    * per-label mean applies the same sign-split to the summed
    * micro-units. `n_misplaced` counts s < 0 (nearer a foreign
    * prototype than its own — the mislabel hotspot count).
    *
    * Scale: the n·dim·|labels| distance frame is the nearest-centroid
    * staple (labels are taxonomy-sized; the centroid frame
    * broadcasts), reduced by one keyed aggregate each at
    * (vec, cand-label) and (vec) grain, then a label-grain rollup.
    * The |b−a|·10⁶ product runs in decimal(38,0) — e12-scale squared
    * distances would wrap a Long past ~9·10¹² — and the quotient
    * lands back in Long. */
  def silhouette(emb: DataFrame): DataFrame = {
    // persisted: the quantized component explode feeds both the
    // centroid aggregate and the distance join — unpersisted, the
    // embedding array explodes twice ([[labelCentroids]] re-derives
    // the same rows label-grain)
    val q = graft.core.CacheBay.register(graft.core.Spread(emb)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(asDouble(col("embedding"))))
      .select(col("vec_id"), col("label"),
        col("pos").cast("long").as("dim"),
        floor(col("col") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("q")))
    // the [[labelCentroids]] aggregate off the shared explode —
    // identical quantization and floor(sum/n) IEEE-double mean
    val cent = q.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).cast("long").as("sum_q"))
      .select(col("label").as("cand"), col("dim"),
        floor(col("sum_q").cast("double") / col("n")).cast("long")
          .as("centroid_e6"))
    val d2 = q.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("cand"))
      .agg(sum((col("q") - col("centroid_e6")) *
        (col("q") - col("centroid_e6"))).cast("long").as("d2"))
    val s = d2.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("cand") === col("label"), col("d2")))
          .cast("long").as("a"),
        min(when(col("cand") =!= col("label"), col("d2")))
          .cast("long").as("b"))
      .filter(col("b").isNotNull) // single-label corpora have no s
      .select(col("label"),
        expr("cast(signum(b - a) as bigint) * cast(" +
          "abs(cast(b as decimal(38,0)) - a) * 1000000 div " +
          "greatest(greatest(a, b), 1) as bigint)").as("s_e6"))
    s.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("s_e6")).cast("long").as("sum_s_e6"),
        sum(when(col("s_e6") < 0, 1L).otherwise(0L)).cast("long")
          .as("n_misplaced"))
      .select(col("label"), col("n"), col("sum_s_e6"),
        col("n_misplaced"),
        expr("cast(signum(sum_s_e6) as bigint) * " +
          "(abs(sum_s_e6) div n)").cast("long").as("mean_s_e6"))
  }

  /** A pair closer than this (cosine in µunits, floor(cos·10⁶ + 0.5))
    * is a semantic duplicate. */
  val SemDupMinCosE6 = 950000L

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): docs
    * whose EMBEDDINGS nearly coincide are near-paraphrases that text
    * dedup (MinHash/SimHash — lexical overlap) cannot see. Each vector
    * hashes to its hyperplane-LSH bucket; the bucket's lowest vec_id
    * is the keeper, and every other member is flagged a semantic dup
    * iff its cosine TO THE KEEPER clears [[SemDupMinCosE6]] — the
    * keeper-star comparison (each member vs one representative), not
    * pairwise: per bucket cost is \|bucket\|, and [[scaledNBits]]
    * holds \|bucket\| ≈ constant as the corpus grows, so the whole
    * pass is linear with three bucket/keeper equi-joins and no
    * all-pairs join anywhere. The gate is integer
    * (`floor(cos·10⁶ + 0.5) ≥ min`), so the dup verdict never rides a
    * float-formatting tie cross-engine. */
  def semanticDedup(emb: DataFrame, nBits: Int = NumHyperplanes,
      minCosE6: Long = SemDupMinCosE6): DataFrame = {
    val coded = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), nBits)))
    val keepers = coded.groupBy(col("bucket"))
      .agg(min(col("vec_id")).as("keeper_id"))
    val kv = coded.select(col("vec_id").as("keeper_id"), col("v").as("kv"))
    val cosK = dotProduct(col("v"), col("kv")) /
      (l2Norm(col("v")) * l2Norm(col("kv")))
    coded.join(keepers, Seq("bucket"))
      .join(kv, Seq("keeper_id"))
      .select(col("vec_id"), col("bucket"), col("keeper_id"),
        round(cosK, 6).as("cos"),
        when(col("vec_id") =!= col("keeper_id") &&
          floor(cosK * 1000000.0 + 0.5) >= minCosE6, 1L)
          .otherwise(0L).as("is_semantic_dup"))
  }

  /** kNN label-disagreement audit (X206) — the confident-learning
    * label-error screen (Northcutt et al. 2021's intuition, kNN form):
    * an example whose nearest neighbors mostly carry a DIFFERENT
    * label is either mislabeled or sits on a class boundary; both are
    * what a curator reviews before training. Per query vector: its
    * exact top-k cosine neighbors' labels, the disagreement count,
    * integer-ppm disagreement rate, and a majority-vote suspect flag.
    *
    * Scale shape: rides [[bruteForceTopK]] unchanged (broadcast query
    * subset, corpus-partition scan, per-query top-k) plus two
    * label equi-joins on the k·|q|-row result — at index scale swap
    * the exact top-k for [[lshTopK]]/[[ivfTopKFromCenters]] and the
    * audit tail is identical. Integer verdicts only: the float cosine
    * decides RANKING (already oracle-replayable), never the flag. */
  def knnLabelAudit(emb: DataFrame, k: Int = TopK,
      queryMod: Int = QueryMod): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label").cast("long"))
    val top = bruteForceTopK(emb, k, queryMod)
      .join(lab.withColumnsRenamed(
        Map("vec_id" -> "nn_id", "label" -> "nn_label")), Seq("nn_id"))
    // broadcast only the |q|-row query-subset labels (vec_id %
    // queryMod == 0, the same predicate bruteForceTopK selects on) —
    // never the corpus-sized label frame
    top.join(broadcast(lab.filter(col("vec_id") % queryMod === 0)
        .withColumnsRenamed(
          Map("vec_id" -> "q_id", "label" -> "q_label"))), Seq("q_id"))
      .groupBy(col("q_id"), col("q_label"))
      .agg(count(lit(1)).cast("long").as("k_used"),
        sum(when(col("nn_label") =!= col("q_label"), 1L).otherwise(0L))
          .cast("long").as("n_disagree"))
      .select(col("q_id"), col("q_label"), col("k_used"),
        col("n_disagree"),
        expr("(n_disagree * 1000000) div greatest(k_used, 1)")
          .cast("long").as("disagree_ppm"),
        when(col("n_disagree") * 2L > col("k_used"), 1L).otherwise(0L)
          .as("is_suspect"))
  }

  /** IVF cell-occupancy balance audit (X207) — the index-health
    * number an ANN operator watches: a lopsided inverted file (one
    * cell holding half the corpus) makes probe cost unpredictable and
    * recall uneven; re-train the quantizer when the hot cell exceeds
    * a few multiples of the uniform share. Per cell of the
    * deterministic [[seedCenters]] assignment (ties → lowest cell,
    * both engines): occupancy, integer-ppm share, and a hot flag at
    * 2× the uniform share.
    *
    * Scale shape: one broadcast-sized center set against a linear
    * corpus scan (nearest-center argmin is map work), one cell-grain
    * aggregate, |cells| output rows; the 1-row corpus total joins
    * back by broadcast. */
  def ivfBalanceAudit(emb: DataFrame, nCells: Int = 16): DataFrame = {
    val centers = seedCenters(emb, nCells)
    // the hot bar is vs the UniformShare over cells that exist — the
    // collected count, not the requested one (small corpora yield
    // fewer than nCells seeds)
    val mCells = centers.length.toLong
    val sorted = array_sort(array(centerDistStructs(centers): _*))
    val assigned = graft.core.Spread(emb)
      .select(asDouble(col("embedding")).as("v"))
      .select(sorted.getItem(0).getField("cell").cast("long").as("cell"))
    val occ = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).cast("long").as("n_vecs"))
    occ.crossJoin(broadcast(
        occ.agg(sum(col("n_vecs")).cast("long").as("n_total"))))
      .select(col("cell"), col("n_vecs"),
        expr("(n_vecs * 1000000) div greatest(n_total, 1)")
          .cast("long").as("share_ppm"),
        when(col("n_vecs") * lit(mCells) >
          lit(2L) * col("n_total"), 1L).otherwise(0L).as("is_hot"))
  }

  /** The semantic-dedup threshold ladder swept by
    * [[thresholdCalibration]] (cosine µunits). */
  /** varq_e12 at or below this flags a low-variance dimension
    * (≈ var < 10⁻³ in original units at the µunit² scale). */
  val LowVarE12 = 1000000000L

  /** Per-dimension embedding moment screen (X224) — the dead/collapsed
    * dimension audit run before trusting an embedding space: a
    * dimension whose variance is ~0 carries no information (an
    * encoder bug, a truncated export, or dimension collapse from
    * under-trained contrastive heads) yet still costs its share of
    * every dot product and index byte; the screen says which
    * dimensions to slice off (the Matryoshka-prefix decision, X-row
    * `sim_matryoshka_recall`, assumes exactly this check ran). Values
    * quantize ONCE to integer µunits (the X9 device) so the sums are
    * exact Longs replayable in any engine; the mean is the FLOOR
    * division (both engines floor: `floor(sum/n)` ≡ DuckDB `//`) and
    * `varq_e12 = max(sumsq div n − mean², 0)` is the defined
    * floor-quantized population variance — every verdict is integer.
    *
    * Scale: one posexplode (linear, ×dims), one dim-grain map-side-
    * combinable aggregate, |dims| output rows. The µunit sum stays
    * double-exact below 2⁵³ — asserted per dim, never silent. */
  def dimStats(emb: DataFrame, lowVarE12: Long = LowVarE12): DataFrame = {
    val q = graft.core.Spread(emb)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("x").cast("double") * 1000000.0 + 0.5)
          .cast("long").as("v"))
    q.groupBy(col("dim"))
      .agg(count(lit(1)).cast("long").as("n"),
        max(abs(col("v"))).cast("long").as("max_abs_v"),
        sum(col("v")).cast("long").as("sum_e6"),
        sum(col("v") * col("v")).cast("long").as("sumsq_e12"))
      .select(col("dim"), col("n"), col("sum_e6"),
        // Pre-overflow witness (VERDICT r13 #2): n·max|v| ≤ 2⁵³ and
        // n·max|v|² ≤ 9e18 in double space bound both sums BEFORE a
        // wrap — the old `sumsq_e12 >= 0` tested the summed Long,
        // which a double wrap can leave positive.
        expr("coalesce(cast(assert_true(" +
          "cast(n as double) * cast(max_abs_v as double) <= " +
          "9007199254740992.0 and " +
          "cast(n as double) * cast(max_abs_v as double) * " +
          "cast(max_abs_v as double) <= 9.0e18, " +
          "'dim-stats sums exceed the double-exact / Long range') " +
          "as bigint), 0) + cast(floor(sum_e6 / n) as bigint)")
          .as("mean_e6"),
        expr("greatest((sumsq_e12 div n) - " +
          "cast(floor(sum_e6 / n) as bigint) * " +
          "cast(floor(sum_e6 / n) as bigint), 0)")
          .cast("long").as("varq_e12"))
      .withColumn("is_low_var",
        when(col("varq_e12") <= lowVarE12, 1L).otherwise(0L))
  }

  /** Cross-dimension covariance moments (X259) — the WHITENING
    * evidence [[dimStats]]' per-dim marginals cannot carry: an
    * embedding space whose dimensions covary strongly has an effective
    * rank far below its width (anisotropy — the known failure mode of
    * contrastive encoders), retrieval improves after whitening, and
    * the whitening transform is computed FROM exactly this matrix.
    * Emits the exact integer moments per upper-triangle dim pair
    * (i ≤ j): n, Σvᵢ, Σvⱼ (e6 µunits, the X224 quantize-once device)
    * and Σvᵢvⱼ (e12), plus the floor-quantized covariance
    * `covq_e12 = floor(Σvᵢvⱼ/n) − floor(Σvᵢ/n)·floor(Σvⱼ/n)` — on the
    * diagonal this reproduces X224's `varq_e12` exactly (the spec's
    * consistency assertion). The float eigen/whitening step belongs to
    * the consumer (X129 moments discipline). Floor via DOUBLE division
    * in BOTH engines (Spark's integer `div` truncates toward zero on
    * negative cross-sums where DuckDB `//` floors); double-exactness
    * of every sum is asserted, never silent.
    *
    * Scale: two native Generates (posexplode + per-row tail slice —
    * no interpreted lambda anywhere), ×d²/2 row expansion, then ONE
    * map-side-combinable aggregate at the d²/2 pair grain (2 080 rows
    * at d = 64) — zero shuffle before it, |pairs| rows after. */
  def covarianceMoments(emb: DataFrame): DataFrame = {
    val e = graft.core.Spread(emb)
      .select(col("embedding"), posexplode(col("embedding"))
        .as(Seq("i", "x")))
      .select(col("i"),
        floor(col("x").cast("double") * 1000000.0 + 0.5)
          .cast("long").as("vi"),
        expr("slice(embedding, i + 1, size(embedding) - i)").as("rest"))
    val pairs = e.select(col("i"), col("vi"),
        posexplode(col("rest")).as(Seq("p", "y")))
      .select(col("i").cast("long").as("i"),
        (col("i") + col("p")).cast("long").as("j"), col("vi"),
        floor(col("y").cast("double") * 1000000.0 + 0.5)
          .cast("long").as("vj"))
    pairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).cast("long").as("n"),
        max(abs(col("vi"))).cast("long").as("max_abs_i"),
        max(abs(col("vj"))).cast("long").as("max_abs_j"),
        sum(col("vi")).cast("long").as("sum_i_e6"),
        sum(col("vj")).cast("long").as("sum_j_e6"),
        sum(col("vi") * col("vj")).cast("long").as("sum_ij_e12"))
      .select(col("i"), col("j"), col("n"),
        col("sum_i_e6"), col("sum_j_e6"),
        // Pre-overflow witness (VERDICT r13 #2): n·max|vi|·max|vj| and
        // the two marginal n·max bounds ≤ 2⁵³ in double space bound
        // every sum BEFORE a wrap — the old abs() checks tested the
        // summed Longs, which a deep wrap can land back inside ±2⁵³.
        expr("coalesce(cast(assert_true(" +
          "cast(n as double) * cast(max_abs_i as double) * " +
          "cast(max_abs_j as double) <= 9007199254740992.0 and " +
          "cast(n as double) * cast(max_abs_i as double) <= " +
          "9007199254740992.0 and " +
          "cast(n as double) * cast(max_abs_j as double) <= " +
          "9007199254740992.0, " +
          "'covariance sums exceed the double-exact range') " +
          "as bigint), 0) + sum_ij_e12").cast("long").as("sum_ij_e12"),
        (expr("cast(floor(sum_ij_e12 / n) as bigint)") -
          expr("cast(floor(sum_i_e6 / n) as bigint)") *
          expr("cast(floor(sum_j_e6 / n) as bigint)"))
          .cast("long").as("covq_e12"))
  }

  /** Semantic train/eval split-leakage audit (X229) — the embedding-
    * level contamination check the n-gram decontaminator cannot run:
    * a paraphrased benchmark item shares no 8-gram with its training
    * twin but sits at cosine ≈ 1 next to it, silently inflating eval.
    * Vectors hash-split 80/20 (the same md5-hex8 device as the doc
    * splitter, so assignment replays anywhere); each EVAL vector
    * meets only its LSH-bucket-mates on the TRAIN side (the bounded
    * candidate join, never all-pairs), and reports its candidate
    * count, best train partner (ties → lowest id), best cosine in
    * exact µunits, and the leak flag at the semantic-dup threshold.
    * Eval vectors with no bucket-mates report 0/NULL/0 — "not leaked
    * as far as this index can see", the same contract an ANN-backed
    * production scan gives.
    *
    * Scale shape: one linear bucket+split pass (cached), one bucket
    * equi-join, one eval-partitioned window, one eval-key left join.
    * At index scale the bucket join swaps for the IVF probe and the
    * audit tail is unchanged. */
  def splitLeakageAudit(emb: DataFrame, nBits: Int = NumHyperplanes,
      minCosE6: Long = SemDupMinCosE6, trainPct: Int = 80): DataFrame = {
    val coded = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), nBits))
        .withColumn("is_train",
          expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 8)," +
            s" 16, 10) AS BIGINT) % 100 < $trainPct")))
    val eval = coded.filter(!col("is_train"))
      .select(col("vec_id"), col("v"), col("bucket"))
    val train = coded.filter(col("is_train"))
      .select(col("vec_id").as("train_id"), col("v").as("tv"),
        col("bucket"))
    val cos = dotProduct(col("v"), col("tv")) /
      (l2Norm(col("v")) * l2Norm(col("tv")))
    val cands = eval.join(train, Seq("bucket"))
      .select(col("vec_id"), col("train_id"),
        floor(cos * 1000000.0 + 0.5).cast("long").as("cos_e6"))
    import org.apache.spark.sql.expressions.Window
    val byEval = Window.partitionBy(col("vec_id"))
    val best = cands
      .withColumn("n_cands", count(lit(1)).over(byEval).cast("long"))
      .withColumn("rk", row_number().over(
        byEval.orderBy(desc("cos_e6"), asc("train_id"))))
      .filter(col("rk") === 1)
    eval.select(col("vec_id"))
      .join(best.select(col("vec_id"), col("n_cands"),
        col("train_id"), col("cos_e6")), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_cands"), lit(0L)).as("n_train_cands"),
        col("train_id").as("best_train_id"),
        col("cos_e6").as("best_cos_e6"),
        when(col("cos_e6") >= minCosE6, 1L).otherwise(0L).as("is_leak"))
  }

  /** Embedding norm profile in power-of-2 buckets (X227) — the norm-
    * collapse companion to [[dimStats]]: cosine retrieval is norm-
    * blind but dot-product retrieval and most index pruning bounds
    * are not, and a corpus whose squared norms span many octaves
    * (mixed encoders, missing normalization, fp16 underflow) breaks
    * both. Each vector's squared norm is summed in exact quantized
    * integers (per-element µunit floor, then Σv², the X9 device) and
    * bucketed by bit_length — the X110 floor-log2 device, so the
    * histogram replays bit-identically in any engine. One spike =
    * normalized corpus; a smear = mixed provenance to investigate.
    *
    * Scale: one linear pass (the per-element HOF fold is the
    * interpreted tier — at index scale this becomes a native
    * expression like DotProduct), one bucket-grain aggregate,
    * ≤64 output rows, 1-row total broadcast. */
  def normProfile(emb: DataFrame): DataFrame = {
    val sq = graft.core.Spread(emb)
      .select(aggregate(
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000000.0 + 0.5).cast("long")),
        lit(0L), (acc, v) => acc + v * v).as("sumsq_e12"))
    val buckets = sq
      .select(length(bin(col("sumsq_e12"))).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_vecs"))
    buckets.crossJoin(broadcast(
        buckets.agg(sum(col("n_vecs")).cast("long").as("n_total"))))
      .select(col("bucket"), col("n_vecs"),
        expr("(n_vecs * 1000000) div greatest(n_total, 1)")
          .cast("long").as("share_ppm"))
  }

  /** IVF cell label-purity audit (X221) — the clustering-eval purity
    * metric read per index cell: a cell whose members mostly share
    * one label is coherent (probes inside it return same-class
    * neighbors); low-purity cells mark boundary regions where ANN
    * recall decays into wrong-class results — together with
    * [[ivfBalanceAudit]] this is the retrain-the-quantizer dashboard.
    * Per cell of the deterministic [[seedCenters]] assignment (ties →
    * lowest cell, both engines): occupancy, majority label (ties →
    * lowest label), majority count, integer-ppm purity.
    *
    * Scale shape: the broadcast-sized center set against a linear
    * corpus scan (argmin is map work), one (cell, label) aggregate,
    * one cell-partitioned window over the ≤ cells·labels grain —
    * nothing corpus-sized shuffles twice. */
  def cellPurityAudit(emb: DataFrame, nCells: Int = 16): DataFrame = {
    val centers = seedCenters(emb, nCells)
    val sorted = array_sort(array(centerDistStructs(centers): _*))
    val assigned = graft.core.Spread(emb)
      .select(col("label").cast("long").as("label"),
        asDouble(col("embedding")).as("v"))
      .select(col("label"),
        sorted.getItem(0).getField("cell").cast("long").as("cell"))
    val byLab = assigned.groupBy(col("cell"), col("label"))
      .agg(count(lit(1)).cast("long").as("n_lab"))
    import org.apache.spark.sql.expressions.Window
    byLab
      .withColumn("n_vecs",
        sum(col("n_lab")).over(Window.partitionBy(col("cell")))
          .cast("long"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("cell"))
        .orderBy(desc("n_lab"), asc("label"))))
      .filter(col("rk") === 1)
      .select(col("cell"), col("n_vecs"), col("label").as("maj_label"),
        col("n_lab").as("n_maj"),
        expr("(n_lab * 1000000) div greatest(n_vecs, 1)")
          .cast("long").as("purity_ppm"))
  }

  val CalibThresholdsE6: Seq[Long] =
    Seq(800000L, 850000L, 900000L, 925000L, 950000L, 975000L, 990000L)

  /** Dedup-threshold calibration curve (X211) — the knob-setting
    * sweep run BEFORE committing to a [[SemDupMinCosE6]]: for each
    * candidate threshold, how many keeper-star pairs would merge and
    * what fraction of the corpus would drop. The pair frame is the
    * SAME bounded candidate set as [[semanticDedup]] (bucket members
    * vs their keeper — linear, never all-pairs), quantized once to
    * integer µunits; the ladder is a bounded ×|thresholds| explode
    * over the |members|-row frame. Monotone by construction:
    * n_dup_pairs decreases as the threshold rises, which is the curve
    * a curator reads the elbow off. */
  def thresholdCalibration(emb: DataFrame,
      nBits: Int = NumHyperplanes,
      thresholds: Seq[Long] = CalibThresholdsE6): DataFrame = {
    val coded = graft.core.CacheBay.register(
      graft.core.Spread(emb)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("bucket", lshBucket(col("v"), nBits)))
    val keepers = coded.groupBy(col("bucket"))
      .agg(min(col("vec_id")).as("keeper_id"))
    val kv = coded.select(col("vec_id").as("keeper_id"),
      col("v").as("kv"))
    val cosK = dotProduct(col("v"), col("kv")) /
      (l2Norm(col("v")) * l2Norm(col("kv")))
    val pairs = coded.join(keepers, Seq("bucket"))
      .join(kv, Seq("keeper_id"))
      .filter(col("vec_id") =!= col("keeper_id"))
      .select(floor(cosK * 1000000.0 + 0.5).cast("long").as("cos_e6"))
    val n = emb.agg(count(lit(1)).cast("long").as("n_total"))
    pairs.select(col("cos_e6"),
        explode(array(thresholds.map(lit): _*)).as("threshold_e6"))
      .groupBy(col("threshold_e6"))
      .agg(sum(when(col("cos_e6") >= col("threshold_e6"), 1L)
        .otherwise(0L)).cast("long").as("n_dup_pairs"))
      .crossJoin(broadcast(n))
      .select(col("threshold_e6"), col("n_dup_pairs"),
        expr("(n_dup_pairs * 1000000) div greatest(n_total, 1)")
          .cast("long").as("drop_ppm"))
  }

  /** Exact per-vector NN by brute force — O(n²): the TEST ORACLE for
    * [[nearestNeighbor]] on sampled subsets, never the production path
    * (a corpus broadcast is unbroadcastable and the pair count
    * quadratic at scale). */
  def nearestNeighborExact(emb: DataFrame): DataFrame = {
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
