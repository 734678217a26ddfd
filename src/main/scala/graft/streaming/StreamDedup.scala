package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

import graft.dedup.Dedup

/** Streaming arrival-time dedup: [[Dedup.incrementalDedupBySig]]
  * driven by a document stream. The stored state is an append-only
  * LEDGER of `(doc_id, sig, is_dup, dup_of, est_jaccard, batch_id)` —
  * one segment file per micro-batch, committed atomically by the
  * parquet `_SUCCESS` marker, never rewritten. The keeper rows
  * (`is_dup = 0`, signature retained) ARE the dedup index the next
  * batch bands against; the dup rows are the decision feed a
  * downstream curation job consumes.
  *
  * Effectively-once under `foreachBatch`'s at-least-once contract, by
  * the same argument as [[VersionedState]]: the applied batch id is
  * the segment's own name, persisted atomically with its data — a
  * redelivered id is detected by `id <= maxSegment` and skipped; a
  * writer that dies mid-segment leaves no `_SUCCESS`, so readers
  * ignore the partial directory and the redelivery overwrites it.
  *
  * Scale shape: each document's signature is computed exactly ONCE,
  * ever (the batch it arrives in); a batch costs one scan of the
  * keeper index for banding plus |batch| signature builds and the
  * band equi-join — never a corpus×corpus comparison and never a
  * rewrite of corpus-sized state (the segment layout is what a
  * transactional table format's append does; segment counts are a
  * [[graft.maint.Maintenance.compactionPlan]] job away from bounded).
  * Duplicates WITHIN one batch both pass as novel by design — intra-
  * batch dedup is the batch operator's job ([[Dedup.exactDedup]] /
  * [[Dedup.nearDupClusters]] in the same `foreachBatch`) and folding
  * it in here would hide that the index join, not the batch, is the
  * scale-bearing side. */
object StreamDedup {

  private val SegDir = "^seg(\\d+)$".r

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed segment ids under `root` (have `_SUCCESS`), ascending. */
  private def segments(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    if (!fs.exists(new Path(root))) return Seq.empty
    fs.listStatus(new Path(root)).iterator.flatMap { st =>
      st.getPath.getName match {
        case SegDir(id)
            if fs.exists(new Path(st.getPath, "_SUCCESS")) => Some(id.toLong)
        case _ => None
      }
    }.toSeq.sorted
  }

  /** Highest committed batch id — the replay-guard watermark. */
  def maxSegment(spark: SparkSession, root: String): Long =
    segments(spark, root).foldLeft(-1L)(math.max)

  /** The full decision ledger (None before the first commit). */
  def ledger(spark: SparkSession, root: String): Option[DataFrame] = {
    val segs = segments(spark, root)
    if (segs.isEmpty) None
    else Some(spark.read.parquet(segs.map(id => s"$root/seg$id"): _*))
  }

  private def emptySigs(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sig", ArrayType(LongType)))))

  /** Flag one micro-batch of documents `(doc_id, text)` against the
    * stored keeper index and append the decisions as segment `id`.
    * Returns false (and writes nothing) when `id` was already
    * committed. Public so tests drive redelivery directly. */
  def mergeBatch(batch: DataFrame, id: Long, root: String): Boolean = {
    val spark = batch.sparkSession
    if (id <= maxSegment(spark, root)) return false
    val exSig = ledger(spark, root)
      .map(_.filter(col("is_dup") === 0 && col("sig").isNotNull)
        .select(col("doc_id"), col("sig")))
      .getOrElse(emptySigs(spark))
    // scoped persist (NOT CacheBay: a foreachBatch body must not drain
    // caches a surrounding query registered): the signature frame
    // feeds both the banding join and the ledger-row join
    val inSig = Dedup.minhashSignature(batch).persist()
    try {
      val flags = Dedup.incrementalDedupBySig(inSig, exSig,
        allIncoming = Some(batch.select(col("doc_id"))))
      val segRows = flags.join(inSig, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("is_dup") === 0, col("sig")).otherwise(lit(null))
            .as("sig"),
          col("is_dup"), col("dup_of"), col("est_jaccard"),
          lit(id).as("batch_id"))
      // reads only prior segments, writes seg<id>: commit = _SUCCESS
      segRows.write.mode(SaveMode.Overwrite).parquet(s"$root/seg$id")
    } finally inSig.unpersist(false)
    true
  }

  /** The stream writer: documents `(doc_id, text)` → append-only
    * dedup decision ledger whose keepers index the corpus so far. */
  def sink(docs: DataFrame, root: String): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch(
      (batch: org.apache.spark.sql.Dataset[Row], id: Long) => {
        mergeBatch(batch, id, root); ()
      })
}
