package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.registry._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain registries; each registry
  * pairs every DataFrame query with DuckDB-ANSI oracle SQL over the same
  * parquet tables (omitted only for non-SQL-expressible ops, which get
  * the driver's weaker rows-only check).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 end-to-end slice: ActDemandBlank extract ->
    * canonical 8-column demand output. */
  def entry(spark: SparkSession): DataFrame =
    graft.transform.Transform.actDemandBlankFinal(
      spark, "/root/testdata/sf0.001")

  private val registries: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (ExtractQueries.queries, ExtractQueries.oracles),
    (ReconQueries.queries, ReconQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (DedupQueries.queries, DedupQueries.oracles),
    (SimilarityQueries.queries, SimilarityQueries.oracles),
    (AnalyticsQueries.queries, AnalyticsQueries.oracles),
    (StreamQueries.queries, StreamQueries.oracles),
    (MultimodalQueries.queries, MultimodalQueries.oracles),
    (PipelineQueries.queries, PipelineQueries.oracles),
    (LoadQueries.queries, LoadQueries.oracles),
    (MaintQueries.queries, MaintQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
