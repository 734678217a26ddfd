package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** JDBC source/sink wrappers (SURVEY §2.1 S5/S8/S12, §2.1 S6):
  * the reference reads SQL Server over pyodbc (`mySQLClass.py:103-105`,
  * `pipeline/readsql.py:95-107`) and bulk-appends with
  * `fast_executemany` in 5000-row chunks (`mySQLClass.py:45,60-90`).
  * Spark's JDBC data source is the same surface: a scan with
  * filter/column pushdown into the database, and a batched
  * `PreparedStatement` writer whose `batchsize` is the chunk knob.
  *
  * Scale notes: `numPartitions`/`partitionColumn` shard the scan across
  * executors (each opens its own connection with a range predicate);
  * the append writes one batched connection per partition. Exercised in
  * CI against DuckDB's JDBC driver (test scope) — the wrappers are
  * dialect-agnostic.
  */
object Jdbc {

  /** S5/S8: JDBC table scan. `options` passes driver specifics
    * (isolation hints, fetchsize, partitioning). */
  def jdbcScan(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
      spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  /** S6: parameterized query builder (`mySQLClass.py:117-146`): the
    * optional IN-list filters compose as Column predicates over the
    * scan — Catalyst pushes them into the database WHERE clause, which
    * is exactly what the reference's string-built SQL achieved. */
  def scanWithInLists(spark: SparkSession, url: String, table: String,
      inLists: Map[String, Seq[Any]],
      options: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions.col
    inLists.foldLeft(jdbcScan(spark, url, table, options)) {
      case (df, (c, vs)) => df.filter(col(c).isin(vs: _*))
    }
  }

  /** S12: chunked JDBC append — `batchsize` is the reference's
    * 5000-row `fast_executemany` chunk (`SqlUpload.py:24`). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
      batchsize: Int = 5000,
      options: Map[String, String] = Map.empty): Unit =
    options.foldLeft(
      df.write.mode(SaveMode.Append).format("jdbc")
        .option("url", url).option("dbtable", table)
        .option("batchsize", batchsize.toString)) {
      case (w, (k, v)) => w.option(k, v)
    }.save()

  /** O2-over-JDBC preview: `TOP(n) ORDER BY` evaluated with limit
    * pushdown (`SqlUpload.py:107-123`). */
  def preview(spark: SparkSession, url: String, table: String,
      orderBy: Column, n: Int): DataFrame =
    jdbcScan(spark, url, table).orderBy(orderBy).limit(n)
}
