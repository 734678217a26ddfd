package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Jdbc

/** S5/S12 against a real database: DuckDB's JDBC driver (test scope)
  * stands in for the reference's SQL Server (`mySQLClass.py:60-105`) —
  * the wrappers are dialect-agnostic. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  // Spark 4's tableExists probe rethrows unless the dialect classifies
  // the failure as object-not-found; DuckDB's driver carries the info
  // only in the message. Production targets (SQL Server, Denodo) ship
  // dialects; this one is the test-scope equivalent.
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(
    new org.apache.spark.sql.jdbc.JdbcDialect {
      override def canHandle(url: String): Boolean =
        url.startsWith("jdbc:duckdb:")
      override def isObjectNotFoundException(
          e: java.sql.SQLException): Boolean =
        e.getMessage != null && e.getMessage.contains("does not exist")
      // the driver reports BIGINT with isSigned=false, which Spark
      // would widen to DECIMAL(20,0)
      override def getCatalystType(sqlType: Int, typeName: String,
          size: Int, md: org.apache.spark.sql.types.MetadataBuilder)
          : Option[org.apache.spark.sql.types.DataType] =
        if (sqlType == java.sql.Types.BIGINT)
          Some(org.apache.spark.sql.types.LongType)
        else None
    })

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("graft_jdbc").toFile.getAbsolutePath
    s"jdbc:duckdb:$dir/t.db"
  }

  test("jdbc append + scan round-trips a table (chunked batches)") {
    val url = freshUrl()
    val df = (1 to 100).map(i => (i.toLong, s"name$i", i * 1.5))
      .toDF("k", "name", "v").coalesce(1)
    Jdbc.jdbcAppend(df, url, "demand", batchsize = 17) // odd chunk size
    val back = Jdbc.jdbcScan(spark, url, "demand")
    assert(back.count() == 100)
    val row = back.filter(col("k") === 42L)
      .as[(Long, String, Double)].collect().toSeq
    assert(row == Seq((42L, "name42", 63.0)))
    // append again -> rows accumulate (append, not overwrite)
    Jdbc.jdbcAppend(df, url, "demand")
    assert(Jdbc.jdbcScan(spark, url, "demand").count() == 200)
  }

  test("S6 IN-list filters are pushed into the database scan") {
    val url = freshUrl()
    val df = (1 to 50).map(i => (i.toLong, s"BU${i % 5}"))
      .toDF("k", "bu").coalesce(1)
    Jdbc.jdbcAppend(df, url, "t")
    val filtered = Jdbc.scanWithInLists(spark, url, "t",
      Map("bu" -> Seq("BU1", "BU3")))
    assert(filtered.count() == 20)
    // the predicate must reach the JDBC scan node (pushed, not a
    // Spark-side post-filter)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("bu"),
      s"IN-list not pushed:\n$plan")
  }

  test("jdbc preview: order-by + limit over the scan") {
    val url = freshUrl()
    val df = (1 to 30).map(i => (i.toLong, s"2026-01-${"%02d".format(i)}"))
      .toDF("k", "snapshot").coalesce(1)
    Jdbc.jdbcAppend(df, url, "t")
    val top = Jdbc.preview(spark, url, "t", col("snapshot").desc, 3)
      .select("k").as[Long].collect().toSeq
    assert(top == Seq(30L, 29L, 28L))
  }
}
