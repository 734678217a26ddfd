package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions entry point: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` resolves the
  * custom expressions from plain SQL — the spark-submit consumer path. */
class GraftExtensionsSpec extends SparkSpec {

  test("SQL functions resolve and compute through the extension") {
    // force a NEW session over the existing context; the
    // spark.sql.extensions STATIC conf is only read at SparkContext
    // creation, so on a shared test context the programmatic
    // equivalent withExtensions exercises the same apply()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master(spark.sparkContext.master)
      .withExtensions(new graft.functions.GraftExtensions)
      .create()
    try {
      assert(s2 ne spark, "builder must return a NEW session")
      assert(s2.catalog.functionExists("graft_dot"),
        "extension did not register graft_dot")
      val dot = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head().getDouble(0)
      assert(dot == 11.0)
      val nrm = s2.sql("SELECT graft_l2norm(array(3.0d, 4.0d))")
        .head().getDouble(0)
      assert(nrm == 5.0)
      // dedup signatures: same values as the Column API
      val sig = s2.sql(
        "SELECT graft_minhash_sig(array(7L, 11L), 4)")
        .head().getSeq[Long](0)
      assert(sig.length == 4)
      val bits = s2.sql(
        "SELECT graft_simhash_bits(array(md5('x')), 8)")
        .head().getString(0)
      assert(bits.matches("[01]{8}"))
      // non-literal count is an analysis-time error, not a wrong result
      intercept[Exception] {
        s2.sql("SELECT graft_minhash_sig(array(1L), CAST(rand()*4 AS INT))")
          .head()
      }
      // wrong arity is an analysis-time error NAMING the signature,
      // not an IndexOutOfBoundsException from the builder body
      val e = intercept[Exception] {
        s2.sql("SELECT graft_dot(array(1.0d))").head()
      }
      assert(e.getMessage.contains("expects 2"),
        s"arity error message: ${e.getMessage}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
