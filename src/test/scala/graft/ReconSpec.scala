package graft

import org.apache.spark.sql.functions._

import graft.qc.Recon

class ReconSpec extends SparkSpec {
  import spark.implicits._

  test("schemaDrift: added/dropped/type_changed/unchanged per column") {
    val before = Seq((1L, 1, "a", 0.5))
      .toDF("id", "n", "name", "score")
    val after = before.drop("score")
      .withColumn("n", col("n").cast("long"))
      .withColumn("tag", lit("x"))
    val r = Recon.schemaDrift(before, after)
      .as[(String, String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r("id") == (("unchanged", "BIGINT", "BIGINT")))
    assert(r("n") == (("type_changed", "INTEGER", "BIGINT")))
    assert(r("name") == (("unchanged", "VARCHAR", "VARCHAR")))
    assert(r("score") == (("dropped", "DOUBLE", null)))
    assert(r("tag") == (("added", null, "VARCHAR")))
    assert(r.size == 5)
  }
}
