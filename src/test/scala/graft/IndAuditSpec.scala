package graft

import graft.qc.IndAudit

class IndAuditSpec extends SparkSpec {

  test("StarContract on fixture: genuine FKs hold, disjoint name " +
    "domain scores 0, p_size-in-nationkey is partial") {
    val r = IndAudit.audit(spark, SfDir)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    assert(r.size == IndAudit.StarContract.size)
    for (id <- Seq("li_part_fk", "li_supp_fk", "ord_cust_fk",
        "cust_nat_fk")) {
      assert(r(id)._1 == 0L, s"$id should hold")
      assert(r(id)._2 == 1000000L && r(id)._3 == 1L)
    }
    // nation names are not region names
    assert(r("nat_name_in_region") === ((25L, 0L, 0L)))
    // p_size 1..50 vs nationkey 0..24: sizes 25..50 missing
    val (miss, ppm, holds) = r("size_as_nation")
    assert(miss > 0L && holds == 0L && ppm > 0L && ppm < 1000000L)
  }

  test("audit counts DISTINCT non-null values, not rows, and NULL " +
    "references hold vacuously") {
    import spark.implicits._
    val tabs = Map(
      "fromt" -> Seq(Option(1L), Option(1L), Option(2L), None).toDF("k"),
      "tot" -> Seq(1L).toDF("r"))
    val r = IndAudit.auditTables(spark, tabs,
      Seq(IndAudit.Ind("t", "fromt", "k", "tot", "r")))
      .collect().head
    // 2 distinct non-null values {1,2}; 2 is missing -> 500000 ppm
    assert(r.getLong(3) == 2L && r.getLong(4) == 1L)
    assert(r.getLong(5) == 500000L && r.getLong(6) == 0L)
  }
}
