package graft

import graft.qc.FdAudit

class FdAuditSpec extends SparkSpec {
  import spark.implicits._

  test("audit: violating, holding, and all-null-dependent keys; ppm " +
    "is floor-exact") {
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")),           // holds (nd=1)
      (2L, Some("y")), (2L, Some("z")),           // violates (nd=2)
      (3L, None)                                  // nd=0, not a violation
    ).toDF("a", "b")
    val r = FdAudit.audit(df, Seq(FdAudit.Fd("a_to_b", "a", "b")))
      .as[(String, String, String, Long, Long, Long, Long)]
      .collect().toList
    assert(r === List(("a_to_b", "a", "b", 3L, 1L, 333333L, 2L)))
  }

  test("multi-FD contract audits in one pass and reports each FD " +
    "independently") {
    val df = Seq((1L, "p", 10L), (2L, "p", 20L), (3L, "q", 10L))
      .toDF("k", "g", "v")
    val r = FdAudit.audit(df, Seq(
      FdAudit.Fd("k_to_g", "k", "g"),    // key FD: holds
      FdAudit.Fd("g_to_v", "g", "v")))   // g 'p' -> {10,20}: violates
      .collect().map(x => x.getString(0) ->
        ((x.getLong(3), x.getLong(4), x.getLong(6)))).toMap
    assert(r("k_to_g") === ((3L, 0L, 1L)))
    assert(r("g_to_v") === ((2L, 1L, 2L)))
  }

  test("PartContract on fixture: partkey->name holds exactly; the " +
    "approximate FDs genuinely violate") {
    val part = graft.core.Tables(spark, SfDir, "part")
    val r = FdAudit.audit(part, FdAudit.PartContract)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(4), x.getLong(6)))).toMap
    assert(r("key_to_name") === ((0L, 1L)))
    assert(r("type_to_size")._1 > 0L)
    assert(r("name_to_brand")._1 > 0L)
  }
}
