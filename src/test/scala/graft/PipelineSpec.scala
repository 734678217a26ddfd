package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables(spark, SfDir, "documents")

  test("hashBucket is stable, in [0,100), and id-only") {
    val r = Seq(1L, 2L, 1L).toDF("doc_id")
      .select(Pipeline.hashBucket($"doc_id").as("b")).as[Long].collect()
    assert(r(0) == r(2)) // same id -> same bucket, always
    assert(r.forall(b => b >= 0 && b < 100))
  }

  test("hashSplit partitions every doc into exactly one split") {
    val s = Pipeline.hashSplit(docs)
    assert(s.count() == docs.count())
    val bad = s.filter(
      !($"split" === "train" && $"bucket" < Pipeline.TrainPct ||
        $"split" === "valid" && $"bucket" >= Pipeline.TrainPct &&
          $"bucket" < Pipeline.TrainPct + Pipeline.ValidPct ||
        $"split" === "test" &&
          $"bucket" >= Pipeline.TrainPct + Pipeline.ValidPct)).count()
    assert(bad == 0)
    // deterministic hash split lands near the 80/10/10 target
    val frac = s.filter($"split" === "train").count().toDouble / s.count()
    assert(frac > 0.6 && frac < 0.95)
  }

  test("splitReport doc counts reconcile with the corpus") {
    val total = Pipeline.splitReport(docs)
      .agg(sum($"n_docs")).as[Long].head()
    assert(total == docs.count())
  }

  test("piiRedact scrubs all three classes and counts them") {
    val r = Pipeline.piiRedact(docs)
    // every doc got exactly one synthetic email/phone/IP appended
    assert(r.filter($"n_emails" < 1 || $"n_phones" =!= 1 || $"n_ips" < 1)
      .count() == 0)
    assert(r.filter($"clean_text".contains("@example.com") ||
      $"clean_text".rlike(Pipeline.PhoneRe)).count() == 0)
    assert(r.filter($"clean_text".contains("<EMAIL>") &&
      $"clean_text".contains("<PHONE>") &&
      $"clean_text".contains("<IP>")).count() == r.count())
  }

  test("decontaminate: benchmark docs excluded; overlap in [0,1]") {
    val d = Pipeline.decontaminate(docs)
    assert(d.filter($"doc_id" % Pipeline.BenchMod === 0).count() == 0)
    assert(d.filter($"overlap" < 0 || $"overlap" > 1).count() == 0)
    assert(d.filter($"n_hit" > $"n_sh").count() == 0)
    // an exact copy of a benchmark doc must flag as contaminated:
    // synthesize one by unioning doc 0's text under a fresh id
    val bench0 = docs.filter($"doc_id" === 0)
      .select($"text").as[String].head()
    val planted = docs.unionByName(
      Seq((999999L, bench0, "en", "planted", bench0.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val hit = Pipeline.decontaminate(planted)
      .filter($"doc_id" === 999999L).select($"contaminated").as[Long].head()
    assert(hit == 1L)
  }

  test("packSequences: cumulative packing is contiguous per part") {
    val p = Pipeline.packSequences(docs)
    assert(p.count() == docs.count())
    // within a part, pack_id is non-decreasing in doc_id order and a
    // doc's pack equals floor(preceding-tokens / budget)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"part").orderBy($"doc_id")
    val viol = p.withColumn("prev", lag($"pack_id", 1).over(w))
      .filter($"prev".isNotNull && $"pack_id" < $"prev").count()
    assert(viol == 0)
  }

  test("packReport tokens reconcile with per-doc token counts") {
    val perDoc = Pipeline.packSequences(docs)
      .agg(sum($"n_tokens")).as[Long].head()
    val perPack = Pipeline.packReport(docs)
      .agg(sum($"pack_tokens")).as[Long].head()
    assert(perDoc == perPack)
  }
}
