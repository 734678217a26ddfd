package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.GraftFunctions._

/** Property tests for the §5 operational invariants (SURVEY: adopted
  * test strategy #3) + scalar-function unit checks. Raw ScalaCheck
  * generators with fixed seeds (the scalatest bridge artifact isn't in
  * the offline cache). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: variance of identical inputs is 0 and QC passes") {
    (1L to 5L).foreach { seed =>
      val xs = sample(Gen.listOfN(20, Gen.chooseNum(-1e6, 1e6)), seed)
      val r = xs.toDF("v").select(
        varianceNull($"v", $"v").as("var"),
        qcStatus($"v", $"v").as("st")).collect()
      assert(r.forall(row =>
        (row.isNullAt(0) || row.getDouble(0) == 0.0) &&
          row.getString(1) == "PASS"))
    }
  }

  test("property: unionByName preserves SUM(value)") {
    (1L to 5L).foreach { seed =>
      val a = sample(Gen.listOfN(15, Gen.chooseNum(-1e5, 1e5)), seed)
      val b = sample(Gen.listOfN(15, Gen.chooseNum(-1e5, 1e5)), seed + 100)
      val u = a.toDF("value").unionByName(b.toDF("value"))
        .agg(sum("value")).as[Double].head()
      assert(math.abs(u - (a.sum + b.sum)) < 1e-6)
    }
  }

  test("zero-baseline QC rule: old=0 passes iff new=0") {
    val r = Seq((0.0, 0.0), (1.0, 0.0), (0.9, 1.0), (2.0, 1.0))
      .toDF("nw", "old")
      .select(qcStatus($"nw", $"old").as("st")).as[String].collect().toSeq
    assert(r == Seq("PASS", "FAIL", "PASS", "FAIL"))
  }

  test("cleaning functions: null normalization and numeric scrub") {
    val r = Seq("  x  ", "nan", "None", "", "1,234.5abc")
      .toDF("c")
      .select(cleanString($"c").as("clean"),
        parseNumberNull(scrubNumeric($"c")).as("num")).collect()
    assert(r(0).getString(0) == "x")
    assert(r(1).isNullAt(0) && r(2).isNullAt(0) && r(3).isNullAt(0))
    assert(r(4).getDouble(1) == 1234.5)
  }

  test("fiscal year: FY starts in October") {
    val r = Seq("1995-09-30", "1995-10-01")
      .toDF("d").select(fiscalYear(to_date($"d"))).as[Int].collect().toSeq
    assert(r == Seq(1995, 1996))
  }

  test("month key arithmetic with EDATE-style shift") {
    val r = Seq("1996-06-15").toDF("d")
      .select(monthKey(to_date($"d")),
        monthKey(to_date($"d"), -12),
        monthKey(to_date($"d"), 7)).as[(Long, Long, Long)].head()
    assert(r == ((199606L, 199506L, 199701L)))
  }

  test("DamerauLevenshtein: unrestricted variant, pinned to DuckDB's " +
    "probed answers; transpositions cost 1 where levenshtein says 2") {
    import graft.functions.DamerauLevenshtein.distance
    // pinned to duckdb damerau_levenshtein outputs (probed r8):
    // the CA/ABC=2 case is what separates unrestricted DL from OSA (3)
    assert(distance("CA", "ABC") == 2)
    assert(distance("abcdef", "abcfed") == 2)
    assert(distance("kitten", "sitting") == 3)
    assert(distance("", "abc") == 3)
    assert(distance("ab", "ba") == 1)
    assert(distance("", "") == 0)
    assert(distance("same", "same") == 0)
    // the operator's reason to exist: one adjacent swap
    val r = Seq(("Supplier#000000001", "Supplier0#00000001"))
      .toDF("a", "b")
      .select(graft.functions.StringExpressions
        .damerauLevenshtein($"a", $"b").as("dl"),
        levenshtein($"a", $"b").as("lev"))
      .as[(Int, Int)].head()
    assert(r == ((1, 2)))
    // SQL surface + null propagation + codegen path
    val sqlR = spark.sql(
      "SELECT graft_dl('CA', 'ABC'), graft_dl(NULL, 'x')").head()
    assert(sqlR.getInt(0) == 2 && sqlR.isNullAt(1))
    val e = intercept[Exception] {
      distance("x" * 5000, "y")
    }
    assert(e.getMessage.contains("gate lengths"))
  }

  test("DamerauLevenshtein: metric axioms and levenshtein bounds hold " +
    "over random string pairs (property)") {
    import graft.functions.DamerauLevenshtein.distance
    // plain Levenshtein reference, small and obviously correct
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val gen = Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val seed = Seed(42L)
    val strs = Iterator.iterate(seed)(_.next)
      .map(s => gen.apply(Gen.Parameters.default, s).getOrElse(""))
      .take(60).toSeq
    for (a <- strs.take(20); b <- strs.slice(20, 40)) {
      val dl = distance(a, b)
      val lv = lev(a, b)
      // identity, symmetry, the levenshtein sandwich, length bound
      assert(distance(a, a) == 0)
      assert(dl == distance(b, a))
      assert(dl <= lv && lv <= 2 * dl || (dl == 0 && lv == 0),
        s"bounds broke for '$a'/'$b': dl=$dl lev=$lv")
      assert(dl >= math.abs(a.length - b.length))
    }
    // triangle inequality (holds for the UNRESTRICTED variant; OSA
    // famously violates it — e.g. OSA('ca','abc')=3 > 1+... )
    for (a <- strs.take(12); b <- strs.slice(12, 24);
         c <- strs.slice(24, 36)) {
      assert(distance(a, c) <= distance(a, b) + distance(b, c),
        s"triangle broke for '$a'/'$b'/'$c'")
    }
  }
}
