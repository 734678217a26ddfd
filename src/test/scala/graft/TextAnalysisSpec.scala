package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokenCount: whitespace tokens; empty and blank are 0") {
    val r = Seq("a b  c", "", "   ", "one").toDF("text")
      .select(tokenCount($"text").as("n")).as[Long].collect()
    assert(r.toSeq == Seq(3L, 0L, 0L, 1L))
  }

  test("bpeishTokenCount: letter runs, digit runs, single marks") {
    val r = one("ab12 cd, x!").select(bpeishTokenCount($"text")).as[Long].head()
    // ab | 12 | cd | , | x | !
    assert(r == 6L)
  }

  test("normalize strips non-alphanumerics and squeezes spaces") {
    val r = one("  Héllo,   WORLD!!  9 ").select(normalize($"text"))
      .as[String].head()
    assert(r == "h llo world 9")
  }

  test("langId picks marker-majority language, und when no markers") {
    val df = Seq(
      "the cat and the hat is in it",
      "der hund und die katze ist nicht da",
      "el perro y la casa en los campos es",
      "le chat et les maisons est un une",
      "qwerty zxcvb").toDF("text")
    val r = df.select(langId($"text")).as[String].collect().toSeq
    assert(r == Seq("en", "de", "es", "fr", "und"))
  }

  test("qualityScore in [0,1] and rewards stopword-rich prose") {
    val good = one("the cat and the dog sat in the house " * 10)
      .select(qualityScore($"text")).as[Double].head()
    val bad = one("!!! ??? *** $$$ %%%")
      .select(qualityScore($"text")).as[Double].head()
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("wordShingles: n-grams in order; short docs yield empty") {
    val r = one("a b c d").select(wordShingles($"text", 3)).as[Seq[String]]
      .head()
    assert(r == Seq("a b c", "b c d"))
    val short = one("a b").select(wordShingles($"text", 3)).as[Seq[String]]
      .head()
    assert(short.isEmpty)
  }

  test("fingerprints are normalization-invariant") {
    val r = Seq("Hello  World!", "hello world").toDF("text")
      .select(fingerprintMd5($"text"), rollingFingerprint($"text"))
      .collect()
    assert(r(0) == r(1))
  }
}
