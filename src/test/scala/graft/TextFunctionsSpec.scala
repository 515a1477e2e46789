package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("v")).collect()(0).get(0)

  test("tokens splits on runs of whitespace and drops empties") {
    assert(one(tokens(col("t")), "  a  b c ") === Seq("a", "b", "c"))
    assert(one(tokenCount(col("t")), "a b c") === 3)
  }

  test("rollingHash matches the independently computed reference value") {
    // fold of 'hello' codepoints: (acc*31 + cp) mod 2^31-1 = 99162322
    // (cross-checked against the DuckDB oracle implementation).
    assert(one(rollingHash(col("t")), "hello") === 99162322L)
  }

  test("rollingHash is order-sensitive") {
    assert(one(rollingHash(col("t")), "ab") !== one(rollingHash(col("t")), "ba"))
  }

  test("shingles yields n-2 trigrams and empty below n tokens") {
    assert(one(shingles(col("t"), 3), "a b c d") === Seq("a b c", "b c d"))
    assert(one(shingles(col("t"), 3), "a b") === Seq())
  }

  test("subTokenCount splits alpha runs, digit runs, symbols") {
    assert(one(subTokenCount(col("t")), "foo bar 12 x!") === 5)
  }

  test("langId picks the marker-majority language with fixed tie-break") {
    assert(one(langId(col("t")), "the cat and the dog is here") === "en")
    assert(one(langId(col("t")), "der hund und die katze ist") === "de")
    assert(one(langId(col("t")), "xyz qqq") === "und")
    // 'la' is both es and fr; priority order resolves es first.
    assert(one(langId(col("t")), "la la") === "es")
  }

  test("qualityScore stays within [0, 1]") {
    val scores = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(qualityScore(col("text")).as("q")).collect().map(_.getDouble(0))
    assert(scores.nonEmpty && scores.forall(q => q >= 0.0 && q <= 1.0))
  }
}
