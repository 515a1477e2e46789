package graft

import org.apache.spark.sql.functions._
import graft.similarity.VectorFunctions._
import graft.text.TextFunctions._

/** Parity tests: the native kernels must be bit-identical to the
  * reference higher-order-function formulations they accelerate.
  */
class NativeExpressionsSpec extends SparkSpec {

  test("dotN is bit-identical to the HOF fold on real embeddings") {
    val v = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val diff = v.select(
        dot(col("embedding"), col("embedding")).as("ref"),
        dotN(col("embedding"), col("embedding")).as("nat"))
      .filter(col("ref") =!= col("nat")).count()
    assert(diff === 0)
  }

  test("dotN handles mixed double/float element types") {
    import spark.implicits._
    val d = Seq((Array(0.5, 0.25), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(dotN(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(d === 2.0)
  }

  test("rollingHash native equals the HOF fold on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val diff = docs.select(
        rollingHashHof(col("text")).as("ref"),
        rollingHash(col("text")).as("nat"))
      .filter(col("ref") =!= col("nat")).count()
    assert(diff === 0)
  }

  test("minShingleHash native equals the HOF fingerprint on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val diff = docs.select(
        shingleFingerprintHof(col("text"), 3).as("ref"),
        shingleFingerprint(col("text"), 3).as("nat"))
      .filter(col("ref") =!= col("nat")
        || col("ref").isNull =!= col("nat").isNull).count()
    assert(diff === 0)
  }

  test("minShingleHash is null for docs shorter than n tokens") {
    import spark.implicits._
    val out = Seq("a b", "  ", "x y z").toDF("t")
      .select(shingleFingerprint(col("t"), 3).as("h")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && !out(2).isNullAt(0))
  }

  test("shingleSetN equals the HOF shingleSet on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val diff = docs.select(
        array_sort(shingleSet(col("text"), 3)).as("ref"),
        array_sort(shingleSetN(col("text"), 3)).as("nat"))
      .filter(col("ref") =!= col("nat")).count()
    assert(diff === 0)
  }

  test("shingleSetN edge cases: short, empty, padded") {
    import spark.implicits._
    val out = Seq("a b", "", "  x y z  ", "a  b c").toDF("t")
      .select(shingleSetN(col("t"), 3).as("s")).collect().map(_.getSeq[String](0))
    assert(out(0) === Seq())
    assert(out(1) === Seq())
    assert(out(2) === Seq("x y z"))
    assert(out(3) === Seq("a b c"))
  }
}
