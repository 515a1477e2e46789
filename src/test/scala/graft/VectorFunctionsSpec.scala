package graft

import org.apache.spark.sql.functions._
import graft.similarity.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (Array(1.0f, 2.0f, 2.0f), Array(1.0f, 2.0f, 2.0f)),
    (Array(1.0f, 0.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f))
  ).toDF("a", "b")

  test("cosine: orthogonal = 0, identical = 1, opposite = -1") {
    val out = df.select(cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(out(0) === 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-15)
    assert(out(2) === -1.0)
  }

  test("dot is the exact ordered fold") {
    val d = Seq((Array(1.5f, 2.5f), Array(2.0f, 4.0f))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(d === 13.0)
  }

  test("allPairsCosine is block-count invariant and equals brute force") {
    val v = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .filter(col("vec_id") < 256)
    def run(b: Int) =
      allPairsCosine(v, "vec_id", "embedding", threshold = 0.3, blocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val brute = run(1) // B = 1 degenerates to the plain cross join
    assert(brute.nonEmpty)
    assert(run(4) === brute)
    assert(run(7) === brute) // non-divisor block count
  }

  test("hyperplaneComponent is a deterministic rational in [-0.5, 0.5)") {
    val h0 = hyperplaneComponent(0)
    assert(h0 === (12345.0 / 2147483648.0 - 0.5))
    assert((0 until 1000).forall { k =>
      val v = hyperplaneComponent(k)
      v >= -0.5 && v < 0.5 && v == hyperplaneComponent(k)
    })
  }

  test("lshCode packs one sign bit per hyperplane and is stable") {
    val v = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select(col("vec_id"), lshCode(col("embedding"), 16, 64).as("code"))
    val codes = v.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes.values.forall(c => c >= 0 && c < (1L << 16)))
    // re-evaluation gives identical codes (pure deterministic expression)
    val again = v.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes === again)
  }

  test("SrpCode native kernel is bit-identical to the composed lshCode") {
    val both = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select(
        lshCode(col("embedding"), 64, 64).as("composed"),
        lshCodeN(col("embedding"), 64, 64).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("composed and native lsh codes agree on NULL embeddings: both " +
      "NULL, never bucket 0") {
    import spark.implicits._
    val r = Seq(Tuple1(null: Array[Float]), Tuple1(Array.fill(64)(1.0f)))
      .toDF("embedding")
      .select(lshCode(col("embedding"), 16, 64).as("composed"),
        lshCodeN(col("embedding"), 16, 64).as("native"))
      .collect()
    val nullRow = r.find(x => x.isNullAt(1)).get
    assert(nullRow.isNullAt(0),
      "composed lshCode put a null embedding in bucket 0 while the " +
        "native form dropped it — the two forms must agree")
    val liveRow = r.find(x => !x.isNullAt(1)).get
    assert(liveRow.getLong(0) === liveRow.getLong(1))
  }

  test("hamming counts differing bits") {
    val h = Seq((5L, 6L)).toDF("x", "y")
      .select(hamming(col("x"), col("y"))).collect()(0).getInt(0)
    assert(h === 2) // 101 vs 110
  }

  test("ivfCell assigns argmax-cosine cell with smallest-index tie-break") {
    import graft.similarity.VectorFunctions.{ivfCell, normN}
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val rows = Seq(
      (0L, Array(0.9f, 0.1f)),   // -> cell 0 (ties with 2 -> smaller index)
      (1L, Array(0.1f, 0.9f)),   // -> cell 1
      (2L, Array(1.0f, 1.0f)))   // equidistant 0/1... dot favors none; tie -> 0
    val df = rows.toDF("id", "emb")
      .withColumn("nrm", normN(col("emb")))
      .withColumn("cell", ivfCell(cents, col("emb"), col("nrm")))
    val cells = df.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(cells(0L) === 0)
    assert(cells(1L) === 1)
    assert(cells(2L) === 0)
  }

  test("CentroidAggregator: quantized means, merge paths, dim mismatch") {
    import graft.similarity.{CentroidAggregator => CA, CentroidBuf}
    // floor-quantization: 0.0015 -> 1, -0.0015 -> -2 (floor, not trunc)
    val b = CA.reduce(CA.reduce(CA.zero, Seq(0.0015f, -0.0015f)),
      Seq(0.5f, 0.5f))
    assert(b.sums.toSeq === Seq(1L + 500L, -2L + 500L))
    val merged = CA.merge(b, CA.merge(CA.zero, b))   // zero-merge passthrough
    assert(merged.n === 4L)
    assert(merged.sums.toSeq === Seq(1002L, 996L))
    assert(CA.finish(merged) === Seq(250.5, 249.0))
    assert(CA.finish(CA.zero) === Seq.empty)
    intercept[IllegalArgumentException](
      CA.merge(b, CA.reduce(CA.zero, Seq(1.0f))))
  }

  test("lloydCodebook: round 2 moves assignments and composes round-wise") {
    import graft.similarity.VectorFunctions.{ivfCell, normN}
    val base = spark.read.parquet(s"$Sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        normN(col("embedding")).as("nrm")).persist()
    val seed: Seq[Seq[Double]] = base
      .filter(col("vec_id").between(100, 115)).orderBy(col("vec_id"))
      .select(col("embedding")).collect().toSeq
      .map(_.getSeq[Float](0).map(_.toDouble))
    val cb1 = graft.queries.SimilarityQueries.lloydCodebook(base, seed, 1)
    val cb2 = graft.queries.SimilarityQueries.lloydCodebook(base, seed, 2)
    // k rounds = one round iterated: training from cb1 for one more
    // round is exactly the two-round codebook.
    assert(graft.queries.SimilarityQueries.lloydCodebook(base, cb1, 1) === cb2)
    assert(cb1 !== cb2, "second Lloyd round left the codebook unchanged")
    // The second round must actually MOVE assignments (the loop is not
    // a no-op): count vectors whose argmax cell differs under cb1 vs cb2.
    def cells(cb: Seq[Seq[Double]]) = base.select(col("vec_id"),
      ivfCell(cb, col("embedding"), col("nrm")).as("cell"))
    val moved = cells(cb1).as("a")
      .join(cells(cb2).as("b"), col("a.vec_id") === col("b.vec_id"))
      .filter(col("a.cell") =!= col("b.cell")).count()
    assert(moved > 0, "round 2 reassigned no vectors")
    base.unpersist()
  }
}
