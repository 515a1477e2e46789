package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.9/§7): a per-group embedding centroid
  * as an `Aggregator[IN, BUF, OUT]`, registered through `functions.udaf`
  * — the Spark-native custom-aggregate path (partial aggregation
  * map-side, merge on the reducer; no per-row driver involvement).
  *
  * Determinism across engines: floating-point addition is not
  * associative, so a double-sum centroid would depend on Spark's
  * merge order and could never hash-match an oracle. Each component is
  * therefore QUANTIZED to an integer (floor(x * 1000) — exact IEEE
  * multiply-then-floor both engines compute identically) and summed in
  * Long space, which is associative/commutative, then divided once at
  * the end. The result is a deterministic fixed-point centroid — the
  * shape used for cluster seeding / drift monitoring at corpus scale.
  *
  * The buffer allocates lazily on first input, so the aggregator is
  * dimension-agnostic; merging buffers of mismatched dimensionality
  * fails fast rather than silently truncating.
  */
final case class CentroidBuf(sums: Array[Long], n: Long)

object CentroidAggregator
    extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

  val Scale = 1000.0

  override def zero: CentroidBuf = CentroidBuf(Array.emptyLongArray, 0L)

  private def quantize(x: Float): Long =
    math.floor(x.toDouble * Scale).toLong

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    if (v == null) return b
    val sums =
      if (b.n == 0L) new Array[Long](v.length)
      else {
        require(b.sums.length == v.length,
          s"dimension mismatch: ${b.sums.length} vs ${v.length}")
        b.sums
      }
    var i = 0
    while (i < v.length) { sums(i) += quantize(v(i)); i += 1 }
    CentroidBuf(sums, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (a.n == 0L) return b
    if (b.n == 0L) return a
    require(a.sums.length == b.sums.length,
      s"dimension mismatch: ${a.sums.length} vs ${b.sums.length}")
    val sums = new Array[Long](a.sums.length)
    var i = 0
    while (i < sums.length) { sums(i) = a.sums(i) + b.sums(i); i += 1 }
    CentroidBuf(sums, a.n + b.n)
  }

  override def finish(r: CentroidBuf): Seq[Double] =
    if (r.n == 0L) Seq.empty
    else r.sums.map(s => s.toDouble / r.n.toDouble).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
