package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The a17 output: histogram-resolution median and MAD estimates plus
  * the exact group count. */
final case class MedianMadEst(median_est: Double, mad_est: Double, n: Long)

/** Approximate per-group median + MAD over a FIXED-width bucket
  * histogram, as a mergeable typed `Aggregator` — the unbounded-group
  * companion to a16's exact rank selection (whose scaladoc concedes it
  * needs bounded rows-per-group): state is a dense `Array[Long]` of
  * `buckets` counters regardless of group size, reduce is one in-place
  * increment, merge is elementwise addition — associative and
  * commutative, so Spark partial-aggregates map-side and the reduce
  * side merges 32 fixed-size histograms per group instead of ranking
  * every row. ONE group exchange, no rank window, group-size-
  * independent memory: the same "mergeable sketch" economics as
  * HLL/KMV, applied to robust statistics (the classic
  * histogram-quantile construction, e.g. Greenwald–Khanna's motivating
  * baseline and every metrics library's bucketed p50).
  *
  * Estimation algebra (deterministic, integer-exact, replayed verbatim
  * by the DuckDB oracle):
  *  - bucket(v) = clamp(floor(v / w), 0, buckets-1) — `w` a power of
  *    two, so the division is exact in IEEE double for the money-grid
  *    inputs this serves; values past the top land in the top bucket
  *    (documented saturation, not an error);
  *  - median_est = b*w + w/2 for the first bucket b (ascending) with
  *    2*cum(b) >= n — the bucket midpoint, error bounded by w/2;
  *  - mad_est = d*w for the first ring distance d (= |b - b_med|,
  *    ascending, weights summed across the ±d pair) with
  *    2*cum(d) >= n — the weighted median of bucket distances.
  *
  * Negative inputs clamp to bucket 0: the aggregator targets
  * non-negative measures (money, counts, durations); re-center or
  * shift upstream for signed domains.
  */
final class MedianMadHistogram(w: Double, buckets: Int)
    extends Aggregator[Double, Array[Long], MedianMadEst] {
  require(buckets > 0 && w > 0)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], v: Double): Array[Long] = {
    val h = if (b.isEmpty) new Array[Long](buckets) else b
    val idx = math.min(math.max(math.floor(v / w).toLong, 0L),
      (buckets - 1).toLong).toInt
    h(idx) += 1L
    h
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    var i = 0
    while (i < buckets) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(h: Array[Long]): MedianMadEst = {
    if (h.isEmpty) return MedianMadEst(Double.NaN, Double.NaN, 0L)
    var n = 0L
    h.foreach(n += _)
    if (n == 0L) return MedianMadEst(Double.NaN, Double.NaN, 0L)
    // Median bucket: first b (ascending) with 2*cum >= n.
    var cum = 0L
    var bMed = 0
    var i = 0
    var found = false
    while (i < buckets && !found) {
      cum += h(i)
      if (2L * cum >= n) { bMed = i; found = true }
      i += 1
    }
    // MAD: weighted median of ring distances around bMed.
    var dCum = 0L
    var dMad = 0L
    var d = 0
    var foundD = false
    while (!foundD) { // terminates: total ring weight is n
      val weight =
        if (d == 0) h(bMed)
        else {
          val lo = bMed - d
          val hi = bMed + d
          (if (lo >= 0) h(lo) else 0L) + (if (hi < buckets) h(hi) else 0L)
        }
      dCum += weight
      if (2L * dCum >= n) { dMad = d.toLong; foundD = true }
      d += 1
    }
    MedianMadEst(bMed * w + w / 2, dMad * w, n)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[MedianMadEst] = Encoders.product
}
