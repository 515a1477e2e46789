package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ZOrderCode

/** Multi-dimensional clustering layout — the engine's stand-in for
  * Delta's `OPTIMIZE ZORDER BY` / multi-key liquid clustering
  * (reference `scripts/gold/fact_order_items.sql:9` clusters the fact on
  * FOUR keys). A lexicographic range sort tightens per-file min/max
  * statistics only for the LEADING cluster key; interleaving a 16-bit
  * order-preserving rank of each key into one Morton code and
  * range-sorting on that code tightens the stats of EVERY key at once,
  * so a point/range probe on any clustered column prunes files — the
  * property StorageSpec proves against parquet footers.
  *
  * Scale: the layout costs one extra agg pass (numeric min/max bounds)
  * plus one shuffle+sort at WRITE time — the same shape as the
  * lexicographic layout it replaces; reads pay nothing. Rank extraction
  * is a pure per-row expression; the interleave is a native expression
  * evaluated once per row.
  */
object ZOrder {

  /** Order-preserving 16-bit rank of a clustering column.
    *
    *  - Strings: a lowercase-hex 4-char prefix (sha hex surrogate keys —
    *    the reference's cluster keys) parses to its full 16-bit value
    *    (hex lexicographic order == numeric order, and the rank is
    *    UNIFORM — a raw byte prefix concentrates hex chars into a narrow
    *    ASCII band, starving the rank's high bits and the interleave
    *    with them); other strings fall back to the first two bytes,
    *    exact prefix order. HOMOGENEITY CAVEAT: the two branches share
    *    one 0..65535 scale but are only order-consistent WITHIN a
    *    branch — a column MIXING hex-prefixed and non-hex values (e.g.
    *    "ffff…" ranks 65535 > "g0…"'s 26416 despite sorting lower) gets
    *    a scattered layout whose per-file min/max stats stay wide, so
    *    pruning on that key degrades (never correctness — the z-value
    *    orders writes only). Cluster keys should be branch-homogeneous;
    *    the reference's are (32-char hex surrogates throughout).
    *  - Integral/floating/date types: min-max scaled into [0, 65535]
    *    from the supplied bounds (one agg pass, computed in [[layout]]).
    */
  private def rank16(c: Column, dt: DataType,
      bounds: Option[(Double, Double)]): Column = dt match {
    case StringType =>
      val hex4 = substring(c, 1, 4)
      when(hex4.rlike("^[0-9a-f]{4}$"), conv(hex4, 16, 10).cast("long"))
        .otherwise(coalesce(ascii(substring(c, 1, 1)), lit(0)) * 256 +
          coalesce(ascii(substring(c, 2, 1)), lit(0)))
    case _ =>
      val (lo, hi) = bounds.getOrElse((0.0, 0.0))
      if (hi <= lo) lit(0L)
      else least(greatest(
        ((c.cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long"),
        lit(0L)), lit(65535L))
  }

  /** The Morton code over the given clustering columns. */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 4,
      "z-order supports 1-4 clustering columns")
    val numeric = cols.filter(c =>
      df.schema(c).dataType != StringType)
    val bounds: Map[String, (Double, Double)] =
      if (numeric.isEmpty) Map.empty
      else {
        val aggs = numeric.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"_lo_$c"),
          max(col(c).cast("double")).as(s"_hi_$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        numeric.map { c =>
          val lo = Option(row.getAs[java.lang.Double](s"_lo_$c"))
            .fold(0.0)(_.doubleValue)
          val hi = Option(row.getAs[java.lang.Double](s"_hi_$c"))
            .fold(0.0)(_.doubleValue)
          c -> (lo, hi)
        }.toMap
      }
    val ranks = cols.map { c =>
      rank16(col(c), df.schema(c).dataType, bounds.get(c)).cast("long")
    }
    org.apache.spark.sql.graftbridge.Bridge.column(ZOrderCode(
      ranks.map(org.apache.spark.sql.graftbridge.Bridge.expression)))
  }

  /** Range-partition + in-file sort on the Morton code — drop-in for the
    * lexicographic `repartitionByRange(cols).sortWithinPartitions(cols)`
    * layout, with every clustered key prunable. `partitions = None`
    * leaves the partition count to AQE (size-targeted files, the
    * `targetFileSize` analogue); pass a count to pin the file fan-out.
    */
  def layout(df: DataFrame, cols: Seq[String],
      partitions: Option[Int] = None): DataFrame = {
    val zc = "_graft_zorder"
    val withZ = df.withColumn(zc, zValue(df, cols))
    val parted = partitions match {
      case Some(p) => withZ.repartitionByRange(p, col(zc))
      case None => withZ.repartitionByRange(col(zc))
    }
    parted.sortWithinPartitions(col(zc)).drop(zc)
  }
}
