package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generated date dimension.
  *
  * Reference: `scripts/gold/dim_date.sql` builds 0..999 day offsets with
  * `ROW_NUMBER() OVER (ORDER BY (SELECT NULL)) - 1 ... LIMIT 1000` (W2) and
  * a dense `date_key` via an unpartitioned `ROW_NUMBER() OVER (ORDER BY
  * date_day)` (W3). Both are single-partition hazards at scale: every row
  * flows through one task. We replace them with semantics-equal,
  * partition-safe forms:
  *   - the day sequence comes from `sequence(d0, d0 + n days)` + `explode`
  *     (generated from a 1-row aggregate — the 1000-row explode is trivial;
  *     for very large ranges swap in `spark.range(n)`);
  *   - `date_key` = `datediff(date_actual, d0)` — dense over consecutive
  *     days like the rank, but a pure per-row expression: no global
  *     sort, no single partition. BASE CAVEAT: this key is 0-BASED
  *     (datediff of the first day is 0) where the reference's
  *     `ROW_NUMBER()` — and [[graft.olist]]'s reference-faithful
  *     `dim_date` — are 1-BASED; the w2/j3 entries and their oracles
  *     use DateDim keys consistently on both sides, but DateDim keys
  *     must never be joined against reference-derived or olist
  *     `date_key` values without the +1 shift.
  *
  * The reference's LIMIT-1000 cap is preserved (maxDays = 999): purchases
  * beyond day 999 intentionally drop from the fact via the inner date join
  * (`fact_order_items.sql:103-104`), and our fact keeps that quirk. The
  * cap here binds at min(data span, maxDays) — a span shorter than the
  * cap generates only the observed days, not the full 1000-day calendar.
  */
object DateDim {

  /** Build from the min..min+cap range of `tsCol` in `src`. */
  def build(src: DataFrame, tsCol: Column, maxDays: Int = 999): DataFrame = {
    val bounds = src.agg(
      min(tsCol.cast("date")).as("d0"),
      least(datediff(max(tsCol.cast("date")), min(tsCol.cast("date"))),
        lit(maxDays)).as("n"))
    bounds
      .select(col("d0"),
        explode(sequence(col("d0"), date_add(col("d0"), col("n")))).as("date_actual"))
      .select(
        col("date_actual"),
        datediff(col("date_actual"), col("d0")).cast("long").as("date_key"),
        year(col("date_actual")).cast("long").as("yr"),
        quarter(col("date_actual")).cast("long").as("qtr"),
        month(col("date_actual")).cast("long").as("mth"),
        dayofmonth(col("date_actual")).cast("long").as("dom"),
        dayofweek(col("date_actual")).cast("long").as("dow"),
        weekofyear(col("date_actual")).cast("long").as("woy"),
        date_format(col("date_actual"), "EEEE").as("day_name"),
        date_format(col("date_actual"), "MMMM").as("month_name"),
        dayofweek(col("date_actual")).isin(1, 7).as("is_weekend"))
  }
}
