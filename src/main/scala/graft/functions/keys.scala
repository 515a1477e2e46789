package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Surrogate-key + money helpers.
  *
  * Mirrors the reference's stable sha2-256 surrogate keys
  * (reference `scripts/gold/fact_order_items.sql:41-42`,
  * `scripts/gold/dim_orders.sql:14`): deterministic expressions that stay
  * stable across incremental refreshes, so they distribute for free (pure
  * per-row codegen'd expression, no shuffle, no id-assignment coordination —
  * unlike monotonically_increasing_id this survives a 1000-executor run with
  * identical output).
  */
object keys {

  /** sha2-256 over '|'-joined natural-key columns (cast to string). */
  def surrogateKey(cols: Column*): Column =
    sha2(concat_ws("|", cols.map(_.cast("string")): _*), 256)

  /** Exact money arithmetic for oracle-stable aggregation: cast to
    * decimal(18,2) BEFORE summing so the aggregation is associative and
    * order-independent (double sums are not), then cast the final value
    * back to double for a canonical output representation.
    */
  def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal for derived per-row doubles (e.g. price*(1-disc)):
    * the per-row double arithmetic is IEEE-deterministic; the cast pins a
    * canonical exact value so the subsequent sum is order-independent.
    */
  def money6(c: Column): Column = c.cast("decimal(18,6)")
}
