package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL that DuckDB runs over the same parquet tables.
  *
  * Determinism conventions (so value-hash comparison is exact):
  *  - integer outputs are BIGINT on both sides;
  *  - money aggregates are summed as decimal(18,x) (exact, order-independent)
  *    and emitted as double (the final cast is deterministic on both engines);
  *  - sets are emitted sorted (`sort_array`, `ORDER BY` inside string_agg);
  *  - every output column is explicitly aliased with the same name on both
  *    sides (the driver sorts columns by name before hashing).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def withOracle(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
