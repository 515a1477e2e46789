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

  /** DuckDB-side mirrors of the repo's hash/shingle conventions — the
    * SHARED copy, because every oracle embedding them must track
    * [[graft.functions.RollingHash]]/[[graft.text.TextFunctions]]
    * exactly: a convention change edited in one pasted copy but not
    * another would leave an oracle silently testing stale semantics.
    * New oracles use these; some older per-query strings still inline
    * the fold mid-expression (grep `a * 31 + b`) — every copy, shared
    * or inline, is continuously hash-verified against the same native
    * kernels, so drift cannot stay silent, only untidy.
    */
  object OracleSql {
    /** `(acc*31 + codepoint) mod 2^31-1` over an expression's chars —
      * the RollingHash fold. */
    def rollHash(e: String): String =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |  list_transform(list_filter(string_split($e, ''), c -> length(c) > 0),
         |                 c -> CAST(ascii(c) AS BIGINT))),
         |  (a, b) -> (a * 31 + b) % 2147483647)""".stripMargin

    /** Space-joined 13-token window starting at `toks[i]`. */
    val cat13: String =
      (0 until 13).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
  }

  /** floor(sqrt)-tempered per-source sampling quotas targeting half the
    * corpus — THE one copy of the temperature-mixture math that
    * c5_temperature_mixture and c8_corpus_pipeline's stage 6 share
    * (the two were verbatim inline copies, free to drift). Input: a
    * (source, n_docs) frame; output: (source, n_docs, quota). */
  def temperatureQuotas(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val weights = counts
      .withColumn("wt", floor(sqrt(col("n_docs").cast("double"))))
    val totals = weights.agg(sum(col("n_docs")).as("total"),
      sum(col("wt")).as("wsum"))
    weights.crossJoin(broadcast(totals))
      .withColumn("quota", expr("((total div 2) * wt) div wsum"))
      .select(col("source"), col("n_docs"), col("quota"))
  }
}
