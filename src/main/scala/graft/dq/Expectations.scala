package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the engine's analogue of DLT's
  * `@dlt.expect_all` / `CONSTRAINT ... EXPECT ... ON VIOLATION FAIL UPDATE`
  * (reference `scripts/silver/Silver_orders.py:23-24`,
  * `scripts/gold/fact_order_items.sql:3-7`).
  *
  * Semantics mirror the reference:
  *  - Warn: violations are counted and reported; rows are KEPT.
  *  - Fail: any violation aborts the update (throws).
  *  - Drop: violating rows are filtered out (DLT's expect_or_drop — unused
  *    by the reference but part of the DLT surface).
  *
  * Scale note: `report` computes ALL rule counters in ONE aggregation pass
  * (a single `agg` of conditional sums) — one scan + one partial/final
  * hash-agg regardless of rule count, no per-rule jobs. At 100 TB this is
  * the difference between N scans and 1.
  */
final case class Expectation(name: String, predicate: Column, action: Action)

sealed trait Action
object Action {
  case object Warn extends Action
  case object Fail extends Action
  case object Drop extends Action

  /** Like Drop for the downstream flow (violating rows never land in
    * the table), but the violating rows are ROUTED — tagged with the
    * rules they broke and written to a `<table>__quarantine` sink by
    * the Pipeline runner — instead of silently discarded. The DLT
    * quarantine-table pattern (expect_or_drop + an inverted-rule
    * quarantine table, MIGRATION.md) as a first-class disposition.
    */
  case object Quarantine extends Action
}

final class ExpectationViolation(msg: String) extends RuntimeException(msg)

object Expectations {

  def warn(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, Action.Warn)
  def fail(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, Action.Fail)
  def drop(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, Action.Drop)
  def quarantine(name: String, predicate: Column): Expectation =
    Expectation(name, predicate, Action.Quarantine)

  /** One row per rule: (rule, action, violations, total) — single-pass.
    * Counters are keyed POSITIONALLY (`__viol_<index>`), never by rule
    * name: a name containing `.` would parse as struct access on the
    * col() round-trip, and two rules sharing a name would be ambiguous.
    * sum() over ZERO rows is NULL, so each counter coalesces to 0 — an
    * empty frame reports 0 violations instead of NPE-ing enforce().
    */
  def report(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val counters = rules.zipWithIndex.map { case (r, i) =>
      coalesce(sum(when(!coalesce(r.predicate, lit(false)), 1L)
        .otherwise(0L)), lit(0L)).as(s"__viol_$i")
    } :+ count(lit(1)).as("__total")
    val one = df.agg(counters.head, counters.tail: _*)
    // Unpivot the single counter row into (rule, action, violations, total).
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"),
        lit(r.action.toString.toLowerCase).as("action"),
        col(s"__viol_$i").as("violations"),
        col("__total").as("total"))
    }
    one.select(explode(array(stacked: _*)).as("e")).select("e.*")
  }

  /** Enforce rules: log warn counts, throw on fail violations, filter drops.
    * Returns the (possibly filtered) DataFrame for further composition.
    */
  def enforce(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    // Quarantine rules are not aggregated here: their violating rows are
    // ROUTED (Pipeline's quarantine sink), not counted-and-warned.
    val checked = rules.filter(r =>
      r.action == Action.Warn || r.action == Action.Fail)
    if (checked.nonEmpty) {
      val rep = report(df, checked).collect()
      rep.foreach { row =>
        val (rule, action, viol) =
          (row.getString(0), row.getString(1), row.getLong(2))
        if (viol > 0 && action == "fail")
          throw new ExpectationViolation(
            s"expectation '$rule' failed: $viol violating rows")
        else if (viol > 0)
          System.err.println(s"[dq] warn: '$rule' has $viol violating rows")
      }
    }
    applyDrops(df, rules)
  }

  /** The drop-expectation filter fold, SINGLE-SOURCED: Pipeline applies
    * drops plan-level (in flight, batch and streaming alike) while
    * enforce applies them after the warn/fail aggregate — both must
    * share one null-handling semantic (violating OR null-predicate rows
    * drop), so both call here. Quarantine rules filter the CLEAN side
    * identically (their violating rows leave the flow too — they are
    * additionally routed by the Pipeline runner's quarantine sink).
    */
  def applyDrops(df: DataFrame, rules: Seq[Expectation]): DataFrame =
    rules.filter(r => r.action == Action.Drop ||
        r.action == Action.Quarantine).foldLeft(df) { (acc, r) =>
      acc.filter(coalesce(r.predicate, lit(false)))
    }

  /** The QUARANTINED side of the split: rows violating at least one of
    * the given rules (null predicates violate, the applyDrops
    * semantic), tagged via [[tagViolations]] with the sorted names of
    * every rule they broke. Plan-level (one shared scan feeds both
    * branches at execution; batch and streaming identical).
    */
  def violating(df: DataFrame, rules: Seq[Expectation],
      colName: String = "_violated"): DataFrame =
    tagViolations(df, rules, colName).filter(size(col(colName)) > 0)

  /** Quarantine routing — the DLT quarantine-table pattern: instead of
    * silently filtering violations (applyDrops) or aborting (Fail),
    * TAG every row with the sorted names of the rules it violates so
    * one pass can route clean rows onward and violating rows — with
    * their reasons — to a quarantine sink for triage/replay. Null
    * predicates count as violations, the applyDrops semantic. Pure
    * plan-level projection: no action, no second scan, works identically
    * on batch and streaming frames; at 100 TB the split is a map-side
    * filter on each branch of one shared scan.
    */
  def tagViolations(df: DataFrame, rules: Seq[Expectation],
      colName: String = "_violated"): DataFrame = {
    require(rules.nonEmpty, "tagViolations needs at least one rule")
    val tags = array(rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*)
    df.withColumn(colName,
      sort_array(filter(tags, x => x.isNotNull)))
  }
}
