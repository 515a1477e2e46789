package graft

import org.apache.spark.sql.functions._
import graft.dq.{Expectations => DQ, ExpectationViolation}

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(1, 2, -3, 4, -5).toDF("x")

  test("report counts violations per rule in one pass") {
    val rep = DQ.report(df, Seq(
      DQ.warn("positive", col("x") > 0),
      DQ.fail("not_null", col("x").isNotNull)))
      .as[(String, String, Long, Long)].collect()
      .map { case (r, a, v, t) => r -> ((a, v, t)) }.toMap
    assert(rep("positive") === (("warn", 2L, 5L)))
    assert(rep("not_null") === (("fail", 0L, 5L)))
  }

  test("enforce throws on fail-rule violations") {
    intercept[ExpectationViolation] {
      DQ.enforce(df, Seq(DQ.fail("positive", col("x") > 0)))
    }
  }

  test("enforce keeps rows for warn rules, filters for drop rules") {
    assert(DQ.enforce(df, Seq(DQ.warn("positive", col("x") > 0))).count() === 5)
    assert(DQ.enforce(df, Seq(DQ.drop("positive", col("x") > 0))).count() === 3)
  }

  test("tagViolations tags sorted rule names; null predicates violate; " +
      "clean rows get an empty tag") {
    val withNull = Seq(Some(-5), None, Some(3)).toDF("x")
    val tagged = DQ.tagViolations(withNull, Seq(
        DQ.drop("gt0", col("x") > 0),
        DQ.drop("above_minus_one", col("x") > -1)))
      .select(col("_violated")).as[Seq[String]].collect()
    // -5 violates both (sorted names); NULL violates both (applyDrops
    // semantic); 3 is clean -> empty, never null.
    assert(tagged.toSet === Set(
      Seq("above_minus_one", "gt0"), Seq("above_minus_one", "gt0"),
      Seq.empty[String]).map(identity))
    assert(tagged.count(_.isEmpty) === 1)
  }

  test("null predicate counts as violation (three-valued logic pinned)") {
    val withNull = Seq(Some(1), None, Some(3)).toDF("x")
    val rep = DQ.report(withNull, Seq(DQ.warn("gt0", col("x") > 0)))
      .as[(String, String, Long, Long)].collect()
    assert(rep(0)._3 === 1L)
  }

  test("empty frame reports 0 violations instead of NPE (sum over zero " +
      "rows is NULL)") {
    val empty = df.filter(col("x") > 1000)
    val rep = DQ.report(empty, Seq(DQ.fail("positive", col("x") > 0)))
      .as[(String, String, Long, Long)].collect()
    assert(rep(0)._3 === 0L && rep(0)._4 === 0L)
    // enforce must pass an empty frame, not abort the refresh on it.
    assert(DQ.enforce(empty,
      Seq(DQ.fail("positive", col("x") > 0))).count() === 0)
  }

  test("dotted and duplicated rule names survive the report round-trip") {
    val rep = DQ.report(df, Seq(
      DQ.warn("orders.valid_id", col("x") > 0),
      DQ.warn("orders.valid_id", col("x") < 100)))
      .as[(String, String, Long, Long)].collect()
    assert(rep.length === 2, "both same-named rules must report")
    assert(rep.forall(_._1 == "orders.valid_id"))
  }

  test("pipeline counts every expectation on INPUT rows: a row dropped " +
      "by one rule still aborts a fail rule it violates (DLT semantics)") {
    import graft.pipeline.{Dataset, Materialize, Pipeline}
    val tbl = "dq_predrop_spec_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // x = -1 violates BOTH the drop rule (x > 0) and the fail rule
    // (x != -1). Post-drop enforcement would filter it first and the
    // fail rule would never see it; DLT evaluates each expectation
    // against the input, so the update must abort.
    val p = new Pipeline().register(Dataset(tbl, Nil,
      (s, _) => { import s.implicits._
        Seq(1, 2, -1).toDF("x") },
      expectations = Seq(
        DQ.drop("positive", col("x") > 0),
        DQ.fail("never_minus_one", col("x") =!= -1)),
      materialize = Materialize.MaterializedView))
    intercept[ExpectationViolation] { p.run(spark) }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
