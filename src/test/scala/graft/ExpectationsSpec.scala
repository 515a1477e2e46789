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

  test("null predicate counts as violation (three-valued logic pinned)") {
    val withNull = Seq(Some(1), None, Some(3)).toDF("x")
    val rep = DQ.report(withNull, Seq(DQ.warn("gt0", col("x") > 0)))
      .as[(String, String, Long, Long)].collect()
    assert(rep(0)._3 === 1L)
  }
}
