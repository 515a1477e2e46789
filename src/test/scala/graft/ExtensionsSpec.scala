package graft

import graft.ext.GraftExtensions

/** SQL-surface registration of the native kernels. */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot and graft_shingle_set usable from spark.sql") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 11.0)
    val sh = spark.sql(
      "SELECT graft_shingle_set('a b c d', 3) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
  }

  test("registration is idempotent") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0D), array(2.0D))")
      .collect()(0).getDouble(0) === 2.0)
  }
}
