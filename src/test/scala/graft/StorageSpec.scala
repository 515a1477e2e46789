package graft

import graft.queries.StorageQueries

/** The storage-layout queries are about PLANS, not just values: bucketing
  * must delete the join/agg shuffles, partitioning must prune the scan.
  * These assertions pin the executed plan shape so a regression that
  * silently reintroduces an exchange fails the build.
  */
class StorageSpec extends SparkSpec {

  test("bucketed join + same-key aggregation runs without a shuffle") {
    val df = StorageQueries.b1BucketedJoin.fn(spark, Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed plan, got:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
  }

  test("partition filter reaches the scan as a PartitionFilter") {
    val df = StorageQueries.b2PartitionPruning.fn(spark, Sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"expected partitioned scan, got:\n$plan")
    // The status predicate must be a partition filter (directory prune),
    // not a post-scan data filter.
    assert(plan.replaceAll("\\s+", " ")
      .matches("(?s).*PartitionFilters: \\[[^\\]]*o_orderstatus[^\\]]*\\].*"),
      s"status filter not pushed to partitions:\n$plan")
  }
}
