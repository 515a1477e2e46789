package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** VERDICT r12 task 5 — ANN recall at the SECOND decade. The banding/
  * IVF constants have recall datapoints at the gate scales (s12); the
  * sf1.0 ScaleUp replica cannot supply one because it replicates
  * embeddings VALUE-IDENTICAL (ScaleUp.scala faithfulness notes): the
  * exact top-k of every query collapses to duplicate copies and the
  * banded probe finds an identical vector with probability 1 — the
  * measured s12 recall there is a degenerate 1.00 (recorded, with this
  * adjudication, in BASELINE.md). This spec supplies the REAL
  * second-decade datapoint: a 10x replica whose replicas are DISTINCT
  * vectors — replica r circularly shifts the 64 dimensions by r, an
  * orthogonal transform that preserves norms and within-replica
  * geometry while decorrelating the replica from the original — then
  * runs the catalog's OWN s12 composition (s1 exact vs s2 banded
  * probe) over it. The assertion pins the recall floor so a banding/
  * LSH parameter drift that silently degrades recall at scale fails
  * the build, the same contract DedupSpec pins for candidate
  * LINEARITY.
  *
  * Measured on r13 code: mean recall@5 = 0.22 over the 10-query set at
  * 20,000 vectors (sf0.1 x 10), vs 0.30 at 2,000 vectors (sf0.1) —
  * the mild occupancy dilution banding theory predicts, not a
  * collapse. Floor set at 0.15: halving from the measured value is a
  * parameter regression, not noise (the pipeline is deterministic —
  * run-to-run variance is ZERO; the floor's slack covers only future
  * legitimate re-tuning of the probe constants).
  */
class AnnRecallScaleSpec extends SparkSpec {

  test("banded-probe recall holds at the second decade on distinct-vector replicas") {
    val factor = 10
    val dims = 64
    val src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val step = src.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val replicated = (0 until factor).map { r =>
      val bumped = src.withColumn("vec_id", col("vec_id") + lit(r * step))
      if (r == 0) bumped
      else bumped.withColumn("embedding",
        expr(s"transform(embedding, (x, i) -> embedding[(i + $r) % $dims])"))
    }.reduce(_ unionAll _)
    val dir = Files.createTempDirectory("graft_ann_recall_sf1")
    replicated.write.mode("overwrite")
      .parquet(dir.resolve("embeddings.parquet").toString)

    val recall = SimilarityQueries.s12AnnRecall.fn(spark, dir.toString)
      .agg(avg(col("recall")).as("mean_recall"),
        count(lit(1)).as("n_queries"))
      .head()
    val mean = recall.getDouble(0)
    val nq = recall.getLong(1)
    info(f"second-decade recall@5: mean=$mean%.3f over $nq queries " +
      s"(${factor}x sf0.1 = ${factor * step} distinct vectors)")
    assert(nq === 10L, "query sample changed — floor no longer calibrated")
    assert(mean >= 0.15,
      f"second-decade mean recall@5 $mean%.3f fell below the 0.15 floor " +
        "— banding/probe constants have drifted (BASELINE.md r13 " +
        "adjudication; measured 0.22 when pinned)")
  }
}
