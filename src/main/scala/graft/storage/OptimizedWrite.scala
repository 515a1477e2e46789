package graft.storage

import org.apache.spark.sql.DataFrame

/** Size-derived file fan-out for batch table writes — the scale-adaptive
  * partition-count rule behind [[graft.pipeline.Pipeline]]'s
  * materialization writes (the open-source shape of Databricks
  * "optimized writes" / Delta's `targetFileSize`).
  *
  * The rule, from the frame's LEAF relation bytes B and the cluster's
  * default parallelism P:
  *
  *   targetFileBytes = clamp(B / (2 P), 256 KiB, 128 MiB)
  *   partitions      = ceil(B / targetFileBytes)
  *
  * Consequences, by scale:
  *   - A production-scale table (B >> 256 MiB * P) lands ~128 MiB files —
  *     the guide's §6 sizing band — and the count follows the data, not
  *     the cluster.
  *   - A mid-size table lands exactly 2 P files: every core of the
  *     cluster participates in the write's encode AND in every later
  *     scan of the committed table.
  *   - A tiny table is capped by the 256 KiB floor so it never shatters
  *     into per-core dust files.
  *
  * Why the leaf-bytes estimate: the committed file count is the
  * READ-side parallelism floor for single-row-group parquet (a file
  * under the row-group size is one unsplittable scan task however small
  * `maxPartitionBytes` goes), and byte-based AQE coalescing sizes
  * shuffles by volume, not by the per-row compute of downstream
  * consumers — so a small-but-hot table written as one file serializes
  * every consumer. Leaf bytes come from the optimized plan's leaf
  * statistics (file-index sizes for parquet relations — already cached
  * by the session, no extra filesystem calls), which track the write's
  * true volume within the projection/join factors of the build — file
  * SIZING needs only the right order of magnitude.
  */
object OptimizedWrite {

  private val MinFileBytes = 256L << 10
  private val MaxFileBytes = 128L << 20

  /** Session override for the derived target-file size (bytes): the
    * deployment knob for clusters whose core count or storage profile
    * makes the derived band wrong (and the test seam for pinning
    * multi-file layouts on tiny fixtures). Unset = the adaptive rule. */
  val TargetFileBytesKey = "spark.graft.write.targetFileBytes"

  /** Sum of the frame's leaf-relation size estimates, bytes. */
  def leafBytes(df: DataFrame): Long = {
    val total = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    if (total > BigInt(Long.MaxValue)) Long.MaxValue else total.toLong
  }

  /** Partition count for a batch materialization write of `df`. */
  def targetPartitions(df: DataFrame): Int = {
    val bytes = leafBytes(df)
    val p = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val target = df.sparkSession.conf.getOption(TargetFileBytesKey)
      .map(v => math.max(1L, v.toLong))
      .getOrElse(math.min(MaxFileBytes,
        math.max(MinFileBytes, bytes / (2L * p))))
    val n = math.ceil(bytes.toDouble / target.toDouble)
    math.max(1, math.min(n, 1 << 20).toInt)
  }
}
