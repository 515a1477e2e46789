package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for CPU-heavy per-row operators.
  *
  * Single-row-group parquet files are unsplittable: a scan's task count
  * is bounded by its file count no matter how small
  * `spark.sql.files.maxPartitionBytes` goes, and every narrow stage
  * downstream inherits that bound. For operators whose per-row work
  * dwarfs the row's bytes (shingle sets, MinHash signatures, tokenizer
  * passes, vector kernels) this serializes the cluster: the bytes say
  * "one task", the compute says "use every core" — the guide's
  * unsplittable-input case (§2.5), fixed by repartitioning immediately
  * after the read.
  *
  * [[widen]] applies that fix SCALE-ADAPTIVELY: it round-robin
  * repartitions to the default parallelism only when the frame's leaf
  * bytes could not fill the cluster at the session's
  * `maxPartitionBytes` — i.e. exactly when the scan is
  * parallelism-starved. A production-scale input (leaf bytes >>
  * cores x maxPartitionBytes) takes the no-op branch, so no extra
  * exchange is ever paid where the scan already parallelizes.
  */
object Parallelism {

  /** `df`, repartitioned to default parallelism iff its leaf bytes
    * cannot yield that many scan splits.
    *
    * Limits (measured, r17): deterministic FILTERS above the widen are
    * pushed below the new exchange with their expressions inlined, so a
    * caller whose heavy kernels live in filter predicates (c8's gate
    * chain) gains nothing — the kernels ride the filter back into the
    * one-task map side. A nondeterministic pushdown barrier was tried
    * and measured strictly worse (it blocks column pruning and splits
    * codegen, costing more than the parallelism returns at bench
    * scale). widen() therefore targets operators whose expansion work
    * sits in PROJECT/GENERATE position above the exchange — shingle
    * explodes, signature kernels — where pushdown cannot sink it. */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(1, spark.sparkContext.defaultParallelism)
    val maxPart = math.max(1L,
      spark.sessionState.conf.filesMaxPartitionBytes)
    val splits = graft.storage.OptimizedWrite.leafBytes(df) / maxPart
    if (splits < p)
      df.repartition(p)
    else df
  }
}
