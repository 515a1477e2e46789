package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.storage.SnapshotCommit

/** TRANSACTIONAL streaming sink: each micro-batch commits as ONE atomic
  * [[SnapshotCommit]] version — new files written, the previous
  * version's files carried (hard link / manifest ref, zero data IO),
  * and the batch id recorded in a `_batchid` sidecar INSIDE the version
  * directory, so the data and its progress marker publish together
  * under the single pointer rename.
  *
  * Why this is stronger than the foreachBatch marker pattern (the
  * Pipeline streaming Table arm, and every non-transactional sink): the
  * marker pattern has a documented gap — a crash in the instant BETWEEN
  * the append and the marker write duplicates that batch on replay.
  * Here there is no instant between them: the batch's rows and its id
  * are the same atomic commit, so a replayed batch (checkpoint behind
  * the sink) is recognized by [[lastBatchId]] and skipped, and a batch
  * whose commit never landed left no partial state — EXACTLY-ONCE into
  * a queryable, time-travelable table, the Delta streaming-sink
  * contract (idempotent writes keyed on (checkpoint, batchId)).
  *
  * Scale: per-batch cost = the batch's own files + O(existing files)
  * directory entries (links) or metadata refs (manifest mode — the
  * object-store shape); the data bytes of prior batches never move.
  * Long streams should interleave [[graft.storage.Optimize.compact]]
  * (which preserves DV masks and stats sidecars) to keep the file count
  * bounded — the same OPTIMIZE cadence Delta streaming tables need.
  */
object SnapshotSink {

  private val BatchIdFile = "_batchid"

  /** The batch id recorded by the CURRENT version's commit, -1 before
    * any batch. */
  def lastBatchId(spark: SparkSession, table: String): Long =
    SnapshotCommit.currentLocation(spark, table).map { dir =>
      val p = new Path(dir, BatchIdFile)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) -1L
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    }.getOrElse(-1L)

  /** Control-flow signal: the closure found `batchId` already committed
    * at the CURRENT version (a concurrent/zombie writer, or a replay
    * that raced this call) — the append must become a no-op, not a
    * duplicate version. */
  private final class AlreadyCommitted extends RuntimeException

  /** Commit `batch` as the table's next version iff `batchId` has not
    * already been committed (idempotent under micro-batch replay).
    * Returns true when a commit happened. Intended as a foreachBatch
    * body: `.foreachBatch((b, id) => SnapshotSink.append(spark, tbl,
    * id, b))`.
    *
    * The idempotence check runs INSIDE the commit closure, against the
    * version the claim will validate: two writers racing the same
    * batchId (a failed-over driver's zombie and its replacement — the
    * Delta txn-id scenario) cannot both land it, because the loser's
    * closure re-invokes against the winner's version, re-reads the
    * marker, and aborts. A pre-check outside the closure would leave
    * exactly that window open.
    *
    * Batch ids are only meaningful relative to ONE checkpoint's
    * numbering (they restart at 0 if the checkpoint is reset) — a reset
    * must recreate the table too, exactly as Delta documents for its
    * txn-version idempotence.
    */
  def append(spark: SparkSession, table: String, batchId: Long,
      batch: DataFrame): Boolean = {
    if (lastBatchId(spark, table) >= batchId) return false // fast path
    try {
      SnapshotCommit.commit(spark, table,
        operation = "STREAMING UPDATE") { stage =>
        // Re-checked per attempt against the then-current version (see
        // the scaladoc): a rebased retry after losing the claim to a
        // concurrent writer of this same batch must abort, not
        // re-append.
        if (lastBatchId(spark, table) >= batchId)
          throw new AlreadyCommitted
        // 1. The batch's own rows (part names embed a job UUID — they
        //    can never collide with carried names).
        batch.write.mode("overwrite").parquet(stage)
        val stageP = new Path(stage)
        val fs =
          stageP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // The batch's fresh basenames, captured BEFORE the carry — the
        // change-axis stamp below names them so table_changes (and the
        // streaming change feed) serve this micro-batch as inserts,
        // exactly what Delta's CDF does for streaming writes.
        val appended = SnapshotCommit.listData(spark, stageP).map(_._1)
        // 2. Carry the previous version's files, resolved INSIDE the
        //    closure (the rebase contract); the deletion-vector
        //    sidecar re-stamps fresh below (every delete coordinate
        //    kept — an append must never resurrect rows a DV delete
        //    masked), and the skipping sidecar refreshes (carried
        //    files reuse rows, new files get footer stats).
        SnapshotCommit.currentLocation(spark, table).foreach { prev =>
          SnapshotCommit.carryData(spark, prev, stageP)
          graft.storage.StatsSkipping.refreshStats(spark, prev, stageP)
        }
        // An EMPTY FIRST batch can leave a version with zero data
        // files, which is unreadable in manifest mode (readData
        // requires paths) — guarantee one schema-bearing file. AFTER
        // the carry, so a later empty batch whose carried files
        // already make the version readable adds nothing (an
        // every-empty-batch filler would compound through carryData
        // into unbounded file growth).
        if (SnapshotCommit.listData(spark, stageP).isEmpty)
          spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              batch.schema)
            .repartition(1).write.mode("append").parquet(stage)
        // Stamp the CHANGE AXIS (r17): one version per micro-batch,
        // `_add:` sentinels naming the batch's files — the same stamp
        // INSERT INTO writes, so the CDC surface answers for streaming
        // appends instead of failing loudly on an unknown operation.
        // Every existing delete coordinate is kept (stampVersion's
        // contract), replacing the previous physical _dv carry.
        graft.storage.DeletionVectors.stampVersion(spark, table,
          stageP, op = "WRITE", added = appended)
        // 3. The progress marker, atomic WITH the rows it covers.
        val out = fs.create(new Path(stageP, BatchIdFile), false)
        try out.write(batchId.toString.getBytes("UTF-8"))
        finally out.close()
      }
      // Re-point the <table>__dv registration at the published
      // version's freshly-stamped sidecar (the DML realign contract).
      graft.storage.DeletionVectors.realign(spark, table)
      true
    } catch { case _: AlreadyCommitted => false }
  }
}
