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

  /** Commit `batch` as the table's next version iff `batchId` has not
    * already been committed (idempotent under micro-batch replay).
    * Returns true when a commit happened. Intended as a foreachBatch
    * body: `.foreachBatch((b, id) => SnapshotSink.append(spark, tbl,
    * id, b))`.
    *
    * Batch ids are only meaningful relative to ONE checkpoint's
    * numbering (they restart at 0 if the checkpoint is reset) — a reset
    * must recreate the table too, exactly as Delta documents for its
    * txn-version idempotence.
    */
  def append(spark: SparkSession, table: String, batchId: Long,
      batch: DataFrame): Boolean = {
    if (lastBatchId(spark, table) >= batchId) return false
    SnapshotCommit.commit(spark, table) { stage =>
      // 1. The batch's own rows (part names embed a job UUID — they can
      //    never collide with carried names).
      batch.write.mode("overwrite").parquet(stage)
      // 2. Carry the previous version's files, resolved INSIDE the
      //    closure (the rebase contract: a lost claim re-invokes
      //    against the winner's version).
      val stageP = new Path(stage)
      SnapshotCommit.currentLocation(spark, table).foreach { prev =>
        SnapshotCommit.listData(spark, prev).foreach { case (n, phys) =>
          SnapshotCommit.carry(spark, phys, new Path(stageP, n))
        }
        // The skipping sidecar (if the table was seeded via
        // commitWithStats) rides along: carried files reuse rows, the
        // batch's new files get footer stats.
        graft.storage.StatsSkipping.refreshStats(spark, prev, stageP)
      }
      // 3. The progress marker, atomic WITH the rows it covers.
      val fs = stageP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(stageP, BatchIdFile), false)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
    true
  }
}
