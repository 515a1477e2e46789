package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process arbitration for a version-pointer claim — the pluggable
  * seam that finishes [[SnapshotCommit]]'s multi-writer story on stores
  * whose rename is NOT atomic-no-clobber.
  *
  * [[SnapshotCommit.claimPointer]] publishes version N by materializing
  * the pointer file `_commits/<N>` exclusively: exactly one of any number
  * of racing writers may succeed. How exclusivity is obtained depends on
  * the store:
  *
  *  - local / HDFS / ABFS: rename-to-destination fails when the
  *    destination exists, so the rename IS the lock ([[RenameCommitLock]],
  *    the default — zero extra round trips);
  *  - S3-semantics stores (no atomic rename): the check-then-put must be
  *    serialized through an EXTERNAL mutual-exclusion service — exactly
  *    what delta-io's S3DynamoDBLogStore does with a DynamoDB table.
  *    Implement this trait over that service (acquire, check-put,
  *    release) and install it with [[SnapshotCommit.setCommitLock]].
  *    [[FileLockCommitLock]] is the in-repo reference implementation:
  *    an OS-level `java.nio.channels.FileLock` on a per-table lock file
  *    plays the lock-service role on any filesystem with POSIX advisory
  *    locks, and the concurrency spec runs the full forced-rendezvous
  *    suite under it to prove the seam carries the same guarantees.
  *
  * CONTRACT: `claim(fs, dst, content)` returns true iff this call
  * transitioned `dst` from absent to present with `content`; false if
  * `dst` already existed (another writer won). It must never clobber an
  * existing pointer and must never return true for more than one of any
  * set of concurrent callers, across processes.
  */
trait CommitLock {
  def claim(fs: FileSystem, dst: Path, content: String): Boolean
}

/** Default arbitration: write a writer-private temp file, then
  * no-clobber-rename it to the pointer name. Atomic wherever rename
  * refuses an existing destination (local via nio's no-replace move,
  * HDFS natively, ABFS — where the reference actually runs,
  * `scripts/bronze/bronze_ingestion.py:21`).
  */
object RenameCommitLock extends CommitLock {
  def claim(fs: FileSystem, dst: Path, content: String): Boolean = {
    val tmp = new Path(dst.getParent,
      s".${dst.getName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val won =
      if (fs.getScheme == "file")
        try {
          java.nio.file.Files.move(
            java.nio.file.Paths.get(tmp.toUri.getPath),
            java.nio.file.Paths.get(dst.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else !fs.exists(dst) && fs.rename(tmp, dst)
    if (!won) fs.delete(tmp, false)
    won
  }
}

/** Lock-service arbitration modeled with an OS file lock: serialize the
  * exists-check and pointer write under an exclusive
  * `java.nio.channels.FileLock` on `<commits>/_lock`, making the
  * check-then-act safe WITHOUT relying on rename atomicity — the shape a
  * production S3 deployment would give this trait over DynamoDB/ZooKeeper
  * (acquire, check, put, release). Local-filesystem only (advisory POSIX
  * locks); the concurrency spec uses it to prove the [[CommitLock]] seam
  * preserves exclusivity under forced writer rendezvous.
  */
object FileLockCommitLock extends CommitLock {

  /** In-JVM serialization per lock file: `FileChannel.lock` throws
    * `OverlappingFileLockException` (rather than blocking) when another
    * THREAD of this JVM holds the region, so threads queue on a local
    * monitor first and only the head of the queue contends the OS lock
    * against other processes. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def claim(fs: FileSystem, dst: Path, content: String): Boolean = {
    require(fs.getScheme == "file",
      "FileLockCommitLock needs POSIX advisory locks (local filesystem)")
    val lockFile = java.nio.file.Paths.get(
      new Path(dst.getParent, "_lock").toUri.getPath)
    val mutex = jvmLocks.computeIfAbsent(lockFile.toString, _ => new Object)
    mutex.synchronized {
      val ch = java.nio.channels.FileChannel.open(lockFile,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until exclusive across processes
        try {
          if (fs.exists(dst)) false
          else {
            // Temp-then-rename even under the lock: a crash mid-write of
            // the pointer itself must never leave a PARTIAL pointer at
            // the claimed name — it would block every later claimant of
            // this version while resolving to nothing. The rename needs
            // no atomicity guarantee here (the lock already serializes
            // the check-then-act); it only needs all-or-nothing
            // visibility of the content, which write-temp + rename gives
            // on any store.
            val tmp = new Path(dst.getParent,
              s".${dst.getName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
            val out = fs.create(tmp, true)
            try out.write(content.getBytes("UTF-8")) finally out.close()
            fs.rename(tmp, dst)
          }
        } finally lock.release()
      } finally ch.close()
    }
  }
}
