package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dataset, Materialize, Pipeline}
import graft.storage.{DeletionVectors, Optimize, SnapshotCommit}

/** Manifest carry mode (`spark.graft.snapshot.manifest = true`): version
  * N+1 references version N's unchanged files IN PLACE through
  * `.graftref` metadata files instead of hard links — the object-store
  * shape, where a link is impossible and a copy would be O(table). The
  * claims pinned here: carry cost is pure metadata (ref files are a few
  * bytes; physical files never move), resolution spans version
  * directories transparently (`spark.table` keeps working through the
  * re-registered view), the whole DV lifecycle (delete / time travel /
  * restore / vacuum / optimize) runs unchanged on top, crash replay
  * holds, and reference-counting GC never collects a file a retained
  * manifest still points at.
  */
class ManifestSnapshotSpec extends SparkSpec {

  private def withManifestMode[T](f: => T): T = {
    spark.conf.set("spark.graft.snapshot.manifest", "true")
    try f finally spark.conf.unset("spark.graft.snapshot.manifest")
  }

  private def hfs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def incPipe(name: String, src: org.apache.spark.sql.DataFrame,
      cluster: Seq[String] = Nil): Pipeline =
    new Pipeline().register(Dataset(name, Nil, (_, _) => src,
      materialize = Materialize.Incremental(Seq("k")),
      clusterBy = cluster))

  test("incremental merge carries unchanged files as pure metadata refs") {
    // Target-file override pins the size-derived fan-out
    // (OptimizedWrite) to several files at test size.
    val coalesceKey = graft.storage.OptimizedWrite.TargetFileBytesKey
    val saved = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "200")
    try withManifestMode {
      val tbl = "man_inc_tbl"
      SnapshotCommit.destroy(spark, tbl)
      incPipe(tbl, spark.range(0, 100)
        .select(col("id").as("k"), (col("id") * 10).as("v")),
        cluster = Seq("k")).run(spark)
      val v1 = SnapshotCommit.currentLocation(spark, tbl).get
      val v1Files = SnapshotCommit.listData(spark, v1)
      assert(v1Files.size >= 2, s"first load landed in ${v1Files.size} file")
      // merge updates the low range, inserts new keys
      incPipe(tbl, spark.range(0, 10)
        .select(col("id").as("k"), lit(-1L).as("v"))
        .unionByName(spark.range(100, 105)
          .select(col("id").as("k"), lit(7L).as("v"))),
        cluster = Seq("k")).run(spark)
      val after = spark.table(tbl)
      assert(after.count() === 105)
      assert(after.filter(col("k") < 10 && col("v") =!= -1L).count() === 0)
      assert(after.filter(col("k").between(10, 99)
        && col("v") =!= col("k") * 10).count() === 0)
      val cur = SnapshotCommit.currentLocation(spark, tbl).get
      val fs = hfs(cur)
      val refs = fs.listStatus(cur)
        .filter(_.getPath.getName.endsWith(SnapshotCommit.RefSuffix))
      assert(refs.nonEmpty, "no metadata refs in the merged version")
      // THE claim: carry cost is metadata, not data. Every ref is a few
      // bytes, and every referenced physical file lives OUTSIDE the new
      // version's directory, untouched in the version that wrote it.
      refs.foreach(r => assert(r.getLen < 512,
        s"ref ${r.getPath.getName} is ${r.getLen} bytes — not metadata"))
      val resolved = SnapshotCommit.listData(spark, cur)
      val carried = resolved.filter(_._2.getParent.toUri.getPath
        != cur.toUri.getPath)
      assert(carried.nonEmpty, "no file resolved outside the current dir")
      carried.foreach { case (_, phys) =>
        assert(fs.exists(phys), s"referenced file $phys missing") }
      // v1's physical files that the current manifest references were
      // NOT collected by the post-commit prune.
      assert(carried.exists(_._2.getParent.toUri.getPath
        == v1.toUri.getPath), "no carried file traces back to v1")
    } finally saved match {
      case Some(v) => spark.conf.set(coalesceKey, v)
      case None => spark.conf.unset(coalesceKey)
    }
  }

  test("DV lifecycle on manifest carries: delete, time travel, restore, vacuum") {
    withManifestMode {
      val tbl = "man_dv_tbl"
      Seq(tbl, s"${tbl}__dv").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      SnapshotCommit.destroy(spark, tbl)
      spark.range(0, 1000).select(col("id"), (col("id") * 3).as("payload"))
        .repartitionByRange(4, col("id"))
        .write.mode("overwrite").format("parquet").saveAsTable(tbl)
      val origDir = new org.apache.hadoop.fs.Path(
        spark.table(tbl).inputFiles.head).getParent
      def origListing(): Set[(String, Long)] = {
        val fs = hfs(origDir)
        fs.listStatus(origDir).filter(_.getPath.getName.endsWith(".parquet"))
          .map(s => (s.getPath.getName, s.getModificationTime)).toSet
      }
      val before = origListing()
      // v1 is range-LOCAL (only the lower files hold matches) so the
      // vacuum below must rewrite some files and carry the rest by ref.
      val del1 = col("id") % 10 === 0 && col("id") < 500
      val v1 = DeletionVectors.delete(spark, tbl, del1)
      val v2 = DeletionVectors.delete(spark, tbl, col("id") >= 900)
      assert((v1, v2) === (1L, 2L))
      // Adoption + both deletes reference the ORIGINAL files in place:
      // zero data bytes moved, names and mtimes untouched.
      assert(origListing() === before, "a manifest delete moved data files")
      val cur = SnapshotCommit.currentLocation(spark, tbl).get
      val fs = hfs(cur)
      val dataCopies = fs.listStatus(cur).filter(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      assert(dataCopies.isEmpty,
        s"current version holds data copies: ${dataCopies.map(_.getPath.getName).mkString(",")}")
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("id").collect().map(_.getLong(0)).toSet
      val all = (0L until 1000L).toSet
      def d1(i: Long) = i % 10 == 0 && i < 500
      assert(ids(DeletionVectors.read(spark, tbl))
        === all.filterNot(i => d1(i) || i >= 900))
      assert(ids(DeletionVectors.readAt(spark, tbl, v1))
        === all.filterNot(d1))
      assert(ids(DeletionVectors.readAt(spark, tbl, 0)) === all)
      // restore rolls back metadata-only
      DeletionVectors.restore(spark, tbl, v1)
      assert(ids(DeletionVectors.read(spark, tbl)) === all.filterNot(d1))
      assert(origListing() === before, "restore touched data files")
      // vacuum folds v1 physically: affected files rewritten as REAL
      // files in the new version, everything else still a ref; newer
      // deletes stay separable.
      val v3 = DeletionVectors.delete(spark, tbl, col("id") % 7 === 0)
      val liveBefore = ids(DeletionVectors.read(spark, tbl))
      DeletionVectors.vacuum(spark, tbl, cutoff = v1)
      assert(ids(DeletionVectors.read(spark, tbl)) === liveBefore,
        "vacuum changed the live view")
      assert(ids(DeletionVectors.readAt(spark, tbl, v1))
        === all.filterNot(d1), "floor state lost")
      val curV = SnapshotCommit.currentLocation(spark, tbl).get
      val rewritten = hfs(curV).listStatus(curV).filter(s =>
        s.isFile && s.getPath.getName.startsWith("vacuum-"))
      assert(rewritten.nonEmpty, "vacuum wrote no rewritten groups")
      assert(hfs(curV).listStatus(curV)
        .exists(_.getPath.getName.endsWith(SnapshotCommit.RefSuffix)),
        "vacuum copied untouched files instead of carrying refs")
      val v4 = DeletionVectors.delete(spark, tbl, col("id") === 1)
      assert(v4 === v3 + 1, "version chain broke across vacuum")
      assert(ids(DeletionVectors.read(spark, tbl)) === (liveBefore - 1L))
    }
  }

  test("optimize on manifest mode folds DVs and compacts into real files") {
    withManifestMode {
      val tbl = "man_opt_tbl"
      Seq(tbl, s"${tbl}__dv").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      SnapshotCommit.destroy(spark, tbl)
      spark.range(0, 5000)
        .select(col("id"), lpad(col("id").cast("string"), 64, "x").as("pad"))
        .repartition(8)
        .write.mode("overwrite").format("parquet").saveAsTable(tbl)
      DeletionVectors.delete(spark, tbl, col("id") % 5 === 0)
      val (nb, na) = Optimize.compact(spark, tbl)
      assert(nb === 8 && na < nb)
      assert(!spark.catalog.tableExists(s"${tbl}__dv"))
      assert(spark.table(tbl).count() === 4000)
      assert(spark.table(tbl).filter(col("id") % 5 === 0).count() === 0)
    }
  }

  test("declared delta.targetFileSize survives manifest mode and steers optimize") {
    withManifestMode {
      val tbl = "man_props_tbl"
      SnapshotCommit.destroy(spark, tbl)
      // Incompressible 64-hex values so the table carries real bytes
      // (~300 KB raw) and a small declared target forces a visible split.
      val src = spark.range(0, 5000).select(col("id").as("k"),
        sha2(col("id").cast("string"), 256).as("v"))
      new Pipeline().register(Dataset(tbl, Nil, (_, _) => src,
        materialize = Materialize.Incremental(Seq("k")),
        tableProperties = Map(
          Optimize.TargetFileSizeProp -> (16 * 1024).toString,
          "quality" -> "gold"))).run(spark)
      // The catalog entry is a temp view (no TBLPROPERTIES), but the
      // snapshot-root sidecar holds the declaration.
      assert(SnapshotCommit.properties(spark, tbl) ===
        Map(Optimize.TargetFileSizeProp -> "16384", "quality" -> "gold"))
      // No explicit size: compact must consult the sidecar — under the
      // pre-sidecar behavior (silent 128 MiB fallback) everything
      // collapses into ONE file; the declared 16 KiB target splits the
      // ~300 KB of data into many.
      val (_, na) = Optimize.compact(spark, tbl)
      assert(na >= 4,
        s"compacted to $na file(s) — the declared 16 KiB target was ignored")
      assert(spark.table(tbl).count() === 5000)
      // Property declarations merge like SET TBLPROPERTIES and survive
      // further versions.
      SnapshotCommit.setProperties(spark, tbl, Map("quality" -> "platinum"))
      assert(SnapshotCommit.properties(spark, tbl) ===
        Map(Optimize.TargetFileSizeProp -> "16384", "quality" -> "platinum"))
    }
  }

  test("concurrent merges under manifest carries: loser rebases through the view") {
    import java.util.concurrent.{CyclicBarrier, TimeUnit}
    import java.util.concurrent.atomic.AtomicInteger
    withManifestMode {
      val tbl = "man_conc_tbl"
      SnapshotCommit.destroy(spark, tbl)
      incPipe(tbl, spark.range(0, 20)
        .select(col("id").as("k"), (col("id") * 2).as("v"))).run(spark)
      val gate = new CyclicBarrier(2)
      val staged = new AtomicInteger(0)
      SnapshotCommit.failpoint = s =>
        if (s == "staged" && staged.incrementAndGet() <= 2) {
          gate.await(30, TimeUnit.SECONDS); ()
        }
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        val a = Future(incPipe(tbl, spark.range(0, 5)
          .select(col("id").as("k"), lit(-1L).as("v"))).run(spark))
        val b = Future(incPipe(tbl, spark.range(20, 25)
          .select(col("id").as("k"), lit(7L).as("v"))).run(spark))
        Await.result(Future.sequence(Seq(a, b)), Duration.Inf)
        pool.shutdown()
      } finally SnapshotCommit.failpoint = _ => ()
      // The loser's rebase resolved the winner's version THROUGH THE
      // MANIFEST (re-created temp view + ref-resolved physical paths):
      // both upserts present, untouched keys intact, serialized v3.
      val out = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.sizeIs == 25)
      assert((0L until 5L).forall(out(_) == -1L))
      assert((20L until 25L).forall(out(_) == 7L))
      assert((5L until 20L).forall(k => out(k) == k * 2))
      assert(SnapshotCommit.currentVersion(spark, tbl) === Some(3L))
      assert(staged.get() === 3)
    }
  }

  test("manifest registration staleness is detected ACROSS sessions: a " +
      "clone's old temp view never serves a superseded version") {
    // A manifest-mode table registers as a PER-SESSION temp view over the
    // resolved file set. The hazard: session B registered v1, session A
    // publishes v2 — B's view still points at v1's files and
    // `tableExists` alone would call it fresh. registrationFresh must
    // compare the view's root paths against the CURRENT version's file
    // set and force B down the rebuild path.
    withManifestMode {
      val tbl = "man_xsession_tbl"
      SnapshotCommit.destroy(spark, tbl)
      SnapshotCommit.commit(spark, tbl) { dir =>
        spark.range(0, 4).select(col("id"), lit("v1").as("gen"))
          .coalesce(1).write.parquet(dir)
      }
      val clone = spark.newSession()
      clone.conf.set("spark.graft.snapshot.manifest", "true")
      assert(SnapshotCommit.register(clone, tbl) === Some(1L))
      assert(clone.table(tbl).count() === 4)
      assert(SnapshotCommit.registrationFresh(clone, tbl, 1L),
        "clone should be fresh at v1 right after registering it")
      // v2 from the parent: one new file, v1's file carried as a ref.
      SnapshotCommit.commit(spark, tbl) { dir =>
        spark.range(4, 6).select(col("id"), lit("v2").as("gen"))
          .coalesce(1).write.parquet(dir)
        val d = new org.apache.hadoop.fs.Path(dir)
        SnapshotCommit.dataFiles(spark, tbl).zipWithIndex.foreach {
          case ((nm, phys), k) =>
            SnapshotCommit.carry(spark, phys,
              new org.apache.hadoop.fs.Path(d, s"c$k-$nm"))
        }
      }
      assert(!SnapshotCommit.registrationFresh(clone, tbl, 2L),
        "clone's v1 temp view passed as fresh for v2 — mere existence " +
          "is not version equality")
      assert(SnapshotCommit.register(clone, tbl) === Some(2L))
      assert(clone.table(tbl).count() === 6)
      assert(clone.table(tbl).filter(col("gen") === "v2").count() === 2)
      SnapshotCommit.destroy(spark, tbl)
    }
  }

  test("manifest fast path: an mtime-aliased cross-process rebuild is " +
      "rejected by the root incarnation nonce") {
    // The resolvedSets fast-path cache keys on (version, version-dir
    // mtime). Object-store mtimes are coarse: a table destroyed and
    // rebuilt BY ANOTHER PROCESS can land on the same version number
    // with an ALIASED mtime, and this JVM's destroy hook (which would
    // drop the cache entry) never ran. The stale cached file set then
    // matches the stale temp view and registrationFresh would serve the
    // dead incarnation's (deleted) files. The root `_incarnation` nonce
    // closes exactly that window. This test forces the alias with
    // fs.setTimes and builds the second incarnation with RAW filesystem
    // writes — the in-JVM commit()/destroy() paths would clear the
    // session state the hazard depends on.
    withManifestMode {
      val tbl = "man_mtime_alias_tbl"
      SnapshotCommit.destroy(spark, tbl)
      SnapshotCommit.commit(spark, tbl) { dir =>
        spark.range(0, 12).select(col("id"), lit("dead").as("gen"))
          .coalesce(1).write.parquet(dir)
      }
      assert(SnapshotCommit.register(spark, tbl) === Some(1L))
      assert(SnapshotCommit.registrationFresh(spark, tbl, 1L),
        "fresh right after registering v1 — this populates the cache")
      val root = SnapshotCommit.rootDir(spark, tbl)
      val fs = hfs(root)
      val v1dir = new org.apache.hadoop.fs.Path(root, "v1")
      val mtime1 = fs.getFileStatus(v1dir).getModificationTime
      // ANOTHER PROCESS destroys and rebuilds: raw fs delete (this JVM's
      // resolvedSets entry and temp view survive, as they would across
      // processes), then a hand-built v1 with different files, a fresh
      // incarnation nonce — and the version dir's mtime forced back to
      // the dead incarnation's.
      fs.delete(root, true)
      spark.range(0, 3).select(col("id"), lit("live").as("gen"))
        .coalesce(1).write.parquet(v1dir.toString)
      val ptr = fs.create(
        new org.apache.hadoop.fs.Path(root, "_commits/1"), false)
      try ptr.write("v1".getBytes("UTF-8")) finally ptr.close()
      val mk = fs.create(new org.apache.hadoop.fs.Path(root,
        SnapshotCommit.IncarnationMarker), false)
      try mk.write(java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
      finally mk.close()
      fs.setTimes(v1dir, mtime1, -1)
      assert(fs.getFileStatus(v1dir).getModificationTime === mtime1,
        "precondition: the rebuilt v1 dir must alias the dead mtime")
      assert(!SnapshotCommit.registrationFresh(spark, tbl, 1L),
        "an mtime-aliased rebuild passed the fast path — the stale " +
          "cached file set was served for the new incarnation")
      assert(SnapshotCommit.register(spark, tbl) === Some(1L))
      assert(spark.table(tbl).count() === 3)
      assert(spark.table(tbl).select("gen").distinct().collect()
        .map(_.getString(0)).toSeq === Seq("live"))
      SnapshotCommit.destroy(spark, tbl)
    }
  }

  test("manifest commits replay across crashes like link commits") {
    withManifestMode {
      val tbl = "man_crash_tbl"
      SnapshotCommit.destroy(spark, tbl)
      def state(): Map[Long, Long] = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      incPipe(tbl, spark.range(0, 50)
        .select(col("id").as("k"), (col("id") * 2).as("v"))).run(spark)
      assert(state().sizeIs == 50)
      SnapshotCommit.failpoint =
        s => if (s == "staged") throw new RuntimeException("injected")
      try intercept[RuntimeException](incPipe(tbl, spark.range(0, 5)
        .select(col("id").as("k"), lit(-1L).as("v"))).run(spark))
      finally SnapshotCommit.failpoint = _ => ()
      assert(state()(3L) === 6L, "pre-publish crash must keep the old version")
      SnapshotCommit.failpoint =
        s => if (s == "committed") throw new RuntimeException("injected")
      try intercept[RuntimeException](incPipe(tbl, spark.range(0, 5)
        .select(col("id").as("k"), lit(-1L).as("v"))).run(spark))
      finally SnapshotCommit.failpoint = _ => ()
      SnapshotCommit.register(spark, tbl) // replay: view over the new version
      assert(state()(3L) === -1L,
        "post-publish crash must surface the committed version after replay")
      incPipe(tbl, spark.range(50, 55)
        .select(col("id").as("k"), lit(9L).as("v"))).run(spark)
      assert(state().sizeIs == 55)
    }
  }

  test("stats sidecar under manifest carries: a DV delete's ref-carried " +
      "version keeps default-path pruning across version directories") {
    withManifestMode {
      import graft.storage.StatsSkipping
      val tbl = "m_stats_life_tbl"
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}__dv")
      SnapshotCommit.destroy(spark, tbl)
      StatsSkipping.commitWithStats(spark, tbl, "id") { stage =>
        spark.range(0, 8000).select(col("id"))
          .repartitionByRange(8, col("id")).sortWithinPartitions("id")
          .write.mode("overwrite").parquet(stage)
      }
      StatsSkipping.installRule(spark)
      def scanned(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.inputFiles
              .count(p => !p.contains("/_dv/") && !p.contains("__dv"))
        }.sum
      // A DV delete carries every data file as a .graftref into v2 —
      // the refreshed sidecar must key the REF names, and the rule must
      // prune even though the physical files live in v1 while the
      // logical file set resolves through the v2 manifest.
      DeletionVectors.delete(spark, tbl, col("id") % 10 === 0)
      val q = DeletionVectors.read(spark, tbl)
        .filter(col("id").between(100, 200))
      assert(scanned(q) < 8,
        "manifest-carried version shed its stats sidecar")
      assert(q.count() === 90L)
      // readRange (explicit API) masks the DV over the pruned refs too.
      assert(StatsSkipping.readRange(spark, tbl, "id", 100L, 200L)
        .count() === 90L)
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}__dv")
      SnapshotCommit.destroy(spark, tbl)
    }
  }

  test("SnapshotSink under manifest carries: a DV delete between " +
      "appends survives — the sidecar copies physically, never as refs") {
    withManifestMode {
      import graft.streaming.SnapshotSink
      val tbl = "m_snap_sink_tbl"
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}__dv")
      SnapshotCommit.destroy(spark, tbl)
      assert(SnapshotSink.append(spark, tbl, 0L,
        spark.range(0, 100).select(col("id"))))
      DeletionVectors.delete(spark, tbl, col("id") < 10)
      assert(SnapshotSink.append(spark, tbl, 1L,
        spark.range(100, 150).select(col("id"))))
      // The mask survived the append (a .graftref inside _dv would
      // break the __dv parquet registration or resurrect on prune).
      assert(DeletionVectors.read(spark, tbl).count() === 140L)
      assert(DeletionVectors.read(spark, tbl)
        .filter(col("id") < 10).count() === 0L)
      assert(SnapshotSink.lastBatchId(spark, tbl) === 1L)
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}__dv")
      SnapshotCommit.destroy(spark, tbl)
    }
  }

  test("clone in manifest mode: DV sidecar files COPY (the sidecar read " +
      "path cannot resolve .graftref pointers)") {
    withManifestMode {
      val src = "m_clone_src"; val dst = "m_clone_dst"
      Seq(src, dst).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS ${t}__dv")
        SnapshotCommit.destroy(spark, t)
      }
      SnapshotCommit.commit(spark, src) { dir =>
        spark.range(0, 40).select(col("id"), (col("id") * 3).as("v"))
          .coalesce(1).write.parquet(dir)
      }
      SnapshotCommit.register(spark, src)
      DeletionVectors.delete(spark, src, col("id") % 4 === 0)
      SnapshotCommit.clone(spark, src, dst)
      // The clone's _dv must hold REAL parquet (no .graftref text files)
      // or DeletionVectors' parquet-table registration over it fails.
      val dvDir = new org.apache.hadoop.fs.Path(
        SnapshotCommit.currentLocation(spark, dst).get, "_dv")
      val fs = hfs(dvDir)
      assert(fs.exists(dvDir), "clone lost the DV sidecar")
      assert(!fs.listStatus(dvDir).exists(
        _.getPath.getName.endsWith(".graftref")),
        "sidecar carried as unresolvable refs")
      val visible = DeletionVectors.read(spark, dst)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(visible === (0L until 40L).filterNot(_ % 4 == 0).toSet)
      Seq(src, dst).foreach(SnapshotCommit.destroy(spark, _))
    }
  }
}
