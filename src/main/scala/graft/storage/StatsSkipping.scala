package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-level min/max data skipping — the engine's analogue of
  * Delta's per-file stats in the transaction log (and Iceberg's
  * manifest column bounds): at commit time, record each data file's
  * min/max for chosen columns in a `_stats` sidecar INSIDE the version
  * directory; at read time, intersect the predicate's range with the
  * recorded bounds and hand Spark ONLY the surviving files.
  *
  * Why this matters at 100 TB when parquet footers already carry
  * min/max: footer-based skipping still OPENS every file (one object-
  * store GET per footer — at a million files, a million round-trips
  * before the first row). Manifest stats cost one sidecar read for the
  * whole table; with a range-clustered layout (b2/b9's write-side
  * investment) a point/range query plans a file list proportional to
  * the QUERY, not the table. The sidecar is written into the staged
  * directory, so it versions, publishes, and travels with its snapshot
  * atomically — no separate consistency protocol.
  *
  * Pruning is CONSERVATIVE: a file missing from the sidecar (e.g. a
  * carried ref in manifest mode, whose stats the carry did not
  * recompute) is always read. Nulls: stats here are recorded for
  * non-null-min/max (Spark's min/max ignore nulls), so a file of only
  * nulls records no row and is conservatively read.
  */
object StatsSkipping {

  private val StatsFile = "_stats"

  /** Commit through [[SnapshotCommit.commit]], then append a per-file
    * min/max sidecar for `statsCol` covering every parquet file the
    * writer produced in the staged directory. Stats key on the file
    * BASENAME — the stage directory is renamed to `v<N>` at publish,
    * so absolute paths recorded at stage time would dangle.
    *
    * Stats come from the parquet FOOTERS the writer just produced
    * (metadata-only I/O, the rowGroupRanges pattern) — never a second
    * scan of the data: file min/max is the row groups' min of mins /
    * max of maxes. A file whose column chunks carry no usable stats
    * (e.g. an all-null column) writes NO sidecar line, which the
    * reader treats as "always read" — the conservative contract.
    */
  def commitWithStats(spark: SparkSession, table: String, statsCol: String)(
      write: String => Unit): Path =
    SnapshotCommit.commit(spark, table) { stage =>
      write(stage)
      import scala.jdk.CollectionConverters._
      val hconf = spark.sparkContext.hadoopConfiguration
      val stageP = new Path(stage)
      val fs = stageP.getFileSystem(hconf)
      val lines = fs.listStatus(stageP).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .flatMap { st =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(st.getPath, hconf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val ranges = reader.getFooter.getBlocks.asScala.toSeq
              .flatMap { block =>
                block.getColumns.asScala
                  .find(_.getPath.toDotString == statsCol)
                  .map(_.getStatistics)
                  // hasNonNullValue false = all-null or stats-less
                  // chunk: no range to record for this block.
                  .filter(s => !s.isEmpty && s.hasNonNullValue)
                  .map(s => (s.genericGetMin.toString.toLong,
                    s.genericGetMax.toString.toLong))
              }
            if (ranges.isEmpty) None
            else Some(s"${st.getPath.getName}\t${ranges.map(_._1).min}" +
              s"\t${ranges.map(_._2).max}")
          } finally reader.close()
        }.sorted.mkString("", "\n", "\n")
      val p = new Path(stage, StatsFile)
      val out = p.getFileSystem(hconf).create(p, false)
      try out.write(lines.getBytes("UTF-8")) finally out.close()
    }

  /** The file list a range predicate `lo <= statsCol <= hi` needs:
    * every data file whose recorded [min, max] intersects [lo, hi],
    * plus (conservatively) any file without a stats row.
    */
  private[graft] def survivingFiles(spark: SparkSession, table: String,
      lo: Long, hi: Long): Seq[Path] = {
    val v = SnapshotCommit.register(spark, table).getOrElse(
      sys.error(s"$table has no published version"))
    val dir = SnapshotCommit
      .resolveDir(spark, table, v)
      .getOrElse(sys.error(s"$table v$v has no directory"))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats: Map[String, (Long, Long)] = {
      val p = new Path(dir, StatsFile)
      if (!fs.exists(p)) Map.empty
      else {
        val in = fs.open(p)
        val txt =
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        txt.split("\n").filter(_.nonEmpty).map { l =>
          val Array(name, mn, mx) = l.split("\t")
          name -> (mn.toLong, mx.toLong)
        }.toMap
      }
    }
    SnapshotCommit.listData(spark, dir).collect {
      case (name, path) if stats.get(name)
        .forall { case (mn, mx) => mx >= lo && mn <= hi } => path
    }
  }

  /** Range read through the stats prune. The predicate is RE-APPLIED on
    * the surviving files — stats only skip, they never filter rows.
    */
  def readRange(spark: SparkSession, table: String, statsCol: String,
      lo: Long, hi: Long): DataFrame = {
    val files = survivingFiles(spark, table, lo, hi)
    // An empty survivor set is a legal answer (no file intersects);
    // Spark still needs a schema, so serve the table's empty limit.
    val base =
      if (files.isEmpty) SnapshotCommit.readData(spark, table).limit(0)
      else spark.read.parquet(files.map(_.toString): _*)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }
}
