package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.streaming.Trigger

import graft.dq.{Action, Expectation, Expectations}

/** Declarative dataset registry + runner — the engine's DLT analogue.
  *
  * The reference wires its medallion layers through named datasets with
  * implicit dependencies (`dlt.read_stream("live.silver_orders")`,
  * `LIVE.silver_order_payments`; SURVEY.md §2.8 "Orchestration") and
  * per-table quality expectations. Here a [[Dataset]] declares its name,
  * upstream names, expectations, and a build function from resolved
  * upstreams; [[Pipeline.run]] topologically orders the graph, enforces
  * expectations (warn logs / fail throws / drop filters — the
  * `@dlt.expect*` triad), and materializes according to [[Materialize]]:
  *
  *  - View: kept lazy (DLT `@dlt.view` staging views, S2/S4);
  *  - Table: the streaming-table analogue (S3). A STREAMING build runs
  *    through `writeStream.toTable` with Trigger.AvailableNow and a
  *    per-table checkpoint, so re-runs process only files the source
  *    checkpoint has not seen — exactly-once incremental append, the
  *    DLT streaming-table contract. A BATCH build cannot carry source
  *    progress, so it degrades to full refresh (overwrite) rather than
  *    blind append — re-running the pipeline never duplicates rows
  *    either way;
  *  - MaterializedView: full refresh via overwrite `saveAsTable`
  *    (`CREATE OR REFRESH MATERIALIZED VIEW`, S7); rejects streaming
  *    builds (a refresh is a batch recomputation by definition).
  *
  * Scale: the runner only sequences Spark actions — all data movement is
  * Spark jobs; a 1000-executor run behaves identically. Writes go
  * through the session catalog so downstream `spark.table` (S5/S6)
  * resolves 2/3-part names.
  */
/** @param clusterBy the open-source stand-in for the reference's liquid
  *   clustering (`fact_order_items.sql:9 CLUSTER BY`): materialized
  *   output is range-repartitioned and sorted within partitions on these
  *   columns, so rows with nearby keys co-locate in the same files and
  *   min/max file statistics prune reads — the parquet analogue of Delta
  *   data skipping. Layout-only: values are unchanged.
  */
final case class Dataset(
    name: String,
    deps: Seq[String],
    build: (SparkSession, Map[String, DataFrame]) => DataFrame,
    expectations: Seq[Expectation] = Nil,
    materialize: Materialize = Materialize.View,
    clusterBy: Seq[String] = Nil)

sealed trait Materialize
object Materialize {
  case object View extends Materialize
  case object Table extends Materialize
  case object MaterializedView extends Materialize
}

final class PipelineCycleException(msg: String) extends RuntimeException(msg)

class Pipeline {
  private val datasets = mutable.LinkedHashMap.empty[String, Dataset]

  def register(d: Dataset): this.type = {
    require(!datasets.contains(d.name), s"duplicate dataset ${d.name}")
    datasets += d.name -> d
    this
  }

  /** Dataset-factory loop over a name list — the reference's bronze
    * table factory (`scripts/bronze/bronze_ingestion.py:35-53`, S2).
    */
  def registerAll(names: Seq[String])(f: String => Dataset): this.type = {
    names.foreach(n => register(f(n)))
    this
  }

  /** Topological order with deterministic tie-break (registration
    * order); throws on cycles or unknown deps.
    */
  def topoOrder: Seq[String] = {
    val indeg = mutable.LinkedHashMap.from(datasets.map { case (n, d) =>
      d.deps.foreach(dep => require(datasets.contains(dep),
        s"dataset $n depends on unregistered $dep"))
      n -> d.deps.size
    })
    val order = mutable.ArrayBuffer.empty[String]
    val ready = mutable.Queue.from(indeg.collect { case (n, 0) => n })
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      order += n
      datasets.values.filter(_.deps.contains(n)).foreach { d =>
        indeg(d.name) -= 1
        if (indeg(d.name) == 0) ready += d.name
      }
    }
    if (order.size != datasets.size)
      throw new PipelineCycleException(
        s"cycle among: ${datasets.keySet.diff(order.toSet).mkString(", ")}")
    order.toSeq
  }

  /** Per-table stream checkpoint under the session warehouse — survives
    * across runs, which is exactly what makes Table re-runs idempotent.
    */
  private def checkpointDir(spark: SparkSession, name: String): String =
    spark.conf.get("spark.sql.warehouse.dir") + s"/_graft_checkpoints/$name"

  /** Batch-id marker directory for streaming Table appends — see the
    * Table case in [[run]].
    */
  private def commitsDir(spark: SparkSession, name: String): String =
    checkpointDir(spark, name) + "_commits"

  private def dropOrphanLocation(spark: SparkSession, name: String): Unit =
    graft.core.CatalogUtil.dropOrphanLocation(spark, name,
      Seq(checkpointDir(spark, name), commitsDir(spark, name)))

  /** Apply the CLUSTER BY layout (see [[Dataset.clusterBy]]). */
  private def clustered(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df
    else df.repartitionByRange(cols.map(df.col): _*)
      .sortWithinPartitions(cols.map(df.col): _*)

  /** Batch frames enforce all expectations up front; streaming frames can
    * only apply Drop (a plan-level filter) in flight — warn/fail are
    * enforced per micro-batch inside the Table sink's foreachBatch,
    * before each append commits (see [[run]]).
    */
  private def applyExpectations(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    if (exps.isEmpty) df
    else if (!df.isStreaming) Expectations.enforce(df, exps)
    else exps.filter(_.action == Action.Drop).foldLeft(df) { (acc, r) =>
      acc.filter(coalesce(r.predicate, lit(false)))
    }

  /** Build every dataset in dependency order; returns name -> DataFrame
    * (materialized datasets are re-read from the catalog so downstream
    * consumers see the committed table).
    */
  def run(spark: SparkSession): Map[String, DataFrame] = {
    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    topoOrder.foreach { name =>
      val d = datasets(name)
      val upstream = d.deps.map(dep => dep -> built(dep)).toMap
      val df = applyExpectations(d.build(spark, upstream), d.expectations)
      val out = d.materialize match {
        case Materialize.View => df
        case Materialize.Table if df.isStreaming =>
          dropOrphanLocation(spark, name)
          // Warn/fail expectations need an aggregate, which a streaming
          // plan cannot host — so each micro-batch is validated inside
          // foreachBatch BEFORE its append (DLT's ON VIOLATION FAIL
          // UPDATE aborts the update): a Fail violation throws before
          // any write, the source checkpoint does not advance, and a
          // re-run reprocesses exactly the offending files; warn counts
          // are per-batch, never re-counting history. Appends stay
          // idempotent across re-runs via a batch-id marker written
          // after each successful append (the standard foreachBatch
          // dedup pattern; like any non-transactional sink, a crash in
          // the instant between append and marker can duplicate that
          // one batch on replay).
          val warnFail = d.expectations.filter(_.action != Action.Drop)
          val hconf = spark.sparkContext.hadoopConfiguration
          val commits = new org.apache.hadoop.fs.Path(commitsDir(spark, name))
          // Markers are only meaningful RELATIVE to their checkpoint's
          // batch numbering. If the checkpoint was reset (dir deleted)
          // while the commits dir survived, batch ids restart at 0 and a
          // stale marker would silently swallow a legitimately new batch
          // — so a missing checkpoint always clears the markers with it.
          val ckpt = new org.apache.hadoop.fs.Path(checkpointDir(spark, name))
          if (!ckpt.getFileSystem(hconf).exists(ckpt)) {
            val cfs = commits.getFileSystem(hconf)
            if (cfs.exists(commits)) cfs.delete(commits, true)
          }
          val q = df.writeStream
            .option("checkpointLocation", checkpointDir(spark, name))
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: DataFrame, batchId: Long) =>
              Expectations.enforce(batch, warnFail)
              val fs = commits.getFileSystem(hconf)
              val marker = new org.apache.hadoop.fs.Path(commits, batchId.toString)
              if (!fs.exists(marker)) {
                clustered(batch, d.clusterBy)
                  .write.mode("append").format("parquet").saveAsTable(name)
                fs.mkdirs(marker)
              }
              ()
            }
            .start()
          q.awaitTermination()
          spark.table(name)
        case Materialize.Table =>
          dropOrphanLocation(spark, name)
          clustered(df, d.clusterBy)
            .write.mode("overwrite").format("parquet").saveAsTable(name)
          spark.table(name)
        case Materialize.MaterializedView =>
          require(!df.isStreaming,
            s"materialized view $name cannot refresh from a streaming build")
          dropOrphanLocation(spark, name)
          clustered(df, d.clusterBy)
            .write.mode("overwrite").format("parquet").saveAsTable(name)
          spark.table(name)
      }
      built += name -> out
    }
    built.toMap
  }
}
