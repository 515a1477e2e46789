package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness-provided parquet tables (TESTDATA.md).
  *
  * The scale-factor directory is passed per call (the driver invokes each
  * query as `(spark, sfDir) => DataFrame`), so nothing here caches paths.
  * Reads are plain parquet scans: Catalyst pushes filters/projections down
  * to the scan, so callers should NOT pre-materialize or cache — compose
  * lazily and let the optimizer prune.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-JVM memo of INFERRED SCHEMAS, keyed by (path, length, mtime):
    * every bare `spark.read.parquet` runs a footer-reading schema-
    * inference JOB before the query proper — ~30-80 ms of scheduler
    * round-trip per table load, paid again by every one of the ~230
    * catalog entries (profiled as the `mapPartitions>parallelize` job
    * leading every entry). The first load of a generation infers; later
    * loads pass the schema explicitly, which skips inference entirely.
    * Metadata only — never rows — and the (length, mtime) key drops the
    * memo the moment the file is regenerated, so staleness is
    * impossible. The same memo Spark itself keeps per-session for
    * catalog tables; these are bare-path reads, which have none.
    */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    spark.read.schema(memoSchema(spark, path)).parquet(path)
  }

  private def memoSchema(spark: SparkSession,
      path: String): org.apache.spark.sql.types.StructType = {
    val p = new org.apache.hadoop.fs.Path(path)
    val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p)
    schemaMemo.computeIfAbsent(
      (path, st.getLen, st.getModificationTime),
      _ => spark.read.parquet(path).schema)
  }

  /** Normalizes `events.ts` to session-zoned TimestampType whatever the
    * parquet physical type is. Generators have shipped it as TIMESTAMP(NANOS)
    * (which Spark 4 refuses to map to TimestampType — read as long via the
    * legacy conf, floor-divide to µs, matching DuckDB's ns→µs truncation)
    * and as TIMESTAMP(MICROS) NTZ (cast; session tz is UTC so the micros
    * value is preserved bit-for-bit). Pure per-row expression either way:
    * codegen'd, no perf impact at scale.
    */
  private def eventsNorm(spark: SparkSession, sfDir: String): DataFrame = {
    // Set-if-needed, not set-always: repeated writes to session conf from
    // a library are racy against concurrent readers of the same session.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Same schema memo as load(): the inference here runs UNDER the
    // nanosAsLong conf just set, so the memoized schema is the one this
    // reader requires (ts as LongType for NANOS generations).
    val path = s"$sfDir/events.parquet"
    normalizeTs(spark.read.schema(memoSchema(spark, path)).parquet(path))
  }

  /** Normalize the generator's `ts` column to session-tz TIMESTAMP —
    * the ONE place that knows the generator's physical encodings, shared
    * by the batch reader above and the streaming reader
    * (graft.streaming.Streams.eventsStream) so the two paths can never
    * silently diverge on a new generation. Fails fast on an encoding it
    * does not recognize instead of letting an un-normalized column reach
    * distant query sites.
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // nanos read as long under the legacy conf
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw // MICROS adjusted-to-UTC: already right
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other — teach " +
          "Tables.normalizeTs the new generator encoding")
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsNorm(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
