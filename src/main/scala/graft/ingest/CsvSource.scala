package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingestion — the engine's Auto Loader analogue (reference
  * `scripts/bronze/bronze_ingestion.py:20-32`): header, comma delimiter,
  * whitespace trimming, schema-given or inferred, and Auto Loader's
  * rescue semantics (`_rescued_data`).
  *
  * Rescue design: the file is parsed with an ALL-STRING schema (which
  * cannot fail per-field), structural problems (wrong token count /
  * unparseable line) are captured by PERMISSIVE mode's corrupt-record
  * column, and TYPE failures are detected by `try_cast` expressions in
  * the plan — `_rescued_data` becomes a JSON object of the columns whose
  * values could not be converted, exactly Auto Loader's shape.
  *
  * Why not cast inside the parser (typed schema + corrupt column): the
  * CSV parser only converts the columns a query REQUIRES, so with column
  * pruning a `count()` that filters on the rescue column never parses
  * the others and sees different rescues than a `show()` — the same
  * DataFrame returns different row sets under different projections
  * (observed on Spark 4.1; the columnPruning.enabled conf does not
  * restore full conversion). With try_cast in the plan, rescue is plan-
  * visible and projection-independent.
  *
  * Scale: file listing/splitting shards across executors; string-parse +
  * try_cast is a single pass inside WholeStageCodegen.
  */
object CsvSource {

  val RescueColumn = "_rescued_data"
  private val StructuralColumn = "_malformed_raw"

  /** One option set for BOTH batch and streaming readers (the two
    * reader types don't share an interface, so without this map the
    * streaming path hand-copied the options — a future addition to one
    * would silently not apply to the other and batch/stream parses of
    * the same file would diverge). */
  private val ReaderOptions = Map(
    "header" -> "true",
    "delimiter" -> ",",
    "ignoreLeadingWhiteSpace" -> "true",
    "ignoreTrailingWhiteSpace" -> "true")

  private def base(r: org.apache.spark.sql.DataFrameReader) =
    r.options(ReaderOptions)

  private def rawSchema(schema: StructType): StructType = StructType(
    schema.fields.map(f => StructField(f.name, StringType, nullable = true))
      :+ StructField(StructuralColumn, StringType, nullable = true))

  /** The rescue plan (shared by batch and streaming reads): type every
    * column with try_cast and fold conversion failures plus structural
    * failures into the JSON `_rescued_data` column. `extras` are columns
    * PRESENT IN THE DATA but absent from the declared schema (schema
    * drift under the rescue contract): their raw values always land in
    * the rescue JSON, never in the output schema.
    */
  private def rescueProject(raw: DataFrame, schema: StructType,
      extras: Seq[String] = Nil): DataFrame = {
    // Backticked references throughout: a bare col("user.id") parses
    // the dot as struct-field access and fails resolution, while the
    // try_cast expr below already quotes — the two halves of one
    // function must accept the same names.
    def rawCol(name: String): Column = col(s"`$name`")
    def typed(f: StructField): Column =
      if (f.dataType == StringType) rawCol(f.name)
      else expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})")

    // JSON map of {column -> raw value} for values that failed to cast
    // (raw non-null/non-empty but conversion null), plus any drifted
    // column's values wholesale.
    val failedEntries = schema.fields.filter(_.dataType != StringType).map { f =>
      lit(f.name) -> when(
        rawCol(f.name).isNotNull && rawCol(f.name) =!= "" && typed(f).isNull,
        rawCol(f.name))
    } ++ extras.map { name =>
      lit(name) -> when(rawCol(name).isNotNull && rawCol(name) =!= "",
        rawCol(name))
    }
    val failedMap = map_filter(
      map(failedEntries.flatMap { case (k, v) => Seq(k, v) }: _*),
      (_, v) => v.isNotNull)
    val rescue = coalesce(
      col(StructuralColumn),
      when(size(map_keys(failedMap)) > 0, to_json(failedMap)))

    raw.select(
      schema.fields.map(f => typed(f).as(f.name)) :+ rescue.as(RescueColumn): _*)
  }

  /** Schema-given batch read with rescue column. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    rescueProject(
      base(spark.read)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", StructuralColumn)
        .schema(rawSchema(schema))
        .csv(path),
      schema)

  /** Inference-mode batch read (bronze-style first contact). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    base(spark.read).option("inferSchema", "true").csv(path)

  /** Streaming read of a CSV directory (incremental bronze) with the SAME
    * rescue plan as the batch read — the Auto Loader analogue proper: new
    * files are discovered incrementally by the file source (checkpointed
    * when the sink provides a checkpointLocation), each parsed all-string
    * and typed via try_cast in the plan.
    */
  /** @param maxFilesPerTrigger bound on files ingested per micro-batch
    *   (0 = unbounded), mirroring Auto Loader's
    *   `cloudFiles.maxFilesPerTrigger`: at large directory counts an
    *   unbounded AvailableNow start ingests the whole backlog in one
    *   batch — one giant task wave, one checkpoint, restart-from-zero on
    *   failure. Bounding the trigger keeps batches (and their
    *   checkpointed progress) proportional to the knob, not the backlog.
    */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream
      .options(ReaderOptions)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", StructuralColumn)
      .schema(rawSchema(schema))
    val throttled =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    rescueProject(throttled.csv(path), schema)
  }

  /** The directory's files grouped by their EXACT header column
    * sequence (insertion-ordered; files name-sorted). Driver-side: one
    * first-line read per file — the same listing-scale metadata pass
    * Auto Loader's schema tracking performs; the result routes each
    * header generation to a parse with its own positional schema.
    */
  private def headerGroups(spark: SparkSession,
      path: String): Seq[(Seq[String], Seq[String])] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Same file set Spark's CSV reader consumes: every data file except
    // `_`/`.`-prefixed metadata — NOT just lowercase `*.csv` (a
    // `data.CSV` or extension-less file that read() parses fine must
    // not silently vanish from the conforming path).
    val files = fs.listStatus(p).filter(_.isFile).map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .sortBy(_.getName)
    val groups =
      scala.collection.mutable.LinkedHashMap.empty[Seq[String], Vector[String]]
    files.foreach { f =>
      val in = fs.open(f)
      try {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8"))
        val line = br.readLine()
        if (line != null && line.nonEmpty) {
          val header = splitHeader(line)
          groups(header) = groups.getOrElse(header, Vector.empty) :+ f.toString
        }
      } finally in.close()
    }
    groups.toSeq
  }

  /** RFC-4180-style split of ONE header line: the delimiter separates
    * only outside double quotes, doubled quotes inside a quoted field
    * unescape to one, surrounding quotes are stripped — matching the
    * column names the Spark CSV parser yields for the same header (a
    * naive split(",") kept the quotes and broke on quoted delimiters,
    * mis-grouping the file and folding the real column into the rescue
    * JSON as nulls). */
  private def splitHeader(line: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            cur += '"'; i += 1
          } else inQuotes = false
        } else cur += ch
      } else ch match {
        case '"' => inQuotes = true
        case ',' => out += cur.result().trim; cur.clear()
        case c => cur += c
      }
      i += 1
    }
    out += cur.result().trim
    out.toSeq
  }

  /** Parse the directory as header-homogeneous file GROUPS — each group
    * gets a positional raw schema built from ITS OWN header — then
    * conform every group to `schema`: columns a group lacks read as
    * null, columns it carries beyond `schema` fold into `_rescued_data`
    * (the rescue contract). Header-driven routing means drift needs no
    * append-only discipline: added, reordered, or removed columns all
    * conform.
    */
  private def readConforming(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val known = schema.fieldNames.toSet
    val groups = headerGroups(spark, path)
    // No groups (empty directory, or every file headerless/empty): the
    // declared-schema rescue read handles whatever Spark can see —
    // reduce on an empty Seq would throw instead of returning the data.
    if (groups.isEmpty) return read(spark, path, schema)
    groups.map { case (header, files) =>
      val rawS = StructType(
        header.map(StructField(_, StringType, nullable = true))
          :+ StructField(StructuralColumn, StringType, nullable = true))
      val raw = base(spark.read)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", StructuralColumn)
        .schema(rawS).csv(files: _*)
      val padded = schema.fieldNames.filterNot(header.contains)
        .foldLeft(raw)((df, m) => df.withColumn(m, lit(null).cast("string")))
      rescueProject(padded, schema, extras = header.filterNot(known))
    }.reduce(_.unionByName(_))
  }

  private def loadLatestSchema(spark: SparkSession,
      schemaLocation: String): Option[(Int, StructType)] = {
    val p = new org.apache.hadoop.fs.Path(schemaLocation)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .maxOption.map { v =>
        val in = fs.open(new org.apache.hadoop.fs.Path(p, s"v$v.json"))
        val json = try new String(in.readAllBytes(), "UTF-8")
          finally in.close()
        (v, org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType])
      }
  }

  private def persistSchema(spark: SparkSession, schemaLocation: String,
      version: Int, schema: StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(schemaLocation, s"v$version.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** The persisted-schema contract — the Auto Loader `schemaLocation`
    * analogue (reference `bronze_ingestion.py:25,30`). First contact
    * INFERS the schema and persists it as `v0.json` under
    * `schemaLocation`; every later read loads the newest persisted
    * version instead of re-inferring, so the parsing contract survives
    * process restarts. When the directory has since grown files with NEW
    * trailing columns (schema drift):
    *
    *  - `evolve = false` (`cloudFiles.schemaEvolutionMode = rescue`):
    *    the persisted schema stays authoritative and the drifted
    *    columns' values fold into `_rescued_data` alongside type
    *    failures;
    *  - `evolve = true` (`addNewColumns`): the schema is widened with
    *    the new columns (as strings — deterministic; a later explicit
    *    contract re-types them), persisted as `v<n+1>.json`, and the
    *    read returns the widened shape.
    *
    * Each header GENERATION parses with its own positional schema and
    * conforms to the contract, so drift may add, reorder, or remove
    * columns; removed columns read as null — they are never dropped
    * from the contract.
    */
  /** Streaming read under the persisted-schema contract — the full Auto
    * Loader call shape (`bronze_ingestion.py:20-32`: readStream +
    * `cloudFiles.schemaLocation` + `inferColumnTypes`). A stream cannot
    * infer per-batch, so first contact runs ONE batch inference pass to
    * seed `v0.json` (exactly Auto Loader's stream-start inference);
    * every later start — including across process restarts — parses
    * with the newest persisted version and the standard rescue plan.
    * Drifted files inside a running stream surface in `_rescued_data`
    * only if their type conversion fails (positional parse); restart
    * after [[readEvolving]]`(evolve = true)` to widen the contract —
    * Auto Loader's addNewColumns mode likewise evolves only across
    * restarts.
    */
  def readStreamEvolving(spark: SparkSession, path: String,
      schemaLocation: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val schema = loadLatestSchema(spark, schemaLocation) match {
      case Some((_, s)) => s
      case None =>
        val inferred = base(spark.read)
          .option("inferSchema", "true").csv(path).schema
        persistSchema(spark, schemaLocation, 0, inferred)
        inferred
    }
    readStream(spark, path, schema, maxFilesPerTrigger)
  }

  def readEvolving(spark: SparkSession, path: String, schemaLocation: String,
      evolve: Boolean = false): DataFrame =
    loadLatestSchema(spark, schemaLocation) match {
      case None =>
        val inferred = base(spark.read)
          .option("inferSchema", "true").csv(path).schema
        persistSchema(spark, schemaLocation, 0, inferred)
        read(spark, path, inferred)
      case Some((v, persisted)) =>
        val known = persisted.fieldNames.toSet
        val fresh = headerGroups(spark, path).flatMap(_._1)
          .distinct.filterNot(known)
        if (fresh.isEmpty) readConforming(spark, path, persisted)
        else if (evolve) {
          val widened = StructType(persisted.fields ++
            fresh.map(StructField(_, StringType, nullable = true)))
          persistSchema(spark, schemaLocation, v + 1, widened)
          readConforming(spark, path, widened)
        } else readConforming(spark, path, persisted)
    }
}
