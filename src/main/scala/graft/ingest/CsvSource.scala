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

  private def base(r: org.apache.spark.sql.DataFrameReader) = r
    .option("header", "true")
    .option("delimiter", ",")
    .option("ignoreLeadingWhiteSpace", "true")
    .option("ignoreTrailingWhiteSpace", "true")

  private def rawSchema(schema: StructType): StructType = StructType(
    schema.fields.map(f => StructField(f.name, StringType, nullable = true))
      :+ StructField(StructuralColumn, StringType, nullable = true))

  /** The rescue plan (shared by batch and streaming reads): type every
    * column with try_cast and fold conversion failures plus structural
    * failures into the JSON `_rescued_data` column.
    */
  private def rescueProject(raw: DataFrame, schema: StructType): DataFrame = {
    def typed(f: StructField): Column =
      if (f.dataType == StringType) col(f.name)
      else expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})")

    // JSON map of {column -> raw value} for values that failed to cast
    // (raw non-null/non-empty but conversion null).
    val failedEntries = schema.fields.filter(_.dataType != StringType).map { f =>
      lit(f.name) -> when(
        col(f.name).isNotNull && col(f.name) =!= "" && typed(f).isNull,
        col(f.name))
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
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    rescueProject(
      spark.readStream
        .option("header", "true")
        .option("delimiter", ",")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", StructuralColumn)
        .schema(rawSchema(schema))
        .csv(path),
      schema)
}
