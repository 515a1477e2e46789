package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.ingest.CsvSource

/** Source-format queries: CSV ingest (Auto Loader analogue, SURVEY §2.1
  * S1) and semi-structured JSON extraction.
  *
  * s1_csv_ingest round-trips the documents table through an on-disk CSV
  * copy (written once per scale factor) and reads it back through
  * [[graft.ingest.CsvSource]] with an explicit schema + rescue column;
  * the oracle is the ORIGINAL parquet table — so the query verifies the
  * full write-read cycle byte-for-byte, including the trim options the
  * reference's Auto Loader sets.
  */
object SourceQueries {

  import QuerySpec._

  private val DocSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val s1CsvIngest = withOracle(
    "s1_csv_ingest",
    "SELECT doc_id, text, lang, source, n_chars FROM documents") { (s, d) =>
    val sfName = new java.io.File(d).getName
    val dir = s"/tmp/graft_csv/$sfName/documents"
    // _SUCCESS marker, not bare existence: a previously interrupted write
    // leaves a partial dir that must be overwritten, not trusted.
    if (!new java.io.File(dir, "_SUCCESS").exists())
      Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.option("header", "true").mode("overwrite").csv(dir)
    CsvSource.read(s, dir, DocSchema)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
  }

  // ---- JSON extraction over the events.props payload ----
  // One from_json parse per row serves every extraction (path-style,
  // struct-style, missing-field probe): parsing is the dominant cost, and
  // get_json_object re-parses the document per call, so N extractions
  // must share a single parsed struct, not run N parsers.
  val f5Json = withOracle(
    "f5_json",
    """SELECT event_id,
      |       CAST(json_extract(props, '$.k') AS BIGINT) AS k_path,
      |       CAST(json_extract(props, '$.k') AS BIGINT) AS k_struct,
      |       CAST(json_extract(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
      |FROM events""".stripMargin) { (s, d) =>
    val parsed = from_json(col("props"), StructType(Seq(
      StructField("k", LongType), StructField("missing", StringType))))
    Tables.events(s, d)
      .withColumn("j", parsed)
      .select(
        col("event_id"),
        col("j.k").as("k_path"),
        col("j.k").as("k_struct"),
        col("j.missing").isNull.as("missing_is_null"))
  }

  val specs: Seq[QuerySpec] = Seq(s1CsvIngest, f5Json)
}
