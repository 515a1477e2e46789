package graft.queries

/** Aggregates every query batch into the driver-facing maps. */
object Catalog {
  def specs: Seq[QuerySpec] =
    Relational.specs ++ Relational2.specs ++ Relational3.specs ++ Star.specs ++
      TextAnalysis.specs ++ TextAnalysis2.specs ++ TextAnalysis3.specs ++
      CurationPipeline.specs ++ DedupQueries.specs ++
      SimilarityQueries.specs ++
      PipelineQueries.specs ++ SourceQueries.specs ++ OlistQueries.specs ++
      StorageQueries.specs ++ SketchQueries.specs ++
      ChangeDataQueries.specs ++ GraphQueries.specs

  /** Fail fast on a name collision: 17 spec batches concatenate blind,
    * and a duplicated name would otherwise silently shadow an existing
    * entry in the toMap below — one query tested against the other's
    * oracle, or dropped from verification entirely. */
  private def checked(ss: Seq[QuerySpec]): Seq[QuerySpec] = {
    val dups = ss.groupBy(_.name).filter(_._2.sizeIs > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    ss
  }

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    checked(specs).map(s => s.name -> s.fn).toMap

  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(o => s.name -> o)).toMap
}
