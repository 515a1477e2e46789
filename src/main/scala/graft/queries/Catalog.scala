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

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    specs.map(s => s.name -> s.fn).toMap

  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(o => s.name -> o)).toMap
}
