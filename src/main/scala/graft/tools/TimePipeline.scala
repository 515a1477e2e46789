package graft.tools

import org.apache.spark.sql.SparkSession

import graft.olist.OlistMaterialized

/** Scratch profiler: times the medallion materialization (cold build vs
  * fingerprint reuse) at a given sf dir. Not part of the driver contract.
  */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.pipeline.verbose", "true")
    spark.read.parquet(s"$sfDir/nation.parquet").count() // warm

    def timed[T](label: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      println(f"TIMED $label%-24s ${(System.nanoTime() - t) / 1e9}%6.2f s")
      r
    }
    val n = timed("ensure (this JVM)") { OlistMaterialized.ensure(spark, sfDir) }
    timed("fact read") { spark.table(n.fact).count() }
    spark.stop()
  }
}
