package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for test suites (one per suite; forked JVM).
  * Mirrors the driver's session shape: UTC, small shuffle parallelism.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // Match Verify/Bench: sorted-bucket layouts (b1, b8) feed merge
    // joins directly instead of re-sorting on every read.
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_test_wh").toString)
    .getOrCreate()

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.setLogLevel("ERROR")
  }

  val Sf0001 = "/root/testdata/sf0.001"
}
