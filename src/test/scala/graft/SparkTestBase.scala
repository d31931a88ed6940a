package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local session for all suites (getOrCreate dedupes across
  * suites in one JVM; sbt forks a single test JVM). */
trait SparkTestBase extends BeforeAndAfterAll { this: Suite =>

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .appName("graft-test")
    .getOrCreate()

  def sf(name: String): String = s"/root/testdata/sf0.001/$name.parquet"

  override protected def afterAll(): Unit = {
    // Session is shared; do not stop between suites.
    super.afterAll()
  }
}
