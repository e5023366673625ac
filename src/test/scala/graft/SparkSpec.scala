package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one JVM-wide session (getOrCreate),
  * small shuffle partition count so tiny-fixture tests don't schedule
  * hundreds of empty tasks. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // one shared warehouse for the one shared session (only the first
    // getOrCreate honors configs anyway); keeps tables out of the repo
    .config("spark.sql.warehouse.dir", SparkSpec.warehouseDir)
    .getOrCreate()

  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}

object SparkSpec {
  lazy val warehouseDir: String =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString
}
