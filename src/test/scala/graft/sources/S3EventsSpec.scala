package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class S3EventsSpec extends SparkSpec {
  import spark.implicits._

  private val putEvent =
    """{"Records":[{"eventName":"ObjectCreated:Put",
      |"s3":{"bucket":{"name":"ingest-bucket"},
      |"object":{"key":"raw/hospital+capacity/2024-01-15.csv","size":1234}}}]}"""
      .stripMargin.replace("\n", "")

  private val deleteEvent =
    """{"Records":[{"eventName":"ObjectRemoved:Delete",
      |"s3":{"bucket":{"name":"ingest-bucket"},
      |"object":{"key":"raw/x.csv","size":0}}}]}""".stripMargin.replace("\n", "")

  test("S3 put event parses: bucket, url-decoded key, uri; delete filtered") {
    val parsed = S3Events.parseEvents(
      Seq(putEvent, deleteEvent).toDF("json"), "json")
    val puts = parsed.filter(S3Events.objectCreated(parsed)).collect()
    assert(puts.length == 1)
    val r = puts.head
    assert(r.getAs[String]("bucket") == "ingest-bucket")
    // '+' decodes to space, as the reference's unquote_plus does
    assert(r.getAs[String]("key") == "raw/hospital capacity/2024-01-15.csv")
    assert(r.getAs[String]("uri") ==
      "s3a://ingest-bucket/raw/hospital capacity/2024-01-15.csv")
    assert(r.getAs[Long]("size") == 1234L)
  }
}
