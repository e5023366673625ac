package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2/S3 — object-store event-trigger plumbing.
  *
  * The reference wires S3 `ObjectCreated:Put` → Lambda → whole-file ETL,
  * parsing bucket/key out of the event JSON and URL-decoding the key
  * (reference: aws/lambda_handler.py:21-31, key decode :27-28; event
  * shape aws/events/s3_put_example.json). Spark-natively the same
  * notification stream is just another DataFrame: parse the event JSON,
  * build the object URI, and hand `s3a://bucket/key` paths straight to
  * `spark.read` — no download-to-/tmp copy step (the reference's
  * ingest_capacity_s3.py:11-19 staging is an artifact of pandas needing
  * local files).
  */
object S3Events {

  /** Minimal S3 put-notification schema (the standard public shape). */
  val eventSchema: StructType = StructType(Seq(
    StructField("Records", ArrayType(StructType(Seq(
      StructField("eventName", StringType),
      StructField("s3", StructType(Seq(
        StructField("bucket", StructType(Seq(
          StructField("name", StringType)))),
        StructField("object", StructType(Seq(
          StructField("key", StringType),
          StructField("size", LongType)))))))))))))

  /** Parse a column of raw S3 event JSON into one row per record:
    * (event_name, bucket, key [url-decoded], size, uri). */
  def parseEvents(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("_ev", from_json(col(jsonCol), eventSchema))
      .select(explode(col("_ev.Records")).as("r"))
      .select(
        col("r.eventName").as("event_name"),
        col("r.s3.bucket.name").as("bucket"),
        url_decode(col("r.s3.object.key")).as("key"),
        col("r.s3.object.size").as("size"))
      .withColumn("uri", concat_ws("/", lit("s3a:/"), col("bucket"), col("key")))

  /** Filter to object-created events (what triggers ingest). */
  def objectCreated(events: DataFrame): Column =
    col("event_name").startsWith("ObjectCreated")
}
