package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** x119's Spark side extracts `props.k` with a real JSON parser
  * (`from_json`, k LONG). Its oracle now also parses JSON (DuckDB
  * json_valid/json_type/json_extract_string with an integer-type gate)
  * instead of a regex sketch — this spec pins the Spark semantics that
  * gate mirrors, on exactly the shapes where regex and JSON diverge.
  * DuckDB's answers for these same inputs (verified when the oracle
  * was written): 3, -7, then NULL for every other row. If a Spark
  * upgrade ever changes from_json's treatment of one of these, this
  * fails before the driver's oracle diff does. */
class PropsJsonParitySpec extends SparkSpec {
  import spark.implicits._

  test("from_json(k LONG) extracts top-level integers and nulls the rest") {
    val rows = Seq(
      """{"k": 3}""" -> Some(3L), // plain integer
      """{"k": -7}""" -> Some(-7L), // negative integer
      """not json {""" -> None, // malformed
      """{"k": 1.5}""" -> None, // float is not a LONG
      """{"a":{"k":2}}""" -> None, // nested k is not top-level
      """{"k": "5"}""" -> None, // quoted number is a string
      """{"k":  3}""" -> Some(3L), // whitespace before value
      """{"k": 99999999999999999999}""" -> None // > int64
    )
    val got = rows.map(_._1).toDF("props")
      .select(from_json(col("props"), new StructType().add("k", LongType))
        .getField("k").as("k"))
      .as[Option[Long]].collect().toSeq
    assert(got == rows.map(_._2),
      s"from_json drifted from the oracle's JSON-type gate:\n" +
        rows.map(_._1).zip(got).mkString("\n"))
  }
}
