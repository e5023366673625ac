package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** x119's schema-on-read contract: a typed field pulled from an opaque
  * JSON string column, where malformed JSON and missing keys become
  * NULLs (counted, never errors). The driver corpus has all-valid
  * props, so the malformed cases are planted here. */
class PropsExtractSpec extends SparkSpec {

  import spark.implicits._

  test("valid, missing-key, malformed, and null props") {
    val df = Seq(
      ("""{"k": 7}""", "a"),
      ("""{"other": 1}""", "a"),
      ("""not json at all""", "a"),
      (null: String, "a"),
      ("""{"k": -3}""", "b")
    ).toDF("props", "event_type")
    val out = df.select(col("event_type"),
        from_json(col("props"), new StructType().add("k", LongType))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_with_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")
      .collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 1L)
    assert(out(0).getLong(3) == 7L && out(0).getLong(4) == 7L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 1L)
    assert(out(1).getLong(3) == -3L)
  }
}
