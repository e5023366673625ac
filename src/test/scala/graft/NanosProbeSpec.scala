package graft

import org.apache.spark.sql.types._

/** TIMESTAMP(NANOS) parquet handling (round-4 verdict item 8): the
  * events reader must not leave session-global conf behind. Two facts
  * make the scoped design sound, both pinned here:
  *   1. a scan with an EXPLICIT long schema needs no `nanosAsLong` conf
  *      at execution time (only driver-side schema inference does);
  *   2. running an events-reading catalog query leaves the session conf
  *      exactly as it found it.
  */
class NanosProbeSpec extends SparkSpec {

  private val key = "spark.sql.legacy.parquet.nanosAsLong"
  private val dir = "/root/testdata/sf0.001"

  test("explicit long schema reads ns parquet without nanosAsLong conf") {
    spark.conf.unset(key)
    assert(spark.conf.get(key) == "false", "unset state = default false")
    val schema = new StructType().add("ts", LongType)
    val n = spark.read.schema(schema).parquet(s"$dir/events.parquet")
      .filter("ts > 0").count()
    assert(n > 0)
    assert(spark.conf.get(key) == "false")
  }

  test("events-reading catalog queries leave session conf untouched") {
    // at-default going in → at-default coming out (execution happens
    // here too, i.e. AFTER the helper restored the conf)
    spark.conf.unset(key)
    val q = graft.SparkEntry.queries("x21_window_agg")
    assert(q(spark, dir).count() > 0)
    assert(spark.conf.get(key) == "false",
      "catalog query must not leak nanosAsLong into the session")
    // pre-set to true by the caller → still true coming out
    spark.conf.set(key, "true")
    assert(q(spark, dir).count() > 0)
    assert(spark.conf.get(key) == "true",
      "catalog query must restore the caller's prior conf value")
    spark.conf.unset(key)
  }
}
