package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct specs for the endpoint-equivalent queries not already pinned
  * by the end-to-end slice (capacityLatest ratios, availableDates shape,
  * allDates, jsonEnvelope content). */
class QueryLayerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val regions = Seq(("r-ca", "California"), ("r-tx", "Texas"))
    .toDF("region_id", "name")

  private lazy val capacity = Seq(
    ("2024-01-15", "r-ca", 50000, 42000, Some(5000), Some(4800)),
    ("2024-01-15", "r-tx", 45000, 38000, None, None),
    ("2024-01-16", "r-ca", 0, 0, Some(0), Some(0)) // zero-bed + icu-0 edges
  ).toDF("date_s", "region_id", "total_beds", "occupied_beds", "icu_beds", "icu_occupied")
    .withColumn("date", to_date($"date_s")).drop("date_s")

  test("capacityLatest: API ratios (NULL on zero beds, ICU truthiness), dim names") {
    val jan15 = QueryLayer.capacityLatest(capacity, regions,
      lit("2024-01-15").cast("date")).collect()
      .map(r => r.getAs[String]("region") -> r).toMap
    assert(jan15("California").getAs[Double]("bed_occ_pct") == 0.84)
    assert(jan15("California").getAs[Double]("icu_occ_pct") == 0.96)
    assert(jan15("Texas").getAs[Any]("icu_occ_pct") == null) // no ICU data

    val jan16 = QueryLayer.capacityLatest(capacity, regions,
      lit("2024-01-16").cast("date")).head()
    assert(jan16.getAs[Any]("bed_occ_pct") == null) // zero beds → NULL (API)
    assert(jan16.getAs[Any]("icu_occ_pct") == null) // icu_beds=0 → missing
  }

  test("availableDates + allDates") {
    val m = capacity.select($"date", $"region_id",
      lit(0.5).as("bed_occ_pct"), lit(0.5).as("icu_occ_pct"),
      lit(50.0).as("strain_index"), lit("r").as("source_run_id"))
    val a = QueryLayer.availableDates(m).head()
    assert(a.getString(0) == "2024-01-15" && a.getString(1) == "2024-01-16" &&
      a.getLong(2) == 2)
    assert(QueryLayer.allDates(m).as[java.sql.Date].collect()
      .map(_.toString).toSeq == Seq("2024-01-15", "2024-01-16"))
  }

  test("jsonEnvelope: one payload per date with region rows inside") {
    val compared = Seq(("2024-01-16", "California", 93.2, 91.2, 2.0))
      .toDF("date_s", "region", "strain_index", "prev_strain", "delta")
      .withColumn("date", to_date($"date_s")).drop("date_s")
    val payload = QueryLayer.jsonEnvelope(compared)
      .select("payload").as[String].head()
    assert(payload.contains("\"date\":\"2024-01-16\""))
    assert(payload.contains("\"region\":\"California\""))
    assert(payload.contains("\"strain_index\":93.2"))
  }
}
