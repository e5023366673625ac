package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  // raw-string rows as the ingest sees them:
  // (date, region, total_beds, occupied_beds, icu_beds, icu_occupied)
  private val rows = Seq(
    ("2024-01-15", "CA", "100", "50", "10", "5"),   // valid
    (null, "CA", "100", "50", null, null),          // date required
    ("garbage", "CA", "100", "50", null, null),     // date unparseable → invalid format
    ("2024-01-15", null, "100", "50", null, null),  // region required
    ("2024-01-15", "CA", null, "50", null, null),   // total required
    ("2024-01-15", "CA", "100", null, null, null),  // occupied required
    ("2024-01-15", "CA", "-1", "0", null, null),    // total negative
    ("2024-01-15", "CA", "100", "-2", null, null),  // occupied negative
    ("2024-01-15", "CA", "100", "150", null, null), // occupied > total
    ("2024-01-15", "CA", "100", "50", "-3", null),  // icu negative
    ("2024-01-15", "CA", "100", "50", "10", "-1"),  // icu_occ negative
    ("2024-01-15", "CA", "100", "50", "10", "20"),  // icu_occ > icu
    ("2024-01-15", "CA", "100", "50", null, "7"),   // icu absent: occ unchecked → VALID
    (null, null, "-1", null, null, null)            // multi-fail → FIRST rule wins
  ).toDF("date", "region", "total_beds", "occupied_beds", "icu_beds", "icu_occupied")

  private def reasons = {
    val typed = rows
      .withColumn("_dp", $"date".try_cast("date"))
      .withColumn("_tb", $"total_beds".try_cast("int"))
      .withColumn("_ob", $"occupied_beds".try_cast("int"))
      .withColumn("_ib", $"icu_beds".try_cast("int"))
      .withColumn("_io", $"icu_occupied".try_cast("int"))
    typed.select(Validation.rejectReason(Validation.capacityRules(
      $"date", $"_dp", $"region", $"_tb", $"_ob", $"_ib", $"_io")).as("r"))
      .as[String].collect()
  }

  test("P3 cascade: each rule fires with its reference message, in order") {
    val expected = Array(
      null,
      "date is required", "invalid date format", "region is required",
      "total_beds is required", "occupied_beds is required",
      "total_beds cannot be negative", "occupied_beds cannot be negative",
      "occupied_beds cannot exceed total_beds", "icu_beds cannot be negative",
      "icu_occupied cannot be negative", "icu_occupied cannot exceed icu_beds",
      null,
      "date is required" // first failing rule, not the later ones
    )
    assert(reasons.sameElements(expected))
  }

  test("split partitions the input: accepted ∪ rejected = input, disjoint") {
    val typed = rows
      .withColumn("_dp", $"date".try_cast("date"))
      .withColumn("_tb", $"total_beds".try_cast("int"))
      .withColumn("_ob", $"occupied_beds".try_cast("int"))
      .withColumn("_ib", $"icu_beds".try_cast("int"))
      .withColumn("_io", $"icu_occupied".try_cast("int"))
      .withColumn("_reject_reason",
        Validation.rejectReason(Validation.capacityRules(
          $"date", $"_dp", $"region", $"_tb", $"_ob", $"_ib", $"_io")))
    val (acc, rej) = Validation.split(typed)
    assert(acc.count() + rej.count() == rows.count())
    assert(acc.count() == 2)
  }
}
