package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class AsOfDeltaSpec extends SparkSpec {
  import spark.implicits._

  test("J3 strict -1 day: sparse dates yield NULL delta, not last-available") {
    val m = Seq(
      ("CA", "2024-01-15", 60.0),
      ("CA", "2024-01-16", 70.0), // delta 10 vs 15th
      ("CA", "2024-01-18", 90.0), // 17th missing → delta NULL (lag() would give 20)
      ("TX", "2024-01-16", 50.0)  // no 15th for TX → NULL
    ).toDF("region_id", "date_s", "strain_index")
      .withColumn("date", to_date($"date_s")).drop("date_s")
    val out = AsOfDelta.strictLag(m, Seq("region_id"), "date", Seq("strain_index"))
      .orderBy("region_id", "date")
      .select($"region_id", $"date".cast("string"), $"delta_strain_index")
      .collect()
    assert(out(0).isNullAt(2))                   // CA 15th: no prev
    assert(out(1).getDouble(2) == 10.0)          // CA 16th
    assert(out(2).isNullAt(2))                   // CA 18th: strict gap
    assert(out(3).isNullAt(2))                   // TX 16th
  }
}
