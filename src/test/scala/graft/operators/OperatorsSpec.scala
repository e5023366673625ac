package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(rows: (String, String, Int)*) =
    rows.toSeq.toDF("date", "region_id", "total_beds")

  test("S7 merge: updates replace same-key rows, new keys appended") {
    val existing = tbl(("2024-01-15", "CA", 100), ("2024-01-15", "TX", 200))
    val updates = tbl(("2024-01-15", "CA", 111), ("2024-01-15", "NY", 300))
    val merged = MergeUpsert.merge(existing, updates, Seq("date", "region_id"))
      .orderBy("region_id").as[(String, String, Int)].collect()
    assert(merged.toSeq == Seq(
      ("2024-01-15", "CA", 111), ("2024-01-15", "NY", 300), ("2024-01-15", "TX", 200)))
  }

  test("S7 idempotence: merge(merge(T,B),B) == merge(T,B)") {
    val t = tbl(("2024-01-15", "CA", 100), ("2024-01-16", "CA", 101))
    val b = tbl(("2024-01-15", "CA", 999), ("2024-01-15", "WA", 1))
    val once = MergeUpsert.merge(t, b, Seq("date", "region_id"))
    val twice = MergeUpsert.merge(once, b, Seq("date", "region_id"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("S7 in-batch duplicates collapse by priority") {
    val t = tbl()
    val b = Seq(("2024-01-15", "CA", 1, 1L), ("2024-01-15", "CA", 2, 2L))
      .toDF("date", "region_id", "total_beds", "pri")
    val m = MergeUpsert.merge(
      t.withColumn("pri", lit(0L)), b, Seq("date", "region_id"), Some("pri"))
    assert(m.select("total_beds").as[Int].collect().toSeq == Seq(2))
  }

  test("S7 mergeWrite rewrites only touched date partitions") {
    val dir = Files.createTempDirectory("graft-merge").toString + "/fact"
    val init = tbl(("2024-01-15", "CA", 100), ("2024-01-16", "CA", 200))
    MergeUpsert.mergeWrite(spark, dir, init, Seq("date", "region_id"))
    val filesBefore = new java.io.File(s"$dir/date=2024-01-16").listFiles().toSet
    // second merge touches only 2024-01-15
    MergeUpsert.mergeWrite(spark, dir,
      tbl(("2024-01-15", "CA", 150)), Seq("date", "region_id"))
    val filesAfter = new java.io.File(s"$dir/date=2024-01-16").listFiles().toSet
    assert(filesBefore == filesAfter, "untouched partition must not be rewritten")
    val got = spark.read.parquet(dir)
      .orderBy("date").select("total_beds").as[Int].collect()
    assert(got.toSeq == Seq(150, 200))
  }
}

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

class DimResolverSpec extends SparkSpec {
  import spark.implicits._

  test("J4 get-or-create: only unseen names inserted, keys deterministic") {
    val dim = Seq(("k-ca", "CA")).toDF("region_id", "name")
    val incoming = Seq("CA", "TX", "TX", "NY").toDF("name")
    val (dim1, created) = DimResolver.getOrCreate(dim, incoming)
    assert(dim1.count() == 3 && created.count() == 2)
    // deterministic: re-running the same create yields identical keys
    val (dim2, _) = DimResolver.getOrCreate(dim, incoming)
    assert(dim1.exceptAll(dim2).isEmpty)
    // resolved facts carry the dim key
    val facts = Seq(("TX", 1), ("CA", 2)).toDF("name", "v")
    val resolved = DimResolver.resolveKeys(facts, dim1, "name")
    assert(resolved.filter($"name" === "CA").select("region_id")
      .as[String].head() == "k-ca")
  }
}
