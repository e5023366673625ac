package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity: small groups flagged, level = min group size, " +
    "risky totals exact") {
    val rows = Seq.fill(6)((1, "A")) ++ Seq.fill(2)((1, "B")) ++
      Seq.fill(1)((2, "A"))
    val df = rows.toDF("nation", "seg")
    val got = Privacy.kAnonymity(df, Seq(col("nation"), col("seg")),
      Seq("nation", "seg"), k = 5).collect()
    val byKey = got.map(r => (r.getInt(0), r.getString(1)) -> r).toMap
    assert(!byKey((1, "A")).getAs[Boolean]("risky"))
    assert(byKey((1, "B")).getAs[Boolean]("risky"))
    assert(byKey((2, "A")).getAs[Boolean]("risky"))
    got.foreach { r =>
      assert(r.getAs[Long]("k_anonymity") == 1L)
      assert(r.getAs[Long]("n_risky_groups") == 2L)
      assert(r.getAs[Long]("n_risky_rows") == 3L)
    }
  }

  test("kAnonymity: a fully generalized table is never risky; " +
    "layout-independent") {
    val df = (0 until 30).map(i => (i % 2, "X")).toDF("nation", "seg")
    val a = Privacy.kAnonymity(df, Seq(col("nation"), col("seg")),
      Seq("nation", "seg"), k = 5).collect()
    assert(a.forall(!_.getAs[Boolean]("risky")))
    assert(a.head.getAs[Long]("k_anonymity") == 15L)
    val b = Privacy.kAnonymity(df.repartition(7),
      Seq(col("nation"), col("seg")), Seq("nation", "seg"), k = 5)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("lDiversity: homogeneous group flagged even when k-anonymous; " +
    "diverse group passes; scalars aggregate") {
    // group A: 6 rows all sharing one sensitive value (k-anonymous at
    // k=5, yet l-risky); group B: 6 rows over 3 sensitive values
    val df = ((1 to 6).map(_ => ("A", "s1")) ++
      (1 to 6).map(i => ("B", s"s${i % 3}")))
      .toDF("qi", "sens")
    val got = Privacy.lDiversity(df, Seq(col("qi")), Seq("qi"),
      col("sens"), l = 3).collect()
    val byQi = got.map(r => r.getString(0) -> r).toMap
    assert(byQi("A").getAs[Long]("l_distinct") == 1L)
    assert(byQi("A").getAs[Boolean]("risky"))
    assert(byQi("B").getAs[Long]("l_distinct") == 3L)
    assert(!byQi("B").getAs[Boolean]("risky"))
    got.foreach { r =>
      assert(r.getAs[Long]("l_diversity") == 1L)
      assert(r.getAs[Long]("n_risky_groups") == 1L)
      assert(r.getAs[Long]("n_risky_rows") == 6L)
    }
  }

  test("laplaceNoisedCounts: replayable per salt, nonnegative, a new " +
    "salt redraws, epsilon guard") {
    val df = ((1 to 50).map(_ => "a") ++ (1 to 3).map(_ => "b"))
      .toDF("grp")
    def rel(salt: String, eps: Double = 1.0) =
      Privacy.laplaceNoisedCounts(df, Seq(col("grp")), Seq("grp"),
        epsilon = eps, salt = salt)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n"), r.getAs[Long]("noised_n"))).toMap
    val a = rel("s1"); val b = rel("s1"); val c = rel("s2")
    assert(a == b, "same salt must replay bit-identically")
    assert(a("a")._1 == 50L && a("b")._1 == 3L)
    assert(a.values.forall(_._2 >= 0L), "count release is nonnegative")
    assert(a != c, "a fresh salt must redraw the noise")
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisedCounts(df, Seq(col("grp")), Seq("grp"),
        epsilon = 0.0)
    }
  }

  test("tCloseness: skewed group flagged even when diverse-looking; " +
    "matching group passes; absent domain values contribute; exact TVD") {
    // group A: 6 rows all s1 (skew attack); group B: 24 rows at the
    // 16/4/4 mix that dominates the global distribution
    val df = ((1 to 6).map(_ => ("A", "s1")) ++
      (1 to 16).map(_ => ("B", "s1")) ++
      (1 to 4).map(_ => ("B", "s2")) ++ (1 to 4).map(_ => ("B", "s3")))
      .toDF("qi", "sens")
    val got = Privacy.tCloseness(df, Seq(col("qi")), Seq("qi"),
      col("sens"), t = 0.2).collect()
    val byQi = got.map(r => r.getString(0) -> r).toMap
    // global: 22/30, 4/30, 4/30. A: (1,0,0) → TVD = ½(8/30+4/30+4/30)
    // = 4/15 ≈ 0.2667 (the s2/s3 terms come from ABSENT values);
    // B: (2/3,1/6,1/6) → TVD = ½(2/30+1/30+1/30) = 1/15 ≈ 0.0667
    assert(byQi("A").getAs[Double]("t_dist") == 0.2667)
    assert(byQi("A").getAs[Boolean]("risky"))
    assert(byQi("B").getAs[Double]("t_dist") == 0.0667)
    assert(!byQi("B").getAs[Boolean]("risky"))
    got.foreach { r =>
      assert(r.getAs[Double]("t_closeness") == 0.2667)
      assert(r.getAs[Long]("n_risky_groups") == 1L)
      assert(r.getAs[Long]("n_risky_rows") == 6L)
    }
    // layout independence (the quantized sum is order-free)
    val b = Privacy.tCloseness(df.repartition(7), Seq(col("qi")),
      Seq("qi"), col("sens"), t = 0.2).collect()
    assert(got.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Privacy.tCloseness(df, Seq(col("qi")), Seq("qi"), col("sens"),
        t = 1.5)
    }
  }
}
