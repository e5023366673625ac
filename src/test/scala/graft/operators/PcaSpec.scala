package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("top component recovers the dominant variance axis") {
    // points spread along (3, 1) with small orthogonal noise
    val pts = (-20 to 20).map { t =>
      (t.toLong, Seq(3.0f * t / 20 + 0.01f * (t % 3),
        1.0f * t / 20 - 0.01f * (t % 3)))
    }
    val got = Pca.topComponent(pts.toDF("id", "v"), "v")
      .orderBy("pos").collect().map(_.getDouble(1))
    // direction ∝ (3,1)/√10 up to sign
    val expect = Array(3.0 / math.sqrt(10), 1.0 / math.sqrt(10))
    val sign = if (got(0) * expect(0) < 0) -1.0 else 1.0
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(sign * g - e) < 0.02, s"got ${got.toSeq}")
    }
    // unit norm (up to the 1e-6 per-round rounding)
    assert(math.abs(got.map(x => x * x).sum - 1.0) < 1e-4)
  }

  test("scatter matrix is symmetric and shift-invariant (centered)") {
    val base = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 5.0f)), (3L, Seq(-2.0f, 0.5f)))
    val m1 = Pca.scatterMatrix(base.toDF("id", "v"), "v").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    assert(m1.forall { case ((i, j), v) => v == m1((j, i)) })
    // adding a constant vector shifts the mean, not the scatter
    val shifted = base.map { case (id, v) =>
      (id, v.map(_ + 7.0f)) }
    val m2 = Pca.scatterMatrix(shifted.toDF("id", "v"), "v").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    assert(m1 == m2, s"scatter must be mean-centered\n$m1\n$m2")
  }

  test("layout independence: repartitioned corpus, identical loadings") {
    val pts = (0 until 50).map(t =>
      (t.toLong, Seq((t % 7).toFloat, (t % 3).toFloat, t.toFloat / 50)))
    val df = pts.toDF("id", "v")
    val a = Pca.topComponent(df, "v").orderBy("pos").collect()
      .map(_.getDouble(1)).toSeq
    val b = Pca.topComponent(df.repartition(13), "v").orderBy("pos")
      .collect().map(_.getDouble(1)).toSeq
    assert(a == b)
  }

  test("empty corpus is rejected") {
    val df = Seq((1L, Seq(1.0f))).toDF("id", "v").filter($"id" < 0)
    intercept[IllegalArgumentException] {
      Pca.topComponent(df, "v")
    }
  }

  test("scatter accumulator width: past the measured cutover the sum " +
    "children are DECIMAL (no Int64 partials), and both exact paths " +
    "agree bit for bit") {
    def sumChildTypes(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.aggregateExpressions.flatMap(_.collect {
            case s: org.apache.spark.sql.catalyst.expressions.aggregate.Sum =>
              s.child.dataType
          })
      }.flatten
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, -1.0f)))
      .toDF("id", "v")
    // wide path (forced): every Sum child is already DecimalType —
    // an Int64 running sum wraps (or ANSI-aborts) near ~8e9 rows of
    // 2^30-scale products even though each product fits a long
    val wide = Pca.scatterMatrix(df, "v", forceDecimalAt = 0L)
    val wideTypes = sumChildTypes(wide)
    assert(wideTypes.nonEmpty)
    wideTypes.foreach { dt =>
      assert(dt.isInstanceOf[org.apache.spark.sql.types.DecimalType],
        s"wide path accumulates in $dt, not DECIMAL")
    }
    // fast path (small corpus, provably safe): long accumulation
    val fast = Pca.scatterMatrix(df, "v")
    assert(sumChildTypes(fast).exists(
      _ == org.apache.spark.sql.types.LongType))
    // both exact — identical values
    def vals(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    assert(vals(fast) == vals(wide))
  }

  test("null and empty vectors neither crash nor dilute n") {
    // 3 real points on a line + a null row + an empty row: the
    // component must be what the 3 real points alone produce
    val real = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(2.0f, 4.0f)), (3L, Seq(3.0f, 6.0f)))
    val a = Pca.topComponent(real.toDF("id", "v"), "v")
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    val dirty = real.map { case (i, v) => (i, Some(v)) } ++
      Seq((4L, None), (5L, Some(Seq.empty[Float])))
    val b = Pca.topComponent(dirty.toDF("id", "v"), "v")
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    assert(a == b, s"$a vs $b")
  }

  test("zero scatter (constant corpus) yields finite loadings, not NaN") {
    val df = Seq((1L, Seq(2.0f, 2.0f)), (2L, Seq(2.0f, 2.0f)))
      .toDF("id", "v")
    val got = Pca.topComponent(df, "v").orderBy("pos").collect()
      .map(_.getDouble(1))
    assert(got.forall(x => !x.isNaN && !x.isInfinite), got.toSeq.toString)
  }
}
