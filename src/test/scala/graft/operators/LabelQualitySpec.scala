package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class LabelQualitySpec extends SparkSpec {
  import spark.implicits._

  test("cohenKappa: perfect agreement is 1, hand-computed table matches") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    val k1 = LabelQuality.cohenKappa(perfect, "a", "b").head()
    assert(k1.getAs[Double]("kappa") == 1.0)
    // 10 rows: n11=3, n00=3, n10=2, n01=2 → po=0.6, pe=0.5, κ=0.2
    val mixed = (Seq.fill(3)((true, true)) ++ Seq.fill(3)((false, false))
      ++ Seq.fill(2)((true, false)) ++ Seq.fill(2)((false, true)))
      .toDF("a", "b")
    val k2 = LabelQuality.cohenKappa(mixed, "a", "b").head()
    assert(k2.getAs[Long]("n") == 10L)
    assert(k2.getAs[Double]("po") == 0.6)
    assert(k2.getAs[Double]("pe") == 0.5)
    // the +1000 negative-domain rounding shift leaves ~1e-13 of float
    // residue (same residue in any engine — the oracle replays it)
    assert(math.abs(k2.getAs[Double]("kappa") - 0.2) < 1e-9)
  }

  test("cohenKappa: degenerate all-same-label annotators (pe = 1) " +
    "report 0, not a division by zero") {
    val allPos = Seq((true, true), (true, true)).toDF("a", "b")
    // po = 1, pe = 1 → guard path
    assert(LabelQuality.cohenKappa(allPos, "a", "b")
      .head().getAs[Double]("kappa") == 0.0)
  }

  test("calibrationReport: hand-computed bins and ECE") {
    // bin 1 (0.1..0.2): two rows p=0.1 y=1, p=0.1 y=0 → mean 0.1,
    // frac 0.5, gap 0.4; bin 9 (0.9+): p=0.9 y=1 → gap 0.1
    // ECE = (2*0.4 + 1*0.1) / 3 = 0.3
    val df = Seq((0.1, true), (0.1, false), (0.9, true))
      .toDF("p", "y")
    val got = LabelQuality.calibrationReport(df, "p", "y")
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean_prob"),
          r.getAs[Double]("frac_pos"), r.getAs[Double]("gap"),
          r.getAs[Double]("ece"))).toMap
    assert(got(1) == ((2L, 0.1, 0.5, 0.4, 0.3)))
    assert(got(9) == ((1L, 0.9, 1.0, 0.1, 0.3)))
  }

  test("calibrationReport: prob 1.0 lands in the top bin, not bin 10") {
    val df = Seq((1.0, true)).toDF("p", "y")
    val bins = LabelQuality.calibrationReport(df, "p", "y")
      .collect().map(_.getAs[Int]("bin")).toSeq
    assert(bins == Seq(9))
  }

  test("psiDrift: identical snapshots have zero PSI in every bin") {
    val rows = (0 until 40).map(i => (i % 2, ((i / 2) % 10) / 10.0 + 0.05))
    val got = LabelQuality.psiDrift(rows.toDF("side", "p"), "side", "p")
      .collect()
    assert(got.length == 10) // every bin reported, even with smoothing
    got.foreach { r =>
      assert(r.getAs[Double]("psi_bin") == 0.0)
      assert(r.getAs[Double]("psi_total") == 0.0)
    }
  }

  test("psiDrift: a shifted distribution yields positive total and " +
    "empty bins still contribute") {
    // side 0 all in bin 0; side 1 all in bin 9
    val rows = Seq.fill(5)((0, 0.05)) ++ Seq.fill(5)((1, 0.95))
    val got = LabelQuality.psiDrift(rows.toDF("side", "p"), "side", "p")
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("psi_bin"), r.getAs[Double]("psi_total")))
      .toMap
    assert(got(0)._1 == 5L && got(0)._2 == 0L)
    assert(got(9)._1 == 0L && got(9)._2 == 5L)
    assert(got(0)._4 > 1.0) // strong drift
    // per-bin PSI terms are non-negative and the drifted bins dominate
    assert(got.values.forall(_._3 >= 0.0))
    assert(got(0)._3 > 0.0 && got(9)._3 > 0.0)
    // bins empty on BOTH sides get equal smoothed mass → psi 0
    assert(got(4)._3 == 0.0)
  }

  test("psiDrift and calibrationReport are layout-independent") {
    val rows = (0 until 97).map(i =>
      (i % 2, ((i * 37) % 100) / 100.0, i % 3 == 0))
    val df = rows.toDF("side", "p", "y")
    def run[T](f: org.apache.spark.sql.DataFrame => Seq[T]) =
      assert(f(df) == f(df.repartition(7)))
    run(d => LabelQuality.psiDrift(d, "side", "p").collect()
      .map(_.toSeq).toSeq)
    run(d => LabelQuality.calibrationReport(d, "p", "y").collect()
      .map(_.toSeq).toSeq)
  }

  test("rocAuc: hand-computed AUC 0.75 and best-F1 operating point") {
    // ascending: 0.1(neg) 0.35(pos) 0.4(neg) 0.8(pos) -> R+ = 2+4,
    // AUC = (6 - 3)/4 = 0.75; best cut at 0.35: P=2/3, R=1, F1=0.8
    val df = Seq((0.1, false), (0.35, true), (0.4, false), (0.8, true))
      .toDF("p", "y")
    val r = LabelQuality.rocAuc(df, "p", "y").head()
    assert(r.getAs[Double]("auc") == 0.75)
    assert(r.getAs[Double]("best_threshold") == 0.35)
    assert(r.getAs[Double]("best_f1") == 0.8)
    assert(r.getAs[Double]("best_recall") == 1.0)
  }

  test("rocAuc: perfect separation is 1.0; a constant score ties to 0.5") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false))
      .toDF("p", "y")
    assert(LabelQuality.rocAuc(perfect, "p", "y").head()
      .getAs[Double]("auc") == 1.0)
    val const = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("p", "y")
    assert(LabelQuality.rocAuc(const, "p", "y").head()
      .getAs[Double]("auc") == 0.5)
  }

  test("rocAuc: degenerate single-class inputs report 0, not a crash") {
    val allPos = Seq((0.9, true), (0.1, true)).toDF("p", "y")
    assert(LabelQuality.rocAuc(allPos, "p", "y").head()
      .getAs[Double]("auc") == 0.0)
  }

  test("rocAuc is layout-independent") {
    val rows = (0 until 211).map(i => (((i * 53) % 100) / 100.0, i % 3 == 0))
    val df = rows.toDF("p", "y")
    val a = LabelQuality.rocAuc(df, "p", "y").head().toSeq
    val b = LabelQuality.rocAuc(df.repartition(9), "p", "y").head().toSeq
    assert(a == b)
  }

  test("fleissKappa: unanimous votes give 1; hand-computed mixed case") {
    val unanimous = Seq(3, 0, 3, 0).toDF("k")
    val u = LabelQuality.fleissKappa(unanimous, "k").head()
    assert(u.getAs[Double]("p_bar") == 1.0)
    assert(u.getAs[Double]("kappa") == 1.0)
    // 2 items, k=1 and k=2: agree_num = (0+2)+(2+0) = 4 ->
    // p_bar = 4/12 = 1/3; p_yes = 3/6 = 0.5 -> p_e = 0.5 ->
    // kappa = (1/3 - 1/2)/(1/2) = -1/3
    val mixed = Seq(1, 2).toDF("k")
    val m = LabelQuality.fleissKappa(mixed, "k").head()
    assert(m.getAs[Double]("p_bar") == 0.3333)
    assert(m.getAs[Double]("p_e") == 0.5)
    assert(math.abs(m.getAs[Double]("kappa") - (-0.3333)) < 1e-9)
  }

  test("ksDrift: identical snapshots give 0; disjoint supports give 1 " +
    "at the crossover value") {
    val same = (0 until 40).map(i => (i % 2, ((i / 2) % 10) / 10.0))
    assert(LabelQuality.ksDrift(same.toDF("side", "p"), "side", "p")
      .head().getAs[Double]("ks") == 0.0)
    val disjoint = Seq.fill(5)((0, 0.2)) ++ Seq.fill(7)((1, 0.8))
    val d = LabelQuality.ksDrift(disjoint.toDF("side", "p"), "side", "p")
      .head()
    assert(d.getAs[Long]("n_a") == 5L && d.getAs[Long]("n_b") == 7L)
    assert(d.getAs[Double]("ks") == 1.0)
    assert(d.getAs[Double]("at_value") == 0.2)
  }

  test("ksDrift: hand-computed partial shift, layout-independent") {
    // a: 0.1 0.1 0.5  b: 0.1 0.5 0.5 -> ECDFs at 0.1: 2/3 vs 1/3
    // (gap 1/3); at 0.5: 1 vs 1 (0) -> ks = 1/3 at 0.1
    val rows = Seq((0, 0.1), (0, 0.1), (0, 0.5),
      (1, 0.1), (1, 0.5), (1, 0.5))
    val df = rows.toDF("side", "p")
    val r = LabelQuality.ksDrift(df, "side", "p").head()
    assert(r.getAs[Double]("ks") == 0.3333)
    assert(r.getAs[Double]("at_value") == 0.1)
    assert(r.toSeq == LabelQuality.ksDrift(df.repartition(5),
      "side", "p").head().toSeq)
  }

  test("krippendorffAlpha: unanimity gives 1; hand-computed mixed " +
    "case matches; degenerate one-item guard") {
    val perfect = Seq(3L, 0L, 3L, 0L).toDF("k")
    assert(LabelQuality.krippendorffAlpha(perfect, "k")
      .head().getAs[Double]("alpha") == 1.0)
    // 2 items, r=3: k = (2, 1) -> dis = 2+2 = 4, Do = 8/12 = 2/3
    // Y = 3, N = 6 -> De = 2*3*3/(6*5) = 0.6 -> alpha = 1 - (2/3)/0.6
    val mixed = Seq(2L, 1L).toDF("k")
    val row = LabelQuality.krippendorffAlpha(mixed, "k").head()
    assert(row.getAs[Long]("n_items") == 2L)
    assert(row.getAs[Long]("n_judgments") == 6L)
    assert(row.getAs[Long]("n_yes") == 3L)
    assert(math.abs(row.getAs[Double]("alpha") -
      (1.0 - (2.0 / 3.0) / 0.6)) < 1e-3)
    // all-identical judgments: De = 0, Do = 0 -> alpha 1, no div error
    val allYes = Seq(3L, 3L).toDF("k")
    assert(LabelQuality.krippendorffAlpha(allYes, "k")
      .head().getAs[Double]("alpha") == 1.0)
  }

  test("conformalThreshold: q-hat is the ceil((n+1)(1-a))-th order " +
    "statistic; coverage and set size count exactly; tiny cal set " +
    "degenerates to the full-set sentinel") {
    // calibration (9 rows): nonconformities sorted
    // [.1,.1,.1,.1,.1,.2,.2,.3,.3]; k = ceil(10·0.9) = 9 -> qhat = 0.3
    val cal = Seq((0.9, true), (0.8, true), (0.9, true), (0.9, true),
      (0.7, true), (0.1, false), (0.2, false), (0.1, false),
      (0.3, false)).map { case (sv, y) => (sv, y, true) }
    // test: clear positive (covered, set {keep}), clear negative
    // (covered, set {reject}), borderline positive s=0.3 (nc 0.7 > qhat
    // -> NOT covered, set {reject})
    val tst = Seq((0.75, true, false), (0.25, false, false),
      (0.3, true, false))
    val df = (cal ++ tst).toDF("s", "y", "is_cal")
    val got = LabelQuality.conformalThreshold(df, "s", "y",
      calCol = col("is_cal")).head()
    assert(got.getAs[Long]("n_cal") == 9L)
    assert(got.getAs[Long]("k") == 9L)
    assert(got.getAs[Double]("qhat") == 0.3)
    assert(got.getAs[Long]("n_test") == 3L)
    assert(got.getAs[Double]("coverage") == 0.6667)
    assert(got.getAs[Double]("avg_set_size") == 1.0)
    // 3 calibration rows at alpha 0.1: k = ceil(4·0.9) = 4 > n -> the
    // +inf sentinel, every set is {0,1}, coverage is vacuously 1
    val tiny = (Seq((0.9, true, true), (0.8, true, true),
      (0.1, false, true)) ++ tst).toDF("s", "y", "is_cal")
    val deg = LabelQuality.conformalThreshold(tiny, "s", "y",
      calCol = col("is_cal")).head()
    assert(deg.getAs[Double]("qhat") == 1.0001)
    assert(deg.getAs[Double]("coverage") == 1.0)
    assert(deg.getAs[Double]("avg_set_size") == 2.0)
  }

  test("spearman: monotone pairs hit ±1 through ties-safe average " +
    "ranks; designed-independent grid is 0; constant column guarded") {
    val mono = (1L to 10L).map(i => (i, i * i)).toDF("a", "b")
    assert(LabelQuality.spearman(mono, "a", "b").head()
      .getAs[Double]("rho") == 1.0)
    val inv = (1L to 10L).map(i => (i, 100L - i)).toDF("a", "b")
    assert(LabelQuality.spearman(inv, "a", "b").head()
      .getAs[Double]("rho") == -1.0)
    // tied grid: ranks (1.5,1.5,3.5,3.5) x (1.5,3.5,1.5,3.5) -> 0
    val grid = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("a", "b")
    assert(LabelQuality.spearman(grid, "a", "b").head()
      .getAs[Double]("rho") == 0.0)
    val const = (1L to 5L).map(i => (i, 7L)).toDF("a", "b")
    assert(LabelQuality.spearman(const, "a", "b").head()
      .getAs[Double]("rho") == 0.0)
  }

  test("brierDecomposition: calibrated two-bin case satisfies the " +
    "Murphy identity exactly; overconfident one-bin case pays it all " +
    "in reliability") {
    // 10 rows at p=0.2 with 2 positives, 10 at p=0.8 with 8: rel 0,
    // res 0.09, unc 0.25, brier 0.16 = 0 - 0.09 + 0.25
    val cal = ((1 to 2).map(_ => (0.2, true)) ++
      (1 to 8).map(_ => (0.2, false)) ++
      (1 to 8).map(_ => (0.8, true)) ++ (1 to 2).map(_ => (0.8, false)))
      .toDF("p", "y")
    val g = LabelQuality.brierDecomposition(cal, "p", "y").head()
    assert(g.getAs[Long]("n") == 20L)
    assert(g.getAs[Double]("base_rate") == 0.5)
    assert(g.getAs[Double]("brier") == 0.16)
    assert(g.getAs[Double]("reliability") == 0.0)
    assert(g.getAs[Double]("resolution") == 0.09)
    assert(g.getAs[Double]("uncertainty") == 0.25)
    assert(g.getAs[Double]("within_bin") == 0.0)
    // all p=0.9, half positive: brier 0.41 = rel 0.16 - 0 + 0.25
    val over = ((1 to 5).map(_ => (0.9, true)) ++
      (1 to 5).map(_ => (0.9, false))).toDF("p", "y")
    val o = LabelQuality.brierDecomposition(over, "p", "y").head()
    assert(o.getAs[Double]("brier") == 0.41)
    assert(o.getAs[Double]("reliability") == 0.16)
    assert(o.getAs[Double]("resolution") == 0.0)
    assert(o.getAs[Double]("uncertainty") == 0.25)
  }

  test("kruskalWallis: textbook no-tie case gives H = 7.2 exactly; " +
    "tie correction is a no-op without ties") {
    import spark.implicits._
    // A={1,2,3} B={4,5,6} C={7,8,9}: ranks are 1..9, R = 6/15/24,
    // H = 12/90 * (12 + 75 + 192) - 30 = 7.2 by hand
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L)).toDF("g", "v")
    val r = LabelQuality.kruskalWallis(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 9L && r.getAs[Long]("k_groups") == 3L)
    assert(r.getAs[Double]("h") == 7.2)
    assert(r.getAs[Double]("h_tc") == 7.2)
  }

  test("kruskalWallis: all-equal values give H = 0 with NULL tie " +
    "correction; identical groups give H ~ 0; layout independent") {
    import spark.implicits._
    val flat = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L),
      ("c", 5L), ("c", 5L)).toDF("g", "v")
    val rf = LabelQuality.kruskalWallis(flat, "g", "v").head()
    assert(rf.getAs[Double]("h") == 0.0)
    assert(rf.isNullAt(3), "total ties -> correction undefined")
    // same distribution in both groups -> H small; a shifted group -> large
    val same = ((1 to 30).map(i => ("a", i.toLong)) ++
      (1 to 30).map(i => ("b", i.toLong))).toDF("g", "v")
    assert(LabelQuality.kruskalWallis(same, "g", "v")
      .head().getAs[Double]("h") < 0.5)
    val shifted = ((1 to 30).map(i => ("a", i.toLong)) ++
      (1 to 30).map(i => ("b", i.toLong + 100))).toDF("g", "v")
    val hs = LabelQuality.kruskalWallis(shifted, "g", "v").head()
    assert(hs.getAs[Double]("h") > 40.0, "disjoint ranks maximize H")
    val again = LabelQuality.kruskalWallis(shifted.repartition(7),
      "g", "v").head()
    assert(again.getAs[Double]("h") == hs.getAs[Double]("h"))
  }
}
