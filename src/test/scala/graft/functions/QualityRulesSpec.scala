package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String) = {
    val r = Seq((1L, text)).toDF("doc_id", "text")
      .select(QualityRules.tokenStats(col("text")).as("st"))
      .select("st.n_tok", "st.mean_tok_len", "st.max_freq_ratio", "st.alpha_ratio")
      .head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("token stats: hand-computed metrics in one pass") {
    // 4 tokens, lengths 3+2+3+2=10, 'ab' twice (max freq 2/4)
    val (n, mean, rep, alpha) = statsOf("abc ab 12q ab")
    assert(n == 4)
    assert(mean == 2.5)      // (3+2+3+2)/4
    assert(rep == 0.5)       // 'ab' twice
    assert(alpha == 1.0)     // '12q' contains 'q'
  }

  test("token stats: no-alpha and empty edge cases") {
    assert(statsOf("12 34 56") == ((3L, 2.0, math.floor(1.0 / 3 * 10000 + 0.5) / 10000, 0.0)))
    assert(statsOf("") == ((0L, 0.0, 0.0, 0.0)))
    assert(statsOf("    ") == ((0L, 0.0, 0.0, 0.0)))
  }

  test("line repetition: hand-computed fractions, boilerplate flagged") {
    val docs = Seq(
      // 4 lines: "nav" twice (1 dup of 3 chars), others unique.
      // n_lines=4, dup_line_frac=1/4, chars 3+3+19+9=34, dup 3/34
      (1L, "nav\nreal content here 1\nsome tail\nnav"),
      // pathological boilerplate: same line 10x
      (2L, (1 to 10).map(_ => "cookie banner").mkString("\n")),
      // no newline at all: one line, zero repetition
      (3L, "single line doc"),
      // empty text: the lone blank line is a separator, not content
      (4L, ""),
      // ordinary prose, 5 paragraphs with blank separators: the 4
      // duplicate empties must NOT count (3/9 = 0.33 would reject it)
      (5L, "para one\n\npara two\n\npara three\n\npara four\n\npara five")
    ).toDF("doc_id", "text")
    val r = QualityRules.lineRepetitionStats(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getBoolean(4))))
      .toMap
    assert(r(1L) == ((4L, 0.25, math.floor(3.0 / 34 * 10000 + 0.5) / 10000,
      true)))
    assert(r(2L) == ((10L, 0.9, 0.9, false)))
    assert(r(3L) == ((1L, 0.0, 0.0, true)))
    assert(r(4L) == ((0L, 0.0, 0.0, true)))
    assert(r(5L) == ((5L, 0.0, 0.0, true)),
      "blank paragraph separators are not duplicate lines")
  }

  test("gopher keep composes the four gates") {
    val df = Seq(
      (1L, (1 to 60).map(i => s"word$i").mkString(" ")),      // healthy
      (2L, (1 to 60).map(_ => "loop").mkString(" ")),          // repetition
      (3L, (1 to 60).map(_ => "1234").mkString(" ") + " x")    // numeric soup
    ).toDF("doc_id", "text")
      .select(col("doc_id"),
        QualityRules.gopherKeep(QualityRules.tokenStats(col("text"))).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(df(1L) && !df(2L) && !df(3L))
  }

  private def probOf(text: String): Double =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(TextFunctions.classifierProb(col("text")).as("p"))
      .head().getDouble(0)

  test("logistic classifier ranks prose over soup, shouting, emptiness") {
    val prose = "the quick brown fox jumps over a lazy dog and then " +
      "the fox sits by the river for a while watching the water flow"
    assert(probOf(prose) > probOf("!!! ??? ;;; ,,, ... :::"),
      "punctuation soup scores below prose")
    assert(probOf(prose) > probOf("BUY NOW LIMITED OFFER ACT FAST TODAY"),
      "all-caps spam scores below prose")
    assert(probOf("") == math.floor(
      1.0 / (1.0 + math.exp(-TextFunctions.ClassifierBias)) * 1e4 + 0.5) / 1e4,
      "featureless doc sits at sigmoid(bias)")
  }

  test("classifier probability is monotone in stopword density") {
    val low = (1 to 40).map(i => s"zq$i").mkString(" ")
    val high = (1 to 20).map(i => s"zq$i the").mkString(" ")
    assert(probOf(high) > probOf(low))
  }
}
