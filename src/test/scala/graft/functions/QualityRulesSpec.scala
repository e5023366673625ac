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
}
