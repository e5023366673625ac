package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.unsafe.types.UTF8String

/** Registers graft's custom codegen expressions as SQL functions via the
  * standard `SparkSessionExtensions` hook, so `spark.sql(...)` users get
  * them too:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  *   // or, on an already-built session: GraftExtensions.registerAll(spark)
  *
  *   SELECT graft_dot_product(a.embedding, b.embedding) ...
  *   SELECT graft_sorted_jaccard(graft_ngrams_long(a.text, 3),
  *                               graft_ngrams_long(b.text, 3)) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name, usage), builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot_product",
      "graft_dot_product(a, b) - codegen'd dot product of two array<float|double>",
      exprs => DotProduct(exprs(0), exprs(1))),
    ("graft_sorted_jaccard",
      "graft_sorted_jaccard(a, b) - jaccard of two sorted distinct array<long>, rounded to 4",
      exprs => SortedJaccard(exprs(0), exprs(1))),
    ("graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - common-element count of two sorted arrays",
      exprs => SortedIntersectCount(exprs(0), exprs(1))),
    ("graft_ngrams_long",
      "graft_ngrams_long(text, n) - sorted distinct char n-grams packed into longs (n<=3)",
      exprs => NgramsLong(exprs(0),
        exprs(1).eval().asInstanceOf[Int])),
    ("graft_minhash_sig",
      "graft_minhash_sig(text, numHashes, shingleN) - one-pass MinHash signature " +
        "(md5-60 mod p base hash; empty-shingle texts yield an empty array)",
      exprs => MinhashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])),
    ("graft_simhash_sig",
      "graft_simhash_sig(text) - one-pass 32-bit SimHash (-1 for token-less texts)",
      exprs => SimhashSig(exprs(0))),
    ("graft_token_stats",
      "graft_token_stats(text) - one-pass (n_tok, mean_tok_len, " +
        "max_freq_ratio, alpha_ratio) struct for quality-rule gates",
      exprs => TokenStatsExpr(exprs(0))),
    ("graft_unicode_normalize",
      "graft_unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') - " +
        "Unicode normalization (TR#15); no-alloc fast path when already normalized",
      exprs => UnicodeNormalize(exprs(0),
        exprs(1).eval().asInstanceOf[UTF8String].toString)),
    ("graft_cdc_boundaries",
      "graft_cdc_boundaries(text, w, mask) - content-defined chunk " +
        "boundaries (rolling window-polynomial ≡ 0 mod mask+1; doc end " +
        "always included), 1-based character positions",
      exprs => CdcBoundaries(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]))
  )

  /** Register into an ALREADY-BUILT session (extensions only apply at
    * session construction). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
