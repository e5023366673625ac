package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** TF-IDF keyword extraction: the top-k most characteristic terms per
  * document — corpus summarization / topic tagging for curation
  * dashboards and domain-mix reports.
  *
  * The score is tf · N / df (the log-free tf-idf variant): tf, N, df
  * are exact integers, so the single IEEE division makes the score
  * bit-identical on any engine — a `ln`-based idf would hinge on libm
  * rounding and could flip rank ties across engines. Ties break on the
  * term itself for full determinism.
  *
  * Scale shape: one (doc, term) hash aggregation (map-side combined),
  * one term-level df aggregation joined back on term (a term-keyed
  * shuffle), the corpus size via a broadcast single-row cross join (no
  * driver action), and a per-doc top-k window. All linear in corpus
  * token count; the df join is the classic skew point (stopwords) —
  * at 100 TB pair it with [[Salting]] or a stopword pre-filter. */
object TfIdf {

  /** (doc_id, term, tf, score, rn) for the top `k` terms per document,
    * lowercased tokens; rank by (score desc, term asc). */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus size as ONE scalar count job (the k-means-centroid
    // pattern: O(1) driver data to parameterize the plan) — folding it
    // in as a literal keeps the scoring projection a pure codegen pass
    // instead of threading a 1-row broadcast through every stage
    val nDocs = df.count().toDouble
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .withColumn("score",
        col("tf").cast("double") * lit(nDocs) / col("df").cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("score"),
        col("rn").cast("int").as("rn"))
  }

  /** BM25 retrieval: the top-`k` documents for a bag-of-terms query —
    * the lexical ranking half of every retrieval-augmented pipeline
    * (and of dataset search over a 100 TB corpus).
    *
    * score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the Lucene idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Determinism across engines, term by term:
    *   - tf per query term is PIVOTED into fixed columns (one hash agg
    *     over the term-filtered explode), so the score is a sum in
    *     fixed expression order — never an aggregation-order float sum;
    *   - idf is computed once from exact integer (N, df) and
    *     portable-rounded to 1e-6 before entering the score;
    *   - the score is rounded to `roundTo` BEFORE ranking, doc_id
    *     tiebreak.
    *
    * Scale shape: the explode is filtered to the query terms at scan
    * (predicate pushdown on the token — the inverted-index access path
    * without the index); corpus stats (N, Σdl) and per-term df are two
    * O(#terms) scalar jobs parameterizing the plan (the k-means-centroid
    * pattern); ranking is orderBy·limit = TakeOrderedAndProject (each
    * partition keeps k, no global sort). Docs containing no query term
    * score 0 and are not returned. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75,
               roundTo: Int = 4): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "query terms must be non-empty and distinct")
    val dl = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCount(lower(col(textCol))).as("dl"))
    val statsRow = dl.agg(count(lit(1)), sum(col("dl"))).head()
    val nDocs = statsRow.getLong(0)
    require(nDocs > 0, "bm25: empty corpus")
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf$i") }
    val tf = toks.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
      .join(dl, Seq("doc_id"))
    val dfRow = tf.select(queryTerms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*).head()
    val idfs = queryTerms.indices.map { i =>
      val dfT = if (dfRow.isNullAt(i)) 0L else dfRow.getLong(i)
      math.floor(math.log(
        1.0 + (nDocs - dfT + 0.5) / (dfT + 0.5)) * 1e6 + 0.5) / 1e6
    }
    val denomTail = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("dl").cast("double") / lit(avgdl))
    val score = queryTerms.indices.map { i =>
      val tfD = col(s"tf$i").cast("double")
      lit(idfs(i)) * (tfD * lit(k1 + 1.0)) / (tfD + denomTail)
    }.reduce(_ + _)
    val scored = tf
      .withColumn("score", TextFunctions.portableRound(score, roundTo))
      .select(col("doc_id"), col("score"))
    Ranked.rankBounded(scored, k,
      Seq(col("score").desc, col("doc_id").asc))
  }

  /** Ranked retrieval by Dirichlet-smoothed query likelihood — the
    * language-modeling scorer of classic IR (Zhai & Lafferty), the
    * third member of the retrieval family next to [[bm25TopK]]
    * (probabilistic) and [[queryScoreTopK]] (vector-space):
    * score(q,d) = Σ_t log2((tf(t,d) + μ·cf(t)/|C|) / (|d| + μ)).
    * Smoothing gives EVERY document a finite score (a zero-tf term
    * backs off to the collection model), so this ranker distinguishes
    * "missing one term" from "missing all" where BM25 just scores 0.
    *
    * Determinism: tf/|d| are exact longs; cf(t) and |C| are collected
    * once (|terms|+1 integers) and shipped as exact integer literals,
    * so each term's double is one IEEE tree identical on any engine;
    * the fixed query-term order makes the 3-term sum order-stable.
    * Query terms with cf = 0 (absent from the corpus) are dropped on
    * both sides — they would send every document to −∞ equally.
    * Negative scores round through the +1000 shift (the κ pattern).
    *
    * Scale shape: same as [[bm25TopK]] — a term-filtered explode, one
    * tf aggregation, a length table, [[Ranked.rankBounded]] top-k. */
  def queryLikelihoodTopK(df: DataFrame, idCol: String, textCol: String,
                          queryTerms: Seq[String], k: Int = 20,
                          mu: Double = 2000.0, roundTo: Int = 4)
      : DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "query terms must be non-empty and distinct")
    val dl = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokenCount(lower(col(textCol))).as("dl"))
    val toks = df.select(
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val cfRows = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = dl.agg(coalesce(sum(col("dl")), lit(0L))).head().getLong(0)
    require(total > 0, "query likelihood: empty corpus")
    val live = queryTerms.filter(t => cfRows.getOrElse(t, 0L) > 0L)
    require(live.nonEmpty, "query likelihood: no query term in corpus")
    val tfCols = live.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf$i") }
    val tf = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(live: _*))
      .groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val base = dl.join(tf, Seq("doc_id"), "left")
    val score = live.zipWithIndex.map { case (t, i) =>
      val tfD = coalesce(col(s"tf$i"), lit(0L)).cast("double")
      log2((tfD + lit(mu) * lit(cfRows(t)).cast("double") /
        lit(total).cast("double")) /
        (col("dl").cast("double") + lit(mu)))
    }.reduce(_ + _)
    val scored = base.select(col("doc_id"),
      TextFunctions.portableRound(score + lit(1000.0), roundTo)
        .minus(lit(1000.0)).as("score"))
    Ranked.rankBounded(scored, k,
      Seq(col("score").desc, col("doc_id").asc))
  }

  /** Ranked retrieval by plain tf·idf over a fixed query — the second
    * scorer of the hybrid-retrieval pair (BM25 saturates tf and
    * length-normalizes; raw tf·idf rewards repetition). score =
    * Σ_t tf(t,d) · (N / df_t) with the log-free idf of [[topTerms]]:
    * exact integers until one division per term, so ranks can never
    * flip on libm rounding. Docs matching no term are absent (score 0).
    * Same plan shape as [[bm25TopK]] minus the length table. */
  def queryScoreTopK(df: DataFrame, idCol: String, textCol: String,
                     queryTerms: Seq[String], k: Int = 20,
                     roundTo: Int = 4): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      "query terms must be non-empty and distinct")
    val nDocs = df.count()
    require(nDocs > 0, "tfidf: empty corpus")
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf$i") }
    val tf = toks.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val dfRow = tf.select(queryTerms.indices.map(i =>
      sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*).head()
    val score = queryTerms.indices.map { i =>
      val dfT = if (dfRow.isNullAt(i)) 0L else dfRow.getLong(i)
      if (dfT == 0L) lit(0.0)
      else col(s"tf$i").cast("double") * lit(nDocs.toDouble / dfT)
    }.reduce(_ + _)
    val scored = tf
      .withColumn("score", TextFunctions.portableRound(score, roundTo))
      .select(col("doc_id"), col("score"))
    Ranked.rankBounded(scored, k,
      Seq(col("score").desc, col("doc_id").asc))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two ranked lists:
    * fused(d) = Σ_r 1/(c + rank_r(d)), summing over the lists that
    * rank d (absent ⇒ contributes 0). The standard way RAG stacks
    * combine a lexical ranker with a second signal without score
    * calibration — only RANKS enter, so the two scorers' scales never
    * meet.
    *
    * Both inputs are top-k tables ((id, rn)), i.e. k-row frames by
    * construction — the fusion join, sort, and re-rank all run on
    * O(k) rows regardless of corpus size; the heavy lifting happened
    * inside the rankers. The fused sum is a fixed-order two-term fold
    * of exact-integer reciprocals — deterministic on any engine. */
  def rrfFusion(a: DataFrame, b: DataFrame, idCol: String, k: Int,
                c: Int = 60, roundTo: Int = 6): DataFrame = {
    val fa = a.select(col(idCol).as("doc_id"), col("rn").as("rn_a"))
    val fb = b.select(col(idCol).as("doc_id"), col("rn").as("rn_b"))
    val fused = fa.join(fb, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rn_a").cast("int"),
        col("rn_b").cast("int"),
        TextFunctions.portableRound(
          coalesce(lit(1.0) / (lit(c) + col("rn_a")).cast("double"),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rn_b")).cast("double"),
            lit(0.0)),
          roundTo).as("rrf"))
    Ranked.rankBounded(fused, k,
      Seq(col("rrf").desc, col("doc_id").asc))
  }

  /** Sparse all-pairs document cosine similarity over tf·idf weights —
    * the LEXICAL near-dup/similarity join (MinHash answers "how much
    * text overlaps"; this answers "how similar are the term
    * distributions", the signal behind tf-idf-based clustering and
    * template detection).
    *
    * Candidate generation is PREFIX-FILTERED the way similarity-join
    * engines do it (cf. prefix filtering, Chaudhuri et al. 2006;
    * DIMSUM's "never all-pairs" discipline): two documents become a
    * candidate pair only if they share at least one DISCRIMINATIVE
    * term (df ≤ `maxDf`). High-df terms (stopwords) are exactly the
    * posting lists whose self-join is O(df²) — the df cap excludes
    * them from candidate generation BY CONTRACT (documented recall
    * bound, the LSH-family ⊘ pattern: a pair sharing only stopwords is
    * not similar in any useful sense). The full dot product — ALL
    * shared terms, stopwords included — is then gathered for candidate
    * pairs only (the LSH-verify shape). Size `maxDf` RELATIVE to the
    * corpus (e.g. 1–10 % of N): "discriminative" is a share, not a
    * count — a fixed small cap on a 10× corpus leaves no candidate
    * terms at all (ScaleStress measures exactly that).
    *
    * Determinism across engines, term by term:
    *   - weights are the log-free tf·idf of [[topTerms]] quantized to
    *     integers: wq = floor(tf·(N/df)·q + 0.5) — one IEEE multiply
    *     chain from exact integers, then integer forever after;
    *   - norms and dots are DECIMAL(38,0) sums of wq products — exact
    *     at any corpus size (no silent Int64 wrap on either engine);
    *   - the threshold test is pure 128-bit integer arithmetic:
    *     keep iff dot²·10⁴ ≥ bp²·‖a‖²·‖b‖² (bp = cosine·100), so no
    *     pair can flip on float rounding at the boundary;
    *   - the reported cosine is one IEEE divide/sqrt over exact
    *     integers, portable-rounded.
    *
    * Scale shape: two map-side-combined hash aggs (tf, df), one
    * term-keyed join, candidate pairs bounded by Σ_{df≤maxDf} df² ≤
    * maxDf · corpus-tokens (linear with the cap), and a candidate-
    * restricted gather join. No window, no driver state, no all-pairs
    * anywhere. */
  def cosinePairs(df: DataFrame, idCol: String, textCol: String,
                  minCosineBp: Int = 50, maxDf: Long = 50,
                  q: Int = 1, idfCap: Double = 10000.0,
                  roundTo: Int = 4): DataFrame = {
    require(minCosineBp >= 0 && minCosineBp <= 100,
      "minCosineBp is cosine·100 in [0,100]")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus size as ONE scalar job parameterizing the plan (the
    // k-means-centroid pattern, as topTerms)
    val nDocs = df.count().toDouble
    // idf is CAPPED (the log-free analogue of log-idf's damping):
    // cosine is weight-scale-invariant, and the cap is what keeps the
    // 128-bit threshold compare in range at ANY corpus size — with
    // uncapped N/df a single ultra-rare term at web scale pushes
    // dot²·10⁴ past DECIMAL(38) (found by ScaleStress at factor 10:
    // every pair silently nulled). Bound: wq ≤ tf·idfCap·q, so docs up
    // to ~30k tokens stay exact at the defaults; the cap engages only
    // when df < N/idfCap (never at verification scale — sf0.01/0.1
    // results are cap-free).
    val w = tf.join(dfreq, Seq("term"))
      .select(col("doc_id"), col("term"), col("df"),
        floor(col("tf").cast("double") *
            least(lit(nDocs) / col("df").cast("double"), lit(idfCap)) *
            lit(q.toDouble) + lit(0.5))
          .cast(dec).as("wq"))
    val norms = w.groupBy("doc_id")
      .agg(sum(col("wq") * col("wq")).as("norm2"))
    val rare = w.filter(col("df") <= maxDf).select("doc_id", "term")
    val cand = rare.as("a")
      .join(rare.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val wa = w.select(col("doc_id").as("id_a"), col("term"),
      col("wq").as("wqa"))
    val wb = w.select(col("doc_id").as("_idb"), col("term").as("term_b"),
      col("wq").as("wqb"))
    val dot = cand.join(wa, Seq("id_a"))
      .join(wb, col("id_b") === col("_idb") && col("term") === col("term_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"), sum(col("wqa") * col("wqb")).as("dot"))
    val bp2 = minCosineBp.toLong * minCosineBp
    dot
      .join(norms.select(col("doc_id").as("id_a"), col("norm2").as("na")),
        Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"), col("norm2").as("nb")),
        Seq("id_b"))
      .filter(col("dot") * col("dot") * lit(10000L) >=
        lit(bp2) * col("na") * col("nb"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        TextFunctions.portableRound(
          col("dot").cast("double") /
            sqrt(col("na").cast("double") * col("nb").cast("double")),
          roundTo).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** Geometric rank weights p^(d−1) for [[rboCurve]], computed ONCE on
    * the JVM and shared with any oracle as literals — iterated or
    * library pow can disagree by an ulp across engines, so neither side
    * recomputes them. */
  def rboWeights(p: Double, depth: Int): Seq[Double] =
    (1 to depth).map(d => math.pow(p, d - 1))

  /** Rank-biased overlap (Webber et al. 2010), truncated at `depth`:
    * how much two rankings of the same query agree, weighted toward the
    * top — the ranker-comparison row a retrieval team reads before
    * deciding whether fusing (x103's RRF) is even worth it (RBO ≈ 1:
    * the rankers are redundant; low RBO: they see different things).
    *
    * Output: one row per depth d — (d, n_overlap, agreement = |A∩B|/d,
    * rbo), with `rbo` the truncated RBO (1−p)·Σ p^(d−1)·agreement(d)
    * repeated on every row (curve + scalar in one shape). Overlap at
    * depth d counts ids ranked ≤ d in BOTH lists, so the whole curve
    * comes from one join of two ≤ depth-row tables. Float terms fold
    * in d order; the geometric weights are [[rboWeights]] literals. */
  def rboCurve(a: DataFrame, b: DataFrame, idCol: String,
               depth: Int = 20, p: Double = 0.9, w: Double = 0.1,
               roundTo: Int = 4): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val ra = a.select(col(idCol).as("id"), col("rn").cast("long").as("ra"))
      .filter(col("ra") <= depth)
    val rb = b.select(col(idCol).as("id"), col("rn").cast("long").as("rb"))
      .filter(col("rb") <= depth)
    val com = ra.join(rb, Seq("id"))
      .select(greatest(col("ra"), col("rb")).as("mx"))
    val depths = spark.range(1, depth + 1)
      .select(col("id").cast("int").as("d"))
    val ov = depths.join(com, col("mx") <= col("d"), "left")
      .groupBy("d").agg(count(col("mx")).as("n_overlap"))
    val pwDf = rboWeights(p, depth).zipWithIndex
      .map { case (pv, i) => (i + 1, pv) }.toDF("d", "pw")
    val wc = ov.join(broadcast(pwDf), Seq("d"))
      .select(col("d"), col("n_overlap"),
        TextFunctions.portableRound(
          col("n_overlap").cast("double") / col("d").cast("double"),
          roundTo).as("agreement"),
        (col("pw") * (col("n_overlap").cast("double") /
          col("d").cast("double"))).as("term"))
    val rbo = wc
      .agg(array_sort(collect_list(struct(col("d"), col("term")))).as("arr"))
      .select(TextFunctions.portableRound(
        lit(w) * aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("term")), 6).as("rbo"))
    wc.select(col("d"), col("n_overlap"), col("agreement"))
      .crossJoin(broadcast(rbo))
      .orderBy("d")
  }
}
