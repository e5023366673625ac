package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram-language-model subword training (Kudo 2018,
  * arXiv:1804.10959 — the SentencePiece `--model_type=unigram`
  * family), as hard-EM over the corpus's DISTINCT-WORD table: the
  * sibling of [[Bpe]] (real pipelines ship both tokenizers and the
  * two trainers share the same vocabulary-not-corpus scale shape).
  *
  * The loop, per EM iteration:
  *   - E-step: each word takes its VITERBI segmentation under the
  *     current piece scores (score = round-to-1e-6 of ln(count/total),
  *     so both engines compare identical doubles); piece usage counts
  *     are the segmentation's pieces weighted by word frequency.
  *   - M-step: keep every single character (coverage can never be
  *     lost) plus the top `vocabTarget` multi-character pieces by
  *     (usage desc, piece asc); re-score from the kept usages with
  *     single-character counts floored at 1 (a zero-usage character
  *     must keep a finite log-probability — SentencePiece's character
  *     floor, made integer-deterministic).
  *
  * Every choice is totally ordered so the training replays
  * cross-engine: Viterbi candidates compare by the struct
  * (−score, n_pieces, path) — maximal probability, then fewest
  * pieces, then lexicographically smallest piece sequence (U+001F
  * joins the path, sorting below every printable char). That key has
  * optimal substructure (appending one piece preserves the order of
  * two same-prefix candidates: score/n_pieces add equally, and the
  * first divergence of two same-prefix paths is at a separator-vs-char
  * position that the appended suffix cannot reach), so the engine's
  * O(len · maxPieceLen) left-to-right DP provably selects the SAME
  * segmentation the oracle finds by exhaustively enumerating all
  * 2^(len−1) cut masks and sorting by the same key — the DP is the
  * 100 TB path, the enumeration is the verification-scale spec.
  *
  * Fallback words (separator collision, beyond-BMP, or longer than
  * [[MaxTrainWordLen]]) sit out of training and encode as ONE piece —
  * [[Bpe]]'s byte-fallback analog, and what bounds the oracle's
  * enumeration. Scale shape: seeding and the E-step are linear scans
  * of the distinct-word table (Zipf-tiny vs the corpus) with one
  * piece-count shuffle per iteration; encoding is a word-table join
  * the corpus explode broadcasts against. */
object UnigramLm {

  val Sep: String = Bpe.Sep // U+001F, shared with the BPE oracle fold
  val MaxTrainWordLen = 16

  /** Words excluded from training (encode as one whole-word piece). */
  def fallbackWord(c: Column): Column =
    Bpe.fallbackWord(c) || length(c) > MaxTrainWordLen

  /** Distinct non-fallback words with corpus frequencies. The
    * zero-length token (tokens() preserves a leading-separator empty
    * split, by design shared with the oracle) trains nothing — it has
    * no characters to cover — and encodes through the OOV one-piece
    * path like any other out-of-table word. */
  private def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) >= 1 && !fallbackWord(col("w")))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), length(col("w")).cast("int").as("len"))
      .localCheckpoint()

  /** Seed candidates: every substring of length 1..maxPieceLen, each
    * occurrence weighted by its word's frequency. */
  private def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("cnt"), explode(flatten(
        transform(sequence(lit(0), col("len") - 1), j =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), col("len") - j)), l =>
            col("w").substr(j + 1, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))

  /** The word table's full character set — the coverage floor every
    * M-step must retain: a char absorbed into multi-char pieces in one
    * iteration has NO usage count, but pruning it would make its words
    * unsegmentable the moment their multi-char hosts are pruned. */
  private def charSet(words: DataFrame): DataFrame =
    words.select(explode(transform(sequence(lit(1), col("len")),
        i => col("w").substr(i, lit(1)))).as("piece"))
      .distinct().localCheckpoint()

  /** M-step prune + re-score: the WHOLE character set (usage floored
    * at 1, zero-usage chars included) plus the top `vocabTarget`
    * multi-char pieces by (cnt desc, piece asc); score =
    * round6(ln(cnt / total)) over the kept set. */
  private def prunedScores(counts: DataFrame, chars: DataFrame,
                           vocabTarget: Int): DataFrame = {
    val singles = chars
      .join(counts.filter(length(col("piece")) === 1), Seq("piece"), "left")
      .select(col("piece"),
        greatest(coalesce(col("cnt"), lit(0L)), lit(1L)).as("cnt"))
    val multis = Ranked.rankBounded(
        counts.filter(length(col("piece")) > 1 && col("cnt") > 0),
        vocabTarget, Seq(col("cnt").desc, col("piece").asc))
      .select(col("piece"), col("cnt"))
    val kept = singles.unionByName(multis)
    val total = kept.agg(sum("cnt")).head().getLong(0)
    kept.select(col("piece"), col("cnt"),
        TextFunctions.portableRound(
          log(col("cnt").cast("double") / lit(total.toDouble)), 6)
          .as("score"))
      .localCheckpoint()
  }

  /** One E-step: Viterbi-segment every word under `scores`, returning
    * (w, cnt, n_pieces, path) with `path` the Sep-joined pieces. */
  private def viterbi(words: DataFrame, scores: DataFrame,
                      maxPieceLen: Int): DataFrame = {
    // candidate edges (j → i covers w[j+1..i]) that have a score; the
    // map key packs (j, i) — both < MaxTrainWordLen+1 ≤ 64
    val edges = words.select(col("w"), explode(flatten(
        transform(sequence(lit(0), col("len") - 1), j =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), col("len") - j)), l =>
            struct((j * 64 + j + l).cast("int").as("key"),
              col("w").substr(j + 1, l).as("piece")))))).as("e"))
      .select(col("w"), col("e.key").as("key"), col("e.piece").as("piece"))
      .join(scores.select(col("piece"), col("score")), Seq("piece"))
      .select(col("w"), col("key"),
        struct((-col("score")).as("nc"), col("piece").as("piece")).as("ev"))
    val em = edges.groupBy("w")
      .agg(map_from_entries(collect_list(struct(col("key"), col("ev"))))
        .as("em"))
    // dp[i] (1-indexed into acc at i+1) = the minimal
    // (ns, np, path) key over segmentations of w[1..i]; single-char
    // pieces are always scored, so every position is reachable
    val dp = words.join(em, Seq("w"), "left")
      .withColumn("best", element_at(
        aggregate(sequence(lit(1), col("len")),
          array(struct(lit(0.0).as("ns"), lit(0).as("np"),
            lit("").as("path"))),
          (acc, i) => concat(acc, array(array_min(filter(
            transform(
              sequence(greatest(lit(0), i - maxPieceLen), i - 1),
              j => {
                val e = element_at(col("em"), (j * 64 + i).cast("int"))
                val p = element_at(acc, (j + 1).cast("int"))
                when(e.isNotNull, struct(
                  (p.getField("ns") + e.getField("nc")).as("ns"),
                  (p.getField("np") + 1).as("np"),
                  when(j === 0, e.getField("piece"))
                    .otherwise(concat(p.getField("path"), lit(Sep),
                      e.getField("piece"))).as("path")))
              }),
            c => c.isNotNull))))),
        -1))
    dp.select(col("w"), col("cnt"), col("len"),
      col("best.np").cast("long").as("n_pieces"),
      col("best.path").as("path"))
  }

  /** Piece usages of an E-step, weighted by word frequency. */
  private def usageCounts(seg: DataFrame): DataFrame =
    seg.select(col("cnt"),
        explode(split(col("path"), Sep, -1)).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))

  /** Train `iters` hard-EM iterations; returns (vocab, wordPieces):
    * vocab = (piece, cnt, score) of the final kept set, wordPieces =
    * (w, n_pieces) of the final segmentation — [[encodeStats]]'s join
    * table, exactly [[Bpe.train]]'s second return. */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int,
            seedVocab: Int, vocabTarget: Int,
            iters: Int): (DataFrame, DataFrame) = {
    require(maxPieceLen >= 1 && seedVocab >= 1 && vocabTarget >= 1 &&
      iters >= 1, "unigram-lm parameters must be >= 1")
    val ws = words(df, textCol)
    val chars = charSet(ws)
    var scores = prunedScores(seedCounts(ws, maxPieceLen), chars, seedVocab)
    var seg = viterbi(ws, scores, maxPieceLen)
    for (_ <- 1 to iters) {
      scores = prunedScores(usageCounts(seg), chars, vocabTarget)
      seg = viterbi(ws, scores, maxPieceLen)
    }
    (scores.select(col("piece"), col("cnt"), col("score")),
      seg.select(col("w"), col("n_pieces")))
  }

  /** Per-document piece counts under a trained vocabulary — the same
    * contract as [[Bpe.encodeStats]] (fallback and out-of-table words
    * count one piece). */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
                  wordPieces: DataFrame): DataFrame =
    Bpe.encodeStats(df, idCol, textCol,
      wordPieces.select(col("w"), col("n_pieces")))
}
