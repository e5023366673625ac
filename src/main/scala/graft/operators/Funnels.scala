package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort analytics over an event stream — the two
  * questions every event pipeline answers right after sessionization
  * (x20): "how many users progressed through these steps IN ORDER",
  * and "how do weekly cohorts retain".
  *
  * Both are exact-integer aggregations (counts, epoch-week quotients,
  * millisecond minima), so results hash-match across engines with no
  * rounding discipline needed.
  */
object Funnels {

  /** Strictly-ordered funnel: stage k counts users whose earliest
    * stage-k event happens STRICTLY AFTER their earliest qualifying
    * stage-(k−1) event (the standard ordered-funnel semantics — a
    * purchase before signup does not convert). Input needs
    * (userCol, tsMsCol, typeCol). Output: one row,
    * n_stage1..n_stageN as the per-stage distinct-user counts.
    *
    * Scale shape: one shuffle-on-user aggregation per stage, each over
    * the per-user minima of the previous stage (monotonically
    * shrinking), never a self-join of raw events against raw events. */
  def orderedFunnel(events: DataFrame, userCol: String, tsMsCol: String,
                    typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val frontiers = stages.tail.scanLeft(
      events.filter(col(typeCol) === stages.head)
        .groupBy(col(userCol).as("u"))
        .agg(min(col(tsMsCol)).as("t"))) { (prev, st) =>
      events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsMsCol).as("ts_"))
        .join(prev, Seq("u"))
        .filter(col("ts_") > col("t"))
        .groupBy("u").agg(min(col("ts_")).as("t"))
    }
    // one lazy plan: each stage count is a 1-row agg, cross-joined —
    // no per-stage driver action
    frontiers.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as(s"n_stage${i + 1}")) }
      .reduce(_ crossJoin _)
  }

  /** Weekly cohort retention: a user's cohort is their first-event
    * epoch week; each (cohort_week, weeks_since) cell counts the
    * cohort's users active that week. One first-seen aggregation +
    * one distinct-count aggregation, both user-keyed. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsMsCol: String,
                      weekMs: Long = 604800000L): DataFrame = {
    // floor, not cast-truncation: cast("long") truncates toward zero,
    // which disagrees with epoch-week floor division for pre-1970
    // timestamps (negative ms)
    val weeks = events.select(col(userCol).as("u"),
      floor(col(tsMsCol) / weekMs).cast("long").as("w"))
    val first = weeks.groupBy("u").agg(min(col("w")).as("cohort_week"))
    weeks.join(first, Seq("u"))
      .groupBy(col("cohort_week"),
        (col("w") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Top-k co-occurring event-type pairs: how many distinct users
    * performed BOTH types (market-basket 2-itemset support over users).
    * The "which behaviors travel together" dashboard row.
    *
    * Scale shape: the (user, type) DISTINCT projection first — so the
    * per-user self-join pairs distinct TYPES, bounded by the type
    * cardinality (tens), never by the user's event count (thousands);
    * per-user work is O(T²) with tiny T, and the pair aggregation
    * shuffles at most types² keys. Pair canonicalization (a < b) makes
    * each pair count once. */
  def cooccurrence(events: DataFrame, userCol: String, typeCol: String,
                   k: Int = 20): DataFrame = {
    val ut = events.select(col(userCol).as("u"), col(typeCol).as("t"))
      .distinct()
    val pairs = ut.as("x").join(ut.as("y"), col("x.u") === col("y.u"))
      .filter(col("x.t") < col("y.t"))
      .select(col("x.t").as("type_a"), col("y.t").as("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_users"))
    Ranked.rankBounded(pairs, k,
      Seq(col("n_users").desc, col("type_a"), col("type_b")))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next = b | current = a), the product-analytics view
    * behind "what do users do after X" and the behavioral-cloning
    * prior a recommender bootstrap uses. One window per user (ordered
    * by time, event-id tiebreak — deterministic under timestamp
    * collisions), exact integer counts, one rounded division.
    * Returns (from_type, to_type, n, p). */
  def transitionMatrix(events: DataFrame, userCol: String,
                       tsCol: String, idCol: String, typeCol: String,
                       roundTo: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type")
      .agg(sum(col("n")).as("_tot"))
    pairs.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        graft.functions.TextFunctions.portableRound(
          col("n").cast("double") / col("_tot").cast("double"), roundTo)
          .as("p"))
  }

  /** Entropy summary of the [[transitionMatrix]] chain: per current
    * state H(next | cur = a) = −Σ_b p(b|a)·log2 p(b|a) plus the
    * chain's conditional entropy H(next | cur) = Σ_a p(a)·H_a — the
    * one-scalar "how predictable is the behavioral stream" gauge
    * (0 bits = deterministic funnels; log2(types) = uniform noise).
    *
    * Determinism: probabilities come from exact integer transition
    * counts; each per-state entropy folds over a to_type-sorted
    * bounded list (≤ |event types| elements), the total over a
    * from_type-sorted one. Output: one row per from_type (p_state,
    * h_bits) with h_conditional replicated. */
  def transitionEntropy(events: DataFrame, userCol: String,
                        tsCol: String, idCol: String, typeCol: String,
                        roundTo: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val perState = pairs.groupBy("from_type")
      .agg(sum(col("n")).as("tot"),
        array_sort(collect_list(struct(col("to_type"), col("n"))))
          .as("arr"))
      .select(col("from_type"), col("tot"),
        (lit(0.0) - aggregate(col("arr"), lit(0.0), (acc, s) => {
          val p = s.getField("n").cast("double") / col("tot").cast("double")
          acc + p * log2(p)
        })).as("h_raw"))
    val grand = perState.agg(sum(col("tot")).as("gt"),
      array_sort(collect_list(struct(col("from_type"), col("tot"),
        col("h_raw")))).as("arr"))
      .select(col("gt"),
        aggregate(col("arr"), lit(0.0), (acc, s) =>
          acc + s.getField("tot").cast("double") /
            col("gt").cast("double") * s.getField("h_raw"))
          .as("h_cond_raw"))
    perState.crossJoin(broadcast(grand))
      .select(col("from_type"), col("tot").as("n_transitions"),
        graft.functions.TextFunctions.portableRound(
          col("tot").cast("double") / col("gt").cast("double"), roundTo)
          .as("p_state"),
        graft.functions.TextFunctions.portableRound(col("h_raw"), roundTo)
          .as("h_bits"),
        graft.functions.TextFunctions.portableRound(col("h_cond_raw"),
          roundTo).as("h_conditional"))
      .orderBy("from_type")
  }

  /** Exponentially time-decayed engagement per event type — recency
    * weighting as EXACT integer arithmetic: weight = 2^20 >> (age
    * weeks), i.e. a halving per `halflifeDays`, summed as plain longs.
    * No `pow`, no float accumulation, no cross-engine drift — and the
    * decayed mass is mergeable (sums of longs), so incremental
    * maintenance through the store is free. `refUs` anchors age;
    * pass the corpus max timestamp for "as of latest data". */
  def decayedCounts(events: DataFrame, typeCol: String, tsCol: String,
                    refUs: Long, halflifeDays: Int = 7): DataFrame = {
    require(halflifeDays >= 1, "halflifeDays must be >= 1")
    // integer `div` end to end (a `/` on longs would detour through
    // doubles); clamp the shift to [0, 40] — 2^20 >> 40 = 0 above, and
    // events AFTER refUs (clock skew, refUs = "now" instead of
    // max(ts)) must weigh at least the full 2^20, not fall into
    // Java's mod-64 shift (1 >> -1 = >> 63 = 0) below
    val shift = least(
      greatest(
        expr(s"((${refUs}L - unix_micros($tsCol)) div 86400000000L) " +
          s"div ${halflifeDays}L"),
        lit(0L)),
      lit(40L)).cast("int")
    events.groupBy(col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(call_function("shiftright", lit(1048576L), shift))
          .as("decayed_q"))
  }
}
