package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Privacy / data-governance analytics — the release-gate side of the
  * PII family (TextFunctions.redactPii scrubs content; these audit
  * STRUCTURE): k-anonymity over quasi-identifier combinations, the
  * standard "can a row be re-identified by joining public attributes"
  * check a dataset must pass before leaving the curation pipeline.
  *
  * Scale shape: one hash aggregation on the quasi-identifier tuple
  * (combination cardinality bounds the result, not the corpus) plus a
  * one-row summary — map-side combined, no windows, no joins beyond a
  * scalar cross join. Exact integer counts throughout.
  */
object Privacy {

  /** k-anonymity report: one row per quasi-identifier combination with
    * its group size and risk flag (size < k ⇒ the combination pins an
    * individual to fewer than k candidates), plus the dataset's
    * anonymity level (min group size) and risky-row totals replicated
    * per row — the x170 per-row-plus-scalar shape.
    *
    * `quasi` are the published columns an attacker can join on;
    * pre-generalize continuous ones (bucket a balance, truncate a
    * date) BEFORE calling — generalization is the mitigation lever,
    * and this report measures whether it generalized enough. */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], names: Seq[String],
                 k: Int): DataFrame = {
    require(quasi.nonEmpty && quasi.length == names.length,
      "one name per quasi column")
    require(k >= 2, "k-anonymity needs k >= 2")
    val keyed = df.select(quasi.zip(names).map { case (c, n) => c.as(n) }: _*)
    val groups = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("risky", col("n") < k)
    val summary = groups.agg(
      min(col("n")).as("k_anonymity"),
      sum(when(col("risky"), lit(1L)).otherwise(lit(0L))).as("n_risky_groups"),
      sum(when(col("risky"), col("n")).otherwise(lit(0L))).as("n_risky_rows"))
    groups.crossJoin(broadcast(summary))
      .orderBy(names.map(col): _*)
  }

  /** l-diversity report — [[kAnonymity]]'s second gate: a group can be
    * k-anonymous yet leak the SENSITIVE attribute outright when all k
    * rows share it (the homogeneity attack). One row per
    * quasi-identifier combination with its size, the number of
    * DISTINCT sensitive values it contains, and the risk flag
    * (distinct < l); plus the dataset's diversity level (min distinct)
    * and risky totals replicated per row — the kAnonymity shape, so
    * release dashboards read both gates the same way.
    *
    * Scale: one exact distinct-count aggregation on (quasi, sensitive)
    * then a group rollup — two map-side-combined shuffles bounded by
    * combination cardinality. */
  def lDiversity(df: DataFrame, quasi: Seq[Column], names: Seq[String],
                 sensitive: Column, l: Int): DataFrame = {
    require(quasi.nonEmpty && quasi.length == names.length,
      "one name per quasi column")
    require(l >= 2, "l-diversity needs l >= 2")
    val keyed = df.select(
      (quasi.zip(names).map { case (c, n) => c.as(n) } :+
        sensitive.as("_sens")): _*)
    val groups = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col("_sens")).as("l_distinct"))
      .withColumn("risky", col("l_distinct") < l)
    val summary = groups.agg(
      min(col("l_distinct")).as("l_diversity"),
      sum(when(col("risky"), lit(1L)).otherwise(lit(0L)))
        .as("n_risky_groups"),
      sum(when(col("risky"), col("n")).otherwise(lit(0L)))
        .as("n_risky_rows"))
    groups.crossJoin(broadcast(summary))
      .orderBy(names.map(col): _*)
  }

  /** t-closeness report — the third release gate after [[kAnonymity]]
    * and [[lDiversity]]: a group can be k-anonymous AND l-diverse yet
    * still leak when its sensitive-value DISTRIBUTION differs sharply
    * from the global one (the skewness attack — "this group is 90%
    * segment X" is a disclosure even with l distinct values present).
    * Per quasi-identifier group, the distance between the group's
    * sensitive distribution and the corpus-wide distribution; for a
    * categorical sensitive attribute the standard instantiation is
    * total variation distance, TVD = ½ Σ_v |p_g(v) − p(v)| over the
    * sensitive DOMAIN (values absent from the group contribute their
    * full global share). Output mirrors the kAnonymity/lDiversity
    * dashboard shape: one row per group with its size, t_dist and risk
    * flag (t_dist > t), plus the dataset's t-closeness level (max
    * distance) and risky totals replicated per row.
    *
    * Determinism: each |p_g(v) − p(v)| term is an IEEE tree of two
    * exact-integer-ratio divisions (identical in any engine), quantized
    * to a ×10⁸ long BEFORE summing so the per-group reduction is an
    * order-free integer sum (the ESS discipline); the risk compare runs
    * on the quantized long against ⌊t·2·10⁸⌋, never on a rounded
    * double. Scale: two hash aggregations bounded by (group, domain)
    * cardinality, a broadcast domain grid (the sensitive DOMAIN is
    * small by contract — it is the attribute's value set), one scalar
    * summary cross join. */
  def tCloseness(df: DataFrame, quasi: Seq[Column], names: Seq[String],
                 sensitive: Column, t: Double): DataFrame = {
    require(quasi.nonEmpty && quasi.length == names.length,
      "one name per quasi column")
    require(t > 0.0 && t < 1.0, "t-closeness threshold must be in (0,1)")
    val tQ = math.round(t * 2.0e8) // threshold on the quantized TVD sum
    val keyed = df.select(
      (quasi.zip(names).map { case (c, n) => c.as(n) } :+
        sensitive.as("_sens")): _*)
    val groups = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val gv = keyed.groupBy((names.map(col) :+ col("_sens")): _*)
      .agg(count(lit(1)).as("n_gv"))
    val global = keyed.groupBy(col("_sens"))
      .agg(count(lit(1)).as("n_v"))
      .crossJoin(broadcast(keyed.agg(count(lit(1)).as("n_tot"))))
    // group × sensitive-domain grid; cells the group never saw join
    // null and count as |0 − p(v)|
    val grid = groups.crossJoin(broadcast(global))
      .join(gv, names :+ "_sens", "left")
    val dq = floor(abs(
      coalesce(col("n_gv"), lit(0L)).cast("double") / col("n").cast("double")
        - col("n_v").cast("double") / col("n_tot").cast("double"))
      * lit(1.0e8) + lit(0.5)).cast("long")
    val per = grid.select((names.map(col) :+ col("n") :+ dq.as("dq")): _*)
      .groupBy((names.map(col) :+ col("n")): _*)
      .agg(sum(col("dq")).as("tvd_q"))
      .withColumn("t_dist",
        TextFunctions.portableRound(col("tvd_q").cast("double") / lit(2.0e8), 4))
      .withColumn("risky", col("tvd_q") > tQ)
    val summary = per.agg(
      TextFunctions.portableRound(max(col("tvd_q")).cast("double") / lit(2.0e8), 4)
        .as("t_closeness"),
      sum(when(col("risky"), lit(1L)).otherwise(lit(0L)))
        .as("n_risky_groups"),
      sum(when(col("risky"), col("n")).otherwise(lit(0L)))
        .as("n_risky_rows"))
    per.crossJoin(broadcast(summary))
      .select((names.map(col) :+ col("n") :+ col("t_dist") :+ col("risky") :+
        col("t_closeness") :+ col("n_risky_groups") :+ col("n_risky_rows")): _*)
      .orderBy(names.map(col): _*)
  }

  /** Laplace-noised count release — the ε-differential-privacy
    * MECHANISM (sensitivity 1 for disjoint-group counts, scale
    * b = 1/ε), with REPLAYABLE noise: the Laplace draw derives from a
    * salted md5 of the group key via inverse-CDF (u ∈ (0,1] from one
    * hash lane → −b·ln(u) exponential; an independent lane picks the
    * sign), so the release is bit-reproducible for audit and
    * oracle-checkable cross-engine. A PRODUCTION DP release must draw
    * the salt fresh and secret per release (fixed noise across
    * releases composes like no noise at all) — the caller owns that
    * entropy; this operator owns the mechanism, exactly like
    * [[graft.functions.Keys]] owns determinism where the reference
    * used uuid4.
    *
    * Output: (quasi…, n, noised_n, epsilon) — noised_n = n + the
    * rounded draw, floored at 0 (a count release is nonnegative). */
  def laplaceNoisedCounts(df: DataFrame, quasi: Seq[Column],
                          names: Seq[String], epsilon: Double,
                          salt: String = "v1"): DataFrame = {
    require(quasi.nonEmpty && quasi.length == names.length,
      "one name per quasi column")
    require(epsilon > 0.0, "epsilon must be positive")
    val keyed = df.select(quasi.zip(names).map { case (c, n) => c.as(n) }: _*)
    val groups = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val keyStr = concat_ws("|", names.map(c => col(c).cast("string")): _*)
    // u ∈ (0,1]: 60-bit hash + 1 over 2^60; sign from a second lane
    val u = (TextFunctions.md5Hash60(concat(lit(s"lap:$salt:"), keyStr))
      .cast("double") + lit(1.0)) / lit(1152921504606846976.0)
    val sign = when(TextFunctions.md5Hash60(
      concat(lit(s"lapsign:$salt:"), keyStr)) % 2L === 0L,
      lit(1.0)).otherwise(lit(-1.0))
    val noise = sign * (lit(0.0) - log(u)) / lit(epsilon)
    groups.select((names.map(col) :+ col("n") :+
      greatest(col("n") + floor(noise + lit(0.5)).cast("long"), lit(0L))
        .as("noised_n") :+
      lit(epsilon).as("epsilon")): _*)
      .orderBy(names.map(col): _*)
  }
}
