package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Skew mitigation for hot keys (the classic heavy-hitter problem at
  * 100 TB — one region/date pair with 100× the rows of the rest stalls
  * the whole stage on a single reducer).
  *
  * Two standard remedies, deterministic by construction:
  *   - `saltedAgg`: two-phase aggregation — partial agg on
  *     (key, salt) spreads a hot key over `salts` reducers, final agg
  *     recombines. Works for any algebraic aggregate (sum/count/min/max);
  *     pass the re-combine explicitly.
  *   - `saltedJoin`: big side gets a deterministic salt (hash of its
  *     non-key columns mod `salts`); the SMALL side is replicated
  *     `salts`× so every salted big row still finds its match. Use when
  *     the small side is too big to broadcast but the join key is skewed.
  *
  * AQE's skew-join handling (on by default) covers sort-merge cases at
  * runtime; these helpers are for when the skew is known and the plan
  * shape must be fixed (e.g., aggregation skew, which AQE does not
  * repartition).
  */
object Salting {

  /** Deterministic salt in [0, salts): hash of `from` columns. */
  def salt(salts: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(salts.toLong)).cast("int")

  /** Two-phase skew-safe aggregation: `partialAggs` run on (keys, salt),
    * `finalAggs` (keyed by the partial output column names) recombine on
    * keys alone. Example:
    *   saltedAgg(df, Seq("k"), 16, salt = $"payload",
    *     partialAggs = Seq(sum("v").as("v_sum"), count(lit(1)).as("n")),
    *     finalAggs   = Seq(sum("v_sum").as("v_sum"), sum("n").as("n")))
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                saltFrom: Seq[Column],
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", salt(salts, saltFrom: _*))
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-safe inner equi-join: salt the big side deterministically,
    * replicate the small side across all salt values, join on
    * (keys, salt). Result is identical to `big.join(small, keys)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, bigSaltFrom: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(salts, bigSaltFrom: _*))
    val replicated = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** The diagnostic that DECIDES whether to salt: per-key frequency
    * profile of a prospective shuffle/join key. Reports the k heaviest
    * keys with their share of all rows, the skew factor (heaviest key
    * vs mean key), and the salt count that would level the heaviest
    * key to the mean — `salt = ceil(max/mean)` is exactly the `salts`
    * argument [[saltedAgg]]/[[saltedJoin]] then take. skew ≈ 1 means
    * salting buys nothing; a 1000× key at 100 TB means one straggler
    * task owns 1000 partitions' worth of rows until this says split.
    *
    * One count shuffle on the key; the top-k rank runs over
    * `orderBy().limit(k)` survivors (bounded window). All ratios are
    * exact-integer counts until one rounded division.
    * Output: k rows of (key, cnt, share, skew, salt) — skew/salt
    * constant across rows (curve + scalar in one shape). */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 5,
                 roundTo: Int = 4): DataFrame = {
    val c = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val s = c.agg(count(lit(1)).cast("long").as("n_keys"),
      sum(col("cnt")).cast("long").as("total"),
      max(col("cnt")).cast("long").as("max_cnt"))
    val mean = col("total").cast("double") / col("n_keys").cast("double")
    val scalars = broadcast(s.select(col("total"),
      graft.functions.TextFunctions.portableRound(
        col("max_cnt").cast("double") / mean, roundTo).as("skew"),
      ceil(col("max_cnt").cast("double") / mean).cast("long").as("salt")))
    Ranked.rankBounded(c, k, Seq(col("cnt").desc, col("key").asc))
      .crossJoin(scalars)
      .select(col("key"), col("cnt"),
        graft.functions.TextFunctions.portableRound(
          col("cnt").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        col("skew"), col("salt"))
      .orderBy("key")
  }

  /** Skew-proof per-group top-k: two-phase ranking. Phase 1 ranks
    * within (group, salt) and keeps k per salt-shard — the hot group's
    * rows spread over `salts` tasks instead of one; phase 2 ranks the
    * ≤ salts·k survivors per group. EXACT: a group's true top-k is a
    * subset of the union of its per-shard top-k (every true top-k row
    * is top-k within its own shard). The plain one-window version
    * dies on the group that holds half the corpus; this caps any
    * task's window at group_size/salts.
    *
    * `orderCol` descends, ties break on ascending `idCol` (which also
    * salts — a pure function of the row, replayable anywhere). */
  def saltedTopK(df: DataFrame, groupCol: String, idCol: String,
                 orderCol: String, k: Int, salts: Int = 8): DataFrame = {
    require(k >= 1 && salts >= 1, "k and salts must be >= 1")
    val w1 = Window.partitionBy(col(groupCol), col("_salt"))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("_salt",
        TextFunctions.md5Hash60(concat_ws(":", lit("tk"),
          col(idCol).cast("string"))) % lit(salts.toLong))
      .withColumn("_rn1", row_number().over(w1))
      .filter(col("_rn1") <= k)
      .withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= k)
      .drop("_salt", "_rn1")
  }
}
