package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Entity resolution (record linkage) with sorted-neighborhood
  * blocking — the dedup family's structured-records sibling: the text
  * dedup ops (Dedup, RepeatedSpans) fold near-identical DOCUMENTS; a
  * training-data pipeline's metadata side needs the same for
  * near-identical RECORDS (users, customers, provenance rows) where
  * "near" means a typo'd name and a drifted balance, not a shared
  * shingle.
  *
  * Design (the classic SNM of Hernández & Stolfo): candidate pairs are
  * NEVER all-pairs, not even per block — records sort by a normalized
  * key inside each block and only rows within a `window`-row
  * neighborhood pair up, so candidates are O(n·window) with the block
  * count bounding skew. A Fellegi–Sunter-style additive score over
  * field-agreement features (edit distance on the normalized name,
  * absolute balance delta, segment equality) decides matches; weights
  * and threshold are explicit parameters, exact comparisons on exact
  * values — no floats until the reported deltas.
  *
  * Scale shape: one shuffle on the block key; the per-block sort is the
  * window's own sort (rank + `window` self-equi-joins on adjacent
  * ranks, each a co-partitioned join on the already-shuffled block).
  * At 100 TB the standard multi-pass extension (second pass with a
  * different sort key) is more SNM invocations, not a new operator. */
object EntityResolution {

  /** Candidate pairs + scores via sorted-neighborhood matching.
    * Input columns: `idCol` (non-negative natural key), `blockCol`
    * (exact blocking key, e.g. nation), `nameCol` (noisy string),
    * `balCol` (numeric), `segCol` (exact categorical).
    * Output: (id_a, id_b, name_dist, bal_diff, same_seg, score)
    * for pairs with score ≥ `minScore`, id_a < id_b. */
  def sortedNeighborhood(df: DataFrame, idCol: String, blockCol: String,
                         nameCol: String, balCol: String, segCol: String,
                         window: Int = 3,
                         wName: Double = 2.0, maxNameDist: Int = 2,
                         wBal: Double = 1.5, maxBalDiff: Double = 5.0,
                         wSeg: Double = 0.5,
                         minScore: Double = 3.0): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val base = df.select(col(idCol).cast("long").as("id"),
      col(blockCol).as("blk"),
      lower(trim(col(nameCol))).as("nm"),
      col(balCol).cast("double").as("bal"),
      col(segCol).as("seg"))
    // rank inside the block: the ONLY sort; ties on the normalized
    // name break on id so the neighborhood is deterministic
    val w = Window.partitionBy("blk").orderBy(col("nm"), col("id"))
    val ranked = base.withColumn("rk", row_number().over(w))
    def side(s: String) = ranked.select(col("blk").as(s"blk_$s"),
      col("id").as(s"id_$s"), col("nm").as(s"nm_$s"),
      col("bal").as(s"bal_$s"), col("seg").as(s"seg_$s"),
      col("rk").as(s"rk_$s"))
    // window self-joins on adjacent ranks — equi-join per offset keeps
    // the plan a co-partitioned sort-merge join, not a range BNL
    val cand = (1 to window).map { off =>
      side("l").join(side("r"),
        col("blk_l") === col("blk_r") &&
          col("rk_r") === col("rk_l") + lit(off))
    }.reduce(_ unionByName _)
    val nameDist = levenshtein(col("nm_l"), col("nm_r"))
    val balDiff = abs(col("bal_l") - col("bal_r"))
    val scored = cand.select(
      least(col("id_l"), col("id_r")).as("id_a"),
      greatest(col("id_l"), col("id_r")).as("id_b"),
      nameDist.as("name_dist"),
      TextFunctions.portableRound(balDiff, 2).as("bal_diff"),
      (col("seg_l") === col("seg_r")).as("same_seg"),
      (when(nameDist <= maxNameDist, lit(wName)).otherwise(lit(0.0)) +
        when(balDiff <= maxBalDiff, lit(wBal)).otherwise(lit(0.0)) +
        when(col("seg_l") === col("seg_r"), lit(wSeg)).otherwise(lit(0.0)))
        .as("score"))
    scored.filter(col("score") >= minScore)
      .orderBy("id_a", "id_b")
  }
}
