package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Preference analytics — the RLHF-data side of the catalog: pairwise
  * comparisons → per-item strength. Bradley–Terry is the canonical
  * model (win probability a over b = p_a/(p_a+p_b)); the fit is
  * Hunter's MM iteration, which is the preference-world sibling of the
  * engine's other fixed-iteration replays (x69 PageRank, x147 power
  * iteration): fixed work, ordered folds, re-round each round, so an
  * oracle unrolling the same iterations lands on identical doubles.
  *
  * Scale shape: comparisons aggregate to an item×item win matrix whose
  * cardinality is the ITEM vocabulary squared (sources, models,
  * annotator pools — bounded by construction), never the comparison
  * count; the matrix takes the k-means bounded-collect path and the MM
  * loop runs on driver-resident floats. The data-scale cost is the one
  * aggregation over comparisons.
  */
object Preference {

  /** Fit Bradley–Terry strengths from (winner, loser) comparison rows.
    * `iters` MM rounds: p'_a = W_a / Σ_{b≠a} n_ab/(p_a+p_b), then
    * normalize to Σp = 1 and re-round to 1e-6 (folds in item-sorted
    * order — the cross-engine float discipline). Items that never win
    * converge to 0; an item with no opponents keeps its prior.
    *
    * The win matrix is collected to the driver, so its cardinality —
    * directed item pairs that actually occur, ≤ items² — is gated by
    * `maxPairs` (the Dedup.driverMaxEdges discipline: a hard reported
    * failure, never a silent OOM). The gate costs nothing extra: the
    * collect takes `maxPairs + 1` rows at most via limit, so a
    * document-grain caller fails fast on a bounded result set instead
    * of materializing the full matrix first.
    * Output: (item, n_wins, n_comparisons, bt_strength). */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
                   loserCol: String, iters: Int = 8,
                   roundTo: Int = 6, maxPairs: Int = 100000): DataFrame = {
    val spark = comparisons.sparkSession
    import spark.implicits._
    val collected = comparisons
      .groupBy(col(winnerCol).cast("string").as("wa"),
        col(loserCol).cast("string").as("lb"))
      .agg(count(lit(1)).as("w"))
      .limit(maxPairs + 1)
      .collect()
    require(collected.length <= maxPairs,
      s"bradleyTerry: win matrix exceeds maxPairs=$maxPairs directed " +
        "pairs — items must be a bounded vocabulary (sources, models, " +
        "annotators), not document-grain ids; aggregate items first or " +
        "raise maxPairs deliberately")
    val wm = collected
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    require(wm.nonEmpty, "bradleyTerry: no comparisons")
    val items = wm.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    def nab(a: String, b: String): Long =
      wm.getOrElse((a, b), 0L) + wm.getOrElse((b, a), 0L)
    val wins = items.map(a =>
      a -> items.filter(_ != a).map(b => wm.getOrElse((a, b), 0L)).sum)
      .toMap
    var p = Array.fill(items.size)(
      TextFunctions.portableRoundJvm(1.0 / items.size, roundTo))
    for (_ <- 1 to iters) {
      val pNew = items.indices.map { ia =>
        // denominator folded over b in item-sorted order; absent
        // pairs contribute exactly 0.0 (the oracle adds the literal)
        val denom = items.indices.foldLeft(0.0) { (acc, ib) =>
          if (ib == ia) acc
          else {
            val n = nab(items(ia), items(ib))
            if (n == 0L) acc else acc + n.toDouble / (p(ia) + p(ib))
          }
        }
        if (denom == 0.0) p(ia) else wins(items(ia)).toDouble / denom
      }.toArray
      val z = pNew.foldLeft(0.0)(_ + _) // item-sorted normalizer fold
      p = pNew.map(x => TextFunctions.portableRoundJvm(x / z, roundTo))
    }
    items.zipWithIndex.map { case (a, i) =>
      (a, wins(a),
        items.filter(_ != a).map(b => nab(a, b)).sum, p(i))
    }.toDF("item", "n_wins", "n_comparisons", "bt_strength")
  }
}
