package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed PageRank over a pair list — graph centrality for
  * corpus curation: on the near-duplicate graph the rank identifies
  * template hubs (one page duplicated by a thousand mirrors ranks far
  * above an isolated page); on a citation/link graph it is the classic
  * quality prior.
  *
  * Determinism: a FIXED iteration count, per-node neighbor sums via
  * [[graft.plans.SortedSumD]] — one native aggregate that buffers the
  * contributions, sorts them ascending and left-folds, the same
  * canonical order on any engine or partitioning — and the rank
  * portable-rounded EVERY iteration so float divergence can never
  * accumulate across iterations. Dangling-node mass is NOT
  * redistributed (ranks sum to < 1; the relative ordering — what
  * curation consumes — is unaffected and the oracle stays free of a
  * global float reduction).
  *
  * Scale shape: each iteration is one (join on src) + one
  * shuffle-on-dst aggregation + one left join back to the node table —
  * all key-partitioned, no driver state but the O(1) node count.
  * Per-node fold state is the node's in-degree, bounded in a blocked
  * near-dup graph by construction (the LSH band/bucket caps upstream).
  * Iterations build one lazy plan (no collect between steps); callers
  * iterating deep should cache the edge table.
  */
object GraphRank {

  /** `edges` is an undirected pair list (srcCol, dstCol), one row per
    * pair; both directions are derived here. Output: (idCol, pr) for
    * every node. */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String = "id_a", dstCol: String = "id_b",
               iters: Int = 3, damping: Double = 0.85,
               roundTo: Int = 10): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val n = nodes.count()
    require(n > 0, "pageRank: empty node set")
    val base = (1.0 - damping) / n
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    var pr = nodes.select(col(idCol).as("id"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = und.join(deg, Seq("src"))
        .join(pr, col("src") === col("id"))
        .select(col("dst"),
          (col("pr") / col("deg").cast("double")).as("w"))
      val inSum = contrib.groupBy("dst")
        .agg(graft.plans.SortedSumD(col("w")).as("s"))
      pr = nodes.select(col(idCol).as("id"))
        .join(inSum, col("id") === col("dst"), "left")
        .select(col("id"),
          TextFunctions.portableRound(
            lit(base) + lit(damping) * coalesce(col("s"), lit(0.0)),
            roundTo).as("pr"))
    }
    pr
  }
}
