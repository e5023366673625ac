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

  /** HITS (Kleinberg) over a directed BIPARTITE edge list — hubs on
    * the left (e.g. users), authorities on the right (e.g. event
    * types, domains): a(t) = Σ_{u→t} h(u), h(u) = Σ_{u→t} a(t), each
    * vector sum-normalized per half-step. PageRank's complement for
    * curation: PageRank scores within one node set; HITS separates
    * "prolific pointers" from "heavily pointed-at" when the relation
    * is two-sided.
    *
    * Determinism: the x69 replay discipline — fixed iterations,
    * [[graft.plans.SortedSumD]] neighbor folds, the normalizer itself
    * a SortedSumD over the bounded side, re-round to `roundTo` every
    * half-step so divergence cannot accumulate. The oracle unrolls
    * the same half-steps CTE by CTE.
    *
    * Scale shape: per half-step one join + one keyed aggregation; the
    * normalizer is a one-row frame crossed in (broadcast). Scores sum
    * to 1 per side at every step — no global float reduction beyond
    * the bounded normalizer fold. */
  def hits(edges: DataFrame, hubCol: String, authCol: String,
           iters: Int = 4, roundTo: Int = 6): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // each half-step consumes its raw sums TWICE (the normalizer agg
    // and the normalized select), so a lazy chain doubles the subtree
    // per half-step — 2^(2·iters) scans by the end (measured: 383
    // event scans at iters = 4). The Pregel superstep discipline
    // applies: materialize each half-step's raw sums (eager
    // localCheckpoint, |auths| / |hubs| rows) so every step executes
    // exactly once and the final plan is one shallow join.
    val e = edges.select(col(hubCol).as("hub"), col(authCol).as("auth"))
      .distinct().localCheckpoint()
    val hubs = e.select("hub").distinct()
    var h = hubs.select(col("hub"), lit(1.0).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = e.join(h, Seq("hub"))
        .groupBy("auth").agg(graft.plans.SortedSumD(col("h")).as("s"))
        .localCheckpoint()
      val az = aRaw.agg(graft.plans.SortedSumD(col("s")).as("z"))
      a = aRaw.crossJoin(broadcast(az))
        .select(col("auth"),
          TextFunctions.portableRound(col("s") / col("z"), roundTo)
            .as("a"))
      val hRaw = e.join(a, Seq("auth"))
        .groupBy("hub").agg(graft.plans.SortedSumD(col("a")).as("s"))
        .localCheckpoint()
      val hz = hRaw.agg(graft.plans.SortedSumD(col("s")).as("z"))
      h = hRaw.crossJoin(broadcast(hz))
        .select(col("hub"),
          TextFunctions.portableRound(col("s") / col("z"), roundTo)
            .as("h"))
    }
    a.select(col("auth"), col("a").as("authority"))
  }
}
