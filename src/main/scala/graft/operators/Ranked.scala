package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Global-rank windows over PROVABLY SMALL frames.
  *
  * A `Window.orderBy` with no partition key makes WindowExec log a
  * "moving all data to a single partition" warning on every execution.
  * All of this engine's global windows run over frames bounded before
  * the window ever sees them — an `orderBy().limit(k)` that the planner
  * executes as TakeOrderedAndProject (top-k merge, no global sort), or
  * a one-row-per-group aggregate whose cardinality is small by
  * construction (sources, languages, shards). For those the single
  * partition IS the plan, so the warning is noise — and dozens of
  * benign copies per bench run would drown a future genuinely-global
  * window that deserves the alarm.
  *
  * [[bounded]] keeps the alarm meaningful: it partitions by a constant,
  * which is the same single-group window (same ranks, same frame
  * semantics, all ≤k rows in one partition) but states the intent
  * explicitly, so WindowExec stays quiet HERE and still warns at any
  * window that was left truly unbounded by accident.
  *
  * Callers must only use this where the input is already bounded;
  * RankedSpec asserts the contract on the canonical call shape.
  */
object Ranked {

  private val ExcludedKey = "spark.sql.optimizer.excludedRules"
  private val FoldablePartitionRule =
    "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions"

  /** Catalyst's EliminateWindowPartitions strips foldable partition
    * keys (they are "meaningless"), which would turn the constant key
    * below back into an unpartitioned window and re-arm the warning.
    * Here the foldable key is the point — it is the documented
    * single-group-on-purpose marker — so the rule is excluded, set
    * idempotently on the active session (appended, never clobbering a
    * caller's own exclusions). The rule can fire ONLY on foldable
    * window partition keys, and this object is the engine's only
    * producer of those, so nothing else's plans change. */
  private def ensureFoldablePartitionsSurvive(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
      val cur = s.conf.getOption(ExcludedKey).getOrElse("")
      if (!cur.split(",").map(_.trim).contains(FoldablePartitionRule))
        s.conf.set(ExcludedKey,
          if (cur.isEmpty) FoldablePartitionRule
          else cur + "," + FoldablePartitionRule)
    }

  /** Single-group window spec for an already-bounded frame: identical
    * ranks to `Window.orderBy(sort)`, no single-partition warning. */
  def bounded(sort: Column*): WindowSpec = {
    ensureFoldablePartitionsSurvive()
    Window.partitionBy(lit(0)).orderBy(sort: _*)
  }

  /** The canonical top-k-then-rank idiom: keep the k smallest rows
    * under `sort` (TakeOrderedAndProject — a per-partition top-k plus
    * one k-row merge, never a global sort shuffle), then number the
    * survivors 1..k in the same order. The rank window's input is ≤k
    * rows by construction. */
  def rankBounded(df: DataFrame, k: Int, sort: Seq[Column],
                  rankCol: String = "rn"): DataFrame =
    df.orderBy(sort: _*).limit(k)
      .withColumn(rankCol, row_number().over(bounded(sort: _*)).cast("int"))
}
