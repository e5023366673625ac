package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic backward as-of join — "attach the most recent right-side
  * row at or before each left row's timestamp, per key".
  *
  * Spark has no as-of operator; the naive formulation
  * (`l JOIN r ON key AND r.ts <= l.ts` + keep-latest) plans as an
  * exploding inequality join: every left row matches ALL earlier right
  * rows before the dedup throws the work away — O(|L|·|R|) per key, a
  * non-starter for 100 TB event streams where a hot key holds millions
  * of rows.
  *
  * The distributed algorithm is union-then-window: tag both inputs,
  * union them, and take one window pass per key ordered by
  * (ts, side, tiebreak) with `last(payload, ignoreNulls=true)` over
  * ROWS UNBOUNDED PRECEDING..CURRENT. Each left row reads the right
  * payload carried forward from the nearest preceding right row — ONE
  * shuffle on the key, O((|L|+|R|) log) sort per partition, zero row
  * amplification. This is the sort-merge as-of shape native engines
  * (kdb, DuckDB ASOF JOIN) use, expressed as a Catalyst window so
  * codegen and AQE still apply.
  *
  * Determinism: right rows sort before left rows at equal `ts`
  * (inclusive semantics — a right row AT the left timestamp is
  * visible; pass `strict = true` to hide it), and right-side ties on
  * `ts` resolve by greatest `tieCol`, so the result is a pure function
  * of the data, independent of partitioning or physical row order.
  *
  * Left rows with no preceding right row keep NULL payloads (left-join
  * semantics). Skew: a single hot key serializes into one task, the
  * same bound as any keyed window — pre-split hot keys upstream with
  * [[Salting]] if one key exceeds a task's memory.
  *
  * NULL handling (the part a naive union-then-window gets wrong):
  *   - A right row with NULL `rightTs` has no as-of position — the
  *     documented predicate `r.ts <= l.ts` is never true for it — so
  *     it is EXCLUDED up front. (Unfiltered, it would sort nulls-first
  *     in the window and leak into every left row.)
  *   - The payload travels as ONE struct column, so
  *     `last(_, ignoreNulls = true)` picks the nearest right ROW
  *     atomically: all payload fields come from that same row, and a
  *     field that is genuinely NULL on it stays NULL — per-column
  *     carry-forward would instead splice values from different
  *     (staler) right rows.
  */
object AsOfJoin {

  /** @param left     probe side, keeps ALL its columns
    * @param right    reference side; only `payload` columns survive
    * @param keys     equi-key columns present on both sides
    * @param leftTs   left timestamp column (numeric/timestamp)
    * @param rightTs  right timestamp column
    * @param tieCol   right column breaking equal-ts ties (greatest wins)
    * @param payload  right columns to attach (must not collide with
    *                 left names); each emitted as `asof_<name>`
    * @param strict   require right.ts < left.ts (default ≤)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, tieCol: String,
           payload: Seq[String], strict: Boolean = false): DataFrame = {
    val outCols = payload.map(p => s"asof_$p")
    val collide = outCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"asOf output collides with left: $collide")
    val reserved = Seq("_ao_side", "_ao_ts", "_ao_tie", "_ao_pay")
    val taken = reserved.filter(n =>
      left.columns.contains(n) || right.columns.contains(n))
    require(taken.isEmpty, s"reserved column names in input: $taken")

    // left rows carry a null payload struct; right rows carry null left
    // columns. Side tag orders right before left at equal ts for
    // inclusive semantics; strict mode instead orders right AFTER left
    // so an equal-ts right row is not yet visible to the left row.
    val rightSide = if (strict) 1 else -1
    val r = right
      // NULL as-of time = no position on the timeline (see scaladoc)
      .filter(col(rightTs).isNotNull)
      .select(
        keys.map(col) ++
          Seq(col(rightTs).as("_ao_ts"), lit(rightSide).as("_ao_side"),
            col(tieCol).as("_ao_tie"),
            struct(payload.zip(outCols)
              .map { case (p, o) => col(p).as(o) }: _*).as("_ao_pay")): _*)
    val leftCols =
      left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_ao_ts"), lit(0).as("_ao_side"),
          lit(null).cast(right.schema(tieCol).dataType).as("_ao_tie"),
          lit(null).cast(r.schema("_ao_pay").dataType).as("_ao_pay")) ++
        leftCols.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ao_ts").asc, col("_ao_side").asc, col("_ao_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the struct is non-null on every (ts-valid) right row, so
    // ignoreNulls skips only the left rows' placeholder — the carried
    // value is the whole nearest right row, fields atomically together
    val filled = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_ao_pay", last(col("_ao_pay"), ignoreNulls = true).over(w))
      .filter(col("_ao_side") === 0)
    val dropped = Set("_ao_side", "_ao_tie", "_ao_pay")
    filled.select(
        filled.columns.filterNot(dropped).map(col) ++
          outCols.map(o => col(s"_ao_pay.$o").as(o)): _*)
      .withColumnRenamed("_ao_ts", leftTs)
  }
}
