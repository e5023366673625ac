package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Growable primitive double buffer — the aggregation state of
  * [[SortedSumD]]. Primitive storage on purpose: the collect_list
  * equivalent buffers boxed rows (GenericArrayData of InternalRow),
  * ~5× the footprint and GC churn for the same values. */
final class DoubleBuf(var arr: Array[Double], var n: Int) {
  def add(x: Double): Unit = {
    if (n == arr.length) {
      val grown = new Array[Double](math.max(8, arr.length * 2))
      System.arraycopy(arr, 0, grown, 0, n)
      arr = grown
    }
    arr(n) = x
    n += 1
  }
}

/** Deterministic float sum as ONE native aggregate: buffer the group's
  * doubles (primitive array), sort ascending at eval, sequential left
  * fold — the same canonical order on any engine, partitioning, or
  * arrival order, so the result is bit-stable without the
  * `array_sort(collect_list(struct(...)))` + interpreted `aggregate`
  * lambda chain it replaces (PERF.md lesson #1: that chain materializes
  * a boxed array column per group and evaluates the fold on the
  * interpreted path). Sorting by VALUE is sufficient for determinism:
  * equal doubles contribute identically wherever ties land.
  *
  * Scale shape: state is O(group size) — for the near-dup graph in
  * [[graft.operators.GraphRank]] that is the node's in-degree, bounded
  * upstream by the LSH band/bucket caps. Runs in ObjectHashAggregateExec
  * (spill-capable sort fallback), merges partial buffers by concat, and
  * ships them as packed little-endian doubles.
  *
  * The DuckDB oracle mirror is
  * `list_reduce(list_prepend(0.0, list_sort(list(w))), (a, x) -> a + x)`.
  */
case class SortedSumD(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DoubleBuf] with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_sum_d"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_sum_d needs a double input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): DoubleBuf =
    new DoubleBuf(new Array[Double](8), 0)

  override def update(buf: DoubleBuf, input: InternalRow): DoubleBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DoubleBuf, other: DoubleBuf): DoubleBuf = {
    var i = 0
    while (i < other.n) { buf.add(other.arr(i)); i += 1 }
    buf
  }

  override def eval(buf: DoubleBuf): Any =
    if (buf.n == 0) null
    else {
      val vals = java.util.Arrays.copyOf(buf.arr, buf.n)
      java.util.Arrays.sort(vals)
      var acc = 0.0
      var i = 0
      while (i < buf.n) { acc += vals(i); i += 1 }
      acc
    }

  override def serialize(buf: DoubleBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.n * 8)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DoubleBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bytes.length / 8
    val arr = new Array[Double](math.max(8, n))
    var i = 0
    while (i < n) { arr(i) = bb.getDouble(); i += 1 }
    new DoubleBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(offset: Int): SortedSumD =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SortedSumD =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SortedSumD =
    copy(child = newChild)
}

object SortedSumD {
  /** Column form, for `agg(...)` and window `over(...)` use. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SortedSumD(org.apache.spark.sql.graft.bridge.expression(c))
        .toAggregateExpression())
}

/** Bounded top-k state of [[TopKSimEid]]: parallel primitive arrays of
  * ≤ k (sim, eid) pairs kept sorted by (sim desc, eid asc) — insertion
  * into a k-sized array is O(k) with k ≤ a few dozen, far cheaper than
  * the sort-based window the aggregate replaces. */
final class TopKBuf(val k: Int) {
  val sims = new Array[Double](k)
  val eids = new Array[Long](k)
  var n: Int = 0
  /** Keep iff it beats the current kth by (sim desc, eid asc). */
  def add(sim: Double, eid: Long): Unit = {
    if (n == k && (sim < sims(n - 1) ||
        (sim == sims(n - 1) && eid >= eids(n - 1)))) return
    var i = if (n < k) n else k - 1
    while (i > 0 && (sims(i - 1) < sim ||
        (sims(i - 1) == sim && eids(i - 1) > eid))) {
      sims(i) = sims(i - 1); eids(i) = eids(i - 1); i -= 1
    }
    sims(i) = sim; eids(i) = eid
    if (n < k) n += 1
  }
}

/** Per-group top-k of (sim, eid) pairs as ONE native aggregate with
  * MAP-SIDE COMBINE — the row_number()-window top-k re-expressed so
  * the candidate set never sorts or shuffles: each partition keeps a
  * k-bounded insertion-sorted buffer per group, partial buffers merge
  * by replayed insertion, and eval emits array<struct<sim, eid>> in
  * the exact window order (sim desc, eid asc — identical tiebreak, so
  * posexplode position + 1 ≡ row_number). The window form sorts the
  * full candidate set per partition before ranking (measured sf1: the
  * sort is ~4 s of the 8.7 s ANN probe); this is O(rows·k)
  * comparisons and O(groups·k) state, and at cluster scale the partial
  * buffers make the exchange independent of candidate volume. */
case class TopKSimEid(sim: Expression, eid: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1 && k <= 4096, s"top-k bound out of range: $k")

  override def left: Expression = sim
  override def right: Expression = eid
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("eid", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "topk_sim_eid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (sim.dataType, eid.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_sim_eid needs (double, long) inputs, got $other")
    }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = sim.eval(input)
    val e = eid.eval(input)
    if (s != null && e != null)
      buf.add(s.asInstanceOf[Double], e.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.n) { buf.add(other.sims(i), other.eids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    if (buf.n == 0) return null
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = InternalRow(buf.sims(i), buf.eids(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.sims(i)); bb.putLong(buf.eids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuf(k)
    var i = 0
    // entries arrive already ordered; insertion replays in O(n)
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKSimEid =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKSimEid =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKSimEid =
    copy(sim = newLeft, eid = newRight)
}

object TopKSimEid {
  /** Column form: array<struct<sim, eid>> of the group's top k by
    * (sim desc, eid asc). */
  def apply(sim: Column, eid: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      TopKSimEid(org.apache.spark.sql.graft.bridge.expression(sim),
        org.apache.spark.sql.graft.bridge.expression(eid), k)
        .toAggregateExpression())
}
