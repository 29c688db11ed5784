package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column ⇄ Catalyst-Expression bridge for Spark 4's column-node API.
  *
  * Spark 4 made `Column(expr)` private and scoped the supported bridge
  * (`classic.ExpressionUtils`) plus `AbstractDataType` to `private[sql]`,
  * so the native expressions live under `org.apache.spark.sql`. Isolated
  * here so the rest of the engine never touches Spark internals directly;
  * the public face is [[graft.functions.VectorFunctions]].
  */
object SparkShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute an explicit logical plan (test harness for optimizer rules). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Native Catalyst expression for the integer dot product of two
  * `array<long>` columns — the hot inner loop of every cosine-similarity
  * operator (Similarity.sim1/sim2, Dedup.dd5).
  *
  * The `functions.aggregate(zip_with(a, b, _*_), 0L, _+_)` formulation
  * allocates an intermediate array and evaluates two lambda closures per
  * element per pair; on an all-pairs join that dominates the runtime. This
  * expression compiles to a tight primitive `long` loop inside whole-stage
  * codegen (no allocation, no boxing), with an interpreted `nullSafeEval`
  * fallback of identical arithmetic. Results are exact int64 —
  * bit-identical to the aggregate/zip_with version and the DuckDB oracle.
  *
  * 100 TB note: a scalar expression composes with any plan shape (bucketed
  * LSH join, broadcast query set, AQE) and never forces a codegen break
  * the way a Scala UDF would.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `numBits` random-hyperplane sign bits of a scaled `array<long>`
  * vector, packed into `numBits / bitsPerBand` band codes, in ONE
  * codegen'd loop (Dedup.dd9 / Similarity.sim5 sketches).
  *
  * The composed form — one `DotLong(v, lit(plane_b))` comparison per bit
  * — emits 128 separate expression trees whose generated code exceeds
  * the JIT's method-size budget, so the hot path ran interpreted
  * (measured: dd9's sketch dominated its sf0.1 time). Here the ±1
  * Rademacher weights (multiplicative-hash mixer, identical arithmetic
  * to the DuckDB oracle's) are precomputed once per plan into a flat
  * `long[]` referenced from a tight two-level loop.
  */
case class HyperplaneBands(child: Expression, numBits: Int, bitsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numBits % bitsPerBand == 0 && bitsPerBand > 0 && bitsPerBand < 64)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  @transient private lazy val weights: Array[Long] = HyperplaneBands.weights(numBits)

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dims = math.min(v.numElements(), 64)
    val codes = new Array[Long](numBits / bitsPerBand)
    var b = 0
    while (b < numBits) {
      var s = 0L
      var i = 0
      while (i < dims) { s += weights(b * 64 + i) * v.getLong(i); i += 1 }
      if (s >= 0L) codes(b / bitsPerBand) |= (1L << (b % bitsPerBand))
      b += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val w = ctx.addReferenceObj("hpWeights", weights, "long[]")
      val dims = ctx.freshName("dims")
      val codes = ctx.freshName("codes")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $dims = java.lang.Math.min($x.numElements(), 64);
         |long[] $codes = new long[${numBits / bitsPerBand}];
         |for (int $b = 0; $b < $numBits; $b++) {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $dims; $i++) {
         |    $s += $w[$b * 64 + $i] * $x.getLong($i);
         |  }
         |  if ($s >= 0L) $codes[$b / $bitsPerBand] |= (1L << ($b % $bitsPerBand));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {
  /** Mixer bit — identical arithmetic to the DuckDB oracle SQL:
    * `((((x*2654435761) % 2^31) * 2654435761) % 2^31 >> 15) & 1`.
    */
  private def wbit(x: Long): Long =
    ((((x * 2654435761L) % 2147483648L) * 2654435761L) % 2147483648L >> 15) & 1L

  /** Flat ±1 weight matrix, plane-major: weight of dim i in plane b is
    * at `b * 64 + i` (64-dim stride by contract).
    */
  def weights(numBits: Int): Array[Long] =
    Array.tabulate(numBits * 64)(idx => if (wbit(idx.toLong) == 0L) 1L else -1L)
}

/** Count of common elements between two SORTED `array<long>` columns
  * (strictly-increasing element sets, e.g. `sort_array(collect_set(..))`)
  * via a two-pointer merge — the hot inner loop of LSH-candidate
  * verification (Dedup.dd6). Equivalent to
  * `size(array_intersect(a, b))` on such inputs but allocation-free and
  * codegen'd (array_intersect materializes the intersected array and its
  * null-tracking state per row pair).
  */
case class IntersectCountSortedLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_count_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** THRESHOLDED common-element count of two SORTED `array<long>` set
  * columns — PPJoin's positional verification: returns the exact
  * intersect count when it reaches `⌈num·|left|/den⌉`, and −1 as soon
  * as `common + min(remaining_left, remaining_right)` can no longer get
  * there (most candidate pairs in a containment/similarity join FAIL
  * verification, and the early exit abandons them after walking only
  * the disjoint prefix instead of both full arrays — measured ~3× on
  * dd15's 10× verify stage, where ~92% of 6.1M candidates fail).
  * Exact for every pair that passes; the −1 encodes "below threshold"
  * without claiming a specific count.
  */
case class IntersectCountAtLeastFrac(left: Expression, right: Expression,
    num: Int, den: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_count_at_least_frac"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val t = (nx.toLong * num + den - 1) / den // ⌈num·nx/den⌉
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else {
        if (xv < yv) i += 1 else j += 1
        val rem = math.min(nx - i, ny - j)
        if (c + rem < t) return -1L
      }
    }
    if (c >= t) c else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val t = ctx.freshName("t")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      val rem = ctx.freshName("rem")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |long $t = (((long) $nx) * $num + $den - 1) / $den;
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else {
         |    if ($xv < $yv) { $i++; } else { $j++; }
         |    int $rem = ($nx - $i < $ny - $j) ? ($nx - $i) : ($ny - $j);
         |    if ($c + $rem < $t) { $c = -1L; break; }
         |  }
         |}
         |${ev.value} = ($c >= $t) ? $c : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Replay a FIXED, ORDERED BPE merge table over an `array<string>` token
  * column in ONE map-only pass — the serving-side encode of the t11/t18
  * tokenizer (TextOps.bpeEncodeWithMerges) and the rewrite half of each
  * training round. Merge r rewrites every leftmost-non-overlapping
  * (lhs, rhs) adjacency into the token `lhs + " " + rhs`, in training
  * order — a single left-to-right scan per merge per document, which is
  * EXACTLY the window-algebra replay's semantics: a greedy left-to-right
  * scan merges the even-offset candidates of each candidate run
  * (consecutive candidates only arise when lhs == rhs), the same set the
  * gaps-and-islands selection picks (BpeEncodeSpec pins the
  * equivalence differentially, full token sequences).
  *
  * Cost: O(k · doc_tokens) per document entirely IN MEMORY inside
  * whole-stage codegen — replacing the k-round corpus replay, whose
  * every round was a doc_id window exchange + sort over the FULL corpus
  * (the one remaining O(k·corpus) serving-side term of the r14 audit).
  * At 100 TB the encode becomes embarrassingly parallel: no shuffle at
  * any k, the merge table rides the plan as three tiny reference
  * arrays. The scan buffer is reused across merges (in-place
  * compaction: the write cursor never passes the read cursor), so the
  * only allocation is one UTF8String[] per row.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  // element nullability mirrors the input: merges never introduce nulls,
  // and a null element never matches a merge (UTF8String.equals(null) is
  // false), so it passes through untouched
  override def dataType: DataType = child.dataType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mA: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val mB: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val mM: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1 + " " + m._2)).toArray

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      cur(i) = if (x.isNullAt(i)) null else x.getUTF8String(i)
      i += 1
    }
    var len = n
    var r = 0
    while (r < mA.length) {
      val av = mA(r); val bv = mB(r); val mv = mM(r)
      var w = 0; var j = 0
      while (j < len) {
        if (j + 1 < len && av.equals(cur(j)) && bv.equals(cur(j + 1))) {
          cur(w) = mv; w += 1; j += 2
        } else {
          cur(w) = cur(j); w += 1; j += 1
        }
      }
      len = w
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cur.asInstanceOf[Array[AnyRef]], len))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      val aRef = ctx.addReferenceObj("bpeLhs", mA, s"$u8[]")
      val bRef = ctx.addReferenceObj("bpeRhs", mB, s"$u8[]")
      val mRef = ctx.addReferenceObj("bpeMerged", mM, s"$u8[]")
      val n = ctx.freshName("n"); val cur = ctx.freshName("cur")
      val len = ctx.freshName("len"); val r = ctx.freshName("r")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val w = ctx.freshName("w")
      val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
      s"""
         |int $n = $x.numElements();
         |$u8[] $cur = new $u8[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $cur[$i] = $x.isNullAt($i) ? null : $x.getUTF8String($i);
         |}
         |int $len = $n;
         |for (int $r = 0; $r < ${mA.length}; $r++) {
         |  $u8 $av = $aRef[$r]; $u8 $bv = $bRef[$r];
         |  int $w = 0; int $j = 0;
         |  while ($j < $len) {
         |    if ($j + 1 < $len && $av.equals($cur[$j]) && $bv.equals($cur[$j + 1])) {
         |      $cur[$w++] = $mRef[$r]; $j += 2;
         |    } else {
         |      $cur[$w++] = $cur[$j]; $j += 1;
         |    }
         |  }
         |  $len = $w;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) java.util.Arrays.copyOf($cur, $len));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Misra–Gries heavy-hitters CANDIDATE sketch over a long-typed item
  * column: a bounded map of `capacity` counters per aggregation buffer,
  * emitting the surviving candidate items as a sorted `array<long>`.
  *
  * Guarantee (the one the exact-recount consumer relies on): every item
  * with true frequency > n/(capacity+1) is in the output — decrements
  * only happen when `capacity+1` distinct live items each give up one
  * count, so an item can lose at most n/(capacity+1) total. The merge
  * operation (counter-wise sum, then subtract the (capacity+1)-th
  * largest count and drop non-positives) preserves the same bound
  * (Agarwal et al., "Mergeable Summaries", PODS'12), so the sketch is
  * partial-aggregable: each map task forwards ≤ capacity counters and
  * the 100 TB shuffle is O(tasks·capacity), not O(distinct items).
  * The EXTRA (non-heavy) candidates a buffer may carry are run-order-
  * dependent — which is why this aggregate emits candidates for an
  * EXACT semi-join recount (the dedup suite's candidates-then-verify
  * discipline applied to frequency), never final answers.
  */
case class MisraGries(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[MGBuffer]
  with ExpectsInputTypes {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(item)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: org.apache.spark.sql.catalyst.InternalRow): MGBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    other.counts.foreach { case (k, c) => buf.addNoCompress(k, c) }
    buf.compress()
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val keys = buf.counts.keys.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.counts.size)
    bb.putInt(buf.counts.size)
    buf.counts.foreach { case (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(capacity)
    var i = 0
    while (i < n) { buf.addNoCompress(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

/** Counter map for [[MisraGries]]: at most `capacity` live counters;
  * `add` applies the classic decrement-all step when full, `compress`
  * restores the bound after a merge by subtracting the (capacity+1)-th
  * largest count from every counter.
  */
final class MGBuffer(val capacity: Int) {
  val counts = new scala.collection.mutable.LongMap[Long](capacity * 2)

  def add(k: Long, c: Long): Unit = { addNoCompress(k, c); compress() }

  def addNoCompress(k: Long, c: Long): Unit =
    counts(k) = counts.getOrElse(k, 0L) + c

  def compress(): Unit = {
    if (counts.size > capacity) {
      // (capacity+1)-th largest count = the smallest count that must
      // reach zero for the map to fit; capacity is small, sort is fine
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val dec = vs(vs.length - capacity - 1)
      val dead = counts.iterator.collect { case (k, c) if c <= dec => k }.toArray
      dead.foreach(counts.remove)
      counts.transformValuesInPlace(c => c - dec)
    }
  }
}

/** Bounded top-k-per-group aggregate: keeps the k largest
  * (key DESC, payload ASC) pairs per group in a fixed-size sorted buffer,
  * emitting `array<struct<key double, payload long>>` in rank order.
  *
  * This is the 100 TB replacement for the `row_number().over(window) <= k`
  * idiom: the window plan shuffles EVERY row to its group's reducer and
  * sorts the whole group; this aggregate is partial-aggregable
  * (ObjectHashAggregate), so each map task forwards at most k pairs per
  * group and reducers merge k-bounded buffers — shuffle volume drops from
  * O(rows) to O(groups·k·tasks) and the per-group sort disappears. Ties
  * break on the payload, so results are deterministic for unique payloads
  * (and bit-equal to the window formulation — Q10TopKSpec proves it).
  *
  * Buffer updates are O(k) insertion into a sorted array — the right
  * trade for the small k of "top-N per key" reports; the buffer
  * serializes as 4 + 16k bytes between partial and final aggregation.
  */
case class TopKPairs(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[TopKBuffer]
  with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(key, payload)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType, LongType)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "top_k_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: org.apache.spark.sql.catalyst.InternalRow): TopKBuffer = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null) {
      buf.insert(kv.asInstanceOf[Double], pv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.keys(i), other.payloads(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(buf.keys(i), buf.payloads(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.keys(i)); bb.putLong(buf.payloads(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), payload = newChildren(1))
}

/** Sorted bounded buffer for [[TopKPairs]]: parallel arrays ordered by
  * (key DESC, payload ASC); insert is an O(size) shift, capped at k.
  */
final class TopKBuffer(val k: Int) {
  val keys = new Array[Double](k)
  val payloads = new Array[Long](k)
  var size: Int = 0

  /** true if (ka, pa) ranks strictly before (kb, pb). Key comparison is
    * `java.lang.Double.compare` — the same total order Spark SQL sorts
    * doubles with (NaN greatest, -0.0 < 0.0) — so DESC-key ranking stays
    * bit-equal to the row_number window formulation even on NaN keys,
    * and NaN ties still fall through to the payload tie-break.
    * (Null-KEY rows are skipped in update(), standard aggregate-ignores-
    * nulls semantics — a window formulation would rank them.)
    */
  @inline private def before(ka: Double, pa: Long, kb: Double, pb: Long): Boolean = {
    val c = java.lang.Double.compare(ka, kb)
    c > 0 || (c == 0 && pa < pb)
  }

  def insert(kv: Double, pv: Long): Unit = {
    if (size == k && !before(kv, pv, keys(size - 1), payloads(size - 1))) return
    // find insertion point (linear — k is small by contract)
    var pos = if (size == k) size - 1 else size
    while (pos > 0 && before(kv, pv, keys(pos - 1), payloads(pos - 1))) pos -= 1
    if (size < k) size += 1
    var i = size - 1
    while (i > pos) { keys(i) = keys(i - 1); payloads(i) = payloads(i - 1); i -= 1 }
    keys(pos) = kv
    payloads(pos) = pv
  }
}

// ---------------------------------------------------------------------------
// Round-19 optimization expressions (guide §2.4 "remove shuffles outright" +
// §4 "built-in/codegen over row-expansion"): the k-means / product-quantizer
// family (Similarity.trainIvfpq / serveIvfpq / kmeansFit and their reusers)
// previously computed every argmin by EXPANDING each row against a broadcast
// candidate table (crossJoin / broadcast join) and then collapsing the
// expansion back with a window row_number()=1 or a min(struct) aggregation —
// one Exchange (plus often a sort) per assignment, times every Lloyd round.
// The candidate sets are broadcast-small by construction (≤ √N coarse
// centroids, ≤ 8×64 PQ codewords), so the argmin is really a ROW-LOCAL
// computation against a small reference array. These expressions evaluate it
// as exactly that: the candidate set rides the row as one array column
// (attached via a 1-row broadcast), and the winner is computed in a tight
// JVM loop inside whole-stage codegen — zero Exchange, zero row expansion,
// bit-identical scoring and tie-breaks to the window/min(struct) plans they
// replace (the DuckDB oracle pins this at three scale factors).
//
// All scoring arithmetic mirrors the composed-expression originals LITERALLY:
// exact int64 dots/norms, and for the cosine metric the same IEEE evaluation
// order `((double) dot) / (sqrt((double) nrm) * sqrt((double) nc))`, compared
// with java.lang.Double.compare — the total order Spark sorts doubles with.

/** Static helpers shared by the vector expressions below; standalone object
  * so generated code can call them as plain static methods.
  */
object VecOps {
  /** Exact int64 dot of `v[off .. off+len)` against the full `c`. */
  @inline def dotSlice(v: ArrayData, off: Int, c: ArrayData, len: Int): Long = {
    var s = 0L
    var i = 0
    val n = math.min(len, math.min(v.numElements() - off, c.numElements()))
    while (i < n) { s += v.getLong(off + i) * c.getLong(i); i += 1 }
    s
  }

  /** argmin/argmax centroid id. cents: array<struct<cid:long, vc:array<long>,
    * nc:long>>. useL2: min (nc − 2·v·vc, cid); else max (cos, tie cid asc)
    * with cos evaluated exactly as the composed plan did.
    */
  def nearestCentroid(v: ArrayData, nrm: Long, cents: ArrayData,
      useL2: Boolean): Long = {
    val k = cents.numElements()
    val dims = v.numElements()
    var bestId = Long.MaxValue
    var bestL2 = Long.MaxValue
    var bestCos = java.lang.Double.NEGATIVE_INFINITY
    var first = true
    var i = 0
    while (i < k) {
      val row = cents.getStruct(i, 3)
      val cid = row.getLong(0)
      val vc = row.getArray(1)
      val nc = row.getLong(2)
      val dot = dotSlice(v, 0, vc, dims)
      if (useL2) {
        val d2 = nc - 2L * dot
        if (first || d2 < bestL2 || (d2 == bestL2 && cid < bestId)) {
          bestL2 = d2; bestId = cid; first = false
        }
      } else {
        val cos = dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(nc.toDouble))
        val c = java.lang.Double.compare(cos, bestCos)
        if (first || c > 0 || (c == 0 && cid < bestId)) {
          bestCos = cos; bestId = cid; first = false
        }
      }
      i += 1
    }
    bestId
  }

  /** Per-subspace nearest-codeword emit. books: array<struct<j:long,
    * code:long, emit:long, cv:array<long>, cn:long>> (any order; winner per
    * j by (cn − 2·sv·cv, code) exactly like the min(struct(d2, code))
    * formulation). Returns array<long>(m) of the winners' `emit` fields.
    */
  def pqBest(v: ArrayData, books: ArrayData, m: Int, sub: Int): GenericArrayData = {
    val out = new Array[Long](m)
    val bestD2 = new Array[Long](m)
    val bestCode = new Array[Long](m)
    val seen = new Array[Boolean](m)
    val n = books.numElements()
    var i = 0
    while (i < n) {
      val row = books.getStruct(i, 5)
      val j = row.getLong(0).toInt
      if (j >= 0 && j < m) {
        val code = row.getLong(1)
        val emit = row.getLong(2)
        val cv = row.getArray(3)
        val cn = row.getLong(4)
        val d2 = cn - 2L * dotSlice(v, j * sub, cv, sub)
        if (!seen(j) || d2 < bestD2(j) || (d2 == bestD2(j) && code < bestCode(j))) {
          seen(j) = true; bestD2(j) = d2; bestCode(j) = code; out(j) = emit
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table: for each subspace j, an array positioned by
    * the codeword's dense index (`emit` = cidx) holding the exact int64 dot
    * of the query's j-th subvector against that codeword. Same `books`
    * layout as [[pqBest]].
    */
  def pqLut(v: ArrayData, books: ArrayData, m: Int, sub: Int): GenericArrayData = {
    val n = books.numElements()
    val counts = new Array[Int](m)
    var i = 0
    while (i < n) {
      val j = books.getStruct(i, 5).getLong(0).toInt
      if (j >= 0 && j < m) counts(j) += 1
      i += 1
    }
    val luts = Array.tabulate(m)(j => new Array[Long](counts(j)))
    i = 0
    while (i < n) {
      val row = books.getStruct(i, 5)
      val j = row.getLong(0).toInt
      if (j >= 0 && j < m) {
        val cidx = row.getLong(2).toInt
        if (cidx >= 0 && cidx < luts(j).length)
          luts(j)(cidx) = dotSlice(v, j * sub, row.getArray(3), sub)
      }
      i += 1
    }
    new GenericArrayData(luts.map(a => new GenericArrayData(a): AnyRef))
  }

  /** Top-`npe` cells for one query against the full centroid array,
    * ranked by (cos desc | l2 asc, cid asc) — the probe stage's
    * row_number() ≤ npe window, computed row-locally. Returns
    * array<struct<cell:long, cdot:long>> in rank order.
    */
  def topCells(v: ArrayData, nrm: Long, npe: Long, cents: ArrayData,
      useL2: Boolean): GenericArrayData = {
    val k = cents.numElements()
    val dims = v.numElements()
    val cid = new Array[Long](k)
    val cdot = new Array[Long](k)
    val score = new Array[Double](k)
    val sl2 = new Array[Long](k)
    var i = 0
    while (i < k) {
      val row = cents.getStruct(i, 3)
      cid(i) = row.getLong(0)
      val vc = row.getArray(1)
      val nc = row.getLong(2)
      val dot = dotSlice(v, 0, vc, dims)
      cdot(i) = dot
      if (useL2) sl2(i) = nc - 2L * dot
      else score(i) = dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(nc.toDouble))
      i += 1
    }
    val idx = Array.range(0, k).map(Integer.valueOf)
    val cmp = new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c =
          if (useL2) java.lang.Long.compare(sl2(a), sl2(b))
          else java.lang.Double.compare(score(b), score(a))
        if (c != 0) c else java.lang.Long.compare(cid(a), cid(b))
      }
    }
    java.util.Arrays.sort(idx, cmp)
    val take = math.min(k.toLong, math.max(npe, 0L)).toInt
    val rows = new Array[Any](take)
    i = 0
    while (i < take) {
      val o = idx(i).intValue()
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(cid(o), cdot(o))
      i += 1
    }
    new GenericArrayData(rows)
  }
}

/** Row-local argmin over a broadcast-attached centroid array — replaces the
  * crossJoin + window row_number()=1 (or min(struct)) assignment pattern
  * with a zero-Exchange map (see the block comment above [[VecOps]]).
  */
case class NearestCentroidId(v: Expression, nrm: Expression, cents: Expression,
    useL2: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = v
  override def second: Expression = nrm
  override def third: Expression = cents
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_id"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VecOps.nearestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[Long],
      c.asInstanceOf[ArrayData], useL2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, z) => s"""
      |${ev.value} = org.apache.spark.sql.graftshim.VecOps.nearestCentroid(
      |  $x, $y, $z, $useL2);
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(v = newFirst, nrm = newSecond, cents = newThird)
}

/** Row-local per-subspace nearest-codeword assignment (array<long>(m) of the
  * winners' emit fields) — replaces the subvector explode + broadcast join +
  * per-(vec,j) argmin aggregation with a zero-Exchange map.
  */
case class PqBestCodes(v: Expression, books: Expression, m: Int, sub: Int)
    extends BinaryExpression {

  override def left: Expression = v
  override def right: Expression = books
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_best_codes"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.pqBest(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      |${ev.value} = org.apache.spark.sql.graftshim.VecOps.pqBest($x, $y, $m, $sub);
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(v = newLeft, books = newRight)
}

/** Row-local per-query ADC LUT (array<array<long>>, subspace-major,
  * positioned by dense codeword index) — replaces the query-side explode +
  * broadcast join + two-stage LUT aggregation with a zero-Exchange map.
  */
case class PqLutArr(v: Expression, books: Expression, m: Int, sub: Int)
    extends BinaryExpression {

  override def left: Expression = v
  override def right: Expression = books
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut_arr"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.pqLut(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
      |${ev.value} = org.apache.spark.sql.graftshim.VecOps.pqLut($x, $y, $m, $sub);
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(v = newLeft, books = newRight)
}

/** Row-local top-npe probed cells (rank order, with the exact coarse dot
  * riding along) — replaces the query×centroid crossJoin + window
  * row_number() ≤ npe probe with a zero-Exchange map + explode.
  */
case class TopCellsExpr(v: Expression, nrm: Expression, npe: Expression,
    cents: Expression, useL2: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = v
  override def second: Expression = nrm
  override def third: Expression = npe
  override def fourth: Expression = cents
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cdot", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_cells"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    VecOps.topCells(a.asInstanceOf[ArrayData], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[ArrayData], useL2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => s"""
      |${ev.value} = org.apache.spark.sql.graftshim.VecOps.topCells(
      |  $a, $b, $c, $d, $useL2);
      |""".stripMargin)

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(v = newFirst, nrm = newSecond, npe = newThird, cents = newFourth)
}

/** The first 60 bits of `md5(s)` as a non-negative long — bit-identical
  * to `conv(substring(md5(s), 1, 15), 16, 10) :: long` (and to DuckDB's
  * `('0x' || substring(md5(s), 1, 15))::BIGINT`), which is the engine's
  * standard oracle-replayable string hash (MinHash shingles, SimHash
  * token votes, DSIR feature buckets, shard keys).
  *
  * The composed form pays, per row, a 32-char hex encode of the digest,
  * a substring copy, and conv's base-16 string parse — pure overhead
  * around the 8 digest bytes the value actually needs. This expression
  * feeds the digest bytes straight into one shift-or chain inside
  * whole-stage codegen. The MessageDigest instance is per-operator
  * mutable state (interpreted path: thread-local), so no per-row
  * allocation beyond the digest itself.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(a: Any): Any = {
    val dg = Md5Prefix60.local.get()
    dg.reset()
    Md5Prefix60.pack(dg.digest(a.asInstanceOf[UTF8String].getBytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, x => {
      val dg = ctx.freshName("dg")
      s"""
         |$md.reset();
         |byte[] $dg = $md.digest($x.getBytes());
         |${ev.value} = org.apache.spark.sql.graftshim.Md5Prefix60.pack($dg);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  private[graftshim] val local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex nibbles of the digest as one long (bytes 0–6 whole,
    * high nibble of byte 7) — exactly what base-16 parsing the 15-char
    * hex prefix yields.
    */
  def pack(dg: Array[Byte]): Long =
    ((dg(0) & 0xffL) << 52) | ((dg(1) & 0xffL) << 44) |
    ((dg(2) & 0xffL) << 36) | ((dg(3) & 0xffL) << 28) |
    ((dg(4) & 0xffL) << 20) | ((dg(5) & 0xffL) << 12) |
    ((dg(6) & 0xffL) << 4) | ((dg(7) & 0xffL) >>> 4)
}
