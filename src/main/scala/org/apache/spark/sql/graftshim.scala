package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

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
