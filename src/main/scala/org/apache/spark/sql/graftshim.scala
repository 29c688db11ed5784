package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
