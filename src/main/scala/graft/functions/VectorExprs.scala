package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{DotLong, HyperplaneBands, IntersectCountSortedLong, SparkShim, TopKPairs}

/** Column-level entry points for the native vector/set expressions (see
  * [[org.apache.spark.sql.graftshim.DotLong]] and
  * [[org.apache.spark.sql.graftshim.IntersectCountSortedLong]]).
  */
object VectorFunctions {
  /** Exact int64 dot product of two `array<long>` columns. */
  def dotLong(a: Column, b: Column): Column =
    SparkShim.column(DotLong(SparkShim.expression(a), SparkShim.expression(b)))

  /** Exact int64 squared L2 norm of an `array<long>` column. */
  def normSqLong(a: Column): Column = dotLong(a, a)

  /** All `numBits` hyperplane sign bits of a scaled int vector packed
    * into `numBits / bitsPerBand` band codes (one codegen'd loop).
    */
  def hyperplaneBands(a: Column, numBits: Int, bitsPerBand: Int): Column =
    SparkShim.column(HyperplaneBands(SparkShim.expression(a), numBits, bitsPerBand))

  /** Common-element count of two SORTED `array<long>` set columns. */
  def intersectCountSorted(a: Column, b: Column): Column =
    SparkShim.column(IntersectCountSortedLong(
      SparkShim.expression(a), SparkShim.expression(b)))

  /** Bounded top-k aggregate: the k largest (key DESC, payload ASC)
    * pairs per group as `array<struct<key, payload>>` in rank order.
    * Partial-aggregable — at most k pairs per group leave each map task
    * (vs every row under a `row_number().over(window)` plan).
    */
  def topK(key: Column, payload: Column, k: Int): Column =
    SparkShim.column(TopKPairs(
      SparkShim.expression(key), SparkShim.expression(payload), k)
      .toAggregateExpression())
}
