package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{DotLong, SparkShim}

/** Column-level entry points for the native vector expressions (see
  * [[org.apache.spark.sql.graftshim.DotLong]] for semantics + rationale).
  */
object VectorFunctions {
  /** Exact int64 dot product of two `array<long>` columns. */
  def dotLong(a: Column, b: Column): Column =
    SparkShim.column(DotLong(SparkShim.expression(a), SparkShim.expression(b)))

  /** Exact int64 squared L2 norm of an `array<long>` column. */
  def normSqLong(a: Column): Column = dotLong(a, a)
}
