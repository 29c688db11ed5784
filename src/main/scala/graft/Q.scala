package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (usually) a
  * DuckDB-runnable ANSI-SQL oracle over the same parquet tables.
  *
  * Determinism contract (so the driver's sorted-column value-hash compare
  * passes): every output column is either
  *   - an exact integer (counts, cent-scaled money, epoch micros),
  *   - a string / date / truncated timestamp,
  *   - or a double derived deterministically from exact integers
  *     (single division / sqrt of exact ints — IEEE-deterministic),
  * and every query has a total ORDER BY. Floating-point *aggregation*
  * (order-dependent rounding) never reaches an output column.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {
  def all: Seq[Q] =
    operators.Relational.queries ++
      operators.GraphOps.queries ++
      operators.TextOps.queries ++
      operators.TrainPrep.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.EventOps.queries ++
      operators.AsOf.queries ++
      operators.Skew.queries ++
      wistia.WistiaGate.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  def headlines: Seq[Q] = all.filter(_.headline)
}
