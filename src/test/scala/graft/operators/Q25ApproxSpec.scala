package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Numeric error bound for the q25 sketch path: the oracle row only
  * checks the within-5% verdict booleans; this spec pins the actual
  * relative error of `approx_count_distinct(rsd=0.02)` against the exact
  * counts on real data, so a sketch regression shows up as a number, not
  * just a flipped flag.
  */
class Q25ApproxSpec extends SparkSpec {

  private def maxRelErr(dir: String): Double = {
    val out = Registry.queries("q25_approx_distinct")(spark, dir)
    // recompute the raw estimates (the query output carries verdicts,
    // not estimates) and compare to its exact columns
    val est = graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("apx_orders"))
    out.join(est, Seq("l_returnflag"))
      .select(greatest(
        abs(col("apx_parts") - col("n_parts")).cast("double") / col("n_parts"),
        abs(col("apx_orders") - col("n_orders")).cast("double") / col("n_orders"))
        .as("rel_err"))
      .agg(max("rel_err")).head().getDouble(0)
  }

  test("q25: approx_count_distinct within 5% of exact at sf0.001 and sf0.01") {
    assert(maxRelErr(sf("sf0.001")) < 0.05)
    assert(maxRelErr(sf("sf0.01")) < 0.05)
  }

  test("q25: the gate verdict booleans are all true") {
    val out = Registry.queries("q25_approx_distinct")(spark, sf("sf0.01"))
    assert(out.filter(!col("apx_parts_ok") || !col("apx_orders_ok")).count() === 0L)
  }
}
