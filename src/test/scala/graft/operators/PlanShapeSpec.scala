package graft.operators

/** Plan-quality regression guards: the 100 TB story rests on filters and
  * projections reaching the parquet scan and small sides broadcasting —
  * properties that silently degrade when a query is refactored (a
  * cast/UDF in the wrong place kills pushdown with zero correctness
  * signal). These specs pin the physical-plan shapes the scaladocs
  * claim, via the formatted explain text (stable public surface).
  */
class PlanShapeSpec extends graft.SparkSpec {

  private def formatted(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q42: disjunction halves are pushed into BOTH parquet scans") {
    val plan = formatted("q42_tpch_q19")
    // lineitem scan carries the quantity brackets...
    assert(plan.contains("GreaterThanOrEqual(l_quantity,1.0)"), plan.take(2000))
    // ...and the part scan carries the brand/size brackets
    assert(plan.contains("EqualTo(p_brand,Brand#1)"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(p_size,"), plan.take(2000))
  }

  test("q26 (TPC-H Q6): all three predicates reach the lineitem scan") {
    val plan = formatted("q26_tpch_q6")
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("l_shipdate"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_discount,"), plan.take(2000))
    assert(plan.contains("LessThan(l_quantity,"), plan.take(2000))
  }

  test("q1_agg: column pruning — scan reads no join keys") {
    val plan = formatted("q1_agg")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty, "no ReadSchema line in formatted plan")
    assert(!readSchema.contains("l_partkey"), readSchema)
    assert(!readSchema.contains("l_suppkey"), readSchema)
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }

  test("q4: explicit broadcast join survives planning") {
    val plan = formatted("q4_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q43 (TPC-H Q10): date window pushed to the orders scan") {
    val plan = formatted("q43_tpch_q10")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,"), plan.take(3000))
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.take(3000))
  }

  test("runtime bloom-filter join pruning engages on the Q10 shape at scale thresholds") {
    // At 100 TB the selective orders scan should inject a bloom filter
    // into the lineitem side of the shuffle join (runtime row-level
    // filtering). The default 10 MB creation threshold exceeds every
    // test table, so this pins the capability by scaling the threshold
    // down — the plan property, not the data size, is what must hold.
    val conf = spark.conf
    // broadcast joins don't need (or get) bloom filters, so also force
    // the shuffle-join plan the same query produces at 100 TB
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1g",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => conf.set(k, v) }
      val plan = formatted("q43_tpch_q10")
      assert(plan.toLowerCase.contains("bloomfilter"), plan.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
