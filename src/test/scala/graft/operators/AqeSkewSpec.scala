package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE's runtime skew-join handling — the engine's answer to hot keys in
  * large joins (alongside manual salting, Skew.saltedSum): one
  * pathologically hot key forces a skewed sort-merge partition, and AQE
  * must split it (plan shows `skew=true`) while keeping the join result
  * exact.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")

      import spark.implicits._
      // hot key 0: 200k rows with padding; keys 1..50: 100 rows each
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("a"))
        .unionByName(spark.range(5000).select((col("id") % 50 + 1).as("k"), col("id").as("a")))
        .withColumn("pad", lpad(col("a").cast("string"), 64, "x"))
      val right = spark.range(51).select(col("id").as("k"), (col("id") * 10).as("b"))

      val joined = left.join(right, "k")
      // materialize THIS queryExecution (count() would plan a separate
      // query; the adaptive plan only finalizes on its own execution)
      val n = joined.collect().length
      assert(n === 205000) // every left row matches exactly one right row

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
