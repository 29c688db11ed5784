package graft.operators

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** The custom bounded TopKPairs aggregate vs the row_number window
  * formulation: identical output on real data (incl. groups with fewer
  * than k rows), plus an adversarial tie/duplicate-key check.
  */
class Q10TopKSpec extends SparkSpec {

  test("q10: TopKPairs aggregate is bit-equal to the window formulation") {
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val agg = Registry.queries("q10_topk_per_group")(spark, d)
      val win = Relational.q10WindowTwin(spark, d)
      assert(agg.exceptAll(win).count() === 0L)
      assert(win.exceptAll(agg).count() === 0L)
    }
  }

  test("TopKPairs: duplicate sort keys break ties on the payload") {
    import spark.implicits._
    val df = Seq(
      (1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L), (1L, 7.0, 40L),
      (2L, 1.0, 1L)).toDF("g", "price", "id")
    val out = df.groupBy("g")
      .agg(graft.functions.VectorFunctions.topK(col("price"), col("id"), 3).as("top"))
      .select(col("g"), col("top.payload").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    // g=1: 7.0 first, then the 5.0 ties ordered by id ascending
    assert(out(1L) === List(40L, 10L, 20L))
    // g=2: fewer rows than k
    assert(out(2L) === List(1L))
  }

  test("TopKPairs: NaN keys rank the way the window's DESC sort ranks them") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, Double.NaN, 1L), (1L, 5.0, 2L), (1L, 3.0, 3L), (1L, Double.NaN, 4L))
      .toDF("g", "price", "id")
    val agg = df.groupBy("g")
      .agg(graft.functions.VectorFunctions.topK(col("price"), col("id"), 3).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "t")))
      .select(col("t.payload").as("id"), (col("i") + 1).cast("int").as("rnk"))
    val win = df.withColumn("rnk",
        row_number().over(Window.partitionBy("g").orderBy(col("price").desc, col("id"))))
      .filter(col("rnk") <= 3).select("id", "rnk")
    assert(agg.exceptAll(win).count() === 0L)
    assert(win.exceptAll(agg).count() === 0L)
  }

  test("TopKPairs: merge across many partitions keeps the global top-k") {
    import spark.implicits._
    // 10k rows in one group spread over 32 partitions; top-3 known
    val df = spark.range(10000).repartition(32)
      .select(lit(0L).as("g"), col("id").cast("double").as("price"), col("id"))
    val out = df.groupBy("g")
      .agg(graft.functions.VectorFunctions.topK(col("price"), col("id"), 3).as("top"))
      .select(col("top.payload").as("ids")).head().getSeq[Long](0).toList
    assert(out === List(9999L, 9998L, 9997L))
  }
}
