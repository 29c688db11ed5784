package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev scratch: A/B-time variants of a query under investigation in one
  * JVM, alternating (`sbt "runMain graft.tools.PieceProbe <dir>"`).
  * Contents change per investigation; not part of the engine surface.
  */
object PieceProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfprobe")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // OLD dd11 verify: corpus-wide shingle aggregate, no candidate pruning
    def oldDd11(s: SparkSession, dir: String): DataFrame = {
      val isNew = col("doc_id") % 5 === 0
      val bands = graft.operators.Dedup.bandFrame(s, dir).localCheckpoint()
      val index = bands.filter(!isNew)
      val probe = bands.filter(isNew)
      val cand = probe.select(col("doc_id").as("nid"), col("band"), col("key"))
        .join(index.select(col("doc_id").as("oid"), col("band"), col("key")),
          Seq("band", "key"))
        .select("nid", "oid").distinct()
      val hs = graft.operators.Dedup.shingleRows(s, dir)
        .select(col("doc_id"), xxhash64(col("s")).as("h")).distinct()
        .groupBy("doc_id")
        .agg(sort_array(collect_set(col("h"))).as("hs"), count(lit(1)).as("n"))
      val verified = cand
        .join(hs.select(col("doc_id").as("nid"), col("hs").as("ha"), col("n").as("na")), "nid")
        .join(hs.select(col("doc_id").as("oid"), col("hs").as("hb"), col("n").as("nb")), "oid")
        .withColumn("common",
          graft.functions.VectorFunctions.intersectCountSorted(col("ha"), col("hb")))
        .filter(col("common") * 10L >= (col("na") + col("nb") - col("common")) * 8L)
        .groupBy("nid")
        .agg(count(lit(1)).as("n_dups"), min(col("oid")).as("dup_of"))
      graft.Tables.documents(s, dir).filter(isNew).select(col("doc_id"))
        .join(verified.withColumnRenamed("nid", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_dups").isNotNull.as("is_dup"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"), col("dup_of"))
        .orderBy("doc_id")
    }

    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[ab] $label%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      drop()
    }
    // warm both once, then alternate 3 measured passes each
    time("warm-old")(oldDd11(spark, d))
    time("warm-new")(graft.SparkEntry.queries("dd11_incremental_dedup")(spark, d))
    for (_ <- 1 to 3) {
      time("old")(oldDd11(spark, d))
      time("new")(graft.SparkEntry.queries("dd11_incremental_dedup")(spark, d))
    }
    spark.stop()
  }
}
