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

    // dd14 variant A: exists()-HOF span test per token (interpreted)
    def hofDd14(s: SparkSession, dir: String): DataFrame = {
      val docs = graft.Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val spans = graft.Registry.queries("dd13_substring_dedup")(s, dir)
        .groupBy("doc_id")
        .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
      val pos = docs
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1)).as("i"))
        .select(col("doc_id"), col("i"),
          element_at(col("toks"), col("i") + 1).as("tok"))
      val kept = pos.join(spans, Seq("doc_id"), "left")
        .filter(col("spans").isNull || !exists(col("spans"),
          sp => col("i") >= sp("span_start") && col("i") <= sp("span_end")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ",
            transform(array_sort(collect_list(struct(col("i"), col("tok")))),
              x => x("tok"))).as("clean_text"))
      graft.Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
          col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
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
    time("warm-hof")(hofDd14(spark, d))
    time("warm-anti")(graft.Registry.queries("dd14_residual_corpus")(spark, d))
    for (_ <- 1 to 3) {
      time("hof")(hofDd14(spark, d))
      time("anti")(graft.Registry.queries("dd14_residual_corpus")(spark, d))
    }
    spark.stop()
  }
}
