package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: time specific queries by name (args), or print a plan with
  * `explain:<name>`. `sbt "runMain graft.BenchOne dd2_ngram_jaccard"`.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach {
      case s if s.startsWith("explain:") =>
        val name = s.stripPrefix("explain:")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      case name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[benchone] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // drop leaked localCheckpoint blocks so repeated measurements
        // stay independent (see Bench.dropPersisted)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
