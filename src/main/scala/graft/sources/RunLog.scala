package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline run history — the job-log the reference gets for free from
  * its managed stack (every BigQuery load keeps a job entry with row
  * counts, duration, and error; the cloud-run job logs per-stage
  * results). A self-hosted lifecycle needs the same table or nightly
  * failures are invisible: one row per (run, stage) with rows written,
  * wall millis, and ok/failed status, appended to the warehouse like
  * any other table so it is queryable next to the data it describes.
  *
  * Row counting uses the Observation API: `df.observe(count(*))` rides
  * the SAME action that writes the stage — no second count job over
  * what was just written (the naive post-write `table.count()` is a
  * full re-scan that grows with TABLE size; this is O(0) extra — the
  * metric accumulates on rows already flowing through the writer).
  * A stage that THROWS still gets its row logged (status=failed, rows
  * -1 since the action died) before the error propagates — the log is
  * most valuable precisely when the run does not finish.
  */
object RunLog {

  case class Entry(run_ts: java.sql.Timestamp, pipeline: String,
      stage: String, rows: Long, millis: Long, status: String,
      error: String)

  /** Run `write` on an observed copy of `df`, returning the stage's log
    * entry. The observation name is salted per call — Spark requires
    * uniqueness per query — and `obs.get` returns immediately because
    * the write action has already completed when it is read.
    */
  def observedWrite(df: DataFrame, runTs: java.sql.Timestamp,
      pipeline: String, stage: String)(write: DataFrame => Unit): Entry = {
    val obs = Observation(s"runlog_${stage}_${java.util.UUID.randomUUID}")
    val observed = df.observe(obs, count(lit(1)).as("rows"))
    val t0 = System.nanoTime()
    try {
      write(observed)
      Entry(runTs, pipeline, stage,
        obs.get("rows").asInstanceOf[Long],
        (System.nanoTime() - t0) / 1000000L, "ok", "")
    } catch {
      case e: Throwable =>
        throw LoggedFailure(
          Entry(runTs, pipeline, stage, -1L,
            (System.nanoTime() - t0) / 1000000L, "failed",
            Option(e.toString).getOrElse("").take(500)), e)
    }
  }

  /** A stage failure carrying its log entry, so the caller can append
    * the partial run history before propagating the original error.
    */
  case class LoggedFailure(entry: Entry, cause: Throwable)
    extends RuntimeException(cause)

  /** Run `body`, append ONE ok/failed row for it, rethrow on failure —
    * the step wrapper the run-logged flows share (one place for the
    * trail's row shape, the 500-char error truncation, and the
    * cumulative-from-`t0Nanos` duration convention). `rows` extracts
    * the logged count from the step's result.
    */
  def step[T](spark: SparkSession, path: String,
      runTs: java.sql.Timestamp, pipeline: String, stage: String,
      t0Nanos: Long)(rows: T => Long)(body: => T): T = {
    def entry(n: Long, status: String, err: String) =
      Entry(runTs, pipeline, stage, n,
        (System.nanoTime() - t0Nanos) / 1000000L, status,
        Option(err).getOrElse("").take(500))
    try {
      val r = body
      append(spark, path, Seq(entry(rows(r), "ok", "")))
      r
    } catch {
      // NonFatal only: logging the failure row is itself a Spark append
      // — on VM death (OOM) or a job cancellation, submitting more
      // cluster work in a broken JVM masks the real failure; fatal
      // throwables propagate unlogged (runRetention's leg rule)
      case scala.util.control.NonFatal(e) =>
        append(spark, path, Seq(entry(-1L, "failed", e.toString)))
        throw e
    }
  }

  /** Append entries to the path-based run-log table (tiny: one row per
    * stage per run — coalesced to a single file per append).
    */
  def append(spark: SparkSession, path: String, entries: Seq[Entry]): Unit = {
    import spark.implicits._
    if (entries.nonEmpty)
      entries.toDS().toDF().coalesce(1)
        .write.mode("append").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
