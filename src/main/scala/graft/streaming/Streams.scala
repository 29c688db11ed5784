package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming pipelines (SURVEY §2.7): the reference's
  * scheduler-driven micro-batches (T5) map to Trigger.AvailableNow over
  * an append-only raw zone; its high-water-mark bookkeeping (T1/T2)
  * becomes the streaming checkpoint. Transform functions are written
  * against plain DataFrames so the identical plan runs in batch (tested
  * against the DuckDB oracle via EventOps) and as a stream (tested over
  * MemoryStream in StreamsSpec).
  *
  * Scale: watermark + windowed aggregation keeps state bounded; session
  * state (flatMapGroupsWithState-style) is per-key-tiny. Sink pattern is
  * foreachBatch → append to the date-partitioned warehouse table, which
  * at 100 TB means each micro-batch only touches the partitions it saw.
  */
object Streams {

  /** 1-hour tumbling window counts with a 30-minute watermark —
    * streaming twin of EventOps.ev1 (the reference's daily grain is the
    * same shape at window="1 day").
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based session windows (30 min) per user — streaming twin of
    * EventOps.ev3, using Spark's native session_window state operator.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start"), col("w.end").as("end"),
        col("n_events"))

  /** Incremental append pipeline: one activation processes exactly the
    * files that arrived since the last checkpoint and stops — the
    * reference's Cloud-Scheduler→Job activation (T5) without the manual
    * HWM query (T1/T2): the checkpoint IS the high-water mark.
    */
  def availableNowSink(transformed: DataFrame, checkpoint: String)(
      write: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    transformed.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, id: Long) => write(batch, id))
}
