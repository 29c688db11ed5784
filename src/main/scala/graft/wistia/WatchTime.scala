package graft.wistia

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The sessionized watch-time state machine (SURVEY A6 — reference:
  * process_wistia_data_v2.py:402-469), the one operator whose semantics
  * exceed Spark built-ins. Two implementations:
  *
  *  - [[spec]]: a direct, readable translation of the reference state
  *    machine via groupByKey + mapGroups (per-group time sort, tiny
  *    (lastTime, lastPercent, total) state). This is the executable
  *    specification — order-dependent and non-commutative, so it cannot
  *    be a partial/final aggregate.
  *  - [[windowed]]: a lag-window formulation that stays inside
  *    whole-stage codegen (the 100 TB path: one shuffle shared with the
  *    group-by, no JVM lambda in the hot loop). Equivalent to [[spec]]
  *    whenever timestamps are strictly increasing within a
  *    (media, visitor, date) group — the anchor then always equals the
  *    previous event. WatchTimeSpec cross-checks the two.
  *
  * Faithful quirks, replicated deliberately (SURVEY §7.4):
  *  - `(Δpercent / 100) · duration` at process_wistia_data_v2.py:437
  *    while percent_viewed is a 0–1 *fraction* → credited time is ~100×
  *    under-scaled. Kept behind [[percentScaleDivisor]]; pass 1.0 for
  *    the "what it meant" corrected mode.
  *  - Python round() is half-even → Spark `bround`, not `round`.
  *  - events named 'pause'/'end' advance the anchor without credit;
  *    a >0.01 forward jump with no elapsed time is a seek (anchor reset).
  */
object WatchTime {

  /** Faithful /100 divisor (reference :437). Set 1.0 for corrected mode. */
  val percentScaleDivisor: Double = 100.0

  private[wistia] case class Ev(
      tsMicros: Long,
      percent: Option[Double],
      name: Option[String])

  /** The state machine on one time-sorted group; returns total seconds
    * watched (uncapped, unrounded). Direct translation of reference
    * :410-465.
    */
  private[wistia] def run(sorted: Seq[Ev], duration: Option[Double],
      scaleDivisor: Double = percentScaleDivisor): Double = {
    duration match {
      case Some(dur) if dur > 0 =>
        var total = 0.0
        var lastTime: Option[Long] = None
        var lastPct = 0.0
        sorted.foreach { e =>
          e.percent match {
            case Some(pct) =>
              val isPlay = e.name.contains("play")
              if (lastTime.isEmpty && (pct > 0 || isPlay)) {
                lastTime = Some(e.tsMicros); lastPct = pct
              } else if (lastTime.nonEmpty) {
                val elapsed = (e.tsMicros - lastTime.get) / 1e6
                if (elapsed > 0 && pct > lastPct) {
                  if (!e.name.exists(n => n == "pause" || n == "end")) {
                    val expected = (pct - lastPct) / scaleDivisor * dur
                    total += math.min(elapsed, expected)
                  }
                  lastPct = pct; lastTime = Some(e.tsMicros)
                } else if (pct > lastPct + 0.01) { // seek with no elapsed time
                  lastPct = pct; lastTime = Some(e.tsMicros)
                } else if (elapsed > 0 && pct <= lastPct) { // pause/seek-back
                  lastPct = pct; lastTime = Some(e.tsMicros)
                }
              }
            case None => () // reference :416 requires a percent to process
          }
        }
        math.min(total, dur)
      case Some(dur) => 0.0 // duration <= 0: no computation (:408)
      case None => 0.0
    }
  }

  /** Executable-spec implementation. Input columns: media_id,
    * visitor_key, received_at (timestamp), percent_viewed, name,
    * duration (already joined from dim_media — the reference's broadcast
    * lookup, J1). Output: media_id, visitor_id, date, total_watch_time
    * (uncapped-at-duration semantics *with* cap + half-even 2dp round
    * applied, as the reference does before emitting).
    */
  def spec(events: DataFrame, scaleDivisor: Double = percentScaleDivisor): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events.select(
      col("media_id"), col("visitor_key"),
      to_date(col("received_at")).cast("string").as("date"),
      unix_micros(col("received_at")).as("us"),
      col("percent_viewed"), col("name"), col("duration"))
      .filter(col("media_id").isNotNull && col("visitor_key").isNotNull &&
        col("received_at").isNotNull)
      .as[(String, String, String, Long, Option[Double], Option[String], Option[Double])]
    prepared
      .groupByKey { case (m, v, dt, _, _, _, _) => (m, v, dt) }
      .mapGroups { (key: (String, String, String), it) =>
        val (m, v, dt) = key
        val rows = it.toVector
        val dur = rows.view.map(_._7).collectFirst { case Some(x) => x }
        // stable sort by timestamp ≙ Python sorted() stability (:395)
        val sorted = rows.sortBy(_._4).map(r => Ev(r._4, r._5, r._6))
        val raw = run(sorted, dur, scaleDivisor)
        val rounded = BigDecimal(raw)
          .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        (m, v, dt, rounded)
      }
      .toDF("media_id", "visitor_id", "date", "total_watch_time")
      .withColumn("date", col("date").cast("date"))
  }

  /** Codegen-friendly lag-window formulation. Same input contract as
    * [[spec]]. Tracking starts at the first event with percent>0 or
    * name='play'; every later event credits min(elapsed, Δpct/divisor ·
    * duration) when percent rose and the event isn't pause/end.
    */
  def windowed(events: DataFrame, scaleDivisor: Double = percentScaleDivisor): DataFrame = {
    val grp = Seq(col("media_id"), col("visitor_key"), col("dt"))
    val w = Window.partitionBy(grp: _*).orderBy(col("us"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val valid = events
      .filter(col("media_id").isNotNull && col("visitor_key").isNotNull &&
        col("received_at").isNotNull)
      .select(
        col("media_id"), col("visitor_key"),
        to_date(col("received_at")).as("dt"),
        unix_micros(col("received_at")).as("us"),
        col("percent_viewed").as("pct"), col("name"), col("duration"))
    // groups whose every event lacks percent still emit a 0.0 row (the
    // spec path iterates them as no-ops); keep their keys for the final
    // left join.
    val allKeys = valid.select(col("media_id"),
      col("visitor_key").as("visitor_id"), col("dt").as("date")).distinct()
    val base = valid
      .filter(col("pct").isNotNull) // reference :416 skips percent-less rows
      .withColumn("started", when(col("pct") > 0 || col("name") === "play", 1L).otherwise(0L))
      .withColumn("n_started_before", coalesce(sum(col("started")).over(wPrev), lit(0L)))
      .withColumn("prev_pct", lag(col("pct"), 1).over(w))
      .withColumn("elapsed", (col("us") - lag(col("us"), 1).over(w)) / 1e6)
    val credit = when(
      col("n_started_before") >= 1 && col("elapsed") > 0 &&
        col("pct") > col("prev_pct") &&
        !coalesce(col("name").isin("pause", "end"), lit(false)),
      least(col("elapsed"), (col("pct") - col("prev_pct")) / scaleDivisor * col("duration")))
      .otherwise(0.0)
    val agg = base
      .withColumn("credit", when(col("duration").isNotNull && col("duration") > 0, credit)
        .otherwise(0.0))
      .groupBy(col("media_id"), col("visitor_key").as("visitor_id"), col("dt").as("date"))
      .agg(bround(
        when(max(col("duration")) > 0, least(sum(col("credit")), max(col("duration"))))
          .otherwise(lit(0.0)), 2).as("total_watch_time"))
    allKeys.join(agg, Seq("media_id", "visitor_id", "date"), "left")
      .na.fill(0.0, Seq("total_watch_time"))
  }
}
