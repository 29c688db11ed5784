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
  *  - [[windowed]]: a declarative formulation that stays inside
  *    whole-stage codegen for the hot path (the 100 TB path). Events are
  *    first collapsed per tie-run — all rows sharing one timestamp in a
  *    (media, visitor, date) group — because the reference state machine
  *    moves its anchor within a run only on a > 0.01 upward percent jump
  *    (elapsed == 0 disables every other transition, and credit requires
  *    elapsed > 0, so runs never credit internally). Each run reduces to
  *    (first row, has-start flag, two anchor ratchets); a lag window over
  *    the now-unique run timestamps then replays the credit rule. Output
  *    is bit-equal to [[spec]] for ALL inputs under the deterministic
  *    (timestamp, event_key) event order — WatchTimeSpec's differential
  *    test covers duplicate timestamps explicitly.
  *
  * Scale: the run collapse is a map-side-combinable aggregation keyed
  * (media, visitor, date, us); tie runs are tiny (a handful of events at
  * one second), so the interpreted `aggregate` fold touches short arrays
  * only. Two shuffles total (run keys, then group keys) — the second is
  * reused by the final group-by.
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
    * visitor_key, received_at (timestamp), event_key (deterministic
    * tie-break for equal timestamps), percent_viewed, name, duration
    * (already joined from dim_media — the reference's broadcast lookup,
    * J1). Output: media_id, visitor_id, date, total_watch_time
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
      col("event_key").cast("string"),
      col("percent_viewed"), col("name"), col("duration"))
      .filter(col("media_id").isNotNull && col("visitor_key").isNotNull &&
        col("received_at").isNotNull)
      .as[(String, String, String, Long, String, Option[Double], Option[String], Option[Double])]
    prepared
      .groupByKey { case (m, v, dt, _, _, _, _, _) => (m, v, dt) }
      .mapGroups { (key: (String, String, String), it) =>
        val (m, v, dt) = key
        val rows = it.toVector
        val dur = rows.view.map(_._8).collectFirst { case Some(x) => x }
        // total order (ts, event_key) ≙ the reference's stable sorted()
        // over its (deterministic) file order (:395)
        val sorted = rows.sortBy(r => (r._4, r._5)).map(r => Ev(r._4, r._6, r._7))
        val raw = run(sorted, dur, scaleDivisor)
        val rounded = BigDecimal(raw)
          .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
        (m, v, dt, rounded)
      }
      .toDF("media_id", "visitor_id", "date", "total_watch_time")
      .withColumn("date", col("date").cast("date"))
  }

  /** Codegen-friendly run-collapsed formulation; bit-equal to [[spec]]
    * on any input (see object doc). Same input contract as [[spec]]
    * (event_key required).
    *
    * Per tie-run fold state: `st` = tracking started within/before this
    * run's scan, `af` = anchor percent assuming tracking had NOT started
    * before the run ("fresh"), `ast` = anchor percent assuming it had
    * (anchor := first row, then ratchet: a jump > 0.01 moves it —
    * reference :459-460). Credit can only happen at a run's first row
    * (elapsed > 0 requires a strictly later timestamp than the anchor,
    * and the anchor always sits in the current run once one row of it is
    * processed).
    */
  def windowed(events: DataFrame, scaleDivisor: Double = percentScaleDivisor): DataFrame = {
    val valid = events
      .filter(col("media_id").isNotNull && col("visitor_key").isNotNull &&
        col("received_at").isNotNull)
      .select(
        col("media_id"), col("visitor_key"),
        to_date(col("received_at")).as("dt"),
        unix_micros(col("received_at")).as("us"),
        col("event_key").cast("string").as("event_key"),
        col("percent_viewed").as("pct"), col("name"), col("duration"))
    // groups whose every event lacks percent still emit a 0.0 row (the
    // spec path iterates them as no-ops); keep their keys for the final
    // left join.
    val allKeys = valid.select(col("media_id"),
      col("visitor_key").as("visitor_id"), col("dt").as("date")).distinct()
    val runs = valid
      .filter(col("pct").isNotNull) // reference :416 skips percent-less rows
      .groupBy(col("media_id"), col("visitor_key"), col("dt"), col("us"))
      .agg(
        min_by(struct(col("pct"), col("name")), col("event_key")).as("f0"),
        max(col("duration")).as("duration"),
        // key-sorted run rows; struct sort orders by first field (k)
        sort_array(collect_list(
          struct(col("event_key").as("k"), col("pct").as("p"), col("name").as("n")))).as("lst"))
      .withColumn("fold", expr(
        """aggregate(lst,
          |  named_struct('i', 0, 'st', false,
          |               'af', cast(0.0 as double), 'ast', cast(0.0 as double)),
          |  (acc, x) -> CASE WHEN acc.i = 0 THEN
          |    named_struct('i', 1,
          |      'st', x.p > 0 OR coalesce(x.n = 'play', false),
          |      'af', x.p, 'ast', x.p)
          |  ELSE
          |    named_struct('i', 1,
          |      'st', acc.st OR x.p > 0 OR coalesce(x.n = 'play', false),
          |      'af', CASE WHEN acc.st THEN
          |                   (CASE WHEN x.p > acc.af + 0.01 THEN x.p ELSE acc.af END)
          |                 WHEN x.p > 0 OR coalesce(x.n = 'play', false) THEN x.p
          |                 ELSE acc.af END,
          |      'ast', CASE WHEN x.p > acc.ast + 0.01 THEN x.p ELSE acc.ast END)
          |  END)""".stripMargin))
      .select(
        col("media_id"), col("visitor_key"), col("dt"), col("us"), col("duration"),
        col("f0.pct").as("p0"), col("f0.name").as("n0"),
        col("fold.st").as("has_start"), col("fold.af").as("a_fresh"),
        col("fold.ast").as("a_started"))
    // run timestamps are unique per group → total deterministic order.
    val w = Window.partitionBy(col("media_id"), col("visitor_key"), col("dt"))
      .orderBy(col("us"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val base = runs
      .withColumn("started_before",
        coalesce(sum(when(col("has_start"), 1L).otherwise(0L)).over(wPrev), lit(0L)) >= 1)
      // anchor leaving this run: started-entry runs re-anchor at their
      // first row (ratchet ast); fresh runs anchor at their first
      // starting row (ratchet af) if any.
      .withColumn("anchor_out",
        when(col("started_before"), col("a_started"))
          .otherwise(when(col("has_start"), col("a_fresh"))))
      .withColumn("prev_anchor", lag(col("anchor_out"), 1).over(w))
      .withColumn("elapsed", (col("us") - lag(col("us"), 1).over(w)) / 1e6)
    val credit = when(
      col("started_before") && col("duration").isNotNull && col("duration") > 0 &&
        col("p0") > col("prev_anchor") &&
        !coalesce(col("n0").isin("pause", "end"), lit(false)),
      least(col("elapsed"), (col("p0") - col("prev_anchor")) / scaleDivisor * col("duration")))
      .otherwise(0.0)
    val agg = base
      .withColumn("credit", credit)
      .groupBy(col("media_id"), col("visitor_key").as("visitor_id"), col("dt").as("date"))
      .agg(bround(
        when(max(col("duration")) > 0, least(sum(col("credit")), max(col("duration"))))
          .otherwise(lit(0.0)), 2).as("total_watch_time"))
    allKeys.join(agg, Seq("media_id", "visitor_id", "date"), "left")
      .na.fill(0.0, Seq("total_watch_time"))
  }
}
