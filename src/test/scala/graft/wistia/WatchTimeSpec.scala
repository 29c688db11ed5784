package graft.wistia

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** A6 watch-time: hand-computed cases against the executable spec, and a
  * randomized differential check spec ⇔ windowed (SURVEY §7.4 requires
  * both implementations to agree under strictly-increasing timestamps).
  */
class WatchTimeSpec extends SparkSpec {

  private def ts(s: String): Long =
    Timestamp.valueOf(s).getTime * 1000L // micros

  import WatchTime.Ev

  test("state machine: simple linear watch credits expected time") {
    // duration 100s, corrected mode (divisor=1): 0→0.5 over 40s credits
    // min(40, 0.5*100)=40; 0.5→0.8 over 10s credits min(10, 30)=10
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.0), None),
      Ev(ts("2025-01-01 00:00:10"), Some(0.5), None), // starts tracking (pct>0)
      Ev(ts("2025-01-01 00:00:50"), Some(0.8), None)) // credits min(40, 0.3*100)=30
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 30.0) < 1e-9)
  }

  test("state machine: faithful /100 quirk under-scales credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:10"), Some(0.5), None),
      Ev(ts("2025-01-01 00:00:50"), Some(0.8), None))
    // faithful: (0.3/100)*100 = 0.3s credited instead of 30s
    val total = WatchTime.run(evs, Some(100.0))
    assert(math.abs(total - 0.3) < 1e-9)
  }

  test("state machine: pause/end advance anchor without credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.1), None),
      Ev(ts("2025-01-01 00:00:10"), Some(0.5), Some("pause")), // no credit, anchor moves
      Ev(ts("2025-01-01 00:00:20"), Some(0.6), None)) // credits vs 0.5
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 10.0) < 1e-9) // min(10, 0.1*100)=10
  }

  test("state machine: percent decrease resets anchor, no credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.5), None),
      Ev(ts("2025-01-01 00:00:10"), Some(0.2), None), // seek back
      Ev(ts("2025-01-01 00:00:20"), Some(0.3), None)) // credits vs 0.2
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 10.0) < 1e-9)
  }

  test("state machine: no duration → zero; cap at duration") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.1), None),
      Ev(ts("2025-01-01 02:00:00"), Some(1.0), None))
    assert(WatchTime.run(evs, None) === 0.0)
    assert(WatchTime.run(evs, Some(0.0)) === 0.0)
    // corrected mode: credit min(7200, 0.9*50)=45, already below cap 50
    assert(WatchTime.run(evs, Some(50.0), scaleDivisor = 1.0) === 45.0)
  }

  test("state machine: events before first progress don't credit") {
    val evs = Seq(
      Ev(ts("2025-01-01 00:00:00"), Some(0.0), None), // not started
      Ev(ts("2025-01-01 00:10:00"), Some(0.0), None), // still not started
      Ev(ts("2025-01-01 00:20:00"), Some(0.4), None), // starts here, no credit
      Ev(ts("2025-01-01 00:20:30"), Some(0.5), None)) // credits min(30, 10)=10
    val total = WatchTime.run(evs, Some(100.0), scaleDivisor = 1.0)
    assert(math.abs(total - 10.0) < 1e-9)
  }

  test("differential: windowed == spec on randomized streams with duplicate timestamps") {
    import scala.util.Random
    val rnd = new Random(42)
    var key = 0
    val rows = (0 until 300).flatMap { g =>
      val media = s"m${g % 7}"
      val visitor = s"v${g % 23}"
      val day = 1 + (g % 3)
      val n = 1 + rnd.nextInt(10)
      var t = ts(f"2025-01-0$day 00:00:00") + rnd.nextInt(1000) * 1000000L
      (0 until n).map { _ =>
        // ~40% of events tie with the previous one (second-granularity
        // Wistia timestamps collide in practice); the rest step forward.
        if (rnd.nextInt(10) >= 4) t += (1 + rnd.nextInt(600)) * 1000000L
        // dyadic percent steps (k/256): credits stay exactly
        // representable, so spec's sequential add and windowed's
        // unordered sum agree bit-for-bit; steps straddle the 0.01 seek
        // threshold (reference :459)
        val pct = if (rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(257) / 256.0)
        val name = rnd.nextInt(10) match {
          case 0 => Some("play"); case 1 => Some("pause"); case 2 => Some("end")
          case _ => None
        }
        key += 1
        (media, visitor, new Timestamp(t / 1000L), f"ek$key%06d", pct, name)
      }
    }
    // multiples of 50 keep (Δpct/100)·duration dyadic-exact under both
    // divisor modes
    val durations = (0 until 7).map(i => (s"m$i", if (i == 6) None else Some(50.0 * (i + 1))))

    import spark.implicits._
    val events = rows.toDF(
      "media_id", "visitor_key", "received_at", "event_key", "percent_viewed", "name")
    val durDf = durations.toDF("media_id", "duration")
    val joined = events.join(broadcast(durDf), Seq("media_id"), "left")

    for (divisor <- Seq(100.0, 1.0)) {
      val specOut = WatchTime.spec(joined, divisor)
        .withColumnRenamed("total_watch_time", "spec_wt")
      val winOut = WatchTime.windowed(joined, divisor)
        .withColumnRenamed("total_watch_time", "win_wt")
      val cmp = specOut.join(winOut, Seq("media_id", "visitor_id", "date"), "full")
        .withColumn("diff", abs(coalesce(col("spec_wt"), lit(-1)) -
          coalesce(col("win_wt"), lit(-2))))
      val bad = cmp.filter(col("diff") > 1e-9)
      assert(bad.count() === 0,
        s"divisor=$divisor mismatches: ${bad.collect().take(5).mkString("\n")}")
      assert(specOut.count() > 0)
    }
  }

  test("differential: windowed == spec under tied anchors (hand cases)") {
    import spark.implicits._
    // One group, duration 100, corrected divisor. Tie patterns that
    // diverge under a naive lag formulation: a tied small (< 0.01)
    // upward step must NOT move the anchor; a tied decrease must not
    // either; a tied > 0.01 jump must.
    val t0 = ts("2025-01-01 10:00:00")
    val rows = Seq[(String, String, Timestamp, String, Option[Double], Option[String])](
      // run 1: start at 0.5, tied small step to 0.505 (anchor stays 0.5)
      ("m", "v", new Timestamp(t0 / 1000L), "e01", Some(0.5), None),
      ("m", "v", new Timestamp(t0 / 1000L), "e02", Some(0.505), None),
      // run 2 (+10s): 0.51 credits vs anchor 0.5 → min(10, 0.01*100)=1
      ("m", "v", new Timestamp((t0 + 10000000L) / 1000L), "e03", Some(0.51), None),
      // run 3 (+20s): tied pair — decrease to 0.3 (anchor stays 0.51
      // after first row re-anchors... first row 0.52 credits 1 then
      // tied 0.3 leaves anchor at 0.52)
      ("m", "v", new Timestamp((t0 + 20000000L) / 1000L), "e04", Some(0.52), None),
      ("m", "v", new Timestamp((t0 + 20000000L) / 1000L), "e05", Some(0.3), None),
      // run 4 (+30s): 0.53 > 0.52 → credit 1; tied jump to 0.8 (> 0.01)
      // moves anchor to 0.8 without credit
      ("m", "v", new Timestamp((t0 + 30000000L) / 1000L), "e06", Some(0.53), None),
      ("m", "v", new Timestamp((t0 + 30000000L) / 1000L), "e07", Some(0.8), None),
      // run 5 (+40s): 0.9 credits vs 0.8 → min(10, 0.1*100)=10
      ("m", "v", new Timestamp((t0 + 40000000L) / 1000L), "e08", Some(0.9), None))
      .toDF("media_id", "visitor_key", "received_at", "event_key", "percent_viewed", "name")
      .withColumn("duration", lit(100.0))
    val specV = WatchTime.spec(rows, 1.0).collect()(0).getDouble(3)
    val winV = WatchTime.windowed(rows, 1.0).collect()(0).getDouble(3)
    assert(specV === 13.0) // 1 + 1 + 1 + 10
    assert(winV === specV)
  }
}
