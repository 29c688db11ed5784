package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver corpus (TESTDATA.md): one parquet file per
  * table under an sf directory. All engine queries read through here so
  * scan options stay in one place.
  *
  * Scale notes (100 TB design): each `table()` is a plain parquet scan —
  * Catalyst pushes filters/projections into the scan
  * (`PushedFilters`/`ReadSchema`), and on a real cluster the path would be
  * a partitioned directory (`date=`/`run_ts=`) so partition pruning
  * applies before any IO. Nothing here materializes on the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across corpus
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses to read as a
    * timestamp) and TIMESTAMP(MICROS, NTZ). Dispatch on the type Spark
    * actually scans:
    *
    *  - `LongType`: the `nanosAsLong` flag surfaced a NANOS column as raw
    *    epoch-nanos. Integer-divide to micros (`div`, not `/` — epoch-nanos
    *    magnitude exceeds exact double range), matching DuckDB's
    *    nanos→micros truncation.
    *  - `TimestampNTZType` / `TimestampType`: cast straight to
    *    `timestamp`. The session is pinned UTC, so an NTZ micros value is
    *    preserved bit-for-bit and the DuckDB naive-timestamp oracle
    *    semantics are unchanged.
    *
    * The `nanosAsLong` flag is session-global BY NECESSITY: it is read at
    * scan execution, not at `spark.read` time, so a set-then-restore here
    * would break the (lazy) scan later. Global is safe in this engine:
    * events is the only possibly-NANOS table, every reader goes through
    * this loader, and for non-nanos parquet the flag is a no-op — it only
    * changes how the NANOS physical annotation is surfaced.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      // fail LOUDLY on anything else: a silent cast of e.g. a string or
      // int32-date regeneration could produce nulls and green-but-empty
      // downstream results between test runs
      case other => throw new IllegalStateException(
        s"events.ts has unexpected parquet-scanned type $other; " +
        "update Tables.events dispatch for the new corpus generation")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
