package graft.sources

import org.apache.spark.sql.functions._

/** Catalog.purgeKeys — the right-to-be-forgotten delete: rows matching a
  * request-sized key list are physically removed by rewriting ONLY the
  * partitions that contain them; untouched partitions keep their exact
  * files, and a partition whose every row was doomed is dropped (dynamic
  * overwrite alone would silently keep it — the classic purge hole).
  */
class PurgeSpec extends graft.SparkSpec {

  private def files(loc: String, p: Long): Set[String] = {
    val d = new java.io.File(s"$loc/p=$p")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
  }

  test("purgeKeys deletes only matching rows, rewrites only touched partitions, drops emptied ones") {
    val db = "purge_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_purge").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.docs"
    // 4 partitions × 100 rows; doc_id does NOT determine the partition
    // (the realistic takedown shape: keys arrive by entity, partitions
    // are by shard)
    val base = spark.range(400L).select(
      (col("id") % 4L).as("p"), col("id").as("doc_id"),
      (col("id") * 7L).as("payload"))
    Catalog.append(base.repartition(col("p")), t, Seq("p"))
    val tableLoc = s"$loc/docs"

    val before1 = files(tableLoc, 1L) // will be untouched
    assert(before1.nonEmpty)

    // purge list: 3 docs in partition 0, plus EVERY doc of partition 2
    // (the all-doomed partition), plus one id not in the table at all
    import spark.implicits._
    val doomed = (Seq(0L, 4L, 8L) ++ (0L until 400L).filter(_ % 4L == 2L)
      :+ 9999L).toDF("doc_id")
    val deleted = Catalog.purgeKeys(spark, t, doomed, Seq("p"))
    assert(deleted === 3L + 100L) // the absent id deletes nothing

    // content: exactly the survivors remain
    val remaining = spark.table(t)
    assert(remaining.count() === 400L - 103L)
    assert(remaining.join(doomed, Seq("doc_id"), "left_semi").count() === 0L)
    // survivors keep their exact payloads
    assert(remaining.filter(col("doc_id") === 12L)
      .select("payload").first().getLong(0) === 84L)

    // the all-doomed partition is GONE (dropped, not silently retained)
    assert(remaining.filter(col("p") === 2L).count() === 0L)
    assert(files(tableLoc, 2L).isEmpty)

    // untouched partition 1 kept its exact files (no rewrite ran there)
    assert(files(tableLoc, 1L) === before1)

    // idempotent: purging the same list again deletes nothing and
    // changes nothing
    assert(Catalog.purgeKeys(spark, t, doomed, Seq("p")) === 0L)
    assert(spark.table(t).count() === 297L)
  }

  test("purgeKeys handles NULL and quote-bearing partition values") {
    val db = "purge_edge"
    val loc = java.nio.file.Files.createTempDirectory("graft_purge_e").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.docs"
    import spark.implicits._
    // string partition col with a NULL partition
    // (__HIVE_DEFAULT_PARTITION__) and a value containing a quote
    val base = Seq(
      (Option("web"), 1L), (Option("web"), 2L),
      (Option("o'brien"), 3L), (Option("o'brien"), 4L),
      (None: Option[String], 5L), (None: Option[String], 6L))
      .toDF("src", "doc_id")
    Catalog.append(base.repartition(col("src")), t, Seq("src"))
    // doom: one row in the null partition (a plain === would silently
    // keep it) and EVERY row of the quoted partition (its DROP spec
    // must escape the quote)
    val deleted = Catalog.purgeKeys(spark, t,
      Seq(3L, 4L, 5L).toDF("doc_id"), Seq("src"))
    assert(deleted === 3L)
    val left = spark.table(t).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(left === Seq(1L, 2L, 6L))
    // the all-doomed quoted partition is gone; the null partition kept
    // its surviving row
    assert(spark.table(t).filter(col("src") === "o'brien").count() === 0L)
    assert(spark.table(t).filter(col("src").isNull).count() === 1L)
  }

  test("purgeKeys on a COMPOSITE partition spec: exact tuples, untouched cross-product partitions keep their files") {
    val db = "purge_comp"
    val loc = java.nio.file.Files.createTempDirectory("graft_purge_c").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.docs"
    // (d, r) composite partitions, 3×3 grid × 20 rows; the doomed rows
    // sit in tuples (0,0) and (1,1) ONLY — the per-column IN prefilter
    // admits the cross product {0,1}×{0,1}, so this pins that the
    // null-safe tuple semi-join re-restricts exactly: (0,1) and (1,0)
    // must keep their files byte-for-byte
    val base = spark.range(180L).select(
      (col("id") % 3L).as("d"), ((col("id") / 3L) % 3L).as("r"),
      col("id").as("doc_id"), (col("id") * 7L).as("payload"))
    Catalog.append(base.repartition(col("d"), col("r")), t, Seq("d", "r"))
    def files(d: Long, r: Long): Set[String] = {
      val f = new java.io.File(s"$loc/docs/d=$d/r=$r")
      if (!f.exists()) Set.empty
      else f.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val crossBefore = Seq((0L, 1L), (1L, 0L), (2L, 2L)).map { case (d, r) =>
      (d, r) -> files(d, r)
    }
    import spark.implicits._
    val doomed = base.filter(
        (col("d") === 0L && col("r") === 0L && col("doc_id") % 2L === 0L) ||
        (col("d") === 1L && col("r") === 1L))
      .select("doc_id").as[Long].collect().toSeq
    val deleted = Catalog.purgeKeys(spark, t, doomed.toDF("doc_id"), Seq("d", "r"))
    assert(deleted === doomed.size.toLong)
    assert(spark.table(t).join(doomed.toDF("doc_id"), Seq("doc_id"),
      "left_semi").count() === 0L)
    assert(spark.table(t).count() === 180L - doomed.size)
    // the all-doomed (1,1) tuple partition is dropped
    assert(spark.table(t).filter(col("d") === 1L && col("r") === 1L).count() === 0L)
    assert(files(1L, 1L).isEmpty)
    // cross-product-but-untouched tuples kept their exact files
    for (((d, r), before) <- crossBefore)
      assert(files(d, r) === before, s"($d,$r)")
  }

  test("purgeKeys on a COMPOSITE spec with the NULL partition touched") {
    // the composite path stages the touched tuples through
    // createDataFrame, which VALIDATES rows against the staging schema —
    // a partition column copied non-nullable from the table schema would
    // throw mid-purge on the null tuple (the single-column path's isin
    // handles null separately; this pins the composite form, the
    // nullable-normalized staging schema)
    val db = "purge_comp_null"
    val loc = java.nio.file.Files.createTempDirectory("graft_purge_cn").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.docs"
    import spark.implicits._
    val base = Seq(
      (Option("web"), 0L, 1L), (Option("web"), 1L, 2L),
      (None: Option[String], 0L, 3L), (None: Option[String], 0L, 4L),
      (None: Option[String], 1L, 5L), (Option("pdf"), 0L, 6L))
      .toDF("src", "r", "doc_id")
    Catalog.append(base.repartition(col("src"), col("r")), t, Seq("src", "r"))
    // doom one row in the (NULL, 0) tuple plus one in ("web", 1) — the
    // touched list mixes a null and a non-null tuple, so the staged
    // frame must admit null in the src column
    val deleted = Catalog.purgeKeys(spark, t,
      Seq(3L, 2L).toDF("doc_id"), Seq("src", "r"))
    assert(deleted === 2L)
    val left = spark.table(t).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(left === Seq(1L, 4L, 5L, 6L))
    // the null tuple kept its surviving row; the all-doomed ("web", 1)
    // tuple is dropped
    assert(spark.table(t).filter(col("src").isNull && col("r") === 0L)
      .count() === 1L)
    assert(spark.table(t).filter(col("src") === "web" && col("r") === 1L)
      .count() === 0L)
  }

  test("dropPartitionsBelow: date retention drops old partitions with their files, spares the floor and the NULL partition") {
    val db = "retention_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_ret").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.fact"
    val rows = Seq(
      ("2024-02-28", 1L), ("2024-02-29", 2L), ("2024-03-01", 3L),
      ("2024-03-02", 4L), (null: String, 5L))
    import spark.implicits._
    Catalog.append(rows.toDF("date", "v").repartition(col("date")),
      t, Seq("date"))
    val dropped = Catalog.dropPartitionsBelow(spark, t, "date", "2024-03-01")
    assert(dropped === Seq("2024-02-28", "2024-02-29"))
    // metadata AND files gone (managed table); survivors + NULL intact
    assert(spark.table(t).select("v").collect().map(_.getLong(0)).toSet ===
      Set(3L, 4L, 5L))
    assert(!new java.io.File(s"$loc/fact/date=2024-02-28").exists())
    assert(new java.io.File(s"$loc/fact/date=2024-03-01").exists())
    // idempotent; a later cutoff takes the next slice but never NULL
    assert(Catalog.dropPartitionsBelow(spark, t, "date", "2024-03-01") === Nil)
    assert(Catalog.dropPartitionsBelow(spark, t, "date", "9999-12-31") ===
      Seq("2024-03-01", "2024-03-02"))
    assert(spark.table(t).select("v").collect().map(_.getLong(0)).toSet ===
      Set(5L))
    // wrong partitioning fails loudly rather than guessing
    val t2 = s"$db.composite"
    Catalog.append(Seq(("a", 1L, 1L)).toDF("x", "y", "v")
      .repartition(col("x")), t2, Seq("x", "y"))
    intercept[IllegalArgumentException] {
      Catalog.dropPartitionsBelow(spark, t2, "x", "zzz")
    }
  }

  test("dropPartitionsBelow: a literal '+' in a partition value survives decoding — the partition actually drops") {
    // Hive's path escaping never encodes '+', so the decoder must NOT
    // be URLDecoder (which maps '+' to ' ': the cutoff comparison then
    // uses the wrong string and the DROP literal names a nonexistent
    // value — DROP IF EXISTS silently no-ops while the value is
    // reported dropped)
    val db = "retention_plus_test"
    val loc = java.nio.file.Files.createTempDirectory("graft_retp").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.fact"
    import spark.implicits._
    Catalog.append(Seq(("a+b", 1L), ("c+d", 2L)).toDF("x", "v")
      .repartition(col("x")), t, Seq("x"))
    assert(Catalog.dropPartitionsBelow(spark, t, "x", "b") === Seq("a+b"))
    // the row is REALLY gone, not just reported dropped
    assert(spark.table(t).select("v").collect().map(_.getLong(0)).toSeq ===
      Seq(2L))
    // the Hive-unescape helper: %XX expands, '+' and malformed runs pass
    assert(Catalog.unescapePathName("2024-03-01 10%3A00") === "2024-03-01 10:00")
    assert(Catalog.unescapePathName("a+b") === "a+b")
    assert(Catalog.unescapePathName("%41%2Fb") === "A/b")
    assert(Catalog.unescapePathName("bad%4") === "bad%4")
    assert(Catalog.unescapePathName("bad%zz") === "bad%zz")
  }
}
