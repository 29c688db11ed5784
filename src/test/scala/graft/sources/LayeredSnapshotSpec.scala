package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Snapshots.writeTablesSpec — LAYERED versions: a Carry table is a
  * version reference (zero data written), an Append table writes only
  * its delta, readTable resolves the chain to the full row set, pinned
  * older versions stay exact, pure-carry chains collapse at write time,
  * vacuum spares every version a surviving chain references, and
  * compactLatest cuts chains so vacuum can reclaim again.
  */
class LayeredSnapshotSpec extends SparkSpec {
  import spark.implicits._
  import Snapshots.{Append, Carry, Full, TableSpec}

  private def frame(tag: String, ids: Range) =
    ids.map(i => (i.toLong, tag)).toDF("id", "tag")

  private def rows(root: String, t: String, v: Option[Long] = None) =
    Snapshots.readTable(spark, root, t, v).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def hasDataFiles(root: String, v: Long, t: String): Boolean = {
    val dir = new java.io.File(s"$root/_v=$v/$t")
    dir.listFiles().exists(f => f.getName.endsWith(".parquet"))
  }
  private def baseOf(root: String, v: Long, t: String): Option[Long] = {
    val f = new java.io.File(s"$root/_v=$v/$t/_base")
    if (!f.exists()) None
    else Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong)
  }

  test("carry and append resolve to the layered row set; pinned versions stay exact; the write is delta-sized") {
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/s"
    val v1 = Snapshots.writeTables(Seq(
      "big" -> frame("a", 1 to 100), "small" -> frame("s", 1 to 3)), root)
    val v2 = Snapshots.writeTablesSpec(spark, Seq(
      "big" -> (Append(v1, frame("b", 101 to 110)): TableSpec),
      "small" -> Carry(v1)), root)
    assert(v2 === v1 + 1)
    // resolved row sets: base ∪ delta for the append, base verbatim for
    // the carry
    assert(rows(root, "big") ===
      (1 to 100).map(i => (i.toLong, "a")).toSet ++
        (101 to 110).map(i => (i.toLong, "b")))
    assert(rows(root, "small") === (1 to 3).map(i => (i.toLong, "s")).toSet)
    // pinned v1 unchanged
    assert(rows(root, "big", Some(v1)).size === 100)
    // the v2 directory carries NO data for `small` and only the DELTA
    // for `big` — the structural pin that the commit was batch-sized
    assert(!hasDataFiles(root, v2, "small"))
    assert(baseOf(root, v2, "small") === Some(v1))
    assert(baseOf(root, v2, "big") === Some(v1))
    assert(spark.read.parquet(s"$root/_v=$v2/big/_delta").count() === 10L)
  }

  test("pure-carry chains collapse at write; append chains layer; vacuum keeps referenced versions and compactLatest frees them") {
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/s"
    val v1 = Snapshots.writeTables(Seq("t" -> frame("a", 1 to 50)), root)
    val v2 = Snapshots.writeTablesSpec(spark,
      Seq("t" -> (Carry(v1): TableSpec)), root)
    val v3 = Snapshots.writeTablesSpec(spark,
      Seq("t" -> (Carry(v2): TableSpec)), root)
    // v3's carry collapsed THROUGH the data-less v2 to where the bytes
    // live
    assert(baseOf(root, v3, "t") === Some(v1))
    val v4 = Snapshots.writeTablesSpec(spark,
      Seq("t" -> (Append(v3, frame("d", 51 to 60)): TableSpec)), root)
    assert(baseOf(root, v4, "t") === Some(v1)) // append base collapsed too
    assert(rows(root, "t").size === 60)

    // vacuum keep=1 must spare v1 (v4's chain references it) but can
    // drop the data-less v2/v3
    val dropped = Snapshots.vacuum(spark, root, keep = 1)
    assert(dropped === Seq(v2, v3))
    assert(rows(root, "t").size === 60) // latest still resolves
    assert(Snapshots.versions(spark, root) === Seq(v1, v4))

    // the cadence observable: one append layer over the collapsed base
    assert(Snapshots.layerReport(spark, root) === Seq(("t", 2, Seq(v1))))

    // compactLatest cuts the chain: the new version is self-contained,
    // and the NEXT vacuum reclaims the whole referenced history
    val v5 = Snapshots.compactLatest(spark, root)
    assert(Snapshots.layerReport(spark, root) === Seq(("t", 1, Nil)))
    assert(baseOf(root, v5, "t") === None)
    assert(hasDataFiles(root, v5, "t"))
    assert(rows(root, "t").size === 60)
    assert(Snapshots.vacuum(spark, root, keep = 1) === Seq(v1, v4))
    assert(Snapshots.versions(spark, root) === Seq(v5))
    assert(rows(root, "t").size === 60)
  }

  test("maintain: the policy loop keeps chains bounded and history reclaimed across an advance loop, losing no advance") {
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/s"
    // no-op before the first commit — and it must not materialize the root
    assert(Snapshots.maintain(spark, root, maxLayers = 3, keep = 2) ===
      Snapshots.Maintenance(None, Nil, 0, 0))
    assert(!new java.io.File(root).exists())
    var v = Snapshots.writeTables(Seq("t" -> frame("n0", 1 to 20)), root)
    var hi = 20
    for (night <- 1 to 7) {
      v = Snapshots.writeTablesSpec(spark, Seq(
        "t" -> (Append(v, frame(s"n$night", hi + 1 to hi + 5)): TableSpec)), root)
      hi += 5
      val m = Snapshots.maintain(spark, root, maxLayers = 3, keep = 2)
      // the policy invariants, every night: bounded chains, no advance
      // lost to the racing compaction, disk bounded
      assert(m.layersAfter <= 3)
      assert(rows(root, "t") ===
        (1 to hi).map(i => (i.toLong,
          if (i <= 20) "n0" else s"n${(i - 21) / 5 + 1}")).toSet)
      assert(Snapshots.versions(spark, root).size <= 4,
        s"night $night: ${Snapshots.versions(spark, root)}")
      if (m.compactedTo.isDefined) {
        v = m.compactedTo.get
        assert(m.layersAfter === 1)
      }
    }
    // the DEPTH rule alone (keep wide enough that nothing pins): chains
    // compact when they exceed maxLayers even with all refs retained
    val root2 = java.nio.file.Files.createTempDirectory("layered").toString + "/d"
    var w = Snapshots.writeTables(Seq("t" -> frame("a", 1 to 10)), root2)
    w = Snapshots.writeTablesSpec(spark,
      Seq("t" -> (Append(w, frame("b", 11 to 12)): TableSpec)), root2)
    // depth 2 ≤ 2, refs inside keep=10 ⇒ healthy root: a no-op pass
    val m0 = Snapshots.maintain(spark, root2, maxLayers = 2, keep = 10)
    assert(m0.compactedTo.isEmpty && m0.vacuumed.isEmpty &&
      m0.layersBefore === 2 && m0.layersAfter === 2)
    w = Snapshots.writeTablesSpec(spark,
      Seq("t" -> (Append(w, frame("c", 13 to 14)): TableSpec)), root2)
    val m1 = Snapshots.maintain(spark, root2, maxLayers = 2, keep = 10)
    assert(m1.compactedTo.isDefined && m1.layersBefore === 3 &&
      m1.layersAfter === 1, m1.toString)
    assert(rows(root2, "t").size === 14)
  }

  test("migrate: add-only schema evolution commits one all-Full chain cut; idempotent; unknown names fail loudly") {
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/m"
    val v1 = Snapshots.writeTables(Seq(
      "man" -> frame("a", 1 to 10), "other" -> frame("o", 1 to 2)), root)
    val v2 = Snapshots.writeTablesSpec(spark, Seq(
      "man" -> (Append(v1, frame("b", 11 to 13)): TableSpec),
      "other" -> Carry(v1)), root)
    // the upgrade: `man` gains a lang column, default for EVERY
    // existing row (both layers of the chain)
    val v3 = Snapshots.migrate(spark, root,
      Map("man" -> Seq("lang" -> lit("und"))))
    assert(v3 === v2 + 1)
    val man = Snapshots.readTable(spark, root, "man").collect()
    assert(man.length === 13)
    assert(man.forall(_.getAs[String]("lang") === "und"))
    // untouched table carried VERBATIM (same rows, same schema)
    assert(rows(root, "other") === (1 to 2).map(i => (i.toLong, "o")).toSet)
    // the migration is a CHAIN CUT: no table of v3 references anything
    // (a layered chain must never span a schema boundary)
    assert(Snapshots.layerReport(spark, root).forall(_._3.isEmpty))
    // idempotent: nothing to add ⇒ no version commits
    assert(Snapshots.migrate(spark, root,
      Map("man" -> Seq("lang" -> lit("xx")))) === v3)
    assert(Snapshots.latestVersion(spark, root) === Some(v3))
    // a later Append layers over the migrated schema and reads as one
    // relation
    val v4 = Snapshots.writeTablesSpec(spark, Seq(
      "man" -> (Append(v3, frame("c", 14 to 15)
        .withColumn("lang", lit("en"))): TableSpec),
      "other" -> Carry(v3)), root)
    val byLang = Snapshots.readTable(spark, root, "man", Some(v4))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("und" -> 13L, "en" -> 2L))
    // unknown table name fails loudly
    intercept[IllegalArgumentException] {
      Snapshots.migrate(spark, root, Map("nope" -> Seq("x" -> lit(1))))
    }
  }

  test("migrate: column existence is decided with the session resolver — a case-variant add never overwrites existing values") {
    // under Spark's default (caseSensitive=false) withColumn resolves
    // case-insensitively: a requested "Lang" against an existing
    // "lang" that slipped past a case-SENSITIVE existence filter would
    // REPLACE every row's value with the default — a destructive
    // overwrite from an "add-only" migration
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/mc"
    Snapshots.writeTables(Seq("man" -> frame("a", 1 to 3)
      .withColumn("lang", lit("en"))), root)
    val v0 = Snapshots.latestVersion(spark, root).get
    // same column in different case: already exists ⇒ idempotent no-op
    assert(Snapshots.migrate(spark, root,
      Map("man" -> Seq("Lang" -> lit("OVERWRITTEN")))) === v0)
    val man = Snapshots.readTable(spark, root, "man").collect()
    assert(man.forall(_.getAs[String]("lang") === "en"))
    // a genuinely-new column still lands alongside
    val v1 = Snapshots.migrate(spark, root,
      Map("man" -> Seq("Lang" -> lit("x"), "score" -> lit(0L))))
    assert(v1 > v0)
    val man1 = Snapshots.readTable(spark, root, "man").collect()
    assert(man1.forall(r => r.getAs[String]("lang") === "en" &&
      r.getAs[Long]("score") === 0L))
  }

  test("randomized histories match the model: Full/Carry/Append commits with maintain interleaved never lose or resurrect a row") {
    // seeded-random model check (the RawZoneSpec merge-model pattern):
    // arbitrary interleavings of per-table Full / Carry / Append
    // commits with maintenance passes must keep every table's resolved
    // row set equal to a trivial in-memory model, keep chains within
    // the policy bound after each maintain, and never let vacuum
    // reclaim a version a surviving chain still needs (the read would
    // fail loudly if it did). This probes the interplay the directed
    // tests cannot enumerate: carry-collapse across maintenance,
    // append-over-compacted bases, window arithmetic at random keeps.
    val rnd = new scala.util.Random(20260816L)
    val tables = Seq("alpha", "beta")
    for (history <- 1 to 4) {
      val root = java.nio.file.Files
        .createTempDirectory("layered_rand").toString + "/s"
      val model = scala.collection.mutable.Map[String, Set[(Long, String)]]()
      var nextId = 0L
      def freshRows(n: Int, tag: String): Seq[(Long, String)] = {
        val out = (0 until n).map(i => (nextId + i, tag))
        nextId += n
        out
      }
      def df(rows: Seq[(Long, String)]) = {
        import spark.implicits._
        rows.toDF("id", "tag")
      }
      // bootstrap: full commit of both tables
      tables.foreach(t => model(t) = freshRows(rnd.nextInt(6) + 1, "b").toSet)
      Snapshots.writeTables(tables.map(t => t -> df(model(t).toSeq)), root)
      for (step <- 1 to 10) {
        if (rnd.nextInt(4) == 0) {
          val (maxL, keep) = (rnd.nextInt(3) + 1, rnd.nextInt(3) + 1)
          val m = Snapshots.maintain(spark, root, maxL, keep)
          assert(m.layersAfter <= maxL,
            s"history $history step $step: layers ${m.layersAfter} > $maxL")
        } else {
          val v0 = Snapshots.latestVersion(spark, root).get
          val specs = tables.map { t =>
            rnd.nextInt(3) match {
              case 0 => // full rewrite with fresh content
                val rows = freshRows(rnd.nextInt(5) + 1, s"f$step")
                model(t) = rows.toSet
                t -> (Full(df(rows)): TableSpec)
              case 1 => t -> (Carry(v0): TableSpec)
              case _ =>
                val delta = freshRows(rnd.nextInt(4) + 1, s"a$step")
                model(t) = model(t) ++ delta
                t -> (Append(v0, df(delta)): TableSpec)
            }
          }
          Snapshots.writeTablesSpec(spark, specs, root)
        }
        // the model equality IS the no-loss/no-resurrection oracle,
        // and reading every table exercises every surviving chain
        tables.foreach { t =>
          assert(rows(root, t) === model(t),
            s"history $history step $step table $t")
        }
      }
    }
  }

  test("a reader pinned to a vacuumed chain member fails loudly; a carry of a missing base fails at write") {
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/s"
    val v1 = Snapshots.writeTables(Seq("t" -> frame("a", 1 to 5)), root)
    intercept[IllegalArgumentException] {
      Snapshots.writeTablesSpec(spark,
        Seq("t" -> (Carry(v1 + 7): TableSpec)), root)
    }
    val v2 = Snapshots.writeTablesSpec(spark,
      Seq("t" -> (Append(v1, frame("b", 6 to 7)): TableSpec)), root)
    // simulate an out-of-band deletion of the base (a manual rm, not
    // vacuum — vacuum would have spared it): the chained read must fail
    // loudly, not silently return the delta alone
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, s"_v=$v1"), true)
    intercept[IllegalArgumentException] {
      Snapshots.readTable(spark, root, "t", Some(v2)).collect()
    }
  }

  test("a failed layered write leaks no staging and commits nothing") {
    val root = java.nio.file.Files.createTempDirectory("layered").toString + "/s"
    val v1 = Snapshots.writeTables(Seq(
      "t" -> frame("a", 1 to 5), "u" -> frame("u", 1 to 2)), root)
    val boom = spark.range(1).selectExpr("assert_true(id > 10) AS boom")
    intercept[Exception] {
      Snapshots.writeTablesSpec(spark, Seq(
        "t" -> (Carry(v1): TableSpec),
        "u" -> Append(v1, boom)), root)
    }
    assert(Snapshots.latestVersion(spark, root) === Some(v1))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val residue = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith("_staging_"))
    assert(residue.isEmpty, residue.mkString(","))
  }
}
