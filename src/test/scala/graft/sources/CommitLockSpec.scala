package graft.sources

import org.apache.spark.sql.functions._

/** The advisory per-table commit lock: two interleaved writers cannot
  * both rewrite a plain-parquet table — the second fails loudly naming
  * the holder — while a crashed holder's lease ages out under the
  * grace and nested acquisitions on one thread re-enter (the
  * executeChunks-calls-purgeKeys shape; TakedownChunksSpec exercises
  * the real nesting end-to-end).
  */
class CommitLockSpec extends graft.SparkSpec {

  private def lockFile(loc: String) =
    new java.io.File(loc.stripPrefix("file:"), "_commit.lock")

  private def plantLock(loc: String, holder: String,
      ageMs: Long = 0L): java.io.File = {
    val f = lockFile(loc)
    java.nio.file.Files.writeString(f.toPath, holder)
    if (ageMs > 0L)
      f.setLastModified(System.currentTimeMillis() - ageMs)
    f
  }

  private def seed(db: String): (String, String) = {
    val loc = java.nio.file.Files.createTempDirectory(s"graft_cl_$db").toString
    Catalog.ensureDatabase(spark, db, Some(loc))
    val t = s"$db.t"
    val base = spark.range(40L).select(
      (col("id") % 4L).as("p"), col("id").as("k"), (col("id") * 7L).as("v"))
    Catalog.append(base.repartition(col("p")), t, Seq("p"))
    (t, CommitLock.tableLocation(spark, t))
  }

  test("a second writer fails loudly naming the holder; the table is untouched") {
    val (t, tloc) = seed("cl_contend")
    val batch = spark.range(10L).select(
      lit(0L).as("p"), col("id").as("k"), lit(-1L).as("v"))
    plantLock(tloc, "nightly-prep@elsewhere")
    val e = intercept[CommitLock.LockedException] {
      Catalog.upsert(spark, batch, t, keys = Seq("p", "k"), partitionBy = Seq("p"))
    }
    assert(e.getMessage.contains("nightly-prep@elsewhere"))
    assert(spark.table(t).filter(col("v") === -1L).count() === 0L)
    // purgeKeys honors the same lock
    import spark.implicits._
    val e2 = intercept[CommitLock.LockedException] {
      Catalog.purgeKeys(spark, t, Seq(0L).toDF("k"), Seq("p"))
    }
    assert(e2.getMessage.contains("nightly-prep@elsewhere"))
    assert(spark.table(t).count() === 40L)
    // the contender released: the writer proceeds and cleans up after
    // itself
    assert(lockFile(tloc).delete())
    Catalog.upsert(spark, batch, t, keys = Seq("p", "k"), partitionBy = Seq("p"))
    assert(spark.table(t).filter(col("v") === -1L).count() === 10L)
    assert(!lockFile(tloc).exists(), "the lock must release with the writer")
  }

  test("a crashed holder's stale lease is broken after the grace") {
    val (t, tloc) = seed("cl_stale")
    plantLock(tloc, "crashed-holder@gone", ageMs = 2L * 3600L * 1000L)
    val batch = spark.range(5L).select(
      lit(1L).as("p"), (col("id") * 4L + 1L).as("k"), lit(-2L).as("v"))
    // default grace is 1h — the 2h-old lease breaks and the write lands
    Catalog.upsert(spark, batch, t, keys = Seq("p", "k"), partitionBy = Seq("p"))
    assert(spark.table(t).filter(col("v") === -2L).count() === 5L)
    assert(!lockFile(tloc).exists())
    // a YOUNG lease (inside the grace) is never broken
    plantLock(tloc, "live-holder@slow", ageMs = 60L * 1000L)
    intercept[CommitLock.LockedException] {
      Catalog.upsert(spark, batch, t, keys = Seq("p", "k"), partitionBy = Seq("p"))
    }
  }

  test("heartbeat keeps a live slow holder's lease young — a contender inside the body never breaks it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cl_hb").toString
    // grace 400 ms, body runs 1.5 s — without the heartbeat (refresh
    // every grace/4 = 100 ms) the contender's stale check at t≈1 s
    // would break the lease mid-body, the exact interleaving the lock
    // exists to prevent
    val got = CommitLock.withLock(spark, dir, staleGraceMs = 400L) {
      Thread.sleep(1500L)
      intercept[CommitLock.LockedException] {
        // contender on ANOTHER thread (same thread would re-enter)
        val t = new java.util.concurrent.CompletableFuture[Unit]()
        val th = new Thread(() =>
          try { CommitLock.withLock(spark, dir, staleGraceMs = 400L)(());
                t.complete(()) }
          catch { case e: Throwable => t.completeExceptionally(e) })
        th.start(); th.join()
        try t.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
      7
    }
    assert(got === 7)
    assert(!new java.io.File(dir, "_commit.lock").exists())
  }

  test("the stale break CLAIMS, not deletes: a young lock survives a breaker with outdated staleness info") {
    // the delete-based TOCTOU: breaker B measures the lock stale, holder
    // A (who broke the same stale lease first) re-claims, then B's
    // delete destroys A's LIVE lock. The rename-to-tombstone break
    // renders the verdict on the exact file object it removed, so B
    // discovers the re-claim post-rename and restores A's lock.
    val dir = java.nio.file.Files.createTempDirectory("graft_cl_toctou").toString
    plantLock(dir, "stale-ghost@gone", ageMs = 2L * 3600L * 1000L)
    CommitLock.withLock(spark, dir) { // breaks the stale ghost, claims
      val mine = java.nio.file.Files.readString(lockFile(dir).toPath)
      // the racing breaker fires with its (now outdated) stale verdict
      CommitLock.breakIfStale(spark, dir, staleGraceMs = 3600000L)
      assert(lockFile(dir).exists(),
        "a young lock must be restored, not deleted, by a raced breaker")
      assert(java.nio.file.Files.readString(lockFile(dir).toPath) === mine,
        "the restored lock must carry the live holder's token")
    }
    assert(!lockFile(dir).exists())
    // no tombstone residue from the restore path
    assert(new java.io.File(dir).listFiles.forall(
      !_.getName.contains(".broken.")))
  }

  test("N concurrent breakers on one stale lock: exactly one wins, no residue, path claimable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cl_race").toString
    plantLock(dir, "crashed@gone", ageMs = 2L * 3600L * 1000L)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => { gate.await();
        CommitLock.breakIfStale(spark, dir, staleGraceMs = 3600000L) })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(!lockFile(dir).exists(), "the stale lock must be gone")
    assert(new java.io.File(dir).listFiles.forall(
      !_.getName.contains(".broken.")), "no tombstone residue")
    // the freed path claims normally
    assert(CommitLock.withLock(spark, dir)(11) === 11)
  }

  test("re-entrant on one thread; released by the outermost scope") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cl_re").toString
    val got = CommitLock.withLock(spark, dir) {
      CommitLock.withLock(spark, dir) { 42 } // must not self-deadlock
    }
    assert(got === 42)
    assert(!new java.io.File(dir, "_commit.lock").exists())
    // and a body failure still releases
    intercept[RuntimeException] {
      CommitLock.withLock(spark, dir) { throw new RuntimeException("boom") }
    }
    assert(!new java.io.File(dir, "_commit.lock").exists())
  }
}
