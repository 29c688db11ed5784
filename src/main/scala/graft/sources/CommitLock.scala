package graft.sources

import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.SparkSession

/** Advisory per-table COMMIT LOCK for the plain-parquet warehouse's
  * rewriting writers — the "next step is serialize" of the r14 audit:
  * [[Catalog.upsert]], [[Catalog.purgeKeys]] and
  * [[Takedown.executeChunks]] all rewrite the same partitions under a
  * documented no-concurrent-writers contract, and with takedowns AND
  * nightly prep both real flows over the same chunk table, the contract
  * needs teeth before anyone schedules both.
  *
  * Protocol ([[Snapshots]]' staging discipline): the holder writes its
  * identity to a UNIQUE tmp file under the table directory, then claims
  * `_commit.lock` with an atomic no-overwrite rename — two racing
  * writers cannot both win (same primitive as the snapshot version
  * claim). The loser reads the holder identity and fails LOUDLY — an
  * advisory lock's job is to turn a silent interleaved-overwrite
  * corruption into an operator-visible scheduling error, not to queue.
  * Release deletes the lock ONLY if it still carries this holder's
  * token (a broken-then-reacquired lock must not be deleted by the
  * previous holder's release path).
  *
  * Crashed holders: a lock file older than `staleGraceMs` (mtime vs
  * this JVM's clock — [[Snapshots.vacuum]]'s pointerTmpGraceMs
  * discipline, widen on stores with real clock skew) is presumed
  * abandoned, broken, and the claim retried ONCE. The break CLAIMS
  * rather than deletes: the presumed-stale lock is renamed to a unique
  * tombstone name via the same atomic no-overwrite rename the claim
  * uses, so (a) exactly one of N concurrent breakers wins — the losers'
  * renames fail on the vanished source and they retry the ordinary
  * claim — and (b) the staleness verdict is rendered on the EXACT file
  * object removed: the tombstone IS the file that sat at the lock path,
  * so a lock that turns out young post-rename (another breaker broke
  * and a new holder re-claimed between this breaker's mtime probe and
  * its rename — the delete-based TOCTOU) is put BACK by a second
  * no-overwrite rename instead of destroyed. A live-but-slow holder is
  * never broken: a daemon HEARTBEAT refreshes the held lock's mtime
  * every `staleGraceMs / 4`, so liveness — not a guess about the
  * longest possible rewrite — keeps the lease; only a genuinely dead
  * holder's file ever ages past the grace. (The refresh is an
  * ownership-checked setTimes; a heartbeat that finds the file gone or
  * re-owned stops silently — the break already happened and the
  * release path will not delete a usurper's lock.)
  *
  * Re-entrant per thread: [[Takedown.executeChunks]] holds the chunk
  * table's lock across its whole flow while calling purgeKeys and
  * upsert on the same table — nested acquisitions of a path this
  * thread already holds are no-ops (released by the outermost scope).
  *
  * The `_` prefix keeps the lock and its tmps invisible to directory-
  * listing readers, like every other control file in this package.
  * Scale: two metadata operations per commit (tmp write + rename), one
  * delete at release — noise against any table rewrite.
  */
object CommitLock {

  private val LockName = "_commit.lock"
  private val Unreadable = "<unreadable>"

  /** Lock paths held by the current thread (re-entrancy). */
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Thrown when another writer holds the table's commit lock. */
  final class LockedException(msg: String) extends IllegalStateException(msg)

  /** Run `body` holding the commit lock of `dir` (a table location).
    * Throws [[LockedException]] if another writer holds it and the
    * lease is not stale.
    */
  def withLock[T](spark: SparkSession, dir: String,
      staleGraceMs: Long = 3600000L, waitRetries: Int = 0,
      waitMs: Long = 250L)(body: => T): T = {
    val lockPath = new Path(dir, LockName)
    val key = lockPath.toString
    if (held.get().contains(key)) return body // re-entrant
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val token = s"${java.util.UUID.randomUUID}@${
      java.net.InetAddress.getLocalHost.getHostName}"
    def tryClaim(): Boolean = {
      val tmp = new Path(dir, s"$LockName.tmp.${java.util.UUID.randomUUID}")
      try {
        val out = fs.create(tmp, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        try {
          // no-OVERWRITE rename: atomic claim, loses if the lock exists
          FileContext.getFileContext(lockPath.toUri,
            spark.sparkContext.hadoopConfiguration).rename(tmp, lockPath)
          true
        } catch {
          case e: java.io.IOException
              if e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
                fs.exists(lockPath) =>
            fs.delete(tmp, false); false
        }
      } catch {
        case e: Throwable => fs.delete(tmp, false); throw e
      }
    }
    def holderOf(): String =
      try {
        val in = fs.open(lockPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      } catch { case _: java.io.IOException => Unreadable }
    var acquired = tryClaim()
    if (!acquired) {
      // stale-lease path: presumed-crashed holders get broken once
      val stale =
        try fs.getFileStatus(lockPath).getModificationTime <
          System.currentTimeMillis() - staleGraceMs
        catch { case _: java.io.IOException => true } // vanished: retry
      if (stale) {
        breakIfStale(spark, dir, staleGraceMs)
        acquired = tryClaim()
      }
      // optional SHORT wait for transient holders (metadata-only
      // commits like table creation) — rewriters keep the default 0:
      // fail-loud is the contract for long-held leases
      var waits = 0
      while (!acquired && waits < waitRetries) {
        Thread.sleep(waitMs)
        waits += 1
        acquired = tryClaim()
      }
      if (!acquired)
        throw new LockedException(
          s"commit lock on $dir is held by ${holderOf()} — concurrent " +
          "writers on a plain-parquet table interleave partition " +
          "overwrites; serialize the schedules (or remove a crashed " +
          s"holder's $LockName after the ${staleGraceMs / 1000}s grace)")
    }
    held.set(held.get() + key)
    // heartbeat: keep the held lease young so a long-running body is
    // never presumed crashed by another writer's stale-break path
    val beat = new Thread(() => {
      var live = true // broken + re-owned ⇒ stand down (no plain `return`
      // in a lambda — that is a non-local return, not a thread exit)
      try {
        while (live && !Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(staleGraceMs / 4, 50L))
          try {
            val h = holderOf()
            // stand down ONLY on positive evidence of re-ownership: a
            // transient read failure ("<unreadable>") must keep the
            // beat alive — killing it on an IO blip would let the
            // stale sweep break a live 2-hour holder, the exact
            // corruption the heartbeat prevents
            if (h != token && h != Unreadable) live = false
            else fs.setTimes(lockPath, System.currentTimeMillis(), -1L)
          } catch { case _: java.io.IOException => () }
        }
      } catch { case _: InterruptedException => () }
    }, s"commit-lock-heartbeat-${lockPath.getName}")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      beat.interrupt()
      held.set(held.get() - key)
      // delete only OUR lock: if someone broke a stale lease and
      // re-claimed, the file carries their token and must survive
      try if (holderOf() == token) fs.delete(lockPath, false)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Break a presumed-stale lock by CLAIM, not delete — the TOCTOU
    * close: rename the lock to a unique tombstone name (atomic,
    * no-overwrite — exactly one of N concurrent breakers wins; the
    * losers' renames fail on the vanished source and fall through to an
    * ordinary claim retry), then render the staleness verdict ON THE
    * TOMBSTONE, which is by construction the very file that sat at the
    * lock path when this breaker renamed. Genuinely stale ⇒ the
    * tombstone is deleted and the path is free. Young ⇒ this breaker
    * raced a break-and-reclaim (its mtime probe saw the PREVIOUS,
    * stale incarnation) and the live lock is restored by a second
    * no-overwrite rename; if even the restore loses to a CONFIRMED
    * third claimant (the no-overwrite rename's
    * FileAlreadyExistsException — a double race, its window one
    * rename wide), the displaced young lock is dropped and its
    * holder's heartbeat stands down on the re-ownership it observes —
    * the advisory-lock failure mode shrunk from "any freshly-broken
    * lease" to two back-to-back races inside one rename. Any OTHER
    * IOException on the restore is a transient store blip, NOT a
    * claim: the restore is retried and, failing that, the tombstone
    * is left in place (fail-safe toward the live holder, never a
    * silent unprotect).
    *
    * Package-visible for CommitLockSpec, which drives both verdicts
    * and the concurrent-breakers race directly.
    */
  private[sources] def breakIfStale(spark: SparkSession, dir: String,
      staleGraceMs: Long): Unit = {
    val lockPath = new Path(dir, LockName)
    val fs = lockPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = new Path(dir, s"$LockName.broken.${java.util.UUID.randomUUID}")
    val fc = FileContext.getFileContext(lockPath.toUri,
      spark.sparkContext.hadoopConfiguration)
    try {
      fc.rename(lockPath, tomb) // no-overwrite: one breaker wins
      // the tombstone cannot be missing (this breaker just renamed it
      // to a name only it knows), so a status-read failure here is a
      // transient store blip on a file that MIGHT be a live displaced
      // lock — the fail-safe verdict is young (restore): a wrongly
      // restored stale lock costs one more LockedException for the
      // operator, a wrongly deleted live lock is the corruption this
      // method exists to prevent
      val young =
        try fs.getFileStatus(tomb).getModificationTime >=
          System.currentTimeMillis() - staleGraceMs
        catch { case _: java.io.IOException => true }
      if (!young) fs.delete(tomb, false)
      else {
        // Restore the live lock we displaced. Only a CONFIRMED
        // third-party claim of the lock path (the no-overwrite
        // rename's FileAlreadyExistsException) justifies dropping the
        // displaced holder — that holder's heartbeat observes the
        // re-ownership and stands down. Any OTHER IOException is a
        // transient store blip, and deleting the tombstone on it
        // would silently unprotect a live holder (the corruption this
        // method exists to prevent): retry the restore, and if it
        // still fails LEAVE the tombstone — an orphan tombstone file
        // costs a later manual sweep; a deleted live lock costs a
        // concurrent-writer corruption. Same fail-safe-toward-restore
        // posture as the status read above.
        var attempts = 0
        var done = false
        while (!done) {
          attempts += 1
          try { fc.rename(tomb, lockPath); done = true }
          catch {
            // FileContext's no-overwrite rename surfaces a lost race as
            // a generic IOException on local FS and several stores (the
            // claimAndCommit idiom) — confirm the claim by the lock
            // path EXISTING before treating the exception as one
            case e: java.io.IOException
                if e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
                  (try fs.exists(lockPath) catch { case _: java.io.IOException => false }) =>
              fs.delete(tomb, false); done = true
            case e: java.io.IOException =>
              if (attempts >= 3) {
                System.err.println(s"commit-lock: could not restore " +
                  s"displaced live lock $tomb -> $lockPath after " +
                  s"$attempts attempts (${e.getMessage}); leaving the " +
                  "tombstone in place rather than unprotecting a live holder")
                done = true
              } else Thread.sleep(25L * attempts)
          }
        }
      }
    } catch {
      // lost the break race (source vanished under us) — the winner
      // owns the verdict; this breaker just retries the claim
      case _: java.io.IOException => ()
    }
  }

  /** The storage location of a catalog table — where its commit lock
    * lives (resolved through SQL, not internals, so it works against
    * any metastore).
    */
  private[graft] def tableLocation(spark: SparkSession, table: String): String =
    spark.sql(s"DESCRIBE FORMATTED $table").collect()
      .find(r => r.getString(0).trim.equalsIgnoreCase("Location"))
      .map(_.getString(1).trim)
      .getOrElse(throw new IllegalStateException(
        s"DESCRIBE FORMATTED $table reports no Location — cannot place its commit lock"))

  /** [[withLock]] keyed by catalog table name. */
  def withTableLock[T](spark: SparkSession, table: String,
      staleGraceMs: Long = 3600000L)(body: => T): T =
    withLock(spark, tableLocation(spark, table), staleGraceMs)(body)

  /** The storage location of a DATABASE — where creation races of its
    * not-yet-existing tables serialize (a table has no location of its
    * own to lock before it exists).
    */
  private[graft] def databaseLocation(spark: SparkSession, db: String): String =
    spark.sql(s"DESCRIBE DATABASE `$db`").collect()
      .find(r => r.getString(0).trim.equalsIgnoreCase("Location"))
      .map(_.getString(1).trim)
      .getOrElse(throw new IllegalStateException(
        s"DESCRIBE DATABASE $db reports no Location — cannot place its commit lock"))

  /** The database a table name resolves in — handles bare,
    * db-qualified, and catalog-qualified (catalog.db.tbl) forms.
    */
  private[graft] def databaseOf(spark: SparkSession, table: String): String =
    table.split('.') match {
      case Array(_, db, _) => db
      case Array(db, _) => db
      case _ => spark.catalog.currentDatabase
    }
}
