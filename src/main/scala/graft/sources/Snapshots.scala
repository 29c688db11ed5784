package graft.sources

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned table SNAPSHOTS with an atomic latest-pointer — the
  * reproducibility layer a training pipeline needs above the
  * append/upsert warehouse: a trainer that records "read manifest v12"
  * can re-read EXACTLY those bytes months later, a rebuild in progress
  * is invisible until its pointer flip, and a crashed write leaves the
  * previous version fully readable (write-audit-publish, the classic
  * pre-table-format batch pattern; full per-row transactionality needs
  * Iceberg/Delta, which the public-Spark-only rule keeps out of scope —
  * this is the strongest isolation a plain-parquet lake offers).
  *
  * Layout under a table root:
  *   <root>/_v=<N>/...parquet        one immutable directory per version
  *   <root>/_latest.version          the commit pointer (decimal N)
  *
  * The underscore prefix keeps both invisible to any reader that lists
  * `<root>` directly (Hadoop/Spark skip `_`-prefixed paths), so a
  * snapshot root never half-reads as a bare parquet table.
  *
  * Commit protocol: data writes to `_v=<next>` FIRST, the pointer flips
  * LAST via an atomic rename (FileContext OVERWRITE — atomic on
  * local/HDFS; an object store without atomic rename would hold the
  * pointer in a metastore/conditional-PUT instead, same protocol).
  * Version numbers come from max(existing dirs, pointer) + 1, so an
  * orphaned directory from a crashed write is never re-claimed — the
  * next successful write simply shadows it.
  *
  * Scale: a snapshot read is exactly a parquet read of one directory
  * (partition pruning, pushdown, and the whole scan stack apply
  * unchanged); the pointer is one ~8-byte file read once per plan.
  * [[write]]/[[writeTables]] emit full versions — right for REBUILT
  * artifacts (manifests, indexes, dim snapshots: small relative to the
  * corpus, rebuilt nightly by pipe2/pipe6). [[writeTablesSpec]] adds
  * LAYERED versions ([[Carry]]/[[Append]] per table) for incremental
  * advances whose nightly change is batch-sized against a store-sized
  * table — same one-claim-one-flip atomicity, batch-sized bytes.
  * Append-only fact/chunk tables still stay on
  * [[Catalog.upsert]]/[[RawZone]]: their history IS the append log.
  * [[vacuum]] bounds retained versions (chain-reference-aware).
  */
object Snapshots {

  private val Pointer = "_latest.version"
  private val VPrefix = "_v="
  private val BaseFile = "_base"
  private val DeltaDir = "_delta"

  /** How one table of a [[writeTablesSpec]] version is materialized —
    * the LAYERED alternative to emitting a full copy per version, for
    * writers whose nightly change is batch-sized against a store-sized
    * table (the pack store's `advanceStore`): a [[Carry]] table is
    * unchanged and stored as a reference to the version that last wrote
    * it; an [[Append]] table stores only the new rows, layered over a
    * base version. Readers ([[readTable]]) resolve the chain to a
    * multi-directory parquet scan — same pruning/pushdown, no unions in
    * the plan — and [[vacuum]] keeps every version a surviving chain
    * references, so a pinned read never dangles. Chain depth grows one
    * per Append commit; a periodic [[compactLatest]] (or any full
    * [[writeTables]] rebuild) cuts the chain and re-bounds what vacuum
    * can reclaim.
    */
  sealed trait TableSpec
  /** A fully materialized table: every row written under this version. */
  final case class Full(df: DataFrame) extends TableSpec
  /** Unchanged since `base` — stored as a version reference, zero data
    * written. Pure-carry chains collapse at write time (a carry of a
    * carry references the original), so resolution cost never grows
    * with consecutive unchanged nights.
    */
  final case class Carry(base: Long) extends TableSpec
  /** `base`'s rows plus `delta` — only the delta is written. The caller
    * owes row-set semantics: the layered read IS base ∪ delta, so this
    * fits append-only advances (new doc_ids), never updates/deletes.
    */
  final case class Append(base: Long, delta: DataFrame) extends TableSpec

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Committed latest version, or None before the first successful
    * [[write]] (an orphaned `_v=` directory alone does NOT count).
    */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val p = new Path(root, Pointer)
    if (!fs.exists(p)) None else Some(readSmall(fs, p).toLong)
  }

  /** All version directories present on disk (committed or orphaned). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val r = new Path(root)
    if (!fs.exists(r)) Nil
    else fs.listStatus(r).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(VPrefix))
      .map(_.stripPrefix(VPrefix).toLong)
      .sorted
  }

  /** Write `df` as the next version and flip the pointer. Returns the
    * committed version number — callers record it next to the run
    * ([[RunLog]]) so the exact input of a training run stays
    * re-readable.
    *
    * Concurrent-writer safe: data stages under a UUID directory and the
    * version number is CLAIMED by an atomic no-overwrite rename — two
    * overlapping writers that both compute `next = N` race the rename,
    * the loser gets FileAlreadyExists and retries at N+1, and no
    * committed `_v=` directory is ever rewritten (a plain
    * SaveMode.Overwrite of `_v=N` would first DELETE the winner's
    * committed files under live readers). Both writers commit; the last
    * pointer flip decides "latest", and both versions stay pinned-
    * readable — the write-audit-publish contract under contention.
    */
  def write(df: DataFrame, root: String,
      partitionBy: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val staging = new Path(root, s"_staging_${java.util.UUID.randomUUID}")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(staging.toString)
    claimAndCommit(spark, root, staging)
  }

  /** Multi-table atomic snapshot: every table stages under ONE staging
    * directory (`_v=<N>/<name>/` after the claim) and a single version
    * claim + pointer flip covers them all — a reader pinned to version N
    * sees a mutually consistent set (the index build's vectors, cells,
    * postings and stats are one artifact; per-table versions could flip
    * out of sync under a crashed or concurrent rebuild). Read back with
    * [[readTable]]; [[read]] is for single-table roots only.
    */
  def writeTables(tables: Seq[(String, DataFrame)], root: String): Long = {
    require(tables.nonEmpty, "writeTables needs at least one table")
    writeTablesSpec(tables.head._2.sparkSession,
      tables.map { case (n, df) => n -> (Full(df): TableSpec) }, root)
  }

  /** [[writeTables]] with per-table materialization specs — the
    * batch-sized-commit form for incremental writers: [[Full]] tables
    * write every row, [[Carry]] tables write a version reference only,
    * [[Append]] tables write only their delta over a base version. The
    * atomicity contract is identical (one staged directory, one version
    * claim, one pointer flip covers the whole set); what changes is the
    * WRITE cost — a nightly advance whose change is batch-sized commits
    * batch-sized bytes instead of re-emitting the store (the "cost of
    * full-version atomicity" the advance's r15 scaladoc named, closed).
    * Base versions must be committed-or-claimed versions of THIS root;
    * [[vacuum]] retains them as long as any surviving chain references
    * them.
    */
  def writeTablesSpec(spark: SparkSession,
      tables: Seq[(String, TableSpec)], root: String): Long = {
    require(tables.nonEmpty, "writeTablesSpec needs at least one table")
    require(tables.map(_._1).distinct.size == tables.size,
      "writeTablesSpec table names must be unique")
    require(tables.forall { case (n, _) => n.nonEmpty && !n.startsWith("_") },
      "table names must be non-empty and not _-prefixed")
    val fs = fsOf(spark, root)
    // collapse PURE-CARRY levels at write time: a carry (or append-base)
    // pointing at a version whose own table is a data-less carry skips
    // to where the data actually lives, so consecutive unchanged nights
    // cost one hop forever, not a hop per night
    def collapse(table: String, base: Long): Long = {
      var b = base
      var hop = true
      while (hop) {
        val dir = new Path(root, s"$VPrefix$b/$table")
        require(fs.exists(dir),
          s"$table carry/append base _v=$b does not exist under $root")
        val bf = new Path(dir, BaseFile)
        if (fs.exists(bf) && !fs.exists(new Path(dir, DeltaDir)))
          b = readSmall(fs, bf).toLong
        else hop = false
      }
      b
    }
    val staging = new Path(root, s"_staging_${java.util.UUID.randomUUID}")
    def writeBaseRef(tableDir: Path, base: Long): Unit = {
      fs.mkdirs(tableDir)
      val out = fs.create(new Path(tableDir, BaseFile), false)
      try out.write(base.toString.getBytes("UTF-8")) finally out.close()
    }
    try
      tables.foreach {
        case (name, Full(df)) =>
          df.write.mode(SaveMode.Overwrite).format("parquet")
            .save(new Path(staging, name).toString)
        case (name, Carry(base)) =>
          writeBaseRef(new Path(staging, name), collapse(name, base))
        case (name, Append(base, delta)) =>
          val dir = new Path(staging, name)
          delta.write.mode(SaveMode.Overwrite).format("parquet")
            .save(new Path(dir, DeltaDir).toString)
          writeBaseRef(dir, collapse(name, base))
      }
    catch { case e: Throwable =>
      fsOf(spark, root).delete(staging, true); throw e
    }
    claimAndCommit(spark, root, staging)
  }

  /** Cut every chain at the committed latest: re-commit each table of
    * the latest version as a [[Full]] copy. Metadata stays identical to
    * readers (same rows via [[readTable]]); what changes is lineage —
    * the new version references nothing, so a following [[vacuum]] can
    * reclaim the whole history the chains were pinning. The periodic
    * maintenance pass for append-advanced stores, run at whatever
    * cadence bounds chain depth × retention.
    *
    * Runs under the root's [[CommitLock]]: a compaction racing an
    * incremental advance would otherwise re-publish the PRE-advance
    * state as latest (read-latest → write-latest lost update — the
    * same resurrection race the advance/takedown writers serialize
    * on). Re-entrant if the caller already holds the lease.
    */
  def compactLatest(spark: SparkSession, root: String): Long =
    CommitLock.withLock(spark, root) {
      val v = latestVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      writeTables(tableNames(spark, root, v)
        .map(t => t -> readTable(spark, root, t, Some(v))), root)
    }

  /** SCHEMA MIGRATION for a multi-table snapshot root — the store-side
    * twin of [[Catalog.appendEvolving]]'s add-only evolution, which the
    * snapshot layer could not express before: an engine upgrade that
    * adds a table column (a manifest `lang`, a per-chunk checksum) had
    * no path onto an existing store short of a full re-materialization.
    * Per named table, each `(column, default)` pair that the table does
    * not already carry is added with the default evaluated for EVERY
    * existing row, and the whole root re-commits as ONE all-Full
    * version under the root's [[CommitLock]].
    *
    * All-Full is load-bearing, not conservatism: a layered chain must
    * never span a schema boundary — [[readTable]] resolves a chain to
    * one multi-directory parquet scan with ONE schema, so base files
    * missing the new column would read corrupt or fail. The migration
    * is therefore a chain cut (like compaction and takedown rewrites),
    * and later Append deltas layer over it with the new schema.
    * Add-only, like the catalog twin: dropping or retyping a column is
    * a rebuild, not a migration. Idempotent: when every requested
    * column already exists, no version commits and the committed
    * latest returns unchanged. Unknown table names fail loudly.
    * Mixed-engine caveat, stated honestly: the advancers conform their
    * APPEND deltas to the stored schema (an unaware engine null-fills
    * the migrated column for its new rows), but a table an advance
    * RECOMPUTES as Full each night (totals/opens/stats) takes the
    * writing engine's schema for that version — an unaware engine's
    * advance drops the migrated column from those tables until an
    * aware engine writes again (each version stays self-consistent;
    * chains never span the flip). Migrate recomputed-Full tables in
    * lockstep with the engine upgrade, not ahead of it.
    * Scale: one full rewrite of the latest version — compaction cost,
    * paid once per engine upgrade, never per night.
    */
  def migrate(spark: SparkSession, root: String,
      addColumns: Map[String, Seq[(String, org.apache.spark.sql.Column)]]): Long =
    CommitLock.withLock(spark, root) {
      val v = latestVersion(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $root"))
      val names = tableNames(spark, root, v)
      val unknown = addColumns.keySet -- names.toSet
      require(unknown.isEmpty,
        s"migrate names table(s) ${unknown.toSeq.sorted.mkString(", ")} " +
          s"that snapshot _v=$v under $root does not have")
      // Column existence must be decided with the SESSION'S resolver,
      // not String equality: under Spark's default (caseSensitive=
      // false) withColumn resolves case-insensitively, so a requested
      // "Lang" against an existing "lang" that passed a case-SENSITIVE
      // filter would REPLACE every existing row's value with the
      // default — a destructive overwrite from an "add-only" migration
      // (and the idempotency check would fail the same way on re-run).
      val resolve: (String, String) => Boolean =
        spark.sessionState.analyzer.resolver
      var added = false
      val tables = names.map { t =>
        val df = readTable(spark, root, t, Some(v))
        val adds = addColumns.getOrElse(t, Nil)
          .filterNot { case (c, _) => df.columns.exists(resolve(_, c)) }
        if (adds.nonEmpty) added = true
        t -> adds.foldLeft(df) { case (d, (c, default)) =>
          d.withColumn(c, default) }
      }
      if (!added) v else writeTables(tables, root)
    }

  /** The table names of a [[writeTables]]/[[writeTablesSpec]] version. */
  def tableNames(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val fs = fsOf(spark, root)
    fs.listStatus(new Path(root, s"$VPrefix$version")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).sorted
  }

  /** One row per table of the committed latest (or a pinned) version:
    * `(table, layers, referenced)` — how many data layers the chain
    * resolves to and which versions it references. The observable the
    * compact-vs-vacuum cadence decision reads: `layers` is the number
    * of directories every scan of that table touches, and the union of
    * `referenced` is what [[vacuum]] cannot reclaim until
    * [[compactLatest]] cuts the chains. Metadata-only (no data read).
    */
  def layerReport(spark: SparkSession, root: String,
      version: Option[Long] = None): Seq[(String, Int, Seq[Long])] = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val fs = fsOf(spark, root)
    tableNames(spark, root, v).map { t =>
      def walk(at: Long): (Int, Seq[Long]) = {
        val dir = new Path(root, s"$VPrefix$at/$t")
        val bf = new Path(dir, BaseFile)
        if (!fs.exists(bf)) (1, Nil)
        else {
          val base = readSmall(fs, bf).toLong
          val (n, refs) = walk(base)
          val own = if (fs.exists(new Path(dir, DeltaDir))) 1 else 0
          (n + own, base +: refs)
        }
      }
      val (layers, refs) = walk(v)
      (t, layers, refs)
    }
  }

  /** What one [[maintain]] pass did: the chain-cut version it committed
    * (None when no compaction was needed), the versions [[vacuum]]
    * reclaimed, and the deepest table chain before/after — the numbers
    * an orchestrator logs to see the policy holding.
    */
  final case class Maintenance(compactedTo: Option[Long],
      vacuumed: Seq[Long], layersBefore: Int, layersAfter: Int)

  /** Policy-driven snapshot MAINTENANCE — the one entry point a nightly
    * orchestrator calls after an incremental advance, closing the loop
    * [[layerReport]] (observe) / [[compactLatest]] (cut) / [[vacuum]]
    * (reclaim) used to leave to operator judgment. Under the root's
    * [[CommitLock]] (one lease across observe-decide-cut-reclaim, so a
    * racing advance can neither lose its commit to the compaction nor
    * slip a new chain ref past the vacuum):
    *
    *  1. read [[layerReport]] at the committed latest;
    *  2. COMPACT ([[compactLatest]]) iff the deepest chain exceeds
    *     `maxLayers` — every scan pays one directory-hop per layer —
    *     OR any chain still references a version OUTSIDE the newest
    *     `keep` (such a ref pins pre-window history against vacuum
    *     forever; an advance loop that never compacts reclaims
    *     nothing);
    *  3. [[vacuum]] to `keep`.
    *
    * An already-healthy root (shallow chains, refs inside the window)
    * pays two metadata reads and writes nothing. `maxLayers >= 1`;
    * `keep >= 1` as in [[vacuum]]. No-op (all zeros) before the first
    * commit. For MULTI-TABLE roots ([[writeTables]]/[[writeTablesSpec]]
    * — the only roots that grow chains); a single-table [[write]] root
    * has nothing to compact and plain [[vacuum]] is its whole policy.
    * Scale: the compact is a full rewrite of the LATEST version
    * only (store-sized, the price of a chain cut — amortized to one per
    * `maxLayers` nights); the decision and the vacuum are metadata-only.
    */
  def maintain(spark: SparkSession, root: String, maxLayers: Int,
      keep: Int): Maintenance = {
    require(maxLayers >= 1, "maintain needs maxLayers >= 1")
    require(keep >= 1, "maintain must keep at least the committed latest")
    if (latestVersion(spark, root).isEmpty)
      return Maintenance(None, Nil, 0, 0)
    CommitLock.withLock(spark, root) {
      val before = layerReport(spark, root)
      val deepest = before.map(_._2).foldLeft(0)(math.max)
      val latest = latestVersion(spark, root).get
      val retained = versions(spark, root).filter(_ <= latest)
        .takeRight(keep).toSet
      val pinning = before.flatMap(_._3).exists(v => !retained.contains(v))
      val compacted =
        if (deepest > maxLayers || pinning) Some(compactLatest(spark, root))
        else None
      val dropped = vacuum(spark, root, keep)
      val after = layerReport(spark, root).map(_._2).foldLeft(0)(math.max)
      Maintenance(compacted, dropped, deepest, after)
    }
  }

  /** Claim the next version number for a fully-staged directory and flip
    * the pointer — the shared tail of [[write]] and [[writeTables]].
    */
  private def claimAndCommit(spark: SparkSession, root: String,
      staging: Path): Long = {
    val fc = FileContext.getFileContext(staging.toUri,
      spark.sparkContext.hadoopConfiguration)
    var committed = -1L
    var attempts = 0
    try {
      while (committed < 0) {
        val next = (versions(spark, root) ++ latestVersion(spark, root))
          .foldLeft(0L)(math.max) + 1L
        try {
          // no-OVERWRITE rename: atomic claim, throws if _v=next exists
          fc.rename(staging, new Path(root, s"$VPrefix$next"))
          committed = next
        } catch {
          // FileContext's no-overwrite rename is exists-check + rename on
          // local FS and several stores, so a lost race can surface as a
          // generic IOException (rename returning failure) rather than
          // FileAlreadyExists. Treat it as a lost race ONLY if _v=next now
          // exists (someone really claimed it); otherwise it is a genuine
          // IO failure and must propagate, not spin to attempt 16.
          case e: java.io.IOException
              if e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException] ||
                fsOf(spark, root).exists(new Path(root, s"$VPrefix$next")) =>
            attempts += 1
            if (attempts >= 16)
              throw new IllegalStateException(
                s"snapshot version claim lost 16 races under $root", e)
        }
      }
    } finally {
      // any non-committed exit (claim exhaustion, genuine IO failure,
      // pointer-flip crash below never reaches here uncommitted) must not
      // leak the staging directory
      if (committed < 0) fsOf(spark, root).delete(staging, true)
    }
    commitPointer(spark, root, committed)
    committed
  }

  /** Flip the pointer to `version` — data first, pointer last. Exposed
    * for rollback: re-pointing to a retained older version is a
    * metadata-only revert.
    *
    * The stage-then-rename is retried ONCE on an IO failure: the one
    * benign way a committer's staged tmp can vanish under it is
    * [[vacuum]]'s crash-residue sweep firing on a stalled/clock-skewed
    * committer (the tmp is re-staged fresh on retry, so the flip still
    * publishes only bytes this committer wrote); a second consecutive
    * failure is a genuine store problem and propagates.
    */
  def commitPointer(spark: SparkSession, root: String, version: Long): Unit = {
    require(versions(spark, root).contains(version),
      s"snapshot _v=$version does not exist under $root")
    val fs = fsOf(spark, root)
    def flipOnce(): Unit = {
      // unique staging name per committer: a FIXED tmp path lets
      // concurrent writer B overwrite the staged content before writer
      // A's rename, so A's flip would publish B's version and B's rename
      // then fails on the missing tmp — each committer must flip only
      // bytes it staged itself
      val tmp = new Path(root, s"$Pointer.tmp.${java.util.UUID.randomUUID}")
      val dst = new Path(root, Pointer)
      try {
        val out = fs.create(tmp, true)
        try out.write(version.toString.getBytes("UTF-8")) finally out.close()
        FileContext.getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
          .rename(tmp, dst, Options.Rename.OVERWRITE)
      } catch {
        // the unique tmp name means nobody else ever overwrites or
        // renames it — a failed flip must clean up its own staging or it
        // leaks forever ([[vacuum]] sweeps the crash-without-cleanup
        // residue)
        case e: Throwable => fs.delete(tmp, false); throw e
      }
    }
    try flipOnce()
    catch {
      // the retry must not erase the first failure's diagnosis: if it
      // too dies, the original IOException rides along as suppressed
      // (Takedown.execute's retry discipline) — one error object carries
      // both attempts for the operator
      case e1: java.io.IOException =>
        try flipOnce()
        catch { case e2: Throwable => e2.addSuppressed(e1); throw e2 }
    }
  }

  /** Read a pinned version, or the committed latest when None. */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame =
    spark.read.parquet(resolve(spark, root, version))

  /** Read one table of a [[writeTables]]/[[writeTablesSpec]] snapshot
    * (pinned or latest). A layered table ([[Carry]]/[[Append]] commits)
    * resolves its base chain to a MULTI-DIRECTORY parquet scan — one
    * relation, all data directories along the chain, with pruning and
    * pushdown applying per file exactly as for a full table.
    */
  def readTable(spark: SparkSession, root: String, table: String,
      version: Option[Long] = None): DataFrame = {
    // resolve the version ONCE (a concurrent pointer flip between two
    // reads of latest must not split this call's view)
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    require(versions(spark, root).contains(v),
      s"snapshot _v=$v does not exist under $root (vacuumed?)")
    spark.read.parquet(tablePaths(spark, root, table, v): _*)
  }

  /** The data directories of `table` at `version`, base-chain resolved
    * (oldest layer first — read order is irrelevant to row-set
    * semantics, but deterministic ordering keeps plans stable).
    * Package-visible for per-directory consumers ([[Takedown]]'s
    * retained-version audit memoizes counts per directory so a layered
    * history's shared base is scanned once, not once per version).
    */
  private[graft] def tablePaths(spark: SparkSession, root: String, table: String,
      version: Long): Seq[String] = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, s"$VPrefix$version/$table")
    require(fs.exists(dir),
      s"table $table of snapshot _v=$version does not exist under $root (vacuumed?)")
    val bf = new Path(dir, BaseFile)
    if (!fs.exists(bf)) Seq(dir.toString)
    else {
      val base = tablePaths(spark, root, table, readSmall(fs, bf).toLong)
      val delta = new Path(dir, DeltaDir)
      if (fs.exists(delta)) base :+ delta.toString else base
    }
  }

  private def resolve(spark: SparkSession, root: String,
      version: Option[Long]): String = {
    val v = version.orElse(latestVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    require(versions(spark, root).contains(v),
      s"snapshot _v=$v does not exist under $root (vacuumed?)")
    s"$root/$VPrefix$v"
  }

  /** Keyed DIFF between two snapshot versions — the audit half of
    * write-audit-publish: before flipping the pointer at a rebuilt
    * artifact (or after, forensically), "what changed" is one
    * full-outer join on the natural key: `added` (key only in `to`),
    * `removed` (key only in `from`), `changed` (key in both, any
    * non-key column differs under null-safe equality). Unchanged keys
    * are filtered out, so the result is change-sized, not table-sized
    * in rows (the join itself is the unavoidable two-version scan —
    * partition pruning applies if the caller filters first).
    * Both versions must share a schema and be unique per key (the
    * keyed-table contract everywhere else in this package).
    */
  def diff(spark: SparkSession, root: String, from: Long, to: Long,
      keys: Seq[String]): DataFrame =
    diffFrames(read(spark, root, Some(from)), read(spark, root, Some(to)),
      from, to, keys)

  /** [[diff]] over one table of a [[writeTables]] snapshot. */
  def diffTable(spark: SparkSession, root: String, table: String,
      from: Long, to: Long, keys: Seq[String]): DataFrame =
    diffFrames(readTable(spark, root, table, Some(from)),
      readTable(spark, root, table, Some(to)), from, to, keys)

  private def diffFrames(a: DataFrame, b: DataFrame, from: Long, to: Long,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "diff needs a natural key")
    require(!keys.exists(Set("change", "_from", "_to")),
      "diff reserves the column names change/_from/_to")
    require(a.schema == b.schema,
      s"diff across schemas: _v=$from ${a.schema.simpleString} vs _v=$to ${b.schema.simpleString}")
    val nonKey = a.columns.toSeq.filterNot(keys.contains)
    def pack(df: DataFrame, as: String) = df.select(
      keys.map(col) :+
        (if (nonKey.isEmpty) lit(0) else struct(nonKey.map(col): _*)).as(as): _*)
    // null-safe key equality: a NULL-keyed row present identically in
    // both versions is UNCHANGED, not a removed+added pair (a plain
    // equi-join never matches NULL = NULL)
    val l = pack(a, "_from").as("l")
    val r = pack(b, "_to").as("r")
    val cond = keys.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    l.join(r, cond, "full_outer")
      .withColumn("change",
        when(col("l._from").isNull, lit("added"))
          .when(col("r._to").isNull, lit("removed"))
          .when(!(col("l._from") <=> col("r._to")), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change") =!= "unchanged")
      .select(keys.map(k =>
        coalesce(col(s"l.$k"), col(s"r.$k")).as(k)) :+ col("change"): _*)
  }

  /** Retention: delete committed versions older than the newest `keep`,
    * EXCEPT any version a surviving version's table chain still
    * references ([[Carry]]/[[Append]] base refs, transitively — a
    * retained layered table must never dangle), plus nothing else —
    * orphans above the pointer are left for the next write to shadow
    * (deleting a directory a concurrent writer owns is not this pass's
    * call). Returns the versions deleted. Readers pinned to a vacuumed
    * version fail loudly at [[read]]'s existence check — retention is
    * the explicit trade against unbounded storage, sized so the
    * training-lineage window (`keep`) survives. Note the corollary for
    * append-advanced stores: a long Append chain pins its whole history
    * against vacuum — [[compactLatest]] cuts it.
    *
    * `pointerTmpGraceMs` bounds the crash-residue sweep below: staged
    * pointer tmps YOUNGER than the grace (by file mtime vs this JVM's
    * wall clock) are left alone. The comparison assumes store and
    * client clocks agree to well within the grace — on a store with
    * real skew, widen the grace (the only cost is residue lingering
    * longer); if the sweep ever does race a stalled live committer,
    * [[commitPointer]]'s one-shot re-stage retry absorbs it.
    *
    * Runs under the root's [[CommitLock]] (re-entrant for callers that
    * already hold it — [[compactLatest]]-then-vacuum maintenance, the
    * takedown flows): the reference closure walks `_base` refs on disk,
    * and a concurrent [[writeTablesSpec]] still STAGING its Carry/
    * Append refs is invisible to the walk — without the lease, a
    * writer basing on an older committed version could have that base
    * deleted between the closure and its claim, committing a version
    * with a dangling ref. Serializing vacuum against writers closes it.
    */
  def vacuum(spark: SparkSession, root: String, keep: Int,
      pointerTmpGraceMs: Long = 3600000L): Seq[Long] = {
    require(keep >= 1, "vacuum must keep at least the committed latest")
    // pointer probe BEFORE the lock: locking materializes the lock file
    // under `root`, and a never-committed root should stay untouched
    if (latestVersion(spark, root).isEmpty) return Nil
    CommitLock.withLock(spark, root)(vacuumLocked(spark, root, keep,
      pointerTmpGraceMs))
  }

  private def vacuumLocked(spark: SparkSession, root: String, keep: Int,
      pointerTmpGraceMs: Long): Seq[Long] = {
    val ptr = latestVersion(spark, root).getOrElse(return Nil)
    val fs = fsOf(spark, root)
    val all = versions(spark, root)
    val committed = all.filter(_ <= ptr)
    // reference closure: walk every SURVIVING version's table chains
    // (retained window + above-pointer versions, which stay pinnable)
    // and spare whatever they reach — transitively, since an Append
    // base can itself be layered
    val candidates = committed.dropRight(keep).toSet
    // FAIL CLOSED on an unreadable/corrupt _base ref: mapping it to
    // "no reference" would let this pass delete a version a surviving
    // chain still needs — the exact loss the closure exists to prevent.
    // A transient read failure aborts the vacuum (retryable, loud);
    // nothing has been deleted yet when the walk runs.
    def baseRefs(v: Long): Seq[Long] = {
      val vd = new Path(root, s"$VPrefix$v")
      if (!fs.exists(vd)) Nil
      else fs.listStatus(vd).toSeq.filter(_.isDirectory).flatMap { st =>
        val bf = new Path(st.getPath, BaseFile)
        if (fs.exists(bf)) Some(readSmall(fs, bf).toLong) else None
      }
    }
    val reached = scala.collection.mutable.Set[Long]()
    var frontier = all.filterNot(candidates).distinct
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(baseRefs).distinct
        .filterNot(v => reached.contains(v) || !candidates.contains(v))
      reached ++= next
      frontier = next
    }
    val drop = committed.filter(v => candidates.contains(v) && !reached.contains(v))
    drop.foreach(v => fs.delete(new Path(root, s"$VPrefix$v"), true))
    // sweep pointer-staging residue from committers that CRASHED between
    // create and rename (a failed flip cleans up after itself; a killed
    // JVM cannot). The grace window protects an in-flight committer —
    // deleting a live tmp would fail its rename.
    val cutoff = System.currentTimeMillis() - pointerTmpGraceMs
    fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isFile
        && st.getPath.getName.startsWith(s"$Pointer.tmp.")
        && st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, false))
    drop
  }
}
