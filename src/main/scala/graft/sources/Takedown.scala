package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A compliance TAKEDOWN end-to-end — the flow a training-data platform
  * runs when a removal request (GDPR erasure, DMCA, opt-out) arrives
  * keyed by document id, composed from the engine's own layers:
  *
  *  1. [[Catalog.purgeKeys]] physically deletes the doc rows from the
  *     maintained documents table (touched-partition rewrite, emptied
  *     partitions dropped);
  *  2. [[graft.operators.TrainPrep.publishRagStoreFrom]] republishes the
  *     RAG index FROM the table's now-purged state as a new atomic
  *     multi-table [[Snapshots]] version — derived artifacts must stop
  *     serving the content, and a rebuild-and-flip is the only delete a
  *     write-audit-publish store admits;
  *  3. one [[RunLog]] row per step (the purge row carries the deleted
  *     count; the publish row is written by publishRagStoreFrom itself,
  *     including its failure path), so the request is answerable from
  *     the job history;
  *  4. the AUDIT: [[Snapshots.diffTable]] between the pre- and
  *     post-takedown index versions, restricted to the purged ids —
  *     the verifiable statement "these chunks left the index", which is
  *     what a compliance response actually has to show.
  *
  * What this deliberately does NOT do: vacuum old snapshot versions
  * (they still contain the content; retention policy decides when
  * [[Snapshots.vacuum]] erases them — a takedown SLA would call it with
  * keep=1 immediately) and packed TRAINING chunks (pk1/pipe5 chunks mix
  * documents, so erasure there is a rebuild of the affected shards via
  * the pipe5 path, not a row delete — the same rebuild-and-flip
  * principle at the chunk grain).
  *
  * Scale: step 1 is purgeKeys' O(touched-partitions) rewrite behind one
  * column-pruned discovery scan; step 2 is pipe6's audited index build
  * (nightly-rebuild cost, probed at prod:search6); steps 3–4 are
  * rows-sized. TakedownSpec drives the whole flow through the real
  * operators and pins every contract above.
  */
object Takedown {

  /** What the flow returns to the requester: rows physically deleted
    * from the documents table, the index version serving AFTER the
    * takedown, the prior version (for the audit window), and the number
    * of the purged docs' chunks that left the index between the two.
    */
  case class Result(deletedRows: Long, ragVersionBefore: Option[Long],
      ragVersionAfter: Long, chunksRemoved: Long)

  def execute(spark: SparkSession, docIds: Seq[Long], docsTable: String,
      partitionBy: Seq[String], ragRoot: String, runLogPath: String,
      runTs: java.sql.Timestamp): Result = {
    require(docIds.nonEmpty, "a takedown needs at least one doc id")
    import spark.implicits._
    val before = Snapshots.latestVersion(spark, ragRoot)
    // step 1 — purge the source of truth (logged with the deleted count;
    // a failed purge logs and aborts BEFORE any index work)
    val t0 = System.nanoTime()
    val deleted =
      try Catalog.purgeKeys(spark, docsTable, docIds.toDF("doc_id"), partitionBy)
      catch {
        case e: Throwable =>
          RunLog.append(spark, runLogPath, Seq(RunLog.Entry(runTs, "takedown",
            s"purge_$docsTable", -1L, (System.nanoTime() - t0) / 1000000L,
            "failed", Option(e.toString).getOrElse("").take(500))))
          throw e
      }
    RunLog.append(spark, runLogPath, Seq(RunLog.Entry(runTs, "takedown",
      s"purge_$docsTable", deleted, (System.nanoTime() - t0) / 1000000L,
      "ok", "")))
    // step 2 — republish the index from the purged table's CURRENT state
    // (publishRagStoreFrom writes its own run-log row, ok or failed)
    val after = graft.operators.TrainPrep.publishRagStoreFrom(
      spark, spark.table(docsTable), ragRoot, Some(runLogPath), runTs)
    // step 4 — the audit: which of the purged docs' chunks left the index
    val removed = before match {
      case Some(v0) =>
        Snapshots.diffTable(spark, ragRoot, "chunklens", v0, after,
            keys = Seq("doc_id", "k"))
          .filter(col("doc_id").isin(docIds: _*) && col("change") === "removed")
          .count()
      case None => 0L // first publish: nothing to diff against
    }
    Result(deleted, before, after, removed)
  }
}
