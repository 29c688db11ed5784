package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VecStore — the published trained vector index. Pins the four
  * contracts that make it a production store rather than a cached
  * query: (1) the FromStore serving twins are BIT-EQUAL to the in-plan
  * sim16/sim17 (train-once/serve-forever loses nothing), and the
  * serving plan reads the store's parquet rather than re-training;
  * (2) advance folds new vectors in against the PINNED quantizers —
  * served at the next read, replay a no-op, the pre-advance version
  * still serving bit-identically; (3) takedown erases at the vec grain
  * with an all-Full chain cut, vacuum physically reclaims, and the
  * tombstone guard blocks an at-least-once resurrection; (4) the
  * erasure evidence derives its audit set from each version's own
  * surface.
  */
class VecStoreSpec extends graft.SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def freshStore(d: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_vecstore_spec").toString + "/v"
    VecStore.publish(spark, d, root)
    root
  }

  test("FromStore twins serve bit-equal to the in-plan queries, from a plan that reads the published parquet") {
    val d = sf("sf0.001")
    val root = freshStore(d)
    val from16 = VecStore.sim16FromStore(spark, d, root)
    val from17 = VecStore.sim17FromStore(spark, d, root)
    assert(rows(from16) ===
      rows(Similarity.ivfpqVariant(spark, d, Similarity.pqIters,
        Similarity.pq16Pool, residual = true,
        coarseIters = Similarity.pq16CoarseIters)))
    assert(rows(from17) ===
      rows(Similarity.ivfpqVariant(spark, d, Similarity.pqIters,
        Similarity.pq16Pool, residual = true,
        coarseIters = Similarity.pq16CoarseIters, filteredByLabel = true)))
    // the serving plan's scan set includes the STORE's artifacts — the
    // trained quantizers come from parquet, not from an in-plan trainer
    // (inspected via the lazy un-pushed form: the pushdown path
    // materializes its small result eagerly to release the probe
    // checkpoint, so its returned frame no longer carries the plan)
    val lazyServe = Similarity.serveIvfpq(
      Similarity.labeledVectors(spark, d).filter(col("vec_id") % 5 === 0),
      VecStore.loadIndex(spark, root), Similarity.pq16Pool,
      residual = true, coarseTrained = true, filteredByLabel = true,
      filterWiden = true)
    val plan = lazyServe.queryExecution.executedPlan.toString
    assert(plan.contains("vec_codes") && plan.contains("vec_vecs"),
      "the serve must scan the published code/vector tables")
    // the probed-cell literal pushdown is pure pruning, and its
    // over-cap FALLBACK (plain join, no literals) serves identically —
    // forced here with a cap of 0
    assert(rows(Similarity.serveIvfpq(
      Similarity.labeledVectors(spark, d)
        .filter(col("vec_id") % 5 === 0).localCheckpoint(),
      VecStore.loadIndex(spark, root), Similarity.pq16Pool,
      residual = true, coarseTrained = true, filteredByLabel = true,
      filterWiden = true, pushProbedCells = true, pushCellCap = 0))
      === rows(from17))
  }

  test("advance: new vectors served at latest against PINNED quantizers; replay no-op; pre-advance version pinned; params/hist advance") {
    import spark.implicits._
    val d = sf("sf0.001")
    val root = freshStore(d)
    val v0 = graft.sources.Snapshots.latestVersion(spark, root).get
    val before16 = rows(VecStore.sim16FromStore(spark, d, root))
    val idx0 = VecStore.loadIndex(spark, root)
    // a batch of genuinely new ids, vectors copied from existing corpus
    // rows so they land in real cells
    val src = Similarity.labeledVectors(spark, d)
      .filter(col("vec_id") % 5 =!= 0).orderBy("vec_id").limit(3).collect()
    val batch = src.zipWithIndex.map { case (r, i) =>
      (900001L + i, r.getAs[Seq[Long]]("v").toArray, r.getAs[Long]("nrm"),
        r.getAs[Long]("lbl"))
    }.toSeq.toDF("vec_id", "v", "nrm", "lbl")
    val v1 = VecStore.advance(spark, batch, root)
    assert(v1 > v0)
    // the new ids are indexed: codes + vecs carry them, quantizers carried
    val idx1 = VecStore.loadIndex(spark, root)
    val newIds = Set(900001L, 900002L, 900003L)
    assert(newIds.subsetOf(idx1.codes.select("vec_id").collect()
      .map(_.getLong(0)).toSet))
    assert(rows(idx1.cent) === rows(idx0.cent), "centroids stay PINNED")
    assert(rows(idx1.pqcent) === rows(idx0.pqcent), "codebooks stay PINNED")
    assert(idx1.nCorpus === idx0.nCorpus + 3)
    assert(idx1.kIvf === idx0.kIvf && idx1.nprobe === idx0.nprobe,
      "probe formulas pinned at the last publish - freshness, not retrain")
    // an advanced-store serve still matches the in-plan twin whose
    // corpus gained the same vectors? No - the quantizers differ (they
    // are pinned). What IS pinned: the pre-advance version serves
    // bit-identically, and the advance composes idempotently.
    assert(rows(Similarity.serveIvfpq(
      Similarity.scaledVectors(spark, d).filter(col("vec_id") % 5 === 0)
        .localCheckpoint(),
      VecStore.loadIndex(spark, root, Some(v0)), Similarity.pq16Pool,
      residual = true, coarseTrained = true, filteredByLabel = false,
      filterWiden = true)) === before16)
    // replay: the same batch commits nothing
    assert(VecStore.advance(spark, batch, root) === v1)
    // a query whose nearest corpus vector IS a new vector finds it: use
    // the copied vector itself as the probe side via sim16FromStore on
    // the advanced store - the copied rows tie with their sources, so
    // assert the new ids are REACHABLE in the ADC scan (codes joined)
    val hist1 = idx1.hist.get.agg(sum("cnt")).collect().head.getLong(0)
    assert(hist1 === idx1.nCorpus, "histogram advances with the corpus")
  }

  test("takedown: all-Full chain cut erases the vec grain, vacuum reclaims physically, tombstones block re-entry, evidence derives its audit set") {
    import spark.implicits._
    val d = sf("sf0.001")
    val root = freshStore(d)
    val doomed = VecStore.loadIndex(spark, root).vecs
      .orderBy("vec_id").limit(2).collect().map(_.getLong(0)).toSeq
    // pre-takedown: the evidence SAYS the ids are present
    val pre = VecStore.verifyErasure(spark, doomed, root).collect()
      .map(r => r.getAs[String]("layer") -> r.getAs[Boolean]("clean")).toMap
    assert(!pre("vec_codes") && !pre("vec_vecs") &&
      !pre("tombstone_coverage"))
    val vT = VecStore.takedown(spark, doomed, root)
    // chain cut: the takedown version references nothing
    assert(graft.sources.Snapshots.layerReport(spark, root)
      .forall(_._3.isEmpty))
    graft.sources.Snapshots.vacuum(spark, root, keep = 1)
    // physical reclaim + a clean audit across every retained version
    val post = VecStore.verifyErasure(spark, doomed, root)
    assert(post.filter(!col("clean")).isEmpty,
      post.collect().mkString(","))
    assert(post.collect().exists(_.getAs[String]("layer") ==
      s"vec_v${vT}_residue"))
    // the audit set is derived: plant an id-bearing side table and see
    // it audited without any registration
    import graft.sources.Snapshots
    import Snapshots.{Carry, Full, TableSpec}
    val carried = Snapshots.tableNames(spark, root, vT).map(t =>
      t -> (Carry(vT): TableSpec))
    Snapshots.writeTablesSpec(spark, carried :+
      ("planted" -> (Full(Seq((doomed.head, 1L)).toDF("vec_id", "x"))
        : TableSpec)), root)
    val planted = VecStore.verifyErasure(spark, doomed, root).collect()
      .map(r => r.getAs[String]("layer") ->
        (r.getAs[Long]("rows_remaining"), r.getAs[Boolean]("clean"))).toMap
    assert(planted("planted") === ((1L, false)),
      "a future id-bearing table must be audited, never silently excluded")
    // tombstone guard: an advance replaying the erased ids commits nothing
    val ghost = VecStore.loadIndex(spark, root).vecs.orderBy("vec_id").limit(1).collect().head
    val replay = Seq((doomed.head, ghost.getAs[Seq[Long]]("v").toArray,
      ghost.getAs[Long]("nrm"), ghost.getAs[Long]("lbl")))
      .toDF("vec_id", "v", "nrm", "lbl")
    val vNow = Snapshots.latestVersion(spark, root).get
    assert(VecStore.advance(spark, replay, root) === vNow,
      "an erased id must never re-enter via an at-least-once replay")
  }

  test("a forward-MIGRATED vec store still advances: Append deltas conform to the stored schema, the drift is the designed null-fill") {
    import spark.implicits._
    val d = sf("sf0.001")
    val root = freshStore(d)
    // an AWARE engine migrated vec_codes forward; THIS engine's advance
    // doesn't compute the new column — without conformTo the Append
    // layer would mismatch the base schema and break the chain scan.
    // vec_hist (a recomputed FULL) is migrated too: there the advance's
    // null-fill RESETS the migrated column, which IS drift and must
    // leave a run-log trail
    graft.sources.Snapshots.migrate(spark, root,
      Map("vec_codes" -> Seq("enc_ver" -> lit(2L)),
        "vec_hist" -> Seq("note" -> lit("migrated"))))
    val src = Similarity.labeledVectors(spark, d)
      .filter(col("vec_id") % 5 =!= 0).orderBy("vec_id").limit(1).collect().head
    val logDir = java.nio.file.Files
      .createTempDirectory("graft_vecm_log").toString + "/run_log"
    val v1 = VecStore.advance(spark, Seq((930001L,
      src.getAs[Seq[Long]]("v").toArray, src.getAs[Long]("nrm"),
      src.getAs[Long]("lbl"))).toDF("vec_id", "v", "nrm", "lbl"), root,
      Some(logDir))
    // the layered read resolves as ONE relation: migrated rows carry
    // the default, the unaware delta's row a typed null
    val codes = VecStore.loadIndex(spark, root, Some(v1)).codes
    assert(codes.columns.contains("enc_ver"))
    val byVer = codes.groupBy("enc_ver").count().collect()
      .map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    assert(byVer(Some(2L)) > 0 && byVer(None) === 1L)
    // and the migrated store still SERVES (the extra column rides along)
    assert(VecStore.sim16FromStore(spark, d, root).count() > 0)
    // the Append null-fill on vec_codes is the DESIGNED behavior (no
    // drift row); the Full-rewrite null-fill on vec_hist is a data
    // reset and leaves exactly one warn row in the advance's trail
    val trail = graft.sources.RunLog.read(spark, logDir)
      .filter(col("pipeline") === "vec_store_advance").collect()
    assert(trail.map(_.getAs[String]("stage")).toSeq ===
      Seq("schema_drift:vec_hist"), trail.mkString(","))
    assert(trail.head.getAs[String]("status") === "warn" &&
      trail.head.getAs[String]("error").contains("note"))
    // a REPUBLISH over the migrated store KEEPS the migrated columns —
    // null-filled (the rebuild is a data reset for them) with one
    // signalled drift row per table — instead of silently dropping
    // them from the store; load-bearing because the nightly vecRecall
    // retention leg can fire a republish unattended
    VecStore.republish(spark, root, Some(logDir))
    val codesR = VecStore.loadIndex(spark, root).codes
    assert(codesR.columns.contains("enc_ver"),
      "a forward-migrated column must survive the retrain rebuild")
    assert(codesR.filter(col("enc_ver").isNotNull).isEmpty,
      "the rebuild null-fills the migrated column (signalled data reset)")
    val rTrail = graft.sources.RunLog.read(spark, logDir)
      .filter(col("pipeline") === "vec_store_republish").collect()
    assert(rTrail.map(_.getAs[String]("stage")).toSet ===
      Set("schema_drift:vec_codes", "schema_drift:vec_hist"),
      rTrail.mkString(","))
    assert(rTrail.forall(_.getAs[String]("status") == "warn"))
    // and the republished migrated store still SERVES
    assert(VecStore.sim16FromStore(spark, d, root).count() > 0)
  }

  test("completeErasure: one call takes down, vacuums to the SLA, re-audits clean, and leaves a run-log trail; a loose SLA says so honestly") {
    import spark.implicits._
    val d = sf("sf0.001")
    val root = freshStore(d)
    val logPath = java.nio.file.Files
      .createTempDirectory("graft_vec_cer").toString + "/run_log"
    // a post-publish advance layers over the store so the completion's
    // maintain pass has a chain to account for
    val src = Similarity.labeledVectors(spark, d)
      .filter(col("vec_id") % 5 =!= 0).orderBy("vec_id").limit(1).collect().head
    VecStore.advance(spark, Seq((920001L, src.getAs[Seq[Long]]("v").toArray,
      src.getAs[Long]("nrm"), src.getAs[Long]("lbl")))
      .toDF("vec_id", "v", "nrm", "lbl"), root)
    val doomed = Seq(VecStore.loadIndex(spark, root).vecs
      .orderBy("vec_id").limit(1).collect().head.getLong(0))
    val preVersions = graft.sources.Snapshots.versions(spark, root)
    val ev = VecStore.completeErasure(spark, doomed, root, keep = 1,
      runLogPath = logPath)
    assert(ev.filter(!col("clean")).isEmpty, ev.collect().mkString(","))
    // keep=1: every pre-takedown version physically gone
    assert(graft.sources.Snapshots.versions(spark, root).size === 1)
    assert(graft.sources.Snapshots.versions(spark, root).head >
      preVersions.max)
    val trail = graft.sources.RunLog.read(spark, logPath)
      .filter(col("pipeline") === "vec_takedown_retention").collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("rows"), r.getAs[String]("status"))).toMap
    assert(trail.keySet === Set("vec_takedown", "compact_vec",
      "vacuum_vec", "erasure_audit"))
    assert(trail.forall(_._2._2 == "ok"))
    assert(trail("erasure_audit")._1 === 0L, "compliant completion = 0 residue")
    assert(trail("vacuum_vec")._1 >= 2L, "the pre-takedown versions reclaimed")
    // loose SLA honesty: takedown another id but keep the whole history —
    // the retained pre-takedown versions' layers SAY they hold it
    val doomed2 = Seq(VecStore.loadIndex(spark, root).vecs
      .orderBy("vec_id").limit(1).collect().head.getLong(0))
    val ev2 = VecStore.completeErasure(spark, doomed2, root, keep = 10,
      runLogPath = logPath)
    val dirty = ev2.filter(!col("clean"))
      .collect().map(_.getAs[String]("layer"))
    assert(dirty.nonEmpty && dirty.forall(_.matches("vec_v\\d+_residue")),
      s"a wide keep must retain the pre-takedown residue AND report it: ${dirty.toSeq}")
  }

  test("randomized lifecycle matches the model: advance/takedown/maintain interleavings never lose, duplicate, or resurrect a vector") {
    // seeded-random model check (the LayeredSnapshotSpec pattern):
    // arbitrary interleavings of advance (with replays and tombstoned
    // ids deliberately mixed into batches), takedown (including ids
    // never indexed — a deletion request binds future ingestion), and
    // maintain must keep every store observable equal to a trivial
    // in-memory model: indexed = (published ∪ advanced) − taken down,
    // tombstones = every id ever taken down, histogram/params = the
    // survivors' counts.
    import spark.implicits._
    import graft.sources.Snapshots
    val d = sf("sf0.001")
    val root = freshStore(d)
    def ids(): Set[Long] = VecStore.loadIndex(spark, root).vecs
      .select("vec_id").collect().map(_.getLong(0)).toSet
    var indexed = ids()
    var tombs = Set.empty[Long]
    val rnd = new scala.util.Random(1742)
    val pool = (0 until 24).map(940001L + _)
    def mkBatch(bids: Seq[Long]) = bids.map { id =>
      val v = Array.tabulate(64)(j => ((id + j) % 7L) - 3L)
      (id, v, v.map(x => x * x).sum, id % 10L)
    }.toDF("vec_id", "v", "nrm", "lbl")
    for (step <- 1 to 10) {
      rnd.nextInt(3) match {
        case 0 => // advance: fresh ids + a replayed id + a tombstoned id
          val picks = Seq.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.size))) ++
            (if (indexed.nonEmpty && rnd.nextBoolean())
              Seq(indexed.head) else Nil) ++
            (if (tombs.nonEmpty) Seq(tombs.head) else Nil)
          VecStore.advance(spark, mkBatch(picks.distinct), root)
          indexed = indexed ++ (picks.toSet -- tombs)
        case 1 => // takedown: a mix of indexed and never-indexed ids
          val doomed = (if (indexed.nonEmpty)
              Seq(indexed.toSeq(rnd.nextInt(indexed.size))) else Nil) ++
            Seq(pool(rnd.nextInt(pool.size)))
          VecStore.takedown(spark, doomed.distinct, root)
          indexed --= doomed.toSet
          tombs ++= doomed.toSet
        case 2 =>
          graft.sources.Snapshots.maintain(spark, root,
            maxLayers = 2, keep = 1)
      }
      val idx = VecStore.loadIndex(spark, root)
      assert(ids() === indexed, s"step $step: vecs diverged from the model")
      assert(idx.codes.select("vec_id").collect().map(_.getLong(0)).toSet
        === indexed, s"step $step: codes diverged")
      assert(Snapshots.readTable(spark, root, "vec_tombstones")
        .collect().map(_.getLong(0)).toSet === tombs,
        s"step $step: tombstones diverged")
      assert(idx.nCorpus === indexed.size.toLong,
        s"step $step: params.n_corpus diverged")
      assert(idx.hist.get.agg(sum("cnt")).collect().head.getLong(0)
        === indexed.size.toLong, s"step $step: histogram diverged")
    }
    // after the walk the store still serves and the chains stay sane
    assert(VecStore.sim16FromStore(spark, d, root).count() >= 0)
    assert(Snapshots.layerReport(spark, root).forall(_._2 <= 12))
  }

  // a crafted store whose drift is PROVABLE: 10 tight clusters whose
  // residuals the trained PQ represents exactly (recall at the trained
  // floor), then an advance of a FAR cluster whose residuals sit far
  // outside the pinned codebooks — every far vector snaps to the same
  // extreme codewords, ADC cannot rank within the cluster, and recall
  // visibly drops until a republish retrains cells/codebooks over it
  private def clusterRow(id: Long): (Long, Array[Long], Long, Long) = {
    val c = (id % 10).toInt
    val v = Array.tabulate(64)(j => 40L * ((c * 7 + j) % 5) + ((id + j) % 3))
    (id, v, v.map(x => x * x).sum, id % 4)
  }
  // two jitter families inside the far cluster: ids 1001-1010 (family
  // A, jitter {0,1,2}) and 1011-1040 (family B, jitter {3,4,5}, three
  // identical-vector groups of 10 whose LOWEST members all sit above
  // 1010). Under the pinned quantizers every far vector snaps to the
  // same degenerate codes, so the ADC pool is the 10 lowest far ids —
  // all family A — and family B's true neighbors are provably
  // unreachable; after a republish both families' residuals are tiny
  // {−1..5} patterns the retrained codebooks represent exactly
  private def farRow(id: Long): (Long, Array[Long], Long, Long) = {
    val v = Array.tabulate(64)(j =>
      if (id <= 1010L) 1000L + ((id + j) % 3)
      else 1003L + ((id * 11 + 2L * j) % 3))
    (id, v, v.map(x => x * x).sum, id % 4)
  }

  test("recallProbe + republish: advance-drift is MEASURED, republish retrains from the store's own surface and restores recall, the tombstone registry survives the rebuild") {
    import spark.implicits._
    import graft.sources.Snapshots
    val root = java.nio.file.Files
      .createTempDirectory("graft_vec_repub").toString + "/v"
    val logPath = java.nio.file.Files
      .createTempDirectory("graft_vec_repub_log").toString + "/run_log"
    VecStore.publishFrom(spark,
      (1L to 100L).map(clusterRow).toDF("vec_id", "v", "nrm", "lbl"), root)
    // pool=10 covers a whole crafted cluster (the exact rerank then
    // repairs near-tie ordering INSIDE a cluster) while staying small
    // enough that coarse-coded drift floods it (prod uses the serving
    // pool; the knob is the spec's)
    def probe() = VecStore.recallProbe(spark, root, sampleN = 200,
      rerankPool = 10, runLogPath = Some(logPath))
    val r0 = probe()
    val v1 = VecStore.advance(spark,
      (1001L to 1040L).map(farRow).toDF("vec_id", "v", "nrm", "lbl"), root)
    val rDrift = probe()
    assert(rDrift < r0 - 0.05,
      s"recall must measurably drift after a far-cluster advance: $r0 -> $rDrift")
    // erase two advanced ids, then RETRAIN from the store's own surface
    VecStore.takedown(spark, Seq(1001L, 1002L), root)
    val vR = VecStore.republish(spark, root)
    // the registry is carried FORWARD through the rebuild — never reset
    assert(Snapshots.readTable(spark, root, "vec_tombstones")
      .collect().map(_.getLong(0)).toSet === Set(1001L, 1002L))
    // republish is an all-Full chain cut: nothing references a prior
    // version, so the SLA's vacuum physically reclaims the drift history
    assert(Snapshots.layerReport(spark, root).forall(_._3.isEmpty))
    Snapshots.vacuum(spark, root, keep = 1)
    assert(Snapshots.versions(spark, root).size === 1)
    // a replayed pre-takedown advance still commits nothing for the
    // erased id, while a genuinely new id in the same batch lands
    val replay = Seq(farRow(1001L), farRow(2001L))
      .toDF("vec_id", "v", "nrm", "lbl")
    VecStore.advance(spark, replay, root)
    val served = VecStore.loadIndex(spark, root).vecs
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!served.contains(1001L) && !served.contains(1002L),
      "an erased id must never resurrect through a post-republish replay")
    assert(served.contains(2001L) && served.contains(1003L) &&
      (1L to 100L).forall(served.contains))
    // recall restored: the retrained cells/codebooks SEE the far cluster
    val rRepub = probe()
    info(f"recall@3: publish=$r0%.3f drift=$rDrift%.3f republish=$rRepub%.3f")
    assert(rRepub > rDrift + 0.05,
      s"republish must restore recall toward the trained floor: $rDrift -> $rRepub")
    // the probe leaves the run-logged trail the retrain trigger reads
    val trail = graft.sources.RunLog.read(spark, logPath)
      .filter(col("pipeline") === "vec_store_recall").collect()
    assert(trail.length === 3 && trail.forall(_.getAs[String]("status") == "ok"))
    assert(trail.map(_.getAs[Long]("rows")).toSet ===
      Set(r0, rDrift, rRepub).map(r => math.round(r * 1e6)))
    assert(v1 > 0 && vR > v1)
  }

  test("advance dedup: conflicting-nrm duplicates converge on one deterministic winner regardless of batch row order") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_vec_dedup").toString + "/v"
    VecStore.publishFrom(spark,
      (1L to 50L).map(clusterRow).toDF("vec_id", "v", "nrm", "lbl"), root)
    // a contract-violating producer: same id, equal (lbl, v), two nrm
    // values — the total-row ordering must pick min(nrm) whichever row
    // comes first in the batch
    val (_, v, nrm, lbl) = clusterRow(7L)
    val rows = Seq((6001L, v, nrm, lbl), (6001L, v, nrm + 7L, lbl),
      (6002L, v, nrm + 7L, lbl), (6002L, v, nrm, lbl))
    VecStore.advance(spark, rows.toDF("vec_id", "v", "nrm", "lbl"), root)
    val got = VecStore.loadIndex(spark, root).vecs
      .filter(col("vec_id").isin(6001L, 6002L))
      .select("vec_id", "nrm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(6001L -> nrm, 6002L -> nrm),
      "both input orders must converge on the lowest total-ordered row")
  }

  test("the nightly retention policy composes over a LIVE vector store: advances interleave, chains stay bounded, serving stays green, erased ids stay erased") {
    import spark.implicits._
    import graft.sources.Snapshots
    val d = sf("sf0.001")
    val root = freshStore(d)
    val logPath = java.nio.file.Files
      .createTempDirectory("graft_vec_ret").toString + "/run_log"
    val policy = graft.wistia.Pipeline.RetentionPolicy(
      stores = Seq((root, 2, 1)))
    val src = Similarity.labeledVectors(spark, d)
      .filter(col("vec_id") % 5 =!= 0).orderBy("vec_id").limit(1)
      .collect().head
    for (night <- 1 to 7) {
      VecStore.advance(spark, Seq((960000L + night,
        src.getAs[Seq[Long]]("v").toArray, src.getAs[Long]("nrm"),
        src.getAs[Long]("lbl"))).toDF("vec_id", "v", "nrm", "lbl"), root)
      if (night == 4) VecStore.takedown(spark, Seq(960001L), root)
      graft.wistia.Pipeline.runRetention(spark, policy, logPath)
      // bounded EVERY night, not just at the end
      assert(Snapshots.layerReport(spark, root).forall(_._2 <= 2),
        s"night $night: chain depth")
      assert(Snapshots.versions(spark, root).size <= 2,
        s"night $night: retained versions")
      if (night >= 4) {
        val ids = VecStore.loadIndex(spark, root).vecs
          .select("vec_id").collect().map(_.getLong(0)).toSet
        assert(!ids.contains(960001L), s"night $night: erased id resurfaced")
        assert(Snapshots.readTable(spark, root, "vec_tombstones")
          .collect().map(_.getLong(0)).toSet === Set(960001L))
      }
    }
    // the composed SLA never broke serving: the store answers at the end
    assert(VecStore.sim16FromStore(spark, d, root).count() > 0)
    val served = VecStore.loadIndex(spark, root).vecs
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((2 to 7).forall(n => served.contains(960000L + n)))
    val trail = graft.sources.RunLog.read(spark, logPath)
      .filter(col("pipeline") === "retention").collect()
    assert(trail.length === 7 && trail.forall(_.getAs[String]("status") == "ok"))
    assert(trail.forall(_.getAs[String]("stage") == "maintain_store:v"))
  }

  test("a republish over an emptied store fails loudly instead of landing empty quantizers that would silently drop future advances") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_vec_empty").toString + "/v"
    VecStore.publishFrom(spark,
      (1L to 20L).map(clusterRow).toDF("vec_id", "v", "nrm", "lbl"), root)
    VecStore.takedown(spark, (1L to 20L), root)
    assert(VecStore.loadIndex(spark, root).vecs.isEmpty)
    val e = intercept[IllegalArgumentException] {
      VecStore.republish(spark, root)
    }
    assert(e.getMessage.contains("EMPTY vector store"))
    // the store's committed state is untouched by the refused rebuild:
    // the tombstones still guard, and a fresh advance against the
    // PINNED (takedown-carried) quantizers still lands
    assert(graft.sources.Snapshots.readTable(spark, root, "vec_tombstones")
      .count() === 20L)
    val (_, v, nrm, lbl) = clusterRow(7L)
    VecStore.advance(spark, Seq((7001L, v, nrm, lbl))
      .toDF("vec_id", "v", "nrm", "lbl"), root)
    val idx = VecStore.loadIndex(spark, root)
    assert(idx.vecs.select("vec_id").collect().map(_.getLong(0)).toSeq
      === Seq(7001L))
    assert(idx.codes.count() === 1L, "the advance must INDEX the vector," +
      " not just count it — takedown carries the trained quantizers")
  }

  test("vecRecall retention leg: a healthy night is probe-only; a floor breach retrains via republish inside the same one-call pass") {
    import spark.implicits._
    import graft.sources.Snapshots
    val root = java.nio.file.Files
      .createTempDirectory("graft_vec_sla").toString + "/v"
    val logPath = java.nio.file.Files
      .createTempDirectory("graft_vec_sla_log").toString + "/run_log"
    VecStore.publishFrom(spark,
      (1L to 100L).map(clusterRow).toDF("vec_id", "v", "nrm", "lbl"), root)
    VecStore.advance(spark,
      (1001L to 1040L).map(farRow).toDF("vec_id", "v", "nrm", "lbl"), root)
    val v0 = Snapshots.latestVersion(spark, root).get
    // floor 0: the observation leg runs, no rewrite — versions unchanged
    val pass1 = graft.wistia.Pipeline.runRetention(spark,
      graft.wistia.Pipeline.RetentionPolicy(
        vecRecall = Seq((root, 200, 0L))), logPath)
    assert(pass1.map(_.stage) === Seq("vec_recall:v"))
    val measured = pass1.head.rows
    assert(measured > 0L && measured <= 1000000L)
    assert(Snapshots.latestVersion(spark, root) === Some(v0),
      "a healthy night must not rewrite the store")
    // floor just above the measured recall: the SAME pass now retrains
    val pass2 = graft.wistia.Pipeline.runRetention(spark,
      graft.wistia.Pipeline.RetentionPolicy(
        vecRecall = Seq((root, 200, measured + 1L))), logPath)
    assert(pass2.map(_.stage) === Seq("vec_recall:v", "vec_republish:v"))
    assert(pass2.forall(_.status == "ok"))
    assert(pass2.last.rows === 140L,
      "the republish leg reports vectors retrained, not a version number")
    assert(pass2.forall(_.error == ""),
      "ok trail rows keep the error field empty")
    val v1 = Snapshots.latestVersion(spark, root).get
    assert(v1 > v0, "a floor breach must land the retrain")
    // the retrained store serves, and the trail separates observation
    // (vec_store_recall rows from the probe itself + retention legs)
    // from action
    assert(VecStore.loadIndex(spark, root).vecs.count() === 140L)
    val trail = graft.sources.RunLog.read(spark, logPath).collect()
    assert(trail.count(r => r.getAs[String]("pipeline") == "vec_store_recall"
      && r.getAs[String]("stage") == "recall_probe") === 2)
    assert(trail.exists(r => r.getAs[String]("pipeline") == "retention"
      && r.getAs[String]("stage") == "vec_republish:v"))
  }

  test("streaming twin: per-trigger vec advances land, a replayed stream commits nothing, the maintenance hook bounds chains") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val d = sf("sf0.001")
    val root = freshStore(d)
    val src = Similarity.labeledVectors(spark, d)
      .filter(col("vec_id") % 5 =!= 0).orderBy("vec_id").limit(4).collect()
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_vecstream").toString
    for ((r, i) <- src.zipWithIndex)
      Seq((910001L + i, r.getAs[Seq[Long]]("v").toArray,
        r.getAs[Long]("nrm"), r.getAs[Long]("lbl")))
        .toDF("vec_id", "v", "nrm", "lbl")
        .coalesce(1).write.mode("append").parquet(inDir)
    val vecSchema = new StructType()
      .add("vec_id", LongType).add("v", ArrayType(LongType))
      .add("nrm", LongType).add("lbl", LongType)
    def stream() = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = graft.streaming.Streams.streamingVecAdvance(stream(), root,
      java.nio.file.Files.createTempDirectory("graft_vecck").toString,
      maintain = Some((2, 1))).start()
    q.awaitTermination(180000)
    val idx = VecStore.loadIndex(spark, root)
    val newIds = (0 until 4).map(910001L + _).toSet
    assert(newIds.subsetOf(idx.codes.select("vec_id").collect()
      .map(_.getLong(0)).toSet))
    // the aggressive maintenance policy kept chains bounded as it ran
    assert(graft.sources.Snapshots.layerReport(spark, root)
      .forall(_._2 <= 2))
    // a fresh checkpoint over the SAME files replays every trigger —
    // and the membership guard makes each one a no-op
    val v1 = graft.sources.Snapshots.latestVersion(spark, root).get
    val q2 = graft.streaming.Streams.streamingVecAdvance(stream(), root,
      java.nio.file.Files.createTempDirectory("graft_vecck2").toString)
      .start()
    q2.awaitTermination(180000)
    assert(graft.sources.Snapshots.latestVersion(spark, root)
      === Some(v1), "a replayed stream must commit nothing")
  }
}
