package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal-column operators: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata, decoded by REAL pure-JVM
  * codecs ([[Codecs]] — BMP header/pixel walk, WAV RIFF chunk walk) into
  * exact-integer features that feed the similarity/dedup operators.
  *
  * The container has no media fixtures, so payloads are synthesized from
  * (doc_id, text) by a documented formula ([[mediaPayloads]]); the DuckDB
  * oracle recomputes the decoded features from the FORMULA while Spark
  * recovers them from the actual BYTES via format parsing. Synthesis and
  * parsing are independent code paths: a bug in either (row padding,
  * bottom-up order, chunk alignment) breaks the mm3/mm4 hash match.
  *
  * Scale: decode is embarrassingly parallel map-side work via
  * `mapPartitions` (an opaque codec genuinely can't be a Catalyst
  * expression); the plan keeps payloads out of shuffles — metadata and
  * fixed-size features only after the decode stage. The cardinal rule for
  * 100 TB multimodal tables: never shuffle the bytes, shuffle the
  * features.
  */
object Multimodal {

  /** documents texts re-typed as opaque binary payloads — the stand-in
    * for a raw media-bytes column (used by mm1/mm2 chunk plumbing).
    */
  def binaryPayloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  // ---------------------------------------------------------------------
  // Synthesis formula (the contract the oracle recomputes):
  //   BMP (24bpp, bottom-up, padded rows) — dims sized so the image
  //   samples the WHOLE text (len = byte length):
  //     w = 12 + len % 9, h = max(8, ceil(len / w))
  //     logical pixel i = y*w + x (y=0 top):
  //       blue  = text byte at (i mod len)
  //       green = (doc_id + 2i) mod 256
  //       red   = (7i) mod 256
  //   WAV (PCM mono 16-bit, a junk chunk before data):
  //     rate = 8000 + (doc_id % 8) * 1000
  //     n    = 64 + len % 129 samples
  //     sample_i = ((doc_id*31 + i*17) mod 4096) - 2048

  final case class MediaFiles(doc_id: Long, img: Array[Byte], wav: Array[Byte])

  private[operators] def synthDims(len: Int): (Int, Int) = {
    val w = 12 + len % 9
    (w, math.max(8, (len + w - 1) / w))
  }

  /** doc_id → (real BMP bytes, real WAV bytes), content derived from the
    * documented formula. Partition-parallel; no shuffle.
    */
  def mediaPayloads(s: SparkSession, d: String): DataFrame = {
    val enc = Encoders.product[MediaFiles]
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val str = r.getString(1)
          // The synthesis formula is DEFINED on non-empty ASCII text: the
          // DuckDB oracles index by character/codepoint while this side
          // indexes UTF-8 bytes, so non-ASCII input would make the two
          // silently diverge — fail loudly instead. (The driver corpus is
          // pure ASCII, min length 44; this guards regeneration drift.)
          require(str.nonEmpty, s"doc $id: empty text")
          val txt = str.getBytes("UTF-8")
          require(txt.length == str.length,
            s"doc $id: non-ASCII text — media synthesis formula undefined")
          val len = txt.length
          val (w, h) = synthDims(len)
          val img = Codecs.encodeBmp(w, h, (x, y) => {
            val i = y.toLong * w + x
            val b = txt((i % len).toInt) & 0xff
            (((7L * i) % 256L).toInt, ((id + 2L * i) % 256L).toInt, b)
          })
          val n = 64 + len % 129
          val rate = (8000L + (id % 8) * 1000L).toInt
          val samples =
            Array.tabulate(n)(i => (((id * 31L + i * 17L) % 4096L) - 2048L).toShort)
          MediaFiles(id, img, Codecs.encodeWav(rate, samples))
        }
      }(enc).toDF()
  }

  /** Exact-integer features recovered by PARSING the media bytes: image
    * dims + per-channel sums + top-row blue sum (order-sensitive, so a
    * decoder that ignored bottom-up storage or row padding fails), and
    * WAV rate/sample-count/sum/sum-of-squares (the exact-arithmetic
    * carriers of mean amplitude and RMS).
    */
  final case class DecodedMedia(
      doc_id: Long, img_w: Long, img_h: Long,
      img_sum_r: Long, img_sum_g: Long, img_sum_b: Long, img_row0_b: Long,
      wav_rate: Long, wav_n: Long, wav_sum: Long, wav_sumsq: Long)

  def decodeMedia(payloads: DataFrame): DataFrame = {
    val enc = Encoders.product[DecodedMedia]
    payloads.select(col("doc_id"), col("img"), col("wav"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bmp = Codecs.decodeBmp(r.getAs[Array[Byte]](1))
          val wav = Codecs.decodeWav(r.getAs[Array[Byte]](2))
          var sr = 0L; var sg = 0L; var sb = 0L; var row0 = 0L
          var i = 0
          while (i < bmp.pixels.length) {
            val p = bmp.pixels(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            if (i < bmp.width) row0 += p & 0xff
            i += 1
          }
          var ws = 0L; var wq = 0L
          var j = 0
          while (j < wav.samples.length) {
            val v = wav.samples(j).toLong; ws += v; wq += v * v; j += 1
          }
          DecodedMedia(r.getLong(0), bmp.width.toLong, bmp.height.toLong,
            sr, sg, sb, row0, wav.sampleRate.toLong, wav.samples.length.toLong, ws, wq)
        }
      }(enc).toDF()
  }

  private def mm3DecodeFeatures(s: SparkSession, d: String): DataFrame =
    decodeMedia(mediaPayloads(s, d)).orderBy("doc_id")

  private val mm3Sql =
    """WITH t AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len FROM documents),
      |dw AS (SELECT doc_id, text, len, 12 + len % 9 AS w,
      |    64 + len % 129 AS n, 8000 + (doc_id % 8) * 1000 AS rate FROM t),
      |dims AS (SELECT doc_id, text, len, w, n, rate,
      |    GREATEST(8, (len + w - 1) // w) AS h FROM dw),
      |px AS (SELECT doc_id, w, u.i - 1 AS i,
      |    ascii(substring(text, CAST((u.i - 1) % len + 1 AS INT), 1)) AS b,
      |    (doc_id + 2*(u.i - 1)) % 256 AS g,
      |    (7*(u.i - 1)) % 256 AS r
      |  FROM dims, UNNEST(generate_series(1, CAST(w*h AS INT))) u(i)),
      |img AS (SELECT doc_id,
      |    CAST(SUM(r) AS BIGINT) AS img_sum_r, CAST(SUM(g) AS BIGINT) AS img_sum_g,
      |    CAST(SUM(b) AS BIGINT) AS img_sum_b,
      |    CAST(SUM(CASE WHEN i < w THEN b ELSE 0 END) AS BIGINT) AS img_row0_b
      |  FROM px GROUP BY 1),
      |sm AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS wav_n,
      |    CAST(SUM(s) AS BIGINT) AS wav_sum, CAST(SUM(s*s) AS BIGINT) AS wav_sumsq
      |  FROM (SELECT doc_id, (doc_id*31 + (u.i-1)*17) % 4096 - 2048 AS s
      |        FROM dims, UNNEST(generate_series(1, CAST(n AS INT))) u(i))
      |  GROUP BY 1)
      |SELECT d.doc_id, CAST(d.w AS BIGINT) AS img_w, CAST(d.h AS BIGINT) AS img_h,
      |  i.img_sum_r, i.img_sum_g, i.img_sum_b, i.img_row0_b,
      |  CAST(d.rate AS BIGINT) AS wav_rate, sm.wav_n, sm.wav_sum, sm.wav_sumsq
      |FROM dims d JOIN img i USING (doc_id) JOIN sm USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // mm4_media_ann — decode → features → ANN, end to end on real bytes:
  // parse each BMP, build a 16-bin blue-channel histogram (the decoded
  // "feature vector"), center it by the CORPUS byte distribution in
  // exact integers (dev[k] = hist[k]·TOT − cnt[k]·npix — a raw or
  // per-image-centered histogram is dominated by the corpus-common
  // letter-frequency direction, which makes every pair of sketches
  // near-collide; subtracting the corpus mean leaves the doc-specific
  // deviation, the same train-then-apply shape as sim3's IVF codebook),
  // simhash the deviation with 48 Rademacher hyperplanes (dd9's mixer),
  // then pair near-identical media by banded pigeonhole: 6 bands ×
  // 8 bits — a pair within Hamming ≤ 5 differs in ≤ 5 bands, so it
  // agrees exactly on ≥ 1 → the band equi-join generates COMPLETE
  // candidates and the LSH output is identical to the brute-force
  // Hamming join (which is what the oracle recomputes, from the pixel
  // formula). Near-dup texts share their byte bag, so their deviations
  // stay parallel under the ±2-word edits the corpus contains —
  // histogram features are shift-invariant where positional ones break.
  //
  // Scale: decode+sketch is one map pass (bytes never leave the stage);
  // the corpus stats are a 17-long map-side-combined aggregate broadcast
  // back; the shuffle carries (long, int, long) band rows and the verify
  // joins move 8-byte sketches — the dd8 profile, on media features. At
  // corpus sizes where 8-bit band codes bucket too coarsely (n ≫ 256²),
  // widen the sketch (96 bits → 8×12 keeps τ ≤ 7 complete) — the knob
  // is bits/bands, the plan shape is unchanged.

  final case class MediaSig(doc_id: Long, hist: Array[Long], simhash: Long)

  private val histBins = 16
  private val simBits = 48
  private val mm4MaxHamming = 5L

  /** Rademacher plane(j,k) ∈ {−1, +1} from the dd9 multiplicative mixer
    * (Dedup.dd9Sql documents the identical SQL-side formula).
    */
  private def planeSign(j: Int, k: Int): Long = {
    val a = 2654435761L
    val x = (((j * histBins + k) * a) % 2147483648L) * a % 2147483648L
    if (((x >> 15) & 1L) == 0L) 1L else -1L
  }

  final case class MediaHist(doc_id: Long, npix: Long, hist: Array[Long])

  /** doc_id → (npix, blue-byte histogram) by parsing the image bytes.
    * One map pass, no shuffle.
    */
  private def mediaHists(payloads: DataFrame): DataFrame = {
    val enc = Encoders.product[MediaHist]
    payloads.select(col("doc_id"), col("img"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bmp = Codecs.decodeBmp(r.getAs[Array[Byte]](1))
          val hist = new Array[Long](histBins)
          var i = 0
          while (i < bmp.pixels.length) {
            hist((bmp.pixels(i) & 0xff) % histBins) += 1
            i += 1
          }
          MediaHist(r.getLong(0), bmp.pixels.length.toLong, hist)
        }
      }(enc).toDF()
  }

  /** Parse image bytes → histogram features → corpus-centered 48-bit
    * hyperplane simhash. Two passes over the (tiny) histogram frame: one
    * 17-long global aggregate, then a map with the stats broadcast via
    * closure — the decode itself runs once.
    */
  def mediaSignatures(payloads: DataFrame): DataFrame = {
    val hists = mediaHists(payloads).localCheckpoint()
    val aggs = sum(col("npix")).as("tot") +:
      (0 until histBins).map(k => sum(element_at(col("hist"), k + 1)).as(s"c$k"))
    val totRow = hists.select(aggs: _*).head()
    val tot = totRow.getLong(0)
    val cnt = Array.tabulate(histBins)(k => totRow.getLong(k + 1))
    val enc = Encoders.product[MediaSig]
    hists.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val id = r.getLong(0)
        val npix = r.getLong(1)
        val hist = r.getSeq[Long](2).toArray
        var sig = 0L
        var j = 0
        while (j < simBits) {
          var acc = 0L
          var k = 0
          while (k < histBins) {
            acc += planeSign(j, k) * (hist(k) * tot - cnt(k) * npix)
            k += 1
          }
          if (acc >= 0L) sig |= 1L << j
          j += 1
        }
        MediaSig(id, hist, sig)
      }
    }(enc).toDF()
  }

  private def mm4MediaAnn(s: SparkSession, d: String): DataFrame =
    mm4Pairs(s, d).orderBy("ida", "idb")

  private def mm4Pairs(s: SparkSession, d: String): DataFrame = {
    // one decode pass, referenced 3× (vals + both expansion sides)
    val sig = mediaSignatures(mediaPayloads(s, d))
      .select("doc_id", "simhash").localCheckpoint()
    // Collapse identical sketches BEFORE candidate generation: a
    // duplicate-heavy corpus puts every member of an n-doc exact-dup
    // cluster on the same code in every band, so banding raw doc rows
    // costs 6·C(n,2) join work per cluster; banding DISTINCT sketch
    // values costs 1 row (measured at the 10× probe: 225 s → seconds).
    // Doc pairs are re-expanded afterwards — within-value pairs at
    // Hamming 0 from a self-join on the value, cross-value pairs from
    // the banded value pairs. Output is pair-enumeration-bounded either
    // way; the rewrite removes the superfluous JOIN-side quadratics.
    val vals = sig.select(col("simhash")).distinct().localCheckpoint()
    val bands = (0 until 6).map { b =>
      vals.select(col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("code"))
    }.reduce(_ unionByName _)
    val vpairs = bands.select(col("simhash").as("ha"), col("band"), col("code"))
      .join(bands.select(col("simhash").as("hb"), col("band"), col("code")),
        Seq("band", "code"))
      .filter(col("ha") < col("hb"))
      .select("ha", "hb").distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= mm4MaxHamming)
    val cross = vpairs
      .join(sig.select(col("simhash").as("ha"), col("doc_id").as("ia")), "ha")
      .join(sig.select(col("simhash").as("hb"), col("doc_id").as("ib")), "hb")
      .select(least(col("ia"), col("ib")).as("ida"),
        greatest(col("ia"), col("ib")).as("idb"), col("hamming"))
    val within = sig.select(col("simhash"), col("doc_id").as("ida"))
      .join(sig.select(col("simhash"), col("doc_id").as("idb")), "simhash")
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), lit(0L).as("hamming"))
    cross.unionByName(within)
  }

  // ---------------------------------------------------------------------
  // mm7_media_ann_topk — the BOUNDED consumable of mm4: per-doc k nearest
  // media instead of the full near-pair list. mm4's output is
  // legitimately pair-enumeration-bounded (78.7M pairs at the 10× probe)
  // — fine as a dedup candidate feed, unusable as a scheduled monitoring
  // report. The bound is applied BEFORE pair enumeration, not after:
  // ranking is (hamming asc, neighbor id asc) and all docs of one sketch
  // value share one hamming to any other value, so only the k smallest
  // doc ids of each value can ever reach a top-k — one bottom-(k+1)
  // aggregate per DISTINCT sketch value (partial-aggregable TopKPairs,
  // so an n-member duplicate cluster collapses map-side) replaces the
  // n² within-cluster expansion, and the banded value-pair join fans out
  // ≤ k+1 candidate ids per (doc, neighboring value). Candidates are
  // O(docs · valueDegree · k); a final per-doc TopKPairs keeps rank ≤ k.
  // (hamming, neighbor) packs into one int64 payload (hamming ≤ 48,
  // ids < 2^48) whose negated double is the rank key — ascending
  // (hamming, neighbor), deterministic, bit-equal to the row_number
  // formulation the oracle runs.
  private val mm7K = 3
  private def mm7MediaAnnTopK(s: SparkSession, d: String): DataFrame = {
    val sig = mediaSignatures(mediaPayloads(s, d))
      .select("doc_id", "simhash").localCheckpoint()
    // per distinct sketch value: its k+1 smallest doc ids, ascending
    // (+1 covers self-exclusion for members of the value's own cluster)
    val bottom = sig.groupBy("simhash")
      .agg(graft.functions.VectorFunctions.topK(
        -col("doc_id").cast("double"), col("doc_id"), mm7K + 1).as("bot"))
      .select(col("simhash"), expr("transform(bot, x -> x.payload)").as("ids"))
      .localCheckpoint() // referenced by within + cross + band sides
    // hamming-0 candidates: the k+1 smallest ids sharing the doc's sketch
    val within = sig.join(bottom, "simhash")
      .select(col("doc_id"), explode(col("ids")).as("nbr"))
      .filter(col("nbr") =!= col("doc_id"))
      .select(col("doc_id"), col("nbr"), lit(0L).as("hamming"))
    // cross-value: band DISTINCT sketch values (as mm4), keep value pairs
    // at hamming 1..5, then each doc of one side sees only the other
    // side's bottom ids — never the |cluster_a|·|cluster_b| expansion
    val bands = (0 until 6).map { b =>
      bottom.select(col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("code"))
    }.reduce(_ unionByName _)
    val vpairsHalf = bands.select(col("simhash").as("ha"), col("band"), col("code"))
      .join(bands.select(col("simhash").as("hb"), col("band"), col("code")),
        Seq("band", "code"))
      .filter(col("ha") < col("hb"))
      .select("ha", "hb").distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= mm4MaxHamming)
    val vpairs = vpairsHalf.unionByName(
      vpairsHalf.select(col("hb").as("ha"), col("ha").as("hb"), col("hamming")))
    val cross = sig.select(col("doc_id"), col("simhash").as("ha"))
      .join(vpairs, "ha")
      .join(bottom.select(col("simhash").as("hb"), col("ids")), "hb")
      .select(col("doc_id"), explode(col("ids")).as("nbr"), col("hamming"))
    within.unionByName(cross)
      .select(col("doc_id"),
        (col("hamming") * lit(1L << 48) + col("nbr")).as("payload"))
      .groupBy("doc_id")
      .agg(graft.functions.VectorFunctions.topK(
        -col("payload").cast("double"), col("payload"), mm7K).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("doc_id"), (col("i") + 1).cast("int").as("rnk"),
        col("t.payload").bitwiseAND(lit((1L << 48) - 1)).as("neighbor_id"),
        shiftright(col("t.payload"), 48).as("hamming"))
      .orderBy("doc_id", "rnk")
  }

  // shared sketch pipeline of mm4/mm7's oracles: text → synthetic image →
  // corpus-centered histogram → 48-bit simhash per doc
  private val mm4SigCte =
    """WITH t AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len FROM documents),
      |dw AS (SELECT doc_id, text, len, 12 + len % 9 AS w FROM t),
      |dims AS (SELECT doc_id, text, len, w, GREATEST(8, (len + w - 1) // w) AS h FROM dw),
      |px AS (SELECT doc_id,
      |    ascii(substring(text, CAST((u.i - 1) % len + 1 AS INT), 1)) % 16 AS k
      |  FROM dims, UNNEST(generate_series(1, CAST(w*h AS INT))) u(i)),
      |hraw AS (SELECT doc_id, k, CAST(COUNT(*) AS BIGINT) AS c FROM px GROUP BY 1, 2),
      |npix AS (SELECT doc_id, CAST(w*h AS BIGINT) AS n FROM dims),
      |gtot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM npix),
      |gcnt AS (SELECT k, CAST(SUM(c) AS BIGINT) AS cnt FROM hraw GROUP BY 1),
      |hist AS (SELECT np.doc_id, ks.k,
      |    COALESCE(h.c, 0) * g.tot - COALESCE(gc.cnt, 0) * np.n AS c
      |  FROM npix np
      |  CROSS JOIN (SELECT u.i - 1 AS k FROM UNNEST(generate_series(1, 16)) u(i)) ks
      |  CROSS JOIN gtot g
      |  LEFT JOIN gcnt gc ON gc.k = ks.k
      |  LEFT JOIN hraw h ON h.doc_id = np.doc_id AND h.k = ks.k),
      |bitsum AS (SELECT h.doc_id, js.j,
      |    SUM((CASE WHEN (((((js.j*16 + h.k) * 2654435761) % 2147483648)
      |        * 2654435761) % 2147483648 >> 15) & 1 = 0
      |      THEN 1 ELSE -1 END) * h.c) AS acc
      |  FROM hist h
      |  CROSS JOIN (SELECT u.i - 1 AS j FROM UNNEST(generate_series(1, 48)) u(i)) js
      |  GROUP BY 1, 2),
      |sig AS (SELECT doc_id,
      |    CAST(SUM(CASE WHEN acc >= 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END)
      |      AS BIGINT) AS simhash
      |  FROM bitsum GROUP BY 1)""".stripMargin

  private val mm4Sql = mm4SigCte +
    """
      |SELECT a.doc_id AS ida, b.doc_id AS idb,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5
      |ORDER BY ida, idb""".stripMargin

  private val mm7Sql = mm4SigCte +
    """,
      |pairs AS (
      |  SELECT a.doc_id AS doc_id, b.doc_id AS nbr,
      |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |  FROM sig a JOIN sig b ON a.doc_id <> b.doc_id
      |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 5),
      |rk AS (SELECT doc_id, nbr, hamming,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY hamming, nbr) AS rnk
      |  FROM pairs)
      |SELECT doc_id, CAST(rnk AS INT) AS rnk, nbr AS neighbor_id, hamming
      |FROM rk WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // mm1_binary_meta — the payload-plumbing slice of the multimodal path:
  // byte length, content hash, fixed-size chunk count of the payload
  // column (chunking = how a 100 TB pipeline batches media bytes for
  // decode UDFs).
  private def mm1BinaryMeta(s: SparkSession, d: String): DataFrame =
    binaryPayloads(s, d)
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        ((octet_length(col("payload")).cast("long") + 255L) / 256L).cast("long")
          .as("n_chunks"))
      .orderBy("doc_id")

  private val mm1Sql =
    """SELECT doc_id,
      | CAST(strlen(text) AS BIGINT) AS n_bytes,
      | md5(text) AS content_hash,
      | CAST((strlen(text) + 255) // 256 AS BIGINT) AS n_chunks
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // mm2_chunk_sample — fixed-size chunking + every-k-th sampling: the
  // batch/frame plumbing of a media pipeline (chunk = decode batch;
  // every-4th = frame sampling). Chunks of 256 chars, keep ci % 4 == 0,
  // emit per-chunk length + digest. Generator + substring are codegen'd;
  // payload bytes never shuffle (the ORDER BY moves only digests).
  private def mm2ChunkSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        ((length(col("text")) + 255) / 256).cast("long").as("n_chunks"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("ci"))
      .filter(col("ci") % 4 === 0)
      .select(
        col("doc_id"), col("ci"),
        expr("substring(text, CAST(ci*256+1 AS INT), 256)").as("chunk"))
      .select(
        col("doc_id"), col("ci"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "ci")

  private val mm2Sql =
    """WITH n AS (SELECT doc_id, text, (length(text) + 255) // 256 AS n_chunks FROM documents),
      |ch AS (SELECT doc_id, u.ci, substring(text, CAST(u.ci*256+1 AS INT), 256) AS chunk
      |       FROM n, UNNEST(generate_series(0, CAST(n_chunks-1 AS INT))) u(ci)
      |       WHERE u.ci % 4 = 0)
      |SELECT doc_id, CAST(ci AS BIGINT) AS ci,
      | CAST(length(chunk) AS BIGINT) AS chunk_len, md5(chunk) AS chunk_md5
      |FROM ch ORDER BY doc_id, ci""".stripMargin

  // ---------------------------------------------------------------------
  // mm5_audio_frames — frame sampling on DECODED audio (the audio analog
  // of mm2's chunk sampling, but downstream of a real codec): parse each
  // WAV, split the PCM into 16-sample frames, keep every 4th frame, emit
  // per-frame exact-integer energy features (sum, sum of squares — the
  // carriers of DC offset and RMS). This is the standard
  // decode → frame → featurize front of an audio pipeline; at 100 TB the
  // frame explosion happens map-side and only the fixed-width feature
  // rows ever shuffle.
  final case class AudioFrame(
      doc_id: Long, frame_id: Long, f_n: Long, f_sum: Long, f_sumsq: Long)

  private val frameLen = 16
  private val frameEvery = 4

  private def mm5AudioFrames(s: SparkSession, d: String): DataFrame = {
    val enc = Encoders.product[AudioFrame]
    mediaPayloads(s, d).select(col("doc_id"), col("wav"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val wav = Codecs.decodeWav(r.getAs[Array[Byte]](1))
          val nFrames = (wav.samples.length + frameLen - 1) / frameLen
          (0 until nFrames).iterator
            .filter(_ % frameEvery == 0)
            .map { f =>
              var i = f * frameLen
              val end = math.min(i + frameLen, wav.samples.length)
              var sm = 0L; var sq = 0L
              while (i < end) {
                val v = wav.samples(i).toLong; sm += v; sq += v * v; i += 1
              }
              AudioFrame(id, f.toLong, (end - f * frameLen).toLong, sm, sq)
            }
        }
      }(enc).toDF()
      .orderBy("doc_id", "frame_id")
  }

  private val mm5Sql =
    """WITH t AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS len FROM documents),
      |d AS (SELECT doc_id, 64 + len % 129 AS n FROM t),
      |s AS (SELECT doc_id, u.i - 1 AS i,
      |    (doc_id*31 + (u.i-1)*17) % 4096 - 2048 AS v
      |  FROM d, UNNEST(generate_series(1, CAST(n AS INT))) u(i)),
      |f AS (SELECT doc_id, i // 16 AS frame_id, CAST(COUNT(*) AS BIGINT) AS f_n,
      |    CAST(SUM(v) AS BIGINT) AS f_sum, CAST(SUM(v*v) AS BIGINT) AS f_sumsq
      |  FROM s GROUP BY 1, 2)
      |SELECT doc_id, frame_id, f_n, f_sum, f_sumsq
      |FROM f WHERE frame_id % 4 = 0 ORDER BY doc_id, frame_id""".stripMargin

  // ---------------------------------------------------------------------
  // mm6_resize_thumb — decode → resize → re-encode, the thumbnailing
  // stage of an image pipeline: parse each BMP, nearest-neighbor
  // downsample to a fixed 8×8 thumbnail (resized (x, y) samples source
  // pixel (x·w div 8, y·h div 8) — pure integer indexing, so exact),
  // re-encode the thumbnail as REAL BMP bytes, and emit features parsed
  // back OUT of the re-encoded bytes — the oracle therefore checks
  // through two full codec passes (decode → resize → encode → decode).
  //
  // Scale: map-only like all codec stages; thumbnails are fixed 246
  // bytes regardless of source size — the shape that makes downstream
  // visual dedup shuffle-friendly at 100 TB.

  private val thumbDim = 8

  final case class ThumbBytes(doc_id: Long, thumb: Array[Byte])
  final case class ThumbFeatures(
      doc_id: Long, t_w: Long, t_h: Long, t_bytes: Long,
      t_sum_r: Long, t_sum_g: Long, t_sum_b: Long, t_tl_b: Long, t_br_b: Long)

  /** Parse source image bytes → nearest-neighbor 8×8 → re-encode as BMP
    * bytes. One map pass.
    */
  def resizeThumbs(payloads: DataFrame): DataFrame = {
    val enc = Encoders.product[ThumbBytes]
    payloads.select(col("doc_id"), col("img"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val src = Codecs.decodeBmp(r.getAs[Array[Byte]](1))
          val bytes = Codecs.encodeBmp(thumbDim, thumbDim, (x, y) => {
            val p = src.pixels((y * src.height / thumbDim) * src.width +
              (x * src.width / thumbDim))
            ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          })
          ThumbBytes(r.getLong(0), bytes)
        }
      }(enc).toDF()
  }

  private def mm6ResizeThumb(s: SparkSession, d: String): DataFrame = {
    val enc = Encoders.product[ThumbFeatures]
    resizeThumbs(mediaPayloads(s, d))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val t = Codecs.decodeBmp(bytes)
          var sr = 0L; var sg = 0L; var sb = 0L
          t.pixels.foreach { p =>
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          }
          ThumbFeatures(r.getLong(0), t.width.toLong, t.height.toLong,
            bytes.length.toLong, sr, sg, sb,
            (t.pixels(0) & 0xff).toLong,
            (t.pixels(t.pixels.length - 1) & 0xff).toLong)
        }
      }(enc).toDF()
      .orderBy("doc_id")
  }

  private val mm6Sql =
    """WITH t AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len FROM documents),
      |dw AS (SELECT doc_id, text, len, 12 + len % 9 AS w FROM t),
      |dims AS (SELECT doc_id, text, len, w, GREATEST(8, (len + w - 1) // w) AS h FROM dw),
      |tp AS (SELECT doc_id, u.k - 1 AS k,
      |    ((((u.k - 1) // 8) * h // 8) * w + (((u.k - 1) % 8) * w // 8)) AS i
      |  FROM dims, UNNEST(generate_series(1, 64)) u(k)),
      |px AS (SELECT tp.doc_id, tp.k,
      |    ascii(substring(d.text, CAST(tp.i % d.len + 1 AS INT), 1)) AS b,
      |    (tp.doc_id + 2*tp.i) % 256 AS g,
      |    (7*tp.i) % 256 AS r
      |  FROM tp JOIN dims d ON d.doc_id = tp.doc_id)
      |SELECT doc_id, 8::BIGINT AS t_w, 8::BIGINT AS t_h, 246::BIGINT AS t_bytes,
      |  CAST(SUM(r) AS BIGINT) AS t_sum_r, CAST(SUM(g) AS BIGINT) AS t_sum_g,
      |  CAST(SUM(b) AS BIGINT) AS t_sum_b,
      |  CAST(MAX(CASE WHEN k = 0 THEN b END) AS BIGINT) AS t_tl_b,
      |  CAST(MAX(CASE WHEN k = 63 THEN b END) AS BIGINT) AS t_br_b
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // mm8_phash_neardup — perceptual-hash near-duplicate IMAGE detection,
  // the visual-dedup stage of a multimodal training pipeline (re-encoded
  // / lightly-edited copies that byte-level dedup can never see). The
  // classic average-hash: mm6's REAL 8×8 thumbnail bytes are decoded
  // back, per-cell gray = (r+g+b) div 3, hash bit k = gray_k ≥
  // (Σgray div 64) — 64 bits packed as two 32-bit halves (h_lo, h_hi;
  // bit 63 in one int64 would collide with the sign). Pairing is dd8's
  // pigeonhole discipline: 8 bands of 8 bits — any pair with Hamming
  // ≤ 7 agrees on ≥ 1 band, so the band join is LOSSLESS for the ≤ 6
  // threshold — then exact Hamming via codegen'd bit_count(xor) on the
  // halves. Band buckets above dd9MaxBucket (shared cap) are skipped:
  // a degenerate corpus (all-flat images → one hash) is a per-bucket
  // quadratic bomb, the same mode dd9/pipe3 guard; the oracle replays
  // the identical cap so gate output is unaffected (max bucket ≈ 25 at
  // sf0.01) and adversarial corpora stay bounded.
  //
  // Scale: hashing is map-only over real codec bytes (the 246-byte
  // thumbnails, not the source images — hash at the thumbnail grain and
  // the 100 TB source table is never re-read); the shuffle carries
  // (band, code, 3 longs) per doc ×8 — fixed width, never pixels. The
  // one self-join is band-bucketed and capped.
  final case class ThumbHash(doc_id: Long, h_lo: Long, h_hi: Long)

  /** 64-bit aHash recovered from the re-encoded thumbnail BYTES (the
    * full decode→resize→encode→decode chain mm6 pins), as two unsigned
    * 32-bit halves.
    */
  def thumbHashes(payloads: DataFrame): DataFrame = {
    val enc = Encoders.product[ThumbHash]
    resizeThumbs(payloads)
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val t = Codecs.decodeBmp(r.getAs[Array[Byte]](1))
          val gray = t.pixels.map(p =>
            (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3)
          val mean = gray.foldLeft(0L)(_ + _) / 64L
          var lo = 0L; var hi = 0L
          var k = 0
          while (k < 64) {
            if (gray(k) >= mean) {
              if (k < 32) lo |= (1L << k) else hi |= (1L << (k - 32))
            }
            k += 1
          }
          ThumbHash(r.getLong(0), lo, hi)
        }
      }(enc).toDF()
  }

  private def mm8PhashNeardup(s: SparkSession, d: String): DataFrame = {
    // 3 longs/doc — the checkpoint stands for the stored hash table a
    // production pipeline maintains per ingest (dd11's convention)
    val h = thumbHashes(mediaPayloads(s, d)).localCheckpoint()
    val bands = h.select(col("doc_id"), col("h_lo"), col("h_hi"),
      posexplode(array(
        (0 until 4).map(b => expr(s"shiftright(h_lo, ${8 * b}) & 255L")) ++
          (0 until 4).map(b => expr(s"shiftright(h_hi, ${8 * b}) & 255L")): _*))
        .as(Seq("band", "code")))
    val keep = bands.groupBy("band", "code").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") <= Dedup.dd9MaxBucket).select("band", "code")
    val bk = bands.join(keep, Seq("band", "code"))
    val cand = bk.select(col("band"), col("code"), col("doc_id").as("doc_a"),
        col("h_lo").as("lo_a"), col("h_hi").as("hi_a"))
      .join(bk.select(col("band"), col("code"), col("doc_id").as("doc_b"),
        col("h_lo").as("lo_b"), col("h_hi").as("hi_b")), Seq("band", "code"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "lo_a", "hi_a", "lo_b", "hi_b").distinct()
    cand
      .withColumn("hamming",
        expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)").cast("long"))
      .filter(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  private val mm8Sql = graft.OracleHints.materializeCtes(
    s"""WITH t AS (SELECT doc_id, text, CAST(strlen(text) AS BIGINT) AS len FROM documents),
      |dw AS (SELECT doc_id, text, len, 12 + len % 9 AS w FROM t),
      |dims AS (SELECT doc_id, text, len, w, GREATEST(8, (len + w - 1) // w) AS h FROM dw),
      |tp AS (SELECT doc_id, u.k - 1 AS k,
      |    ((((u.k - 1) // 8) * h // 8) * w + (((u.k - 1) % 8) * w // 8)) AS i
      |  FROM dims, UNNEST(generate_series(1, 64)) u(k)),
      |px AS (SELECT tp.doc_id, tp.k,
      |    (ascii(substring(d.text, CAST(tp.i % d.len + 1 AS INT), 1))
      |     + (tp.doc_id + 2*tp.i) % 256 + (7*tp.i) % 256) // 3 AS gray
      |  FROM tp JOIN dims d ON d.doc_id = tp.doc_id),
      |m AS (SELECT doc_id, CAST(SUM(gray) // 64 AS BIGINT) AS mean FROM px GROUP BY doc_id),
      |hh AS (SELECT px.doc_id,
      |    CAST(SUM(CASE WHEN gray >= mean AND k < 32
      |      THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END) AS BIGINT) AS h_lo,
      |    CAST(SUM(CASE WHEN gray >= mean AND k >= 32
      |      THEN (CAST(1 AS BIGINT) << CAST(k - 32 AS INT)) ELSE 0 END) AS BIGINT) AS h_hi
      |  FROM px JOIN m ON px.doc_id = m.doc_id GROUP BY px.doc_id),
      |bands AS (SELECT doc_id, h_lo, h_hi, u.b AS band,
      |    CASE WHEN u.b < 4 THEN (h_lo >> (8 * CAST(u.b AS INT))) & 255
      |         ELSE (h_hi >> (8 * CAST(u.b - 4 AS INT))) & 255 END AS code
      |  FROM hh, UNNEST(generate_series(0, 7)) u(b)),
      |keep AS (SELECT band, code FROM bands GROUP BY band, code
      |         HAVING COUNT(*) <= ${Dedup.dd9MaxBucket}),
      |bk AS (SELECT bands.* FROM bands JOIN keep USING (band, code)),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.h_lo AS lo_a, a.h_hi AS hi_a, b.h_lo AS lo_b, b.h_hi AS hi_b
      |  FROM bk a JOIN bk b ON a.band = b.band AND a.code = b.code
      |    AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(bit_count(CAST(xor(lo_a, lo_b) AS BIT))
      |     + bit_count(CAST(xor(hi_a, hi_b) AS BIT)) AS BIGINT) AS hamming
      |FROM cand
      |WHERE bit_count(CAST(xor(lo_a, lo_b) AS BIT))
      |    + bit_count(CAST(xor(hi_a, hi_b) AS BIT)) <= 6
      |ORDER BY doc_a, doc_b""".stripMargin)

  // ---------------------------------------------------------------------
  // mm9_video_keyframes — keyframe selection on a DECODED frame stream,
  // the video twin of mm5's audio framing: each doc synthesizes an
  // 8-frame "video" (one real 8×8 BMP per frame — scene content is
  // constant within a scene and shifts at deterministic cuts, cut at
  // frame f iff (doc_id + f) % 3 = 0), every frame round-trips the REAL
  // codec (encodeBmp → decodeBmp), and the keyframe rule runs on the
  // DECODED pixels: inter-frame L1 distance over all channels,
  // keyframe iff frame 0 or l1_diff ≥ 1000 — the shot-boundary
  // detection a video ingest pipeline runs before sampling frames for
  // captioning/embedding. Because scene content is exactly constant
  // within a scene, within-scene diffs are EXACTLY 0 and cut diffs are
  // provably ≥ 64·(50+91+13) = 9856 (per-channel deltas mod 256 are at
  // least min(Δ, 256−Δ) per pixel), so the keyframe set is crisp.
  //
  // The oracle replays the GENERATOR arithmetic + diff + threshold and
  // never touches a codec — an oracle match therefore also proves
  // decode∘encode is the identity on every frame (the codec round-trip
  // is load-bearing, not decorative). Scale: map-only per doc (8
  // fixed-size frames synthesized, decoded, and diffed inside one
  // mapPartitions pass); only fixed-width (doc, frame, diff, flag)
  // rows ever shuffle — the mm5/mm6 discipline. 10× probe: 0.42 →
  // 1.66 s, linear in docs as a map-only pass must be.
  final case class VideoFrame(
      doc_id: Long, frame_id: Long, l1_diff: Long, is_keyframe: Boolean)

  private val vidFrames = 8
  private val vidCutThreshold = 1000L

  private def mm9VideoKeyframes(s: SparkSession, d: String): DataFrame = {
    val enc = Encoders.product[VideoFrame]
    Tables.documents(s, d).select(col("doc_id"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          var scene = 0L
          var prev: Array[Int] = null
          (0 until vidFrames).iterator.map { f =>
            if (f > 0 && (id + f) % 3 == 0) scene += 1
            val sc = scene
            val bytes = Codecs.encodeBmp(8, 8, (x, y) => {
              val i = y.toLong * 8 + x
              (((id * 7 + sc * 50 + i) % 256).toInt,
                ((sc * 91 + 3 * i) % 256).toInt,
                ((id + sc * 13 + 5 * i) % 256).toInt)
            })
            val pix = Codecs.decodeBmp(bytes).pixels
            val diff =
              if (prev == null) 0L
              else {
                var acc = 0L; var i = 0
                while (i < pix.length) {
                  val a = pix(i); val b = prev(i)
                  acc += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
                    math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
                    math.abs((a & 0xff) - (b & 0xff))
                  i += 1
                }
                acc
              }
            prev = pix
            VideoFrame(id, f.toLong, diff,
              f == 0 || diff >= vidCutThreshold)
          }
        }
      }(enc).toDF()
      .orderBy("doc_id", "frame_id")
  }

  private val mm9Sql =
    s"""WITH fr AS (SELECT doc_id, u.f FROM documents,
       |    UNNEST(generate_series(0, ${vidFrames - 1})) u(f)),
       |sc AS (SELECT doc_id, f,
       |    CAST(SUM(CASE WHEN f > 0 AND (doc_id + f) % 3 = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY f) AS BIGINT) AS s
       |  FROM fr),
       |px AS (SELECT doc_id, f, u.i,
       |    (doc_id * 7 + s * 50 + u.i) % 256 AS r,
       |    (s * 91 + 3 * u.i) % 256 AS g,
       |    (doc_id + s * 13 + 5 * u.i) % 256 AS b
       |  FROM sc, UNNEST(generate_series(0, 63)) u(i)),
       |df AS (SELECT a.doc_id, a.f,
       |    CAST(SUM(ABS(a.r - p.r) + ABS(a.g - p.g) + ABS(a.b - p.b)) AS BIGINT)
       |      AS l1_diff
       |  FROM px a JOIN px p ON p.doc_id = a.doc_id AND p.f = a.f - 1
       |    AND p.i = a.i
       |  GROUP BY 1, 2)
       |SELECT fr.doc_id, CAST(fr.f AS BIGINT) AS frame_id,
       |  COALESCE(df.l1_diff, 0) AS l1_diff,
       |  (fr.f = 0 OR df.l1_diff >= $vidCutThreshold) AS is_keyframe
       |FROM fr LEFT JOIN df ON df.doc_id = fr.doc_id AND df.f = fr.f
       |ORDER BY fr.doc_id, frame_id""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("mm9_video_keyframes", mm9VideoKeyframes, Some(mm9Sql)),
    Q("mm8_phash_neardup", mm8PhashNeardup, Some(mm8Sql)),
    Q("mm1_binary_meta", mm1BinaryMeta, Some(mm1Sql)),
    Q("mm2_chunk_sample", mm2ChunkSample, Some(mm2Sql)),
    Q("mm3_decode_features", mm3DecodeFeatures, Some(mm3Sql)),
    Q("mm4_media_ann", mm4MediaAnn, Some(mm4Sql)),
    Q("mm7_media_ann_topk", mm7MediaAnnTopK, Some(mm7Sql)),
    Q("mm5_audio_frames", mm5AudioFrames, Some(mm5Sql)),
    Q("mm6_resize_thumb", mm6ResizeThumb, Some(mm6Sql)))
}
