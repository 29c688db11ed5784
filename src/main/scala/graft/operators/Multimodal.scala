package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata structs. The container has
  * no image/audio codecs, so the decode step is a deterministic stub
  * ([[decodeStub]]) — the Spark-side contract (schema, batching,
  * partition-parallel decode via mapPartitions, metadata struct shape) is
  * real and tested in MultimodalSpec.
  *
  * Scale: decode is embarrassingly parallel map-side work; the plan keeps
  * payloads out of shuffles (metadata-only projections after decode) —
  * the cardinal rule for 100 TB multimodal tables is "never shuffle the
  * bytes, shuffle the features".
  */
object Multimodal {

  /** Metadata extracted by the (stubbed) decoder. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** documents texts re-typed as opaque binary payloads — the stand-in
    * for an image/audio bytes column.
    */
  def binaryPayloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: a real deployment would decode image/audio bytes here
    * (the codec libraries are not in this container). The stub derives
    * deterministic fake dimensions from the payload bytes so tests can
    * assert exact values. Runs per-partition — no driver collection, no
    * shuffle of payload bytes.
    */
  def decodeStub(s: SparkSession, payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[MediaMeta]
    payloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // deterministic fake decode: dims from byte content
          val w = 64 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 64)
          val h = 64 + (math.abs(bytes.lastOption.getOrElse(0.toByte).toInt) % 64)
          MediaMeta(id, bytes.length.toLong, "stub/raw", w, h,
            1 + (bytes.length % 16))
        }
      }(enc).toDF()
  }

  /** STUB feature extractor: binary payload → dense embedding
    * (`Array[Float]`, `dim` dims). A real deployment runs a vision/audio
    * encoder here; the stub derives deterministic features from byte
    * histograms so the downstream contract — fixed-dim float vectors,
    * partition-parallel extraction, no payload bytes past this stage —
    * is real and testable. Output feeds the Similarity operators
    * unchanged (decode → features → ANN is the standard multimodal
    * dedup/search pipeline).
    */
  case class DocFeatures(doc_id: Long, features: Array[Float])

  def featuresStub(payloads: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[DocFeatures]
    payloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val v = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) { v(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
          DocFeatures(r.getLong(0), v)
        }
      }(enc).toDF()
  }

  // ---------------------------------------------------------------------
  // mm1_binary_meta — the oracle-checkable slice of the multimodal path:
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

  val queries: Seq[Q] = Seq(
    Q("mm1_binary_meta", mm1BinaryMeta, Some(mm1Sql)),
    Q("mm2_chunk_sample", mm2ChunkSample, Some(mm2Sql)))
}
