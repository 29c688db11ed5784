package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Training-data preparation operators beyond filtering/dedup: test-set
  * decontamination, sequence packing, paragraph-level dedup, and PII
  * redaction — the curation steps a 100 TB pretraining pipeline runs
  * after the dedup/quality passes (Dedup.*, TextOps.*).
  *
  * Determinism: all outputs are exact longs / strings / booleans (see
  * graft.Q); content identities are md5 / word n-grams so the DuckDB
  * oracle recomputes them bit-identically. Spark-side shuffle keys are
  * xxhash64 longs (equivalent modulo 64-bit collisions, same stance as
  * Dedup.dd2/dd3).
  */
object TrainPrep {

  // ---------------------------------------------------------------------
  // dc1_decontaminate — benchmark/test-set decontamination: drop (flag)
  // training documents whose word-3-gram fingerprints overlap the test
  // set's fingerprint universe (the GPT-3/Pile n-gram-overlap rule;
  // reference semantics: F1's IN-list filter generalized to fuzzy
  // membership). Test set = doc_id % 10 = 0 (a held-out split of the
  // corpus); a train doc is contaminated when ≥ 20% of its distinct
  // shingles appear anywhere in the test set (exact integer test
  // n_shared·5 ≥ n_shingles).
  //
  // Scale: the test fingerprint set is the small side by construction
  // (a benchmark is MBs, the corpus TBs) — it is deduped to distinct
  // hashed longs and broadcast, so the train side stays map-local: one
  // scan + one groupBy(doc_id) shuffle of (long, long) rows. At a test
  // set too big to broadcast this degrades gracefully to a shuffled
  // semi-join on the same keys.
  private def dc1Decontaminate(s: SparkSession, d: String): DataFrame = {
    val sh = Dedup.shingleRows(s, d)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val test = sh.filter(col("doc_id") % 10 === 0).select("h").distinct()
    val train = sh.filter(col("doc_id") % 10 =!= 0).distinct()
    val tot = train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val shared = train.join(broadcast(test), Seq("h"))
      .groupBy("doc_id").agg(count(lit(1)).as("shared0"))
    tot.join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_shingles"),
        coalesce(col("shared0"), lit(0L)).as("n_shared"),
        (coalesce(col("shared0"), lit(0L)) * 5L >= col("n_shingles"))
          .as("contaminated"))
      .orderBy("doc_id")
  }

  private val dc1Sql =
    s"""WITH ${Dedup.shinglesSqlCte},
       |test AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
       |train AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0),
       |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
       |shr AS (SELECT doc_id, COUNT(*) AS n_shared
       |        FROM train JOIN test USING (s) GROUP BY 1)
       |SELECT tot.doc_id, n_shingles,
       |  CAST(COALESCE(shr.n_shared, 0) AS BIGINT) AS n_shared,
       |  COALESCE(shr.n_shared, 0) * 5 >= n_shingles AS contaminated
       |FROM tot LEFT JOIN shr ON shr.doc_id = tot.doc_id
       |ORDER BY tot.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // pk1_pack_sequences — sequence packing: concatenate the corpus in
  // doc_id order and split into fixed context windows of `packBudget`
  // tokens (the concat-and-chunk layout LLM pretraining uses). Each doc
  // gets its global token offset and the chunk range it spans.
  //
  // Scale: a global running sum is NOT one window over one partition
  // (the naive `Window.orderBy(doc_id)` plan serializes the corpus
  // through a single task). This is the classic two-phase distributed
  // prefix sum: range-repartition by doc_id, cumsum locally within each
  // partition, then add broadcast per-partition base offsets (32 rows —
  // the tiny single-partition window over partition totals is the only
  // sequential step and is O(#partitions), not O(rows)).
  private val packBudget = 512L

  private def pk1PackSequences(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // pid must be identical across the two subtrees below; checkpoint the
    // range partitioning once (its sampled bounds are nondeterministic).
    val parted = t.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val local = parted.withColumn("local_off",
      coalesce(
        sum(col("n_tokens")).over(Window.partitionBy("pid").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val offs = parted.groupBy("pid").agg(sum(col("n_tokens")).as("ptot"))
      .withColumn("pid_off",
        coalesce(
          sum(col("ptot")).over(Window.orderBy("pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("pid", "pid_off")
    local.join(broadcast(offs), Seq("pid"))
      .withColumn("start_off", col("pid_off") + col("local_off"))
      .withColumn("chunk_first", expr(s"start_off div $packBudget"))
      .withColumn("chunk_last",
        expr(s"(start_off + greatest(n_tokens, 1L) - 1L) div $packBudget"))
      .select(
        col("doc_id"), col("n_tokens"), col("start_off"),
        col("chunk_first"), col("chunk_last"),
        (col("chunk_last") - col("chunk_first") + 1L).as("n_chunks"))
      .orderBy("doc_id")
  }

  private val pk1Sql =
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |o AS (SELECT doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_off
       |  FROM t)
       |SELECT doc_id, n_tokens, start_off,
       |  start_off // $packBudget AS chunk_first,
       |  (start_off + greatest(n_tokens, 1) - 1) // $packBudget AS chunk_last,
       |  (start_off + greatest(n_tokens, 1) - 1) // $packBudget
       |    - start_off // $packBudget + 1 AS n_chunks
       |FROM o ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // dd10_paragraph_dedup — sub-document dedup (the CCNet/RefinedWeb
  // paragraph-level pass): split each doc into 16-word "paragraphs"
  // (the corpus is single-line text; at 100 TB this is split('\n')),
  // keep the globally FIRST occurrence of each paragraph (ordered by
  // (doc_id, position)), and emit per-doc dup stats plus the md5 of the
  // cleaned (kept-paragraphs-only) text.
  //
  // Scale: one shuffle keyed on the paragraph identity for the
  // first-occurrence window + one groupBy(doc_id) to reassemble. The
  // window partitions by xxhash64(paragraph) so the shuffle carries
  // longs; a salted two-phase variant would bound a pathological
  // boilerplate paragraph's partition (same playbook as Skew.saltedSum).
  private val paraWords = 16

  private def dd10ParagraphDedup(s: SparkSession, d: String): DataFrame = {
    val chunks = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0L, (size(toks) - 1) div $paraWords)")).as("ci"))
      .select(col("doc_id"), col("ci"),
        array_join(slice(col("toks"), col("ci") * paraWords + 1, lit(paraWords)), " ")
          .as("chunk"))
    val kept = chunks.withColumn("kept",
      row_number().over(
        Window.partitionBy(xxhash64(col("chunk"))).orderBy("doc_id", "ci")) === 1)
    val stats = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_paras"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("n_dup_paras"))
    val clean = kept.filter(col("kept"))
      .groupBy("doc_id")
      .agg(md5(array_join(
        transform(sort_array(collect_list(struct(col("ci"), col("chunk")))),
          x => x.getField("chunk")),
        " ")).as("clean0"))
    stats.join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
        coalesce(col("clean0"), md5(lit(""))).as("clean_hash"))
      .orderBy("doc_id")
  }

  private val dd10Sql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, u.i - 1 AS ci,
       |    array_to_string(toks[(u.i-1)*$paraWords + 1 :
       |      least((u.i-1)*$paraWords + $paraWords, len(toks))], ' ') AS chunk
       |  FROM t, UNNEST(generate_series(1, (len(toks)-1)//$paraWords + 1)) u(i)),
       |k AS (SELECT doc_id, ci, chunk,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) = 1 AS kept
       |  FROM c),
       |st AS (SELECT doc_id, COUNT(*) AS n_paras,
       |    CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_paras
       |  FROM k GROUP BY 1),
       |cl AS (SELECT doc_id, md5(string_agg(chunk, ' ' ORDER BY ci)) AS clean0
       |  FROM k WHERE kept GROUP BY 1)
       |SELECT st.doc_id, n_paras, n_dup_paras,
       |  COALESCE(clean0, md5('')) AS clean_hash
       |FROM st LEFT JOIN cl ON cl.doc_id = st.doc_id
       |ORDER BY st.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // t7_pii_redact — PII scrubbing: count and redact email addresses and
  // dotted-quad IPs with plain regexes. The corpus text carries no PII,
  // so each row gets a deterministic synthetic tail (two emails + two
  // IPs derived from doc_id) appended first — the redaction then has
  // real work whose output both engines recompute exactly. Regexes stay
  // in the Java∩RE2 common dialect (classes, bounded quantifiers, \b).
  //
  // Scale: map-only, whole-stage-codegen'd; the only shuffle is the
  // presentation ORDER BY.
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def t7PiiRedact(s: SparkSession, d: String): DataFrame = {
    val did = col("doc_id").cast("string")
    val injected = concat(
      substring(col("text"), 1, 64),
      lit(" contact user"), did, lit("@example.com or admin"), did,
      lit("@mail.example.org from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), (col("doc_id") % 200).cast("string"),
      lit(" and 192.168.1."), (col("doc_id") % 100).cast("string"), lit(" end"))
    Tables.documents(s, d)
      .select(col("doc_id"), injected.as("txt"))
      .select(
        col("doc_id"),
        regexp_count(col("txt"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("txt"), lit(ipRe)).cast("long").as("n_ips"),
        md5(regexp_replace(regexp_replace(col("txt"), emailRe, "<EMAIL>"),
          ipRe, "<IP>")).as("redacted_hash"))
      .orderBy("doc_id")
  }

  private val t7Sql = {
    val injected = "substring(text, 1, 64) || ' contact user' || did ||" +
      " '@example.com or admin' || did || '@mail.example.org from 10.' ||" +
      " CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 200 AS VARCHAR) ||" +
      " ' and 192.168.1.' || CAST(doc_id % 100 AS VARCHAR) || ' end'"
    s"""WITH t AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS did, text FROM documents),
       |i AS (SELECT doc_id, $injected AS txt FROM t)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(txt, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(txt, '$ipRe')) AS BIGINT) AS n_ips,
       |  md5(regexp_replace(regexp_replace(txt, '$emailRe', '<EMAIL>', 'g'),
       |      '$ipRe', '<IP>', 'g')) AS redacted_hash
       |FROM i ORDER BY doc_id""".stripMargin
  }

  val queries: Seq[Q] = Seq(
    Q("dc1_decontaminate", dc1Decontaminate, Some(dc1Sql)),
    Q("pk1_pack_sequences", pk1PackSequences, Some(pk1Sql)),
    Q("dd10_paragraph_dedup", dd10ParagraphDedup, Some(dd10Sql)),
    Q("t7_pii_redact", t7PiiRedact, Some(t7Sql)))
}
