package graft.operators

import org.apache.spark.sql.functions._

/** q57_dq_audit — on the gate corpus every expectation passes (that is
  * what the oracle pins, with live `checked` denominators), so this spec
  * supplies the other half: a corpus with one PLANTED violation of every
  * kind must be caught with the exact violation count. An audit that
  * cannot fail is not an audit.
  */
class DqAuditSpec extends graft.SparkSpec {

  test("every expectation catches its planted violation with the exact count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dq").toString
    import spark.implicits._
    // lineitem: 1 null key, 1 nonpositive quantity, 1 discount > 1,
    // 1 duplicated (orderkey, linenumber), 1 orphan (orderkey 99 has no
    // order). 7 rows total.
    Seq(
      (Some(1L), 1L, 10.0, 0.05),
      (Some(1L), 2L, 5.0, 0.00),
      (None: Option[Long], 3L, 1.0, 0.10), // null_orderkey (also orphan)
      (Some(2L), 1L, 0.0, 0.10),           // nonpositive_quantity
      (Some(2L), 2L, 3.0, 1.50),           // discount_range
      (Some(2L), 2L, 4.0, 0.20),           // dup_linenumber
      (Some(99L), 1L, 2.0, 0.10))          // orphan_orderkey
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    // orders: 1 nonpositive total, 1 duplicate key, 1 orphan custkey
    Seq((1L, 10L, 100.0), (2L, 10L, -5.0), (2L, 11L, 7.0), (3L, 99L, 8.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    // customer: 1 duplicate key
    Seq((10L, "a"), (10L, "b"), (11L, "c"))
      .toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")
    // documents: 1 empty text, 1 n_chars mismatch
    Seq((1L, "hello", 5L), (2L, "", 0L), (3L, "abc", 7L))
      .toDF("doc_id", "text", "n_chars").write.parquet(s"$dir/documents.parquet")
    // embeddings: 1 bad dimension + 1 NULL embedding (also a violation —
    // the coalesce(-1) pin on both engines)
    spark.range(4L).selectExpr("id AS vec_id",
      """CASE WHEN id = 3 THEN NULL ELSE
        |  transform(sequence(1, CASE WHEN id = 2 THEN 8 ELSE 64 END),
        |    x -> CAST(0.1 AS FLOAT)) END AS embedding""".stripMargin)
      .write.parquet(s"$dir/embeddings.parquet")

    val got = graft.SparkEntry.queries("q57_dq_audit")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val want = Map(
      ("lineitem", "null_orderkey") -> ((1L, 7L, false)),
      ("lineitem", "nonpositive_quantity") -> ((1L, 7L, false)),
      ("lineitem", "discount_range") -> ((1L, 7L, false)),
      ("lineitem", "dup_linenumber") -> ((1L, 7L, false)),
      // the null-key row cannot match any order: 2 orphans
      ("lineitem", "orphan_orderkey") -> ((2L, 7L, false)),
      ("orders", "nonpositive_totalprice") -> ((1L, 4L, false)),
      ("orders", "dup_orderkey") -> ((1L, 4L, false)),
      ("orders", "orphan_custkey") -> ((1L, 4L, false)),
      ("customer", "dup_custkey") -> ((1L, 3L, false)),
      ("documents", "empty_text") -> ((1L, 3L, false)),
      ("documents", "nchars_mismatch") -> ((1L, 3L, false)),
      ("embeddings", "bad_dim") -> ((2L, 4L, false)))
    assert(got === want)
  }
}
