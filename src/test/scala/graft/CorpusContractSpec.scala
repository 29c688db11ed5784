package graft

/** Pins the ENGINE-VISIBLE schema of every corpus table, as seen through
  * the `Tables` loaders at sf0.001.
  *
  * Why this exists: the driver regenerated `/root/testdata` mid-build and
  * changed `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ);
  * the engine found out via 23 analysis failures spread across the query
  * registry. This spec makes the corpus contract a single named test —
  * the next silent corpus change fails HERE first, with the exact table
  * and column in the message, instead of breaking a fifth of the registry.
  *
  * The assertion is on `(name, dataType.simpleString)` per column, i.e.
  * what queries actually bind against after any loader normalization
  * (events' ts-type dispatch included). Nullability is deliberately NOT
  * pinned — parquet round-trips flip it without semantic effect.
  */
class CorpusContractSpec extends SparkSpec {

  private def visible(name: String): Seq[(String, String)] = {
    val df = name match {
      case "events" => Tables.events(spark, sf("sf0.001"))
      case other    => Tables.table(spark, sf("sf0.001"), other)
    }
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
  }

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // `ts` must surface as a session-TZ timestamp REGARDLESS of the
    // parquet physical type (NANOS via nanosAsLong+div, MICROS-NTZ via
    // cast) — that is the loader's whole job
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")
  )

  test("every corpus table matches the engine-visible schema contract") {
    val diffs = Tables.all.flatMap { t =>
      val got = visible(t)
      val want = expected(t)
      if (got == want) None
      else Some(s"$t:\n  expected $want\n  got      $got")
    }
    assert(diffs.isEmpty, "corpus contract violated —\n" + diffs.mkString("\n"))
  }

  test("orderdate/shipdate/ts parse as real time values (not epoch zero)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf("sf0.001"))
    val Array(mn, mx) = ev.agg(min("ts"), max("ts")).collect()(0)
      .toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
    assert(mn.getTime > 0L, s"events.ts min is $mn — loader decoded garbage")
    assert(mx.after(mn), s"events.ts range degenerate: [$mn, $mx]")
  }
}
