package graft.operators

/** Structural invariants for the graph family (value-level correctness
  * is the DuckDB oracle's job — gr1/gr2 are hash-compared there):
  * PageRank must keep one row per node with the damping floor as a hard
  * lower bound, and the clustering coefficient is bounded by definition
  * (3·triangles ≤ wedges — every triangle closes exactly 3 wedges).
  */
class GraphOpsSpec extends graft.SparkSpec {

  test("gr1: one row per node, every rank at or above the damping floor") {
    val df = graft.SparkEntry.queries("gr1_pagerank")(spark, sf("sf0.001")).cache()
    val n = df.count()
    assert(n > 0)
    assert(df.select("node_type", "node_key").distinct().count() == n)
    assert(df.filter(org.apache.spark.sql.functions.col("rank_ppm") < 150000L).count() == 0)
  }

  test("gr2: single row, 3*triangles <= wedges, clustering in [0, 1e6]") {
    val r = graft.SparkEntry.queries("gr2_triangles")(spark, sf("sf0.001")).collect()
    assert(r.length == 1)
    val row = r.head
    val tri = row.getAs[Long]("n_triangles")
    val wedges = row.getAs[Long]("n_wedges")
    val c = row.getAs[Long]("clustering_ppm")
    assert(3L * tri <= wedges || wedges == 0L)
    assert(c >= 0L && c <= 1000000L)
  }
}
