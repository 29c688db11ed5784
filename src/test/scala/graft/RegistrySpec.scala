package graft

/** Contract checks for the driver-facing surface: every oracle key has a
  * query, names are unique, and every query executes with >0 rows and
  * stable column names at sf0.001 (the driver's smoke scale).
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracles reference real queries") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns rows") {
    val empty = Registry.all.flatMap { q =>
      val df = q.fn(spark, sf("sf0.001"))
      val n = df.count()
      if (n == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }

  test("no query output has duplicate or case-colliding column names") {
    // the driver's compare sorts columns BY NAME before hashing — a
    // duplicate name would silently scramble the comparison
    val bad = Registry.all.flatMap { q =>
      val cols = q.fn(spark, sf("sf0.001")).columns.map(_.toLowerCase)
      if (cols.distinct.length != cols.length) Some(q.name -> cols.toSeq) else None
    }
    assert(bad.isEmpty, s"duplicate output columns: $bad")
  }
}
