package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump `SparkEntry.oracleSql` as JSON without starting Spark,
  * so the DuckDB oracle strings can be type-audited (DESCRIBE) offline.
  * The driver's hash compare is over typed values — a DuckDB column that
  * comes back HUGEINT/DECIMAL where Spark emits BIGINT/DOUBLE hash-fails
  * even when value-exact (the round-6 q33 artifact). Usage:
  *   sbt "runMain graft.tools.DumpOracle /tmp/oracle_sql.json"
  */
object DumpOracle {
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"[dump-oracle] wrote ${graft.SparkEntry.oracleSql.size} entries to $out")
  }
}
