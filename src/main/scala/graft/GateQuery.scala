package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gate query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle. The driver runs
  * the Spark side at sf0.01, the oracle in DuckDB, and hash-compares.
  *
  * Column names must match between the two sides exactly (the compare
  * sorts columns by name before hashing values).
  */
final case class GateQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"bad query name: $name")
}

object GateQuery {
  /** Convenience: query whose Spark side and oracle are the same SQL text
    * (the shared ANSI subset of Spark SQL and DuckDB SQL).
    */
  def sharedSql(name: String, sql: String): GateQuery =
    GateQuery(
      name,
      (s: SparkSession, dir: String) => { Tables.register(s, dir); s.sql(sql) },
      Some(sql))
}
