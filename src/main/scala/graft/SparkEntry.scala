package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full gate battery: each entry is a Spark implementation
  * of one operator/capability from SURVEY.md §2 (plus the LLM-pipeline
  * extensions), and `oracleSql` carries the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All gate queries, assembled from the per-domain modules. */
  def gateQueries: Seq[GateQuery] =
    queries_relational ++ queries_extensions

  private def queries_relational: Seq[GateQuery] = graft.queries.RelationalQueries.all
  private def queries_extensions: Seq[GateQuery] =
    graft.queries.DedupQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.SamplingQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.ConnectorQueries.all ++
      graft.queries.EventQueries.all ++
      graft.queries.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 pricing summary — the same shape the reference exercises
    * first in its aggregation battery (tests/e2e.rs:1893).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.register(spark, dir)
    spark.table("lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gateQueries.map(g => g.name -> g.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    gateQueries.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
