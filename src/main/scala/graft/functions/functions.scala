package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge.{column, expression}

import graft.functions.{ClickHouseEval, ClickHouseFn, ClickHousePassthrough}

/** DataFrame-API expression builders (the analog of the reference's
  * `functions` module, /root/reference/src/udfs.rs:76-155).
  *
  * {{{
  *   import graft.chfunctions._
  *   df.select(clickhouse(upper($"name"), "String"))
  *   df.select(clickhouse_fn("base64Encode", Seq($"name"), "String"))
  *   df.select(clickhouse_eval("countDigits(42)", "UInt8"))
  * }}}
  */
object chfunctions {

  /** Ship `expr` to ClickHouse, declaring its return type. */
  def clickhouse(expr: Column, returnType: String): Column =
    column(ClickHousePassthrough(expression(expr), returnType))

  /** Splice a raw ClickHouse SQL fragment into the remote query. */
  def clickhouse_eval(rawSql: String, returnType: String): Column =
    column(ClickHouseEval(rawSql, returnType))

  /** Call any remote function by (case-sensitive) name. arrayJoin — the
    * one ROW-EXPANDING function in the surface — becomes Spark's native
    * explode generator so Catalyst sees the true cardinality (see
    * Registration.buildFn).
    */
  def clickhouse_fn(name: String, args: Seq[Column], returnType: String): Column =
    if (name == "arrayJoin") {
      require(args.length == 1, "arrayJoin takes exactly one array argument")
      column(org.apache.spark.sql.catalyst.expressions.Explode(expression(args.head)))
    } else column(ClickHouseFn(name, args.map(expression), returnType))
}
