package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction, Literal}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ClickHouseFn
import graft.types.ClickHouseType

/** SQL-surface parity with the reference's implicit function resolution
  * (/root/reference/src/context.rs:375-402 + udfs/placeholder.rs:22-74):
  * a function name the session does NOT know becomes a remote ClickHouse
  * call instead of an analysis error, so users write
  * `` SELECT `base64Encode`(name) `` directly — no `clickhouse_fn`
  * wrapper. Installed via [[GraftExtensions]] (`injectParser`); the parse
  * tree is rewritten before analysis, mirroring the reference's
  * ContextProvider fallback that hands the planner a PlaceholderUDF.
  *
  * Semantics match the reference:
  *  - names are CASE-SENSITIVE (ClickHouse's registry is), and only names
  *    unknown to Spark's function/table-function registries are wrapped —
  *    known builtins, temp functions and aggregates resolve normally;
  *  - the return type is the trailing `'Type'` string literal when one
  *    parses as a ClickHouse type (the `clickhouse_fn` convention /
  *    `extract_return_field_from_args`), otherwise the LAST argument's
  *    resolved type (placeholder.rs `return_type`);
  *  - the `apply`/`lambda` named-builder family (udfs/apply.rs:26-34)
  *    maps `apply(x -> body, arr)` to Spark's native `transform`
  *    (= ClickHouse `arrayMap` under collapse), so the lambda executes
  *    locally AND remotely with one spelling;
  *  - bare `` `arrayJoin`(arr) `` becomes a true row-expanding generator
  *    (explode), the cardinality-safe rewrite Registration.buildFn makes.
  *
  * Like the reference's planning-only UDFs, a wrapped call that never
  * reaches a remote subtree fails at execution — the price of accepting
  * any name is deferring "no such function" from analysis to pushdown.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    // materialized-view DDL has no Spark grammar (CREATE) or no DSv2
    // view resolution (DROP) — intercepted from the RAW text when it
    // addresses a ClickHouse catalog; see ChMvDdl
    ChMvDdl.rewrite(session, sqlText, delegate)
      .orElse(ChProjectionDdl.rewrite(session, sqlText, delegate))
      .getOrElse {
      val parsed = delegate.parsePlan(rewritePlaceholders(sqlText))
      // SQL UPDATE on a ClickHouse catalog table ships as a server-side
      // mutation (Spark's own path would demand SupportsRowLevelOperations
      // and re-shuffle matched groups) — see ChUpdateRewrite
      ChUpdateRewrite.rewrite(session, parsed) match {
        case Some(cmd) => cmd
        case None => rewritePlan(parsed)
      }
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    rewritePlan(delegate.parseQuery(rewritePlaceholders(sqlText)))

  override def parseExpression(sqlText: String): Expression =
    rewriteExpr(delegate.parseExpression(rewritePlaceholders(sqlText)))

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  /** Pre-lex for the reference's `$x` lambda placeholders
    * (tests/e2e.rs:1087-1214): Spark's lexer rejects `$` outright, so
    * `$name` tokens OUTSIDE quotes/backticks rewrite to marker
    * identifiers (`__ch_ph_name`) that [[graft.functions.ApplyBuilders]]
    * later turns into lambda variables. Quoted regions (single/double
    * quotes with backslash escapes, backticks) pass through verbatim —
    * a `$` in DATA is never a placeholder. Everything this touches was
    * a guaranteed PARSE_SYNTAX_ERROR before, so the rewrite can only
    * widen the accepted surface.
    */
  private def rewritePlaceholders(sql: String): String = {
    if (!sql.contains('$')) return sql
    val out = new StringBuilder(sql.length + 16)
    var i = 0
    var quote: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == '\\' && quote != '`' && i + 1 < sql.length) {
          out.append(sql.charAt(i + 1)); i += 1
        } else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (c == '$' && i + 1 < sql.length &&
        (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_')) {
        var e = i + 1
        while (e < sql.length &&
          (sql.charAt(e).isLetterOrDigit || sql.charAt(e) == '_')) e += 1
        out.append(graft.functions.ApplyBuilders.PhPrefix)
          .append(sql.substring(i + 1, e))
        i = e
      } else { out.append(c); i += 1 }
    }
    out.result()
  }

  private def rewritePlan(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => rewriteExpr(e) }

  private def rewriteExpr(e: Expression): Expression = e.transformUp {
    case uf: UnresolvedFunction
        if uf.nameParts.length == 1 && !uf.isDistinct && uf.filter.isEmpty &&
          !uf.ignoreNulls && uf.orderingWithinGroup.isEmpty &&
          !isKnown(session, uf.nameParts.head) =>
      build(uf.nameParts.head, uf.arguments)
  }

  private def build(name: String, args: Seq[Expression]): Expression =
    if (ApplyAliases.contains(name.toLowerCase(java.util.Locale.ROOT))) {
      // wrapper unwrap (`lambda(arrayMap(...))`) or Spark-style lambda
      // forms — shared with the runtime registration
      graft.functions.ApplyBuilders.buildAlias(name, args)
    } else if (graft.functions.ApplyBuilders.phName(args.headOption.orNull).isDefined) {
      // the reference's placeholder spelling on the HOF itself:
      // `` `arrayMap`($x, concat($x, id), names) `` (e2e.rs:1087-1214);
      // `$x` tokens were pre-lexed into marker attributes
      graft.functions.ApplyBuilders.buildPlaceholder(name, args).get
    } else if (name == "arrayJoin") {
      require(args.length == 1, "arrayJoin takes exactly one array argument")
      org.apache.spark.sql.catalyst.expressions.Explode(args.head)
    } else {
      val declared = args.lastOption.collect {
        case Literal(s: UTF8String, StringType)
            if args.length >= 2 &&
              scala.util.Try(ClickHouseType.parse(s.toString)).isSuccess =>
          s.toString
      }
      declared match {
        case Some(t) => ClickHouseFn(name, args.dropRight(1), t)
        case None =>
          // reference parity: placeholder return_type demands >= 1 arg
          require(args.nonEmpty, s"implicit remote function '$name' requires " +
            "at least one argument (its return type is the last argument's)")
          ClickHouseFn(name, args, "")
      }
    }
}

object GraftSqlParser {

  /** The reference's named-builder alias family (udfs/apply.rs:26-34). */
  val ApplyAliases: Set[String] = Set(
    "apply", "lambda", "clickhouse_apply", "clickhouse_lambda",
    "clickhouse_map", "clickhouse_fmap", "clickhouse_hof")

  /** Known to Spark = NOT wrapped (the reference skips registered scalar/
    * aggregate/window functions the same way, context.rs:387-398).
    */
  private def isKnown(session: SparkSession, name: String): Boolean = {
    val id = FunctionIdentifier(name)
    session.sessionState.functionRegistry.functionExists(id) ||
      session.sessionState.tableFunctionRegistry.functionExists(id)
  }
}
