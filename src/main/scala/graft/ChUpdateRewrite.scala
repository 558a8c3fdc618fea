package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `UPDATE` on a ClickHouse catalog table → server-side mutation.
  *
  * Spark only accepts UPDATE for tables implementing
  * SupportsRowLevelOperations, whose delta/group rewrites re-shuffle
  * every matched group through the cluster — the opposite of what a
  * point update should cost at 100 TB. The connector instead ships the
  * statement as `ALTER TABLE ... UPDATE` where the data lives (the r34
  * path, SQL-surfaced): on the extensions session, GraftSqlParser
  * rewrites the parsed [[UpdateTable]] into [[ChUpdateCommand]] when the
  * target resolves to a ClickHouse catalog AND every assignment and the
  * condition unparse to the shared ClickHouse/Spark expression surface.
  * Anything outside that surface fails the STATEMENT loudly
  * (honored-or-rejected) — never a silent local rewrite.
  *
  * Semantics match the server mutation (and r34's oracle): assigned
  * columns recompute from OLD row values where the condition is TRUE;
  * a NULL condition keeps the row.
  */
object ChUpdateRewrite {

  /** Parse-time hook: Some(command) when this UPDATE belongs to a
    * ClickHouse catalog; None leaves the plan for Spark's own path
    * (e.g. session-catalog tables, other DSv2 sources).
    */
  def rewrite(session: SparkSession, plan: LogicalPlan): Option[LogicalPlan] =
    plan match {
      case UpdateTable(UnresolvedRelation(parts, _, _), assignments, condition) =>
        // 3-part names carry their catalog; 2-part names belong to the
        // session's CURRENT catalog (`USE clickhouse; UPDATE db.t ...`)
        def current: Option[String] = {
          val cur =
            try session.sessionState.catalogManager.currentCatalog.name()
            catch { case _: Exception => "" }
          Some(cur).filter(c => c.nonEmpty && isClickHouse(session, c))
        }
        val target: Option[(String, String, String)] = parts match {
          case Seq(c, d, t) if isClickHouse(session, c) => Some((c, d, t))
          case Seq(d, t) => current.map((_, d, t))
          case Seq(t) => // USE clickhouse.main; UPDATE t ...
            current.flatMap { c =>
              session.sessionState.catalogManager.currentNamespace match {
                case Array(d) => Some((c, d, t))
                case _ => None
              }
            }
          case _ => None
        }
        target.map { case (cat, db, t) =>
          val sets = assignments.map {
            case Assignment(key: UnresolvedAttribute, value) =>
              key.nameParts.last -> unparse(value)
            case other => fail(s"unsupported assignment target: ${other.key.sql}")
          }
          val where = condition.map(unparse).getOrElse("1 = 1")
          ChUpdateCommand(cat, db, t, sets, where)
        }
      case _ => None
    }

  private def isClickHouse(session: SparkSession, cat: String): Boolean =
    try session.sessionState.catalogManager.catalog(cat)
      .isInstanceOf[graft.catalog.ClickHouseCatalog]
    catch { case _: Exception => false }

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3065",
      messageParameters = Map("clazz" -> "ChUpdateRewrite", "msg" ->
        (s"UPDATE on a ClickHouse table must compile to a remote mutation; $msg. " +
          "Use graft.connector.ChMutations.updateWhere for raw ClickHouse expressions.")))

  /** Names valid verbatim in BOTH dialects over the argument shapes an
    * UPDATE plausibly uses — with IDENTICAL semantics. Deliberately
    * absent: `round` (ClickHouse half-to-even vs Spark HALF_UP — 2.5
    * diverges, caught by UpdateSqlSpec), `lower`/`upper` (ClickHouse is
    * ASCII-only, Spark Unicode), `length` (ClickHouse counts BYTES on
    * strings, Spark characters), `greatest`/`least` (ClickHouse
    * propagates NULL arguments, Spark SKIPS them), and the partial math
    * family `sqrt`/`ln`/`log10` (out-of-domain inputs are nan/±inf in
    * ClickHouse but NULL in Spark).
    */
  private val SharedFns = Set(
    "abs", "coalesce", "floor", "ceiling", "concat", "if", "nullif", "exp")

  /** Unparse a PARSE-TREE (unresolved) expression to ClickHouse SQL.
    * Conservative by construction: only shapes whose remote semantics
    * are the shared surface are emitted.
    */
  private def unparse(e: Expression): String = e match {
    case a: UnresolvedAttribute => s"`${a.nameParts.last.replace("`", "``")}`"
    case Literal(null, _) => "NULL"
    case l @ Literal(_, t) => t match {
      case org.apache.spark.sql.types.StringType =>
        "'" + l.value.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
      case _: org.apache.spark.sql.types.NumericType => l.value.toString
      case org.apache.spark.sql.types.BooleanType => l.value.toString
      case org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType =>
        l.sql // parser-built date/timestamp literals render as typed SQL
      case other => fail(s"literal of type ${other.simpleString}")
    }
    case Add(l, r, _) => s"(${unparse(l)} + ${unparse(r)})"
    case Subtract(l, r, _) => s"(${unparse(l)} - ${unparse(r)})"
    case Multiply(l, r, _) => s"(${unparse(l)} * ${unparse(r)})"
    case Divide(l, r, _) => s"(${unparse(l)} / ${unparse(r)})"
    case Remainder(l, r, _) => s"(${unparse(l)} % ${unparse(r)})"
    case UnaryMinus(c, _) => s"(-${unparse(c)})"
    case EqualTo(l, r) => s"(${unparse(l)} = ${unparse(r)})"
    case LessThan(l, r) => s"(${unparse(l)} < ${unparse(r)})"
    case LessThanOrEqual(l, r) => s"(${unparse(l)} <= ${unparse(r)})"
    case GreaterThan(l, r) => s"(${unparse(l)} > ${unparse(r)})"
    case GreaterThanOrEqual(l, r) => s"(${unparse(l)} >= ${unparse(r)})"
    case Not(EqualTo(l, r)) => s"(${unparse(l)} != ${unparse(r)})"
    case Not(c) => s"(NOT ${unparse(c)})"
    case And(l, r) => s"(${unparse(l)} AND ${unparse(r)})"
    case Or(l, r) => s"(${unparse(l)} OR ${unparse(r)})"
    case IsNull(c) => s"(${unparse(c)} IS NULL)"
    case IsNotNull(c) => s"(${unparse(c)} IS NOT NULL)"
    case In(v, list) => s"(${unparse(v)} IN (${list.map(unparse).mkString(", ")}))"
    case c: Cast =>
      s"CAST(${unparse(c.child)} AS ${graft.types.ClickHouseType.render(c.dataType)})"
    case f: UnresolvedFunction
        if f.nameParts.length == 1 && !f.isDistinct && f.filter.isEmpty =>
      val n = f.nameParts.head.toLowerCase(java.util.Locale.ROOT)
      if (!SharedFns.contains(n)) fail(s"function '${f.nameParts.head}'")
      s"$n(${f.arguments.map(unparse).mkString(", ")})"
    case other => fail(s"expression ${other.getClass.getSimpleName} (${other.sql})")
  }
}

/** Eager driver-side command: ships ONE `ALTER TABLE ... UPDATE`
  * statement; zero rows cross the wire in either direction.
  */
final case class ChUpdateCommand(
    catalog: String, db: String, table: String,
    sets: Seq[(String, String)], where: String)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.connector.ChMutations.updateWhere(
      spark, s"$catalog.$db.$table", sets, where)
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"ChUpdateCommand $catalog.$db.$table SET ${sets.map { case (c, v) => s"$c = $v" }
      .mkString(", ")} WHERE $where"
}
