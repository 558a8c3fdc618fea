package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL surface for materialized-view DDL on ClickHouse catalogs.
  *
  * Spark has no `CREATE MATERIALIZED VIEW` grammar (the delegate parser
  * rejects the statement outright) and resolves `DROP VIEW` only
  * against ViewCatalog implementations, so both forms are intercepted
  * from the RAW text on the extensions session — the same parser hook
  * as [[ChUpdateRewrite]] — and ship as client DDL when the identifier
  * resolves to a ClickHouse catalog. Anything else falls through to
  * Spark's own parsing untouched (session-catalog views keep working).
  *
  * The `AS` select ships VERBATIM in ClickHouse dialect — it executes
  * on the server (or the embedded server model), never in Spark, which
  * is exactly the reference's passthrough contract.
  */
object ChMvDdl {

  // pattern-matched via unapplySeq, which full-matches — no anchors
  private val CreateRe =
    raw"(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([^\s]+)\s+TO\s+([^\s]+)\s+(?:(POPULATE)\s+)?AS\s+(.+?)\s*;?\s*".r
  private val DropRe =
    raw"(?is)\s*DROP\s+(?:MATERIALIZED\s+)?VIEW\s+(?:(IF\s+EXISTS)\s+)?([^\s]+)\s*;?\s*".r

  /** Some(command) when the statement is MV DDL addressed at a
    * ClickHouse catalog; None lets the delegate parse the text.
    */
  def rewrite(session: SparkSession, sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case CreateRe(ifNotExists, viewId, targetId, populate, select) =>
      resolve(session, delegate, viewId).map { case (cat, db, name) =>
        // once the VIEW addresses a ClickHouse catalog, a bad target is
        // a loud error, never a fall-through to Spark's parse failure
        val (tCat, tDb, tTable) = resolve(session, delegate, targetId)
          .getOrElse(throw new IllegalArgumentException(
            s"CREATE MATERIALIZED VIEW $db.$name: TO target '$targetId' " +
              "does not resolve to a ClickHouse catalog table"))
        require(cat == tCat,
          s"CREATE MATERIALIZED VIEW $db.$name: the TO target must live " +
            s"in the same catalog ('$cat' vs '$tCat') — cross-catalog " +
            "triggers have no server counterpart")
        ChCreateMvCommand(cat, db, name, tDb, tTable, select,
          ifNotExists != null, populate != null)
      }
    case DropRe(ifExists, viewId) =>
      resolve(session, delegate, viewId).filter { case (cat, db, name) =>
        // a 1/2-part DROP VIEW under `USE <clickhouse-catalog>` may mean
        // a SPARK (temp) view — claim the statement only when explicitly
        // catalog-qualified or when the materialized view actually
        // exists; otherwise Spark's own view resolution handles it
        explicitCatalog(delegate, viewId) ||
          (try graft.connector.ChMutations.clientOf(session, cat)
            .listMaterializedViews(db).contains(name)
          catch { case _: Exception => false })
      }.map { case (cat, db, name) =>
        ChDropMvCommand(cat, db, name, ifExists != null)
      }
    case _ => None
  }

  private def explicitCatalog(delegate: ParserInterface, ident: String): Boolean =
    (try delegate.parseMultipartIdentifier(ident).length
    catch { case _: Exception => 0 }) == 3

  /** cat.db.name / db.name / name → (clickhouse catalog, db, name);
    * None when the statement belongs to another catalog.
    */
  private[graft] def resolve(session: SparkSession, delegate: ParserInterface,
      ident: String): Option[(String, String, String)] = {
    val parts =
      try delegate.parseMultipartIdentifier(ident)
      catch { case _: Exception => return None }
    def current: Option[String] = {
      val cur =
        try session.sessionState.catalogManager.currentCatalog.name()
        catch { case _: Exception => "" }
      Some(cur).filter(c => c.nonEmpty && isClickHouse(session, c))
    }
    parts match {
      case Seq(c, d, t) if isClickHouse(session, c) => Some((c, d, t))
      case Seq(d, t) => current.map((_, d, t))
      case Seq(t) =>
        current.flatMap { c =>
          session.sessionState.catalogManager.currentNamespace match {
            case Array(d) => Some((c, d, t))
            case _ => None
          }
        }
      case _ => None
    }
  }

  private def isClickHouse(session: SparkSession, cat: String): Boolean =
    try session.sessionState.catalogManager.catalog(cat)
      .isInstanceOf[graft.catalog.ClickHouseCatalog]
    catch { case _: Exception => false }
}

final case class ChCreateMvCommand(
    catalog: String, db: String, name: String,
    targetDb: String, targetTable: String, select: String,
    ifNotExists: Boolean, populate: Boolean = false)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val client = graft.connector.ChMutations.clientOf(spark, catalog)
    if (!(ifNotExists && client.listMaterializedViews(db).contains(name))) {
      client.createMaterializedView(
        db, name, targetDb, targetTable, select, populate)
      // the backfill landed rows in the target (and possibly its own
      // views' targets) outside Spark's invalidation hooks
      if (populate) {
        graft.connector.ChMutations.drainMvRefresh(spark)
        graft.connector.ChMutations.refresh(
          spark, s"$catalog.$targetDb.$targetTable")
      }
    }
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"ChCreateMvCommand $catalog.$db.$name TO $targetDb.$targetTable"
}

final case class ChDropMvCommand(
    catalog: String, db: String, name: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val client = graft.connector.ChMutations.clientOf(spark, catalog)
    if (!(ifExists && !client.listMaterializedViews(db).contains(name)))
      client.dropMaterializedView(db, name)
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"ChDropMvCommand $catalog.$db.$name"
}
