package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.client.ChAlterOp

/** SQL surface for table-projection DDL on ClickHouse catalogs
  * (`ALTER TABLE t ADD PROJECTION p (SELECT ... GROUP BY ...)`,
  * `MATERIALIZE PROJECTION p`, `DROP PROJECTION p`).
  *
  * Spark's ALTER TABLE grammar has no projection clauses, so — like the
  * materialized-view DDL in [[ChMvDdl]] — the statements are intercepted
  * from the RAW text when the identifier resolves to a ClickHouse
  * catalog and ship as client DDL ([[ChAlterOp]]); every transport
  * renders or executes them (HTTP verbatim, embedded per-part state
  * build). Anything else falls through to Spark's own parsing.
  */
object ChProjectionDdl {

  private val AddRe =
    raw"(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+ADD\s+PROJECTION\s+(?:(IF\s+NOT\s+EXISTS)\s+)?`?([A-Za-z_][A-Za-z0-9_]*)`?\s*\((.+)\)\s*;?\s*".r
  private val DropRe =
    raw"(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+DROP\s+PROJECTION\s+(?:(IF\s+EXISTS)\s+)?`?([A-Za-z_][A-Za-z0-9_]*)`?\s*;?\s*".r
  private val MatRe =
    raw"(?is)\s*ALTER\s+TABLE\s+([^\s]+)\s+MATERIALIZE\s+PROJECTION\s+`?([A-Za-z_][A-Za-z0-9_]*)`?\s*;?\s*".r

  def rewrite(session: SparkSession, sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] = sqlText match {
    case AddRe(tableId, _, name, select) =>
      ChMvDdl.resolve(session, delegate, tableId).map { case (cat, db, t) =>
        ChProjectionCommand(cat, db, t, ChAlterOp.AddProjection(name, select))
      }
    case DropRe(tableId, _, name) =>
      ChMvDdl.resolve(session, delegate, tableId).map { case (cat, db, t) =>
        ChProjectionCommand(cat, db, t, ChAlterOp.DropProjection(name))
      }
    case MatRe(tableId, name) =>
      ChMvDdl.resolve(session, delegate, tableId).map { case (cat, db, t) =>
        ChProjectionCommand(cat, db, t, ChAlterOp.MaterializeProjection(name))
      }
    case _ => None
  }
}

final case class ChProjectionCommand(
    catalog: String, db: String, table: String, op: ChAlterOp)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.connector.ChMutations.clientOf(spark, catalog)
      .alterTable(db, table, Seq(op))
    // MATERIALIZE rewrites store state out-of-band of Spark's caches
    graft.connector.ChMutations.refresh(spark, s"$catalog.$db.$table")
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"ChProjectionCommand $catalog.$db.$table $op"
}
