package graft.connector

import org.apache.spark.sql.SparkSession

import graft.catalog.ClickHouseCatalog
import graft.client.ClickHouseClient

/** Server-side mutations on connector tables (`ALTER TABLE ... UPDATE /
  * DELETE`): the mutation runs where the data lives and rewrites parts in
  * the store — at 100 TB this is the only sane shape for point updates,
  * which is why UPDATE is NOT exposed through Spark's row-level-operation
  * rewrite (that path re-shuffles every matched group through Spark).
  * `DELETE FROM <table>` in Spark SQL routes through [[ClickHouseTable]]'s
  * `SupportsDelete` and needs no helper; UPDATE has no DSv2 mutation
  * hook, so it gets this entry point.
  *
  * Assignments and conditions are ClickHouse SQL fragments (the same
  * passthrough dialect as `clickhouse_eval`), evaluated against the
  * row's OLD values — server mutation semantics; a NULL condition leaves
  * the row unchanged.
  */
object ChMutations {

  /** `ChMutations.updateWhere(spark, "clickhouse.main.t",
    *   Seq("c" -> "c + 1"), "id > 10")`
    */
  def updateWhere(
      spark: SparkSession,
      table: String,
      assignments: Seq[(String, String)],
      where: String): Unit = {
    val (client, db, tbl) = resolve(spark, table)
    client.updateWhere(db, tbl, assignments, where)
    refresh(spark, table)
  }

  /** Programmatic twin of SQL `DELETE FROM` for raw ClickHouse
    * conditions the DSv2 filter grammar cannot express.
    */
  def deleteWhere(spark: SparkSession, table: String, where: String): Unit = {
    val (client, db, tbl) = resolve(spark, table)
    client.deleteWhere(db, tbl, where)
    refresh(spark, table)
  }

  /** Mutations run OUTSIDE Spark's write path, so Spark's own
    * cache-invalidation (what a native DSv2 DELETE exec does) never
    * fires — without this, a cached DataFrame over the table silently
    * keeps serving pre-mutation rows (UpdateSqlSpec pins it).
    */
  private[graft] def refresh(spark: SparkSession, table: String): Unit =
    try spark.catalog.refreshTable(table)
    catch { case _: Exception => () } // cache hygiene must not fail the mutation

  /** Materialized-view fires change TARGET tables during a SOURCE
    * insert — outside Spark's own invalidation, which only covers the
    * insert's table. Drained after every connector write commit: each
    * fired (connectionKey, db, table) refreshes EVERY registered catalog
    * fronting that store, so cached plans over targets never serve
    * pre-trigger rows.
    */
  private[graft] def drainMvRefresh(spark: SparkSession): Unit = {
    val it = graft.client.MvRefresh.pending.iterator()
    while (it.hasNext) {
      val (key, db, t) = it.next()
      it.remove()
      ClickHouseCatalog.registered.forEach { (cat, ck) =>
        if (ck == key) refresh(spark, s"$cat.$db.$t")
      }
    }
  }

  /** The catalog's transport client, for maintenance statements with no
    * DataFrame surface (OPTIMIZE TABLE, raw mutations).
    */
  def clientOf(spark: SparkSession, catalog: String): ClickHouseClient =
    spark.sessionState.catalogManager.catalog(catalog) match {
      case c: ClickHouseCatalog => c.clickHouseClient
      case other => throw new IllegalArgumentException(
        s"catalog '$catalog' is not a ClickHouse catalog (${other.getClass.getName})")
    }

  private def resolve(
      spark: SparkSession, table: String): (ClickHouseClient, String, String) = {
    table.split('.') match {
      case Array(cat, db, tbl) =>
        spark.sessionState.catalogManager.catalog(cat) match {
          case c: ClickHouseCatalog => (c.clickHouseClient, db, tbl)
          case other => throw new IllegalArgumentException(
            s"catalog '$cat' is not a ClickHouse catalog (${other.getClass.getName})")
        }
      case _ => throw new IllegalArgumentException(
        s"expected <catalog>.<database>.<table>, got: $table")
    }
  }
}
