package graft.pushdown

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.client.ClickHouseClient

/** `INSERT INTO <ch-table> SELECT ... FROM <same-store tables>` executed
  * entirely server-side (`client.insertSelect`) — the optimizer rewrite
  * replaces Spark's AppendData when the read side unparses to one
  * remote statement on the SAME connection key, so ZERO rows cross the
  * wire in either direction. At 100 TB this is the difference between a
  * store-local copy and a full round-trip of the selected rows through
  * the cluster. Trade-offs vs the Spark write path, all recorded:
  * `chRowsInserted` metrics and client-side insert layout
  * (partition_by clustering) do not apply — the server lays out its own
  * blocks; nullability is still enforced (insertSelect's runtime NULL
  * guard), and materialized views on the target still fire (the insert
  * rides the same staged commit).
  */
final case class ChInsertSelectCommand(
    client: ClickHouseClient,
    db: String,
    table: String,
    chSelectSql: String,
    refreshName: Option[String])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val n = client.insertSelect(db, table, chSelectSql)
    graft.connector.ChInsertCount.record(client.connectionKey, db, table, n)
    // the write ran outside Spark's own invalidation: refresh cached
    // plans over the target, and over any MV targets the insert fired
    refreshName.foreach(n => graft.connector.ChMutations.refresh(spark, n))
    graft.connector.ChMutations.drainMvRefresh(spark)
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"ChInsertSelectCommand $db.$table AS [$chSelectSql]"
}
