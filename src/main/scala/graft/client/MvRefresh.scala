package graft.client

/** Materialized-view fires mutate TARGET tables outside Spark's own
  * write-path invalidation (the insert Spark sees is on the SOURCE), so
  * a cached plan over a target would keep serving pre-trigger rows —
  * the same staleness class as out-of-band mutations (ChMutations
  * .refresh). Clients record fired targets here; connector commit paths
  * drain the queue and refresh every registered catalog that fronts the
  * client (ChMutations.drainMvRefresh).
  */
object MvRefresh {
  /** (client connectionKey, target db, target table) awaiting a Spark
    * catalog-cache refresh.
    */
  val pending: java.util.Set[(String, String, String)] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String, String)]()
}
