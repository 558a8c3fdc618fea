package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.functions.Registration
import graft.pushdown.{ClickHouseFunctionPushdown, ClickHouseRemoteStrategy}

/** Session wiring (the analog of the reference's
  * `prepare_session_context`, /root/reference/src/context.rs:54-116):
  * registers the passthrough functions, the pushdown rule, and the remote
  * strategy.
  *
  * Two installation paths:
  *  - [[GraftSession.install]]: runtime, on an existing session (uses the
  *    experimental hooks — works with any driver-provided session).
  *  - [[GraftExtensions]]: `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=graft.GraftExtensions` at session build.
  */
object GraftSession {

  def install(spark: SparkSession): Unit = synchronized {
    Registration.registerFunctions(spark)
    val em = spark.experimental
    if (!em.extraOptimizations.contains(ClickHouseFunctionPushdown))
      em.extraOptimizations = em.extraOptimizations :+ ClickHouseFunctionPushdown
    if (!em.extraStrategies.contains(ClickHouseRemoteStrategy))
      em.extraStrategies = em.extraStrategies :+ ClickHouseRemoteStrategy
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // Pre-CBO runs after V2ScanRelationPushDown, so the rule sees the
    // pushed-down scans whose generated SQL seeds the collapsed query —
    // the same ordering the runtime install path gets from the
    // user-provided optimizer batch.
    e.injectPreCBORule(_ => ClickHouseFunctionPushdown)
    e.injectPlannerStrategy(_ => ClickHouseRemoteStrategy)
    graft.functions.Registration.descriptors.foreach(e.injectFunction)
  }
}
