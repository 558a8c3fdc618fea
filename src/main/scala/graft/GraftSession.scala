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
    // The "Pre CBO Rules" batch runs BEFORE "Early Filter and Projection
    // Push-Down" (V2ScanRelationPushDown) on Spark 4.1, so the pushdown
    // rule cannot live there: it consumes ChScan scan relations that only
    // exist afterwards. The one post-scan-pushdown optimizer seam is the
    // "User Provided Optimizers" batch, so the injected builder (invoked
    // when the session assembles its optimizer batches, i.e. before the
    // first optimization completes) registers the rule there — same seam
    // as the runtime GraftSession.install path — and contributes nothing
    // to the pre-CBO batch itself.
    e.injectPreCBORule { session =>
      val em = session.experimental
      if (!em.extraOptimizations.contains(ClickHouseFunctionPushdown))
        em.extraOptimizations = em.extraOptimizations :+ ClickHouseFunctionPushdown
      GraftExtensions.Noop
    }
    e.injectPlannerStrategy(_ => ClickHouseRemoteStrategy)
    graft.functions.Registration.descriptors.foreach(e.injectFunction)
    // implicit unknown-function resolution + apply/lambda builders
    // (PlaceholderUDF parity — see GraftSqlParser)
    e.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
  }
}

object GraftExtensions {
  private object Noop
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    override def apply(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p
  }
}
