package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Register-once guard for the graft_* temp functions.
  *
  * Every operator that needs a custom expression calls its `register`
  * defensively, so a multi-query session (Verify/Bench run 238 queries on
  * one session) would otherwise `createOrReplaceTempFunction` the same
  * name hundreds of times — each re-registration logs a
  * SimpleFunctionRegistry "replaced a previously registered function"
  * WARN, and the driver's bench tail capture is only ~2000 bytes: WARN
  * spam is exactly what could push the Bench JSON line out of the window.
  * The guard makes re-registration a no-op once the name resolves.
  */
private[functions] object Registration {
  def once(spark: SparkSession, name: String)(body: => Unit): Unit =
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(name))) body
}
