package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Register-once guard for the graft_* temp functions.
  *
  * Every operator that needs a custom expression calls its `register`
  * defensively, so the multi-query session (Verify/Bench run the whole
  * suite on one session) would otherwise `createOrReplaceTempFunction`
  * the same name hundreds of times — each re-registration logs a
  * SimpleFunctionRegistry "replaced a previously registered function"
  * WARN, and the driver's bench tail capture is only ~2000 bytes: WARN
  * spam is exactly what could push the Bench JSON line out of the window.
  * The guard makes re-registration a no-op once EVERY listed name
  * resolves — a block registering several functions runs again if any
  * one of them is missing (a single-name probe would silently skip the
  * siblings whenever the probe name exists alone).
  */
private[functions] object Registration {
  def once(spark: SparkSession, names: String*)(body: => Unit): Unit =
    if (!names.forall(n => spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(n)))) body
}
