package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Prints the formatted physical plan of EVERY execution a query runs —
  * not just the returned frame (which for driver-report queries is a
  * trivial ExistingRDD scan) but the internal aggregates/joins where the
  * corpus work actually happens. Used to produce the plans/r15 before/
  * after artifacts. Usage:
  *   Test/runMain graft.tools.DeepPlanProbe <query> [sfDir]
  */
object DeepPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length >= 2) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.add(s"== execution [$funcName, ${durationNs / 1000000} ms]\n" +
          qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    val df = graft.SparkEntry.queries(args(0))(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    // the listener bus is asynchronous — allow it to drain before printing
    Thread.sleep(3000)
    plans.forEach(p => println(p))
    spark.stop()
  }
}
