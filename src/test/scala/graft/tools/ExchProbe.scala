package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints the planned exchange count per named query — the same
  * "Exchange " regex over the initial physical plan that
  * PlanBudgetSpec gates on — for measuring a budget before pinning it.
  * Usage: Test/runMain graft.tools.ExchProbe [--dir <sfDir>] q1 q2 ...
  */
object ExchProbe {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.length >= 2 && args(0) == "--dir") (args(1), args.drop(2))
      else ("/root/testdata/sf0.001", args)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val c = "Exchange ".r.findAllIn(df.queryExecution.executedPlan.toString).size
      println(s"EXCH $n $c")
    }
    spark.stop()
  }
}
