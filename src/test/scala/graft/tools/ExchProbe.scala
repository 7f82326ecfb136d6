package graft.tools
import org.apache.spark.sql.SparkSession
object ExchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      val c = "Exchange ".r.findAllIn(df.queryExecution.executedPlan.toString).size
      println(s"EXCH $n $c")
    }
    spark.stop()
  }
}
