package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints one query's formatted physical plan for interactive plan work.
  * Usage: Test/runMain graft.tools.PlanProbe <query> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length >= 2) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
