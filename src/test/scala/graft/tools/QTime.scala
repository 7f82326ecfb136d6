package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: `Test/runMain graft.tools.QTime qNNN_name ...`
  * runs each named SparkEntry query 3 times against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints wall times — the
  * quiet min-of-N companion to Bench for iterating on one query. */
object QTime {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .appName("qtime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { q =>
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime
        val n = graft.SparkEntry.queries(q)(s, dir).count()
        println(s"[qtime] $q run$r: ${(System.nanoTime - t0) / 1e9} s rows=$n")
      }
    }
    s.stop()
  }
}
