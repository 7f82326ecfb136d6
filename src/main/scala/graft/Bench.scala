package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Size scan splits below the corpus file size (sf0.1 files ~25 MB vs
      // the 128 MB default). NOTE: the driver-generated files hold a SINGLE
      // row group, so scans stay one-task here regardless — but this is the
      // right setting wherever files carry multiple row groups, which a
      // 100 TB deployment has by construction.
      .config("spark.sql.files.maxPartitionBytes", String.valueOf(4L << 20))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warmup outside the timed region
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // warm the RDD<->DataFrame bridge (RowEncoder + RDD-scan codegen) that
    // GlobalOrder-based queries hit — first use costs ~1s of Janino work
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType, nullable = false))
      .selectExpr("sum(id)").collect()
    graft.operators.GlobalOrder.withRowNumber(
      spark.range(100).toDF(), Seq(org.apache.spark.sql.functions.col("id")), "rn")
      .count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"$k\"" }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // a failed query must not masquerade as a fast success: failures are
    // listed explicitly in the report
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failures":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
