package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BpeProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import s.implicits._
    val wf = graft.sources.Tables.load(s, "/root/testdata/sf0.001", "documents")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("c"))
    val n = if (args.nonEmpty) args(0).toInt else 10
    val t0 = System.nanoTime()
    val rows = graft.ops.TextOps.bpeTrainRows(s, wf, n)
    println(s"TRAINED ${rows.size} merges in ${(System.nanoTime()-t0)/1e9}s")
    rows.foreach(r => println("ROW " + r.toSeq.mkString(",")))
    s.stop()
  }
}
