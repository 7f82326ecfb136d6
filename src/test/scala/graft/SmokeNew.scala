package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Throwaway smoke runner for newly-added queries: dumps just the named
  * queries to parquet so scripts/check.py can oracle-compare them without
  * a full Verify pass. Test scope only — not part of the driver contract. */
object SmokeNew {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    for (name <- args.drop(2)) {
      val t0 = System.nanoTime()
      SparkEntry.queries.get(name) match {
        case None => println(s"[smoke] $name FAILED: unknown query name")
        case Some(fn) =>
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            println(f"[smoke] $name ok ${(System.nanoTime() - t0) / 1e9}%.2fs")
          } catch { case e: Throwable =>
            println(s"[smoke] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
