package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet-backed table catalog over the driver corpus (TESTDATA.md).
  *
  * Mirrors the reference's catalog scans (SURVEY.md §2.1 S1–S8:
  * `internal/mysql/metadata.go:58-256`) re-expressed Spark-first: the
  * "catalog" is a directory of parquet tables; schema comes from parquet
  * footers (no regex DDL parsing needed), and whitelist/blacklist filtering
  * (`metadata.go:89-122`) is a driver-side Seq filter.
  *
  * Scale notes: `spark.read.parquet` yields a splittable, column-pruned,
  * predicate-pushdown scan — at 100 TB each table is read by thousands of
  * tasks sized by `spark.sql.files.maxPartitionBytes`; nothing here is
  * driver-bound.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables — always broadcast-join these. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    // for; sessions set spark.sql.legacy.parquet.nanosAsLong=true and we
    // rebuild a microsecond TIMESTAMP_NTZ here (floor-div like DuckDB's
    // ns→µs truncation, so oracles agree).
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case None => df
    }
  }

  /** Register every table as a temp view (idempotent), applying optional
    * include/exclude lists like the reference's use_table_list /
    * exclude_table_list (`metadata.go:89-122`). */
  def registerAll(
      spark: SparkSession,
      dir: String,
      include: Seq[String] = Nil,
      exclude: Seq[String] = Nil): Unit = {
    val names = all
      .filter(n => include.isEmpty || include.contains(n))
      .filterNot(exclude.contains)
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
  }
}
