package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.CorpusOps

/** Invariant checks for the corpus-level operators (SURVEY.md §2.7
  * X29-X33) beyond the driver's DuckDB hash gate: the salted rewrite must
  * be bit-identical to the direct plan, the HOF longest-run must agree
  * with the explode-based word count, and the cleaning pass must PARTITION
  * the corpus (reasons exclusive + exhaustive).
  */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("corpus-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted aggregation is bit-identical to the direct groupBy") {
    import spark.implicits._
    val direct = graft.sources.Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
      .orderBy($"l_returnflag")
      .collect().toSeq
    val salted = CorpusOps.q72SaltedAgg(spark, sf).collect().toSeq
    assert(salted == direct)
  }

  test("HOF longest-run top word equals the explode-based word count") {
    import spark.implicits._
    val hof = CorpusOps.q70Repetition(spark, sf)
      .select($"doc_id", $"top_word", $"top_word_n")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val exploded = graft.sources.Tables.load(spark, sf, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"c".desc, $"w")))
      .filter($"rk" === 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(hof.nonEmpty)
    hof.foreach { case (id, got) => assert(got == exploded(id), s"doc $id") }
  }

  test("repetition metrics bound their fractions") {
    val rows = CorpusOps.q70Repetition(spark, sf).collect()
    rows.foreach { r =>
      val f = r.getAs[Double]("top_word_frac")
      assert(f > 0.0 && f <= 1.0)
      assert(r.getAs[Long]("dup_2gram_n") >= 0L)
      assert(r.getAs[Long]("top_word_n") <= r.getAs[Long]("n_words"))
    }
  }

  test("corpus-clean reasons partition the corpus exactly") {
    import spark.implicits._
    val perLang = CorpusOps.q74CorpusClean(spark, sf)
      .groupBy($"lang").agg(sum($"n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == truth)
  }

  test("df-quality: every word's df >= 1 so sum_df >= n_distinct_words") {
    val rows = CorpusOps.q71DfQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_distinct_words")
      assert(r.getAs[Long]("sum_df") >= nd)
      assert(r.getAs[Long]("rare_words") <= nd)
    }
  }

  test("vocab top-20 is ordered by frequency with word tiebreak") {
    val rows = CorpusOps.q73VocabTopk(spark, sf).collect()
    assert(rows.length == 20)
    val pairs = rows.map(r => (r.getAs[Long]("n_occurrences"), r.getAs[String]("w")))
    val sorted = pairs.sortBy { case (n, w) => (-n, w) }
    assert(pairs.toSeq == sorted.toSeq)
  }
}
