package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.config.GraftConfig
import graft.pipeline.Pipeline
import graft.transfer.Transfer.ParquetDir
import java.nio.file.Files

/** Config-matrix drive of the migration flow — the Spark analogue of the
  * reference's integration matrix (`run_integration_tests.sh`, 32 cases:
  * stage subsets, include/exclude lists, truncate/validate toggles,
  * idempotent re-runs). Each case goes YAML text → GraftConfig →
  * Pipeline.run, i.e. exactly what `graft.Migrate` drives after its
  * connectivity probe. */
class MigrateMatrixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("migrate-matrix")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def cfgOf(yaml: String): GraftConfig = GraftConfig.parseString(yaml)

  test("case: YAML → pipeline config round-trip (lists, toggles, stages)") {
    val cfg = cfgOf(
      """source_url: /src
        |target_url: /dst
        |use_table_list: [region, nation]
        |exclude_table_list:
        |  - nation
        |truncate_before_sync: true
        |validate_data: false
        |concurrency: 7
        |stages: [schema, data]
        |""".stripMargin)
    val p = cfg.toPipelineConfig
    assert(p.includeTables == Seq("region", "nation"))
    assert(p.excludeTables == Seq("nation"))
    assert(p.truncateBeforeSync && !p.validateData && p.concurrency == 7)
    assert(p.stages == Seq("schema", "data"))
    assert(Pipeline.tableList(p, graft.sources.Tables.all) == Seq("region"))
  }

  test("case: pipeline into a csv: target validates checksums end-to-end") {
    import graft.transfer.Transfer.CsvDir
    val dst = CsvDir(Files.createTempDirectory("mm_csv").toString)
    val cfg = cfgOf(
      """use_table_list: [region, nation]
        |truncate_before_sync: true
        |validate_data: true
        |""".stripMargin).toPipelineConfig
    val r = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    assert(r.results.length == 2)
    assert(r.results.forall(_.checksumMatch), r.results.mkString(", "))
    assert(r.inconsistent.isEmpty)
  }

  test("case 31/32: truncate re-run is idempotent") {
    val dst = ParquetDir(Files.createTempDirectory("mm_idem").toString)
    val cfg = cfgOf(
      """use_table_list: [region, nation]
        |truncate_before_sync: true
        |""".stripMargin).toPipelineConfig
    val r1 = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    val r2 = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    assert(r1.inconsistent.isEmpty && r2.inconsistent.isEmpty)
    assert(r1.results.map(r => (r.table, r.dstRows)).sorted ==
      r2.results.map(r => (r.table, r.dstRows)).sorted)
  }

  test("case 19/20: append without truncate doubles rows and is flagged") {
    val dst = ParquetDir(Files.createTempDirectory("mm_append").toString)
    val cfg = cfgOf(
      """use_table_list: [region]
        |truncate_before_sync: false
        |""".stripMargin).toPipelineConfig.copy(stopOnError = false)
    val r1 = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    assert(r1.inconsistent.isEmpty && r1.results.head.dstRows == 5)
    val r2 = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    // second append: 10 rows vs 5 source rows → the validation gate fires
    assert(r2.results.head.dstRows == 10)
    assert(r2.inconsistent.map(_.table) == Seq("region"))
  }

  test("case 4-10: stage subset skips validation") {
    val dst = ParquetDir(Files.createTempDirectory("mm_stages").toString)
    val cfg = cfgOf(
      """use_table_list: [region]
        |stages: [data]
        |""".stripMargin).toPipelineConfig
    val report = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    assert(report.stats.map(_.stage) == Seq("data"))
    assert(report.results.head.dstRows == 5)
  }

  test("case 17/18: validate_data=false skips checksum but keeps counts") {
    val dst = ParquetDir(Files.createTempDirectory("mm_noval").toString)
    val cfg = cfgOf(
      """use_table_list: [nation]
        |validate_data: false
        |truncate_before_sync: true
        |""".stripMargin).toPipelineConfig
    val report = Pipeline.run(spark, ParquetDir(sf), dst, cfg)
    assert(report.results.head.srcRows == 25 && report.results.head.dstRows == 25)
    assert(report.inconsistent.isEmpty)
  }
}
