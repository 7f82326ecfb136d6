package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Catalog
import graft.config.GraftConfig
import java.sql.DriverManager
import java.nio.file.Files

class CatalogConfigSpec extends AnyFunSuite {

  private lazy val url: String = {
    val db = Files.createTempDirectory("catdb").toString + "/cat"
    val u = s"jdbc:derby:$db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE users (id INT NOT NULL, name VARCHAR(50), age INT DEFAULT 18, PRIMARY KEY (id))")
    st.execute("CREATE TABLE orders (oid INT NOT NULL, uid INT, amount DECIMAL(10,2), PRIMARY KEY (oid))")
    st.execute("CREATE INDEX idx_uid ON orders (uid)")
    st.execute("CREATE UNIQUE INDEX uq_name ON users (name)")
    st.execute("CREATE TABLE scratch (x INT)")
    conn.close()
    u
  }

  test("S1 table list with include/exclude filters") {
    assert(Catalog.listTables(url) == Seq("ORDERS", "SCRATCH", "USERS"))
    assert(Catalog.listTables(url, include = Seq("users", "orders")) == Seq("ORDERS", "USERS"))
    assert(Catalog.listTables(url, exclude = Seq("scratch")) == Seq("ORDERS", "USERS"))
  }

  test("S3 columns: types, nullability, defaults") {
    val cols = Catalog.tableColumns(url, "USERS")
    assert(cols.map(_.name) == Seq("ID", "NAME", "AGE"))
    assert(!cols.head.nullable && cols(1).nullable)
    assert(cols(2).default.exists(_.contains("18")))
    assert(cols(2).typeName == "INTEGER")
  }

  test("S4 indexes grouped and ordered; PK discovered") {
    assert(Catalog.primaryKeys(url, "ORDERS") == Seq("OID"))
    val idx = Catalog.tableIndexes(url, "ORDERS")
    assert(idx.exists(i => i.name == "IDX_UID" && i.columns == Seq("UID") && !i.unique))
    val uidx = Catalog.tableIndexes(url, "USERS")
    assert(uidx.exists(i => i.name == "UQ_NAME" && i.unique))
  }

  test("S2 bounded-concurrency describeAll") {
    val metas = Catalog.describeAll(url, concurrency = 4, exclude = Seq("scratch"))
    assert(metas.map(_.name) == Seq("ORDERS", "USERS"))
    assert(metas.head.columns.nonEmpty && metas.head.primaryKey == Seq("OID"))
  }

  test("S13 version probe + S11 row count + S12 size estimate") {
    assert(Catalog.version(url).startsWith("Apache Derby"))
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("INSERT INTO scratch VALUES (1), (2), (3)")
    conn.close()
    assert(Catalog.rowCount(url, "scratch") == 3)
    val est = Catalog.estimateRowSize(Catalog.tableColumns(url, "USERS"))
    assert(est == 60) // 3 cols x 20 bytes (reference heuristic)
    assert(Catalog.suggestNumPartitions(1000000, 200) == 1)
    assert(Catalog.suggestNumPartitions(10000000000L, 200) > 1)
  }

  test("config: parse, defaults, clamping, lists") {
    val cfg = GraftConfig.parseString(
      """# migration config
        |source:
        |  url: jdbc:derby:memory:src
        |target:
        |  url: jdbc:derby:memory:dst
        |concurrency: 99
        |batch_insert_size: 500
        |truncate_before_sync: true
        |lowercase_columns: yes
        |use_table_list:
        |  - customer
        |  - orders
        |exclude_table_list: [scratch, tmp]
        |""".stripMargin)
    assert(cfg.sourceUrl == "jdbc:derby:memory:src")
    assert(cfg.targetUrl == "jdbc:derby:memory:dst")
    assert(cfg.concurrency == 50)            // clamped (README.md:85)
    assert(cfg.batchInsertSize == 500)
    assert(cfg.truncateBeforeSync && cfg.lowercaseColumns)
    assert(cfg.useTableList == Seq("customer", "orders"))
    assert(cfg.excludeTableList == Seq("scratch", "tmp"))
    assert(cfg.validateData)                 // default
    val p = cfg.toPipelineConfig
    assert(p.includeTables == Seq("customer", "orders") && p.truncateBeforeSync)
  }

  test("config: maxRowsPerBatch >= batchInsertSize invariant") {
    val cfg = GraftConfig.parseString(
      "batch_insert_size: 9000\nmax_rows_per_batch: 100\n")
    assert(cfg.maxRowsPerBatch == 9000)
  }
}
