package graft.catalog

import java.sql.{Connection, DriverManager}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import scala.collection.mutable.ArrayBuffer

/** Source-catalog introspection — SURVEY.md §2.1 S1–S8/S11–S13 re-expressed
  * over JDBC `DatabaseMetaData` instead of MySQL-specific SHOW statements:
  *
  *  S1 table list + whitelist/blacklist  (`metadata.go:58-256`)
  *  S3 column scan                        (`metadata.go:259-292`)
  *  S4 index scan                         (`metadata.go:295-344`)
  *  S2-style bounded-concurrency fetch    (`metadata.go:133-255`, 20-way
  *                                         semaphore → fixed thread pool)
  *  S11 row count / S12 row-size estimate (`connection.go:232-256`)
  *  S13 version probe                     (`connection.go:259-266`)
  *
  * All driver-side and cold-path: the data plane never touches this — at
  * cluster scale the executors read partitioned ranges handed to them by
  * [[graft.transfer.Transfer]], and this module only answers "what tables
  * exist and how are they shaped" once per run.
  */
object Catalog {

  final case class ColumnMeta(name: String, typeName: String, nullable: Boolean,
      default: Option[String], comment: Option[String])
  final case class IndexMeta(name: String, table: String, columns: Seq[String],
      unique: Boolean)
  final case class TableMeta(name: String, columns: Seq[ColumnMeta],
      primaryKey: Seq[String], indexes: Seq[IndexMeta])

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** S1: list base tables, with app-side include/exclude filtering. */
  def listTables(url: String, include: Seq[String] = Nil,
                 exclude: Seq[String] = Nil): Seq[String] =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val out = ArrayBuffer[String]()
      while (rs.next()) out += rs.getString("TABLE_NAME")
      out.toSeq
        .filter(t => include.isEmpty || include.exists(_.equalsIgnoreCase(t)))
        .filterNot(t => exclude.exists(_.equalsIgnoreCase(t)))
        .sorted
    }

  /** S3: column metadata for one table. */
  def tableColumns(url: String, table: String): Seq[ColumnMeta] =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getColumns(null, null, table, "%")
      val out = ArrayBuffer[ColumnMeta]()
      while (rs.next()) out += ColumnMeta(
        rs.getString("COLUMN_NAME"),
        rs.getString("TYPE_NAME"),
        rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
        Option(rs.getString("COLUMN_DEF")),
        Option(rs.getString("REMARKS")).filter(_.nonEmpty))
      out.toSeq
    }

  /** PK columns in ordinal order (single-PK gate lives in the caller, like
    * the reference's `GetTablePrimaryKeys` + `:218-229`). */
  def primaryKeys(url: String, table: String): Seq[String] =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getPrimaryKeys(null, null, table)
      val out = ArrayBuffer[(Short, String)]()
      while (rs.next()) out += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
      out.sortBy(_._1).map(_._2).toSeq
    }

  /** S4: secondary indexes grouped by name, ordered by position; expression
    * indexes (null column name) skipped like `metadata.go:331-334`. */
  def tableIndexes(url: String, table: String): Seq[IndexMeta] =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getIndexInfo(null, null, table, false, false)
      val rows = ArrayBuffer[(String, Short, String, Boolean)]()
      while (rs.next()) {
        val name = rs.getString("INDEX_NAME")
        val col = rs.getString("COLUMN_NAME")
        if (name != null && col != null)
          rows += ((name, rs.getShort("ORDINAL_POSITION"), col, !rs.getBoolean("NON_UNIQUE")))
      }
      rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (name, cols) =>
        IndexMeta(name, table, cols.sortBy(_._2).map(_._3).toSeq, cols.head._4)
      }
    }

  /** S2-shaped bounded-concurrency full-catalog fetch (the reference's
    * 20-way semaphore, `metadata.go:134-135`). */
  def describeAll(url: String, concurrency: Int = 8,
                  include: Seq[String] = Nil,
                  exclude: Seq[String] = Nil): Seq[TableMeta] = {
    val tables = listTables(url, include, exclude)
    val pool = Executors.newFixedThreadPool(math.max(1, concurrency))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = tables.map { t =>
        Future(TableMeta(t, tableColumns(url, t), primaryKeys(url, t),
          tableIndexes(url, t)))
      }
      futures.map(Await.result(_, 5.minutes))
    } finally pool.shutdown()
  }

  /** K1: driver-side DDL executor (`ExecuteDDL`, postgres/connection.go:
    * 79-91) — Spark has no DataFrame surface for arbitrary DDL. */
  def executeDdl(url: String, ddl: String): Unit =
    withConnection(url)(_.createStatement().execute(ddl))

  /** K6: existence probe driving skip-vs-drop (`TableExists`,
    * postgres/connection.go:357-373; logic manager.go:1228-1278). */
  def tableExists(url: String, table: String): Boolean =
    withConnection(url) { conn =>
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      var found = false
      while (rs.next() && !found)
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      found
    }

  /** S13: version probe (< 1 s test_only path, `cmd/main.go:96-144`). */
  def version(url: String): String =
    withConnection(url) { conn =>
      val md = conn.getMetaData
      s"${md.getDatabaseProductName} ${md.getDatabaseProductVersion}"
    }

  /** S11: row count through plain JDBC (the validation-side count). */
  def rowCount(url: String, table: String): Long =
    withConnection(url) { conn =>
      val rs = conn.createStatement().executeQuery(s"SELECT COUNT(*) FROM $table")
      rs.next(); rs.getLong(1)
    }

  /** S12: row-size estimate — the reference's columns×20-bytes heuristic
    * (`connection.go:232-245`), used to derive numPartitions for transfers. */
  def estimateRowSize(columns: Seq[ColumnMeta]): Int = columns.size * 20

  /** Partition-count heuristic for a transfer: target ~128 MB per task. */
  def suggestNumPartitions(rows: Long, rowSizeBytes: Int,
                           targetBytesPerPartition: Long = 128L << 20): Int =
    math.max(1, math.min(10000,
      (rows * rowSizeBytes / math.max(1L, targetBytesPerPartition)).toInt))
}
