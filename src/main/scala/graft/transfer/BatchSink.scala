package graft.transfer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}

/** Custom bulk-load sink — the reference's K4 COPY path
  * (`BatchInsertDataWithTransactionAndGetLastValue`,
  * postgres/connection.go:447-593) as an explicit `foreachPartition`
  * writer: one connection + one transaction per partition, batched
  * prepared statements, per-batch flush at `batchSize`, single commit.
  *
  * Spark's built-in JDBC writer already batches; this sink exists for the
  * cases it can't express: a true PostgreSQL COPY protocol stream (swap
  * `flushBatch` for `CopyManager.copyIn` when the PG driver is present —
  * not in this container, so the portable addBatch body stands in), custom
  * conflict handling, or per-partition transactional side effects. Tested
  * against Derby.
  *
  * Scale notes: connections scale with partitions, not rows; no driver-side
  * row handling at all. Partition count should be pre-sized via
  * [[graft.catalog.Catalog.suggestNumPartitions]] so each transaction stays
  * within WAL/undo comfort (the per-batch-transaction bound the reference
  * gets from max_rows_per_batch).
  */
object BatchSink {

  def write(df: DataFrame, url: String, table: String, batchSize: Int = 1000): Unit = {
    // PostgreSQL targets with the PG driver present take the COPY stream
    // path (true K4 parity); everything else uses the portable batch body.
    // CopyEncoder re-checks driver presence ON THE EXECUTOR and falls back
    // to writePartition there, so a driver-only PG jar can't strand tasks.
    if (url.startsWith("jdbc:postgresql") && CopyEncoder.copySupported()) {
      CopyEncoder.write(df, url, table, batchRows = math.max(batchSize, 1))
      return
    }
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      writePartition(rows, schema, url, table, batchSize)
    }
  }

  /** The portable per-partition body: one connection, one transaction,
    * batched prepared statements. Callable from executors (CopyEncoder's
    * fallback) as well as from [[write]]. */
  def writePartition(rows: Iterator[Row], schema: StructType, url: String,
                     table: String, batchSize: Int): Unit =
    if (rows.nonEmpty) {
      val cols = schema.fieldNames
      val placeholders = cols.map(_ => "?").mkString(", ")
      val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders)"
      val conn: Connection = DriverManager.getConnection(url)
      conn.setAutoCommit(false)  // one transaction per partition
      try {
        val ps = conn.prepareStatement(insertSql)
        var pending = 0
        rows.foreach { row =>
          bindRow(ps, schema, row)
          ps.addBatch()
          pending += 1
          if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
        }
        if (pending > 0) ps.executeBatch()
        conn.commit()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case r: Throwable => e.addSuppressed(r) }
          throw e
      } finally conn.close()
    }

  private def bindRow(ps: PreparedStatement, schema: StructType, row: Row): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val idx = i + 1
      if (row.isNullAt(i)) ps.setObject(idx, null)
      else f.dataType match {
        case LongType      => ps.setLong(idx, row.getLong(i))
        case IntegerType   => ps.setInt(idx, row.getInt(i))
        case ShortType     => ps.setShort(idx, row.getShort(i))
        case DoubleType    => ps.setDouble(idx, row.getDouble(i))
        case FloatType     => ps.setFloat(idx, row.getFloat(i))
        case BooleanType   => ps.setBoolean(idx, row.getBoolean(i))
        case StringType    => ps.setString(idx, row.getString(i))
        case BinaryType    => ps.setBytes(idx, row.getAs[Array[Byte]](i))
        case _: DecimalType => ps.setBigDecimal(idx, row.getDecimal(i))
        case TimestampType | TimestampNTZType =>
          ps.setTimestamp(idx, row.getAs[Timestamp](i))
        case DateType      => ps.setDate(idx, row.getAs[java.sql.Date](i))
        case _             => ps.setObject(idx, row.get(i))
      }
    }
}
