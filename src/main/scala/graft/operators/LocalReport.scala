package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** The tail of the persist → materialize → unpersist idiom (q106/q117/
  * q123 discipline): a bounded report is collected while its expensive
  * input is still cached, the cache is released, and the caller returns
  * a 1-partition LOCAL frame — so the returned plan cannot re-trigger
  * the distributed computation after the cache is gone.
  *
  * One audited code path instead of ~20 hand-rolled
  * `createDataFrame(parallelize(rows, 1), StructType(...))` copies: a
  * schema/row mismatch fails here, in one place, not as a downstream
  * ClassCastException per site. */
object LocalReport {
  def frame(s: SparkSession, rows: Seq[Row],
            fields: (String, DataType)*): DataFrame =
    s.createDataFrame(s.sparkContext.parallelize(rows, 1),
      StructType(fields.map { case (n, t) => StructField(n, t) }))
}
