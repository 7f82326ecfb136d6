package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.Path

/** Shared-scratch allocation for operators that round-trip data through a
  * filesystem (format endpoints, layout/partition audits, IVM state,
  * compaction, transfer targets). The root comes from the
  * `graft.scratch.dir` Spark conf and defaults to the driver's
  * java.io.tmpdir — fine in local mode, but ON A CLUSTER IT MUST POINT AT
  * SHARED STORAGE (HDFS/S3/NFS): executors write task files under the
  * returned path, so a driver-local default would only ever work
  * single-node (ADVICE r9). Any URI the session's Hadoop conf can resolve
  * works — allocation and recursive cleanup go through the Hadoop
  * FileSystem API, never java.nio, so `hdfs://` / `s3a://` roots behave
  * exactly like local ones. */
object Scratch {

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Allocate a fresh scratch directory under the configured root and
    * return its fully-qualified URI string. Pair with [[delete]]. */
  def alloc(s: SparkSession, prefix: String): String = {
    val root = new Path(s.conf.get("graft.scratch.dir",
      System.getProperty("java.io.tmpdir")))
    val dir = new Path(root, s"${prefix}_${java.util.UUID.randomUUID}")
    fs(s, dir).mkdirs(dir)
    fs(s, dir).makeQualified(dir).toString
  }

  /** Recursively delete a directory allocated by [[alloc]]. */
  def delete(s: SparkSession, path: String): Unit = {
    val p = new Path(path)
    fs(s, p).delete(p, true)
    ()
  }
}
