package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects all custom functions into a fresh session") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT graft_fingerprint('ab') AS fp,
          |       inet_aton('1.2.3.4') AS ip,
          |       inet_ntoa(16909060) AS ips,
          |       graft_point_decode(NULL) AS pt""".stripMargin).collect().head
      assert(row.getLong(0) == (97L * 31 + 98) % 1000000007L)
      assert(row.getLong(1) == 16909060L)
      assert(row.getString(2) == "1.2.3.4")
      assert(row.isNullAt(3))
    } finally spark.stop()
  }
}
