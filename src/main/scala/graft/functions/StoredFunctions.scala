package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's stored-function surface (SURVEY.md §2.5,
  * `scripts/mysql/create_function.sql:30-128`): three READS-SQL-DATA scalar
  * functions, each "multi-way join → CONCAT → one string". Re-expressed
  * set-oriented (the Spark-correct shape): each function body is a
  * DataFrame pipeline; the scalar form is `.first()` over the
  * parameter-filtered plan. A cursor loop *is* a scan (SURVEY §2.5), so no
  * procedural translation layer is needed for this fixture class.
  *
  * Formatting discipline: every CONCAT argument is an integer or string —
  * float-to-string formatting differs between engines, so numerics are
  * reduced to exact integers (cents / casts) before concatenation, which
  * keeps the DuckDB oracle hash-exact.
  */
object StoredFunctions {

  /** get_joined_data analogue: 5-way INNER join keyed by order, returns
    * "Order: k, Cust: name, Nation: n, Region: r, Items: i, Qty: q". */
  def orderSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = broadcast(Tables.load(s, dir, "nation"))
    val r = broadcast(Tables.load(s, dir, "region"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy($"o_orderkey", $"c_name", $"n_name", $"r_name")
      .agg(count(lit(1)).as("items"), sum($"l_quantity").cast("long").as("qty"))
      .select($"o_orderkey", concat(
        lit("Order: "), $"o_orderkey",
        lit(", Cust: "), $"c_name",
        lit(", Nation: "), $"n_name",
        lit(", Region: "), $"r_name",
        lit(", Items: "), $"items",
        lit(", Qty: "), $"qty").as("result"))
  }

  /** Scalar form (the UDF the reference emits): one string for one key. */
  def getOrderSummary(s: SparkSession, dir: String, orderKey: Long): Option[String] = {
    import s.implicits._
    orderSummary(s, dir).filter($"o_orderkey" === orderKey)
      .select($"result").collect().headOption.map(_.getString(0))
  }

  /** get_combined_data analogue: LEFT join + COALESCE + ORDER BY + LIMIT 1
    * per status — "best customer" line for an order status. */
  def statusSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders")
    val joined = o.join(c, o("o_custkey") === c("c_custkey"), "left")
      .select($"o_orderstatus".as("status"), $"o_orderkey",
        coalesce($"c_name", lit("N/A")).as("cust"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
    // top-1 per group via max_by on a (cents, -key) struct: a hash
    // aggregate with map-side partials instead of a row_number window,
    // which would sort the whole table into (here) THREE partitions —
    // the classic low-cardinality window skew. Same row wins: struct
    // comparison is lexicographic and o_orderkey makes it unique.
    joined.groupBy($"status")
      .agg(max_by(struct($"cust", $"cents"),
        struct($"cents", (-$"o_orderkey").as("nk"))).as("top"))
      .select($"status", concat(
        lit("Status: "), $"status",
        lit(", Top Cust: "), $"top.cust",
        lit(", Cents: "), $"top.cents").as("result"))
  }

  def getStatusSummary(s: SparkSession, dir: String, status: String): Option[String] = {
    import s.implicits._
    statusSummary(s, dir).filter($"status" === status)
      .select($"result").collect().headOption.map(_.getString(0))
  }

  /** get_detailed_data analogue: join with extra AND predicates + LIMIT 1:
    * first qualifying line detail per supplier. */
  def supplierDetail(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.load(s, dir, "lineitem")
    val sup = broadcast(Tables.load(s, dir, "supplier"))
    val joined = l.join(sup,
      l("l_suppkey") === sup("s_suppkey") && l("l_quantity") > 40 && l("l_discount") >= 0.05)
    // first row per supplier as a min_by hash aggregate (see statusSummary)
    joined.groupBy($"s_suppkey", $"s_name")
      .agg(min_by(struct($"l_orderkey", $"l_linenumber", $"l_quantity"),
        struct($"l_orderkey", $"l_linenumber")).as("f"))
      .select($"s_suppkey", concat(
        lit("Supp: "), $"s_name",
        lit(", Order: "), $"f.l_orderkey",
        lit(", Line: "), $"f.l_linenumber",
        lit(", Qty: "), $"f.l_quantity".cast("long")).as("result"))
  }

  def getSupplierDetail(s: SparkSession, dir: String, suppKey: Long): Option[String] = {
    import s.implicits._
    supplierDetail(s, dir).filter($"s_suppkey" === suppKey)
      .select($"result").collect().headOption.map(_.getString(0))
  }
}
