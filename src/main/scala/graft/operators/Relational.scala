package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Core relational operator surface, executed (not just rewritten — the
  * capability upgrade over the reference, SURVEY.md §2.6 note + §7 step 4).
  * Every query has a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Hash-stability convention: monetary doubles are reduced per-row to exact
  * integer cents (`round(x*100)::bigint`) before aggregation, so sums are
  * order-independent and bit-identical across Spark and DuckDB regardless of
  * partial-aggregation order. Every query ends in a deterministic total
  * ORDER BY (unique tiebreak column included).
  *
  * Scale notes: aggregations are partial (map-side combine) by construction
  * via groupBy/agg; dimension joins broadcast (region/nation/supplier);
  * fact-fact joins shuffle on the join key only after filters are pushed to
  * the parquet scan.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact integer cents from a 2-decimal double — order-independent sums
    * (the shared quantizer; see [[graft.functions.Exact]]). */
  private def cents(c: Column): Column = graft.functions.Exact.cents(c)

  /** TPC-H Q1-style pricing summary: scan → filter (pushed to parquet) →
    * partial agg → final agg. Reference analogue: the aggregate surface of
    * rewritten views (sync_viewddl.go:359-370 SUM handling). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("long").as("sum_qty"),
        sum(cents($"l_extendedprice")).as("sum_base_cents"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("sum_disc_cents"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"))).as("sum_charge_cents"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection + filter, verifying parquet predicate pushdown / pruning. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_quantity" >= 49 && $"l_discount" >= 0.05)
      .select(
        $"l_orderkey", $"l_linenumber",
        $"l_quantity".cast("long").as("qty"),
        cents($"l_extendedprice" * (lit(1) - $"l_discount")).as("net_cents"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Star-schema join: fact orders → customer → broadcast nation/region.
    * Catalyst broadcasts the dims; one shuffle on o_custkey/c_custkey. */
  def q03JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents($"o_totalprice")).as("revenue_cents"))
      .orderBy($"r_name", $"n_name")
  }

  /** Left outer join preserving customers with no orders. */
  def q04LeftJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(
        count($"o_orderkey").as("n_orders"),
        coalesce(sum(cents($"o_totalprice")), lit(0L)).as("spend_cents"))
      .orderBy($"c_custkey")
  }

  /** Semi/anti join (EXISTS / NOT EXISTS) — customers tagged by whether
    * they have any order. leftsemi/leftanti avoid materializing the match. */
  def q05SemiAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select($"o_custkey")
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", lit("has_orders").as("tag"))
    val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", lit("no_orders").as("tag"))
    withOrders.unionAll(without).orderBy($"c_custkey")
  }

  /** Window functions: top-2 orders per customer by price (row_number),
    * plus running total — single shuffle on the partition key. */
  def q06WindowTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("run_cents",
        sum(cents($"o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"rn" <= 2)
      .select($"o_custkey", $"rn", $"o_orderkey",
        cents($"o_totalprice").as("price_cents"), $"run_cents")
      .orderBy($"o_custkey", $"rn")
  }

  /** GROUP_CONCAT semantics (sync_viewddl.go:177-193) with deterministic
    * ORDER BY, Spark-first: sorted collect_list + array_join. */
  def q07GroupConcat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    c.filter($"c_acctbal" > 9000)
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy($"n_name")
      .agg(array_join(array_sort(collect_list($"c_name")), ",").as("members"),
        count(lit(1)).as("n_members"))
      .orderBy($"n_name")
  }

  /** MySQL `LIMIT offset, n` semantics (sync_viewddl.go:26,217) →
    * Spark offset().limit() over a total order. */
  def q08LimitOffset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", cents($"o_totalprice").as("price_cents"))
      .orderBy($"price_cents".desc, $"o_orderkey")
      .offset(10)
      .limit(20)
  }

  /** Set operations: nations having customers ∩/∖ nations having suppliers. */
  def q09SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custN = t(s, dir, "customer").select($"c_nationkey".as("nkey")).distinct()
    val suppN = t(s, dir, "supplier").select($"s_nationkey".as("nkey")).distinct()
    custN.intersect(suppN).withColumn("tag", lit("both"))
      .unionAll(custN.except(suppN).withColumn("tag", lit("cust_only")))
      .select($"tag", $"nkey")
      .orderBy($"tag", $"nkey")
  }

  /** ROLLUP subtotal lattice in one pass. Subtotal rows are rendered via
    * `coalesce(col, 'ALL')` — a presentation convention that assumes the
    * group columns never contain NULL or the literal 'ALL' (true for
    * o_orderstatus/year here); a domain where they could needs the
    * `grouping_id()` disambiguation q66 uses. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(cents($"o_totalprice")).as("cents"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"cents")
      .orderBy($"status", $"priority")
  }

  /** Conditional / null surface: IF, IFNULL, CASE, NULLIF, STRCMP
    * (sync_viewddl.go:14-22,171-199,342-347) as native Spark expressions. */
  def q11Conditional(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select(
        $"o_orderkey",
        when($"o_totalprice" > 200000, "big").otherwise("small").as("size_tag"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status2"),
        when($"o_orderstatus" === "F", 0)
          .when($"o_orderstatus" < "F", -1).otherwise(1).as("strcmp_f"))
      .orderBy($"o_orderkey")
  }

  /** String-function surface (§2.4 string table): concat, substring_index,
    * locate, lpad, repeat, reverse, left/right, replace, upper/lower. */
  def q12Strings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey",
        concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
        substring_index($"p_name", " ", 1).as("first_word"),
        instr($"p_name", "widget").cast("long").as("widget_pos"),
        lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
        reverse($"p_brand").as("brand_rev"),
        substring($"p_name", 1, 3).as("left3"),
        regexp_replace($"p_name", "[aeiou]", "").as("no_vowels"),
        upper($"p_type").as("type_upper"),
        length($"p_name").cast("long").as("name_len"))
      .orderBy($"p_partkey")
  }

  /** Date/time surface (§2.4 date table): year/month/day/quarter/week,
    * dayofweek (MySQL 1=Sunday), datediff, date_add, last_day, epoch. */
  def q13Dates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        quarter($"o_orderdate").cast("long").as("q"),
        month($"o_orderdate").cast("long").as("m"),
        dayofmonth($"o_orderdate").cast("long").as("d"),
        dayofweek($"o_orderdate").cast("long").as("dow"),
        weekofyear($"o_orderdate").cast("long").as("woy"),
        datediff(lit("1998-01-01").cast("date"), $"o_orderdate".cast("date"))
          .cast("long").as("days_to_98"),
        date_add($"o_orderdate".cast("date"), 90).as("plus90"),
        last_day($"o_orderdate".cast("date")).as("eom"),
        unix_micros($"o_orderdate".cast("timestamp")).as("epoch_us"))
      .orderBy($"o_orderkey")
  }

  /** JSON surface (§2.4 JSON table): extract from the events.props JSON
    * column and aggregate — get_json_object ≈ JSON_EXTRACT/JSON_VALUE. */
  def q14Json(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Lag/lead event-stream analytics: inter-arrival seconds per user. */
  def q15EventLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .filter($"prev_ts".isNotNull)
      .select($"user_id", $"event_id",
        (unix_micros($"ts".cast("timestamp")) -
          unix_micros($"prev_ts".cast("timestamp"))).as("gap_us"))
      .orderBy($"user_id", $"event_id")
  }

  /** Tumbling-window aggregation (batch form of the streaming pipeline in
    * graft.streaming): hourly event counts per type via date_trunc. */
  def q16EventWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(cents($"value")).as("value_cents"))
      .orderBy($"hour", $"event_type")
  }

  /** Multi-way join like the reference's stored-function fixtures
    * (create_function.sql:46-88, 5-way joins + ORDER BY + LIMIT):
    * lineitem → orders → customer → nation → region, top revenue lines. */
  def q17MultiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name")
      .agg(
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("revenue_cents"),
        countDistinct($"o_orderkey").as("n_orders"),
        countDistinct($"c_custkey").as("n_customers"))
      .orderBy($"revenue_cents".desc, $"r_name")
  }

  /** Generator/UDTF surface: explode a per-order generated month sequence
    * (lateral-view shape). Narrow explode — no shuffle until the agg. */
  def q45Generator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .filter($"o_orderkey" % 500 === 0)
      .select($"o_orderkey",
        explode(expr(
          "sequence(CAST(o_orderdate AS DATE), add_months(CAST(o_orderdate AS DATE), 3), INTERVAL 1 MONTH)"))
          .as("month_date"))
      .select($"o_orderkey", $"month_date")
      .orderBy($"o_orderkey", $"month_date")
  }

  /** Pivot: order counts + revenue by priority × status — one shuffle,
    * pivot columns resolved statically (explicit value list, which is the
    * scale-safe form: no extra pass to discover values). */
  def q46Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select($"o_orderpriority",
        $"F".as("n_f"), $"O".as("n_o"), $"P".as("n_p"))
      .orderBy($"o_orderpriority")
  }

  /** CUBE lattice over status × priority (all 4 grouping combinations). */
  def q47Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(cents($"o_totalprice")).as("cents"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"cents")
      .orderBy($"status", $"priority")
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube) with
    * grouping_id disambiguation — ((status), (priority), ()) computes two
    * independent dimension totals and the grand total in ONE pass over the
    * fact table (one shuffle, expanded map-side), vs three separate
    * aggregations. */
  def q66GroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin)
  }

  /** Correlated scalar subqueries — written in the subquery form users
    * write, decorrelated by Catalyst into aggregate+join (no per-row
    * execution; `.explain` shows one join, not N subplans). The capability
    * upgrade over the reference, which could only pass such text through
    * untouched. */
  def q67CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
        |   FROM orders o WHERE o.o_custkey = c.c_custkey
        |     AND o.o_orderstatus = 'F') AS f_cents
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Custom typed Aggregator (UDAF tier): exact top-3 orders per status
    * via a bounded-buffer heap aggregate — O(k) state per group map-side
    * vs the window form's full per-group sort. Output exploded to rows so
    * the oracle (a plain row_number window) hash-compares. */
  def q69TopkAggregator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topk = udaf(new graft.functions.TopKAggregator(3))
    t(s, dir, "orders")
      .select($"o_orderstatus", $"o_orderkey", cents($"o_totalprice").as("c"))
      .groupBy($"o_orderstatus")
      .agg(topk($"o_orderkey", $"c").as("top"))
      .select($"o_orderstatus", posexplode($"top"))
      .select($"o_orderstatus", ($"pos" + 1).cast("long").as("rk"),
        $"col._1".as("o_orderkey"), $"col._2".as("price_cents"))
      .orderBy($"o_orderstatus", $"rk")
  }

  /** LATERAL correlated subquery with per-row LIMIT — top-2 orders per
    * customer in the lateral form (the other spelling of q06's window
    * top-k; Catalyst plans it via DomainJoin decorrelation rather than N
    * subplans). Inner-join semantics: order-less customers drop out. */
  def q68LateralTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.price_cents
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |         FROM orders WHERE o_custkey = c.c_custkey
        |         ORDER BY price_cents DESC, o_orderkey LIMIT 2) o
        |ORDER BY c.c_custkey, o.price_cents DESC, o.o_orderkey""".stripMargin)
  }

  /** Advanced window ranks: rank/dense_rank/ntile/percent_rank/cume_dist/
    * lead over customer spend — exact rational arithmetic, portable. */
  def q48WindowRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"spend_cents".desc, $"c_custkey")
    t(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment", cents($"c_acctbal").as("spend_cents"))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("drk", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("next_cents", lead($"spend_cents", 1).over(w))
      .orderBy($"c_mktsegment", $"rk", $"c_custkey")
  }

  /** Count validation (reference P3, sync_data.go:313-356): per-table row
    * counts — the migration engine's correctness gate, as one query.
    * Each table is a plain `df.count()` (Spark's count-star fast path reads
    * only parquet row-group metadata, no column data) and the tables run
    * from concurrent driver futures — exactly how the validation stage
    * counts both sides of a live migration. */
  def q18CountValidation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val counts = Await.result(
      Future.sequence(Tables.all.map(name =>
        Future(name -> t(s, dir, name).count()))),
      Duration.Inf)
    counts.toDF("table_name", "n_rows").orderBy($"table_name")
  }

  /** Scalar math/cast surface: MOD, SIGNED/UNSIGNED casts, abs/floor/ceil/
    * pow/sqrt (§2.4 cast + math rewrites) with exact integer outputs. */
  def q19MathCasts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 997 === 0)
      .select(
        $"l_orderkey", $"l_linenumber",
        ($"l_orderkey" % 7).as("mod7"),
        $"l_quantity".cast("long").as("qty_signed"),
        floor($"l_extendedprice").cast("long").as("price_floor"),
        ceil($"l_discount" * 100).cast("long").as("disc_pct_ceil"),
        abs($"l_quantity" - 25).cast("long").as("abs_from_25"),
        // exact integral multiply, NOT pow(): libm pow can return
        // 2024.9999…, and DuckDB rounds double→int casts while Spark
        // truncates — only integral doubles cast identically.
        ($"l_quantity" * $"l_quantity").cast("long").as("qty_sq"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Exact order-statistics: continuous-interpolation percentiles over
    * integer cents (both engines use the (n-1)·p rank definition, and the
    * interpolation arithmetic on exact integers is deterministic). Exact
    * percentile is a full-sort-per-group op — at 100 TB you'd swap in
    * approx_percentile (t-digest) and lose the oracle; this is the exact
    * baseline. */
  def q43Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderstatus", cents($"o_totalprice").as("c"))
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(c, 0.5)").as("p50"),
        expr("percentile(c, 0.9)").as("p90"),
        min($"c").as("min_cents"),
        max($"c").as("max_cents"))
      .orderBy($"o_orderstatus")
  }

  /** Correlated-subquery shape: orders above 1.5× their customer's average —
    * decorrelated into a join against a pre-aggregate (what Catalyst does
    * too). The predicate `price > 1.5 * sum/n` is evaluated as the exact
    * integer inequality `price*n*2 > sum*3` so the comparison never depends
    * on float accumulation order. */
  def q20AboveAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", cents($"o_totalprice").as("price_cents"))
    val ag = o.groupBy($"o_custkey".as("k"))
      .agg(sum($"price_cents").as("sum_cents"), count(lit(1)).as("n"))
    o.join(ag, o("o_custkey") === ag("k"))
      .filter($"price_cents" * $"n" * 2 > $"sum_cents" * 3)
      .select($"o_orderkey", $"o_custkey", $"price_cents")
      .orderBy($"o_orderkey")
  }

  /** Approximate aggregates — the documented 100 TB swap for the exact
    * order-statistics ops (q43's exact percentile, q18's exact counts):
    * HyperLogLog++ distinct counting and t-digest percentiles run in one
    * pass with fixed-size sketches (mergeable map-side, no sort, no
    * full-cardinality state). Raw sketch outputs are engine-specific, so
    * the hashable surface is a TOLERANCE verdict instead (ADVICE r5): each
    * engine computes its own approx AND its own exact value and asserts
    * |approx − exact| ≤ 5% — the exact values hash cross-engine, and the
    * booleans hash because both engines' sketches sit far inside the band
    * (HLL rsd 1% → 5σ; t-digest at the median ≪1%). The median is emitted
    * ×2 so even-count interpolation ((a+b)/2) stays integral. */
  def q60ApproxStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderstatus", $"o_custkey", cents($"o_totalprice").as("c"))
      .groupBy($"o_orderstatus")
      .agg(
        approx_count_distinct($"o_custkey", 0.01).as("ac"),
        countDistinct($"o_custkey").as("ec"),
        percentile_approx($"c", lit(0.5), lit(10000)).as("am"),
        expr("CAST(2 * percentile(c, 0.5D) AS BIGINT)").as("em2"))
      .select($"o_orderstatus",
        $"ec".as("exact_custs"),
        $"em2".as("exact_median_x2"),
        (abs($"ac" - $"ec") * 20 <= $"ec").as("custs_ok"),
        (abs($"am" * 2 - $"em2") * 20 <= $"em2").as("median_ok"))
      .orderBy($"o_orderstatus")
  }

  /** Range join: orders bucketed into price bands via an interval-overlap
    * predicate against a small band table. The band side is broadcast, so
    * the plan is a BroadcastNestedLoopJoin — a single pass over the fact
    * table with no shuffle, the right plan whenever the range side fits in
    * memory (here: always; band tables are inherently tiny). Were the
    * bands uniform-width (they are), the scalable equivalent for a
    * non-broadcastable band table is the equi-join on
    * floor(price / width) — documented, not needed at any realistic band
    * cardinality. */
  /** X250 — skyline / Pareto-front query (min price, min size over
    * parts): the multi-criteria operator relational engines bolt on as
    * SKYLINE OF — a part is on the front iff nothing is ≤ in BOTH
    * dimensions with at least one strict. The naive form is an O(n²)
    * NOT-EXISTS self-join (the oracle runs exactly that); the engine
    * plan exploits the small discrete size domain: per-size min price
    * (ONE combinable aggregate), a 50-row running-min staircase, and a
    * broadcast join back — a part survives iff it ACHIEVES its size's
    * min price and that min strictly undercuts every smaller size's
    * (price-tied parts at a front point all survive: no strict
    * dominance). For continuous/high-d criteria the same shape coarsens
    * to grid cells (cell mins prune candidates, the exact pass runs on
    * the surviving sliver).
    *
    * Scale: the corpus collapses in the per-size aggregate; the
    * staircase window runs on the 50-row frame (q257's bounded-frame
    * rule); the final pass is scan + broadcast filter. No self-join. */
  /** X258 — bitmap-index build + predicate algebra: the other classic
    * OLAP index (X43 builds the inverted index for text; this is its
    * low-cardinality-column sibling). Per value of l_returnflag,
    * l_linestatus and a derived quantity band, a bitmap of row positions
    * packed into 32-bit words keyed by word index — only nonzero words
    * stored, the roaring-style sparse form. Predicates are then answered
    * ENTIRELY inside the index: AND = word-join + `&`, OR = full-outer
    * word-join + `|`, NOT = `& ~` against the value's own superset
    * bitmap; cardinality = Σ bit_count. The audit runs three predicate
    * shapes (conjunction, IN-list disjunction, negated conjunct) and
    * shows each index answer EQUAL to the exact scan count — plus the
    * index-stats row proving positions are unique (popcount of the
    * universe bitmap == row count). Positions are a DENSE GlobalOrder
    * row numbering — (l_orderkey, l_linenumber) is NOT unique in this
    * corpus, and every count here is invariant to WHICH row gets which
    * position (each row sets exactly one bit; a predicate's popcount is
    * the number of rows satisfying it under any bijective numbering),
    * which is why the DuckDB oracle can use its own row_number() and
    * still agree bit-for-bit on every output.
    *
    * Scale: each bitmap is ONE combinable bit_or aggregate keyed by the
    * uniform word index (data/32-sized, distributed — never collected);
    * predicate evaluation joins bitmap frames word-to-word (co-keyed —
    * a co-partitioned merge at any scale) and popcounts map-side. The
    * exact counts exist only because the audit proves equality;
    * production reads the index alone. */
  def q288BitmapIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.load(s, dir, "lineitem")
      .select($"l_orderkey".cast("long").as("okey"),
        $"l_linenumber".cast("long").as("line"),
        $"l_returnflag".as("rf"), $"l_linestatus".as("ls"),
        expr("CAST(round(l_quantity) AS BIGINT) div 10").as("qb"))
    // the numbered frame feeds 8 consumers (6 bitmaps, universe, exact) —
    // without the persist each one re-runs the GlobalOrder range shuffle
    // (measured 5.2 s un-persisted → 2.2 s persisted at sf0.1); released after
    // the 4-row report collects (the bounded-report idiom)
    val base = GlobalOrder.withRowNumber(rows,
        Seq($"okey", $"line", $"rf", $"ls", $"qb"), "rk")
      .select($"rf", $"ls", $"qb", expr("(rk - 1) div 32").as("word"),
        expr("shiftleft(1L, CAST((rk - 1) % 32 AS INT))").as("bit"))
      .persist()
    try {
      def bm(cond: Column): DataFrame = base.filter(cond)
        .groupBy($"word").agg(expr("bit_or(bit)").as("bits"))
      val universe = base.groupBy($"word").agg(expr("bit_or(bit)").as("bits"))
      val stats = universe
        .agg(count(lit(1)).as("n_index"),
          sum(expr("bit_count(bits)")).as("n_pop"))
      val p1 = bm($"rf" === "R").as("a")
        .join(bm($"ls" === "F").as("b"), Seq("word"))
        .agg(coalesce(sum(expr("bit_count(a.bits & b.bits)")), lit(0L)).as("n"))
      val p2 = bm($"qb" === 0L).as("a")
        .join(bm($"qb" === 4L).as("b"), Seq("word"), "full_outer")
        .agg(coalesce(sum(expr(
          "bit_count(coalesce(a.bits, 0L) | coalesce(b.bits, 0L))")), lit(0L)).as("n"))
      val p3 = bm($"rf" === "A").as("a")
        .join(bm($"qb" === 2L).as("b"), Seq("word"), "left")
        .agg(coalesce(sum(expr(
          "bit_count(a.bits & ~coalesce(b.bits, 0L))")), lit(0L)).as("n"))
      val exact = base.agg(count(lit(1)).as("e0"),
        sum(when($"rf" === "R" && $"ls" === "F", 1L).otherwise(0L)).as("e1"),
        sum(when($"qb" === 0L || $"qb" === 4L, 1L).otherwise(0L)).as("e2"),
        sum(when($"rf" === "A" && $"qb" =!= 2L, 1L).otherwise(0L)).as("e3"))
      val out = stats.crossJoin(broadcast(p1.select($"n".as("n1"))))
        .crossJoin(broadcast(p2.select($"n".as("n2"))))
        .crossJoin(broadcast(p3.select($"n".as("n3"))))
        .crossJoin(broadcast(exact))
        .selectExpr(
          """stack(4,
            |  '0_index_stats', n_index, n_pop, e0,
            |  '1_rf_and_ls', n_index, n1, e1,
            |  '2_qband_in', n_index, n2, e2,
            |  '3_rf_and_not_qband', n_index, n3, e3)
            |AS (predicate, n_words, n_bitmap, n_exact)""".stripMargin)
        .selectExpr("predicate", "n_words", "n_bitmap", "n_exact",
          "n_bitmap - n_exact AS diff")
        .orderBy($"predicate")
        .collect().toSeq
      import org.apache.spark.sql.types._
      graft.operators.LocalReport.frame(s, out,
        ("predicate", StringType), ("n_words", LongType),
        ("n_bitmap", LongType), ("n_exact", LongType), ("diff", LongType))
    } finally base.unpersist(blocking = false)
  }

  /** X268 — rank-aware top-k via Fagin's threshold algorithm: the top-10
    * customers by combined score (account balance + lifetime spend)
    * WITHOUT ranking the whole population — read the two per-attribute
    * orderings in geometrically deepening prefixes (8, 16, … 1024),
    * after each round compute the TA threshold (the attribute values AT
    * the current depth, summed) and stop as soon as the 10th-best fully-
    * scored candidate meets it: every unseen id is bounded above by the
    * threshold, so the answer is EXACT. Measured: depth 16 of 15000
    * suffices on this corpus at every SF — the audit reports the depth
    * and candidate count alongside the top-10 so the saving is visible,
    * and the oracle replays the identical ladder/stop rule relationally
    * (its top-10 comes from the SAME seen set, so a wrong stop rule
    * cannot hash-match).
    *
    * Scale: each prefix is a distributed TakeOrdered (top-d per
    * attribute — no global sort, no full shuffle); candidate state is
    * ≤ 2·depth rows on the driver. At 100 TB the orderings are the
    * sorted projections/indexes a warehouse already maintains, and TA
    * reads their heads — this is the query shape rank-aware engines
    * exist for. */
  def q297ThresholdTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.load(s, dir, "customer")
      .select($"c_custkey".cast("long").as("k"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("s1"))
      .join(Tables.load(s, dir, "orders")
          .groupBy($"o_custkey".cast("long").as("k"))
          .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("s2")),
        Seq("k"), "left")
      .select($"k", $"s1", coalesce($"s2", lit(0L)).as("s2"))
    val maxD = 1024
    val l1 = base.orderBy($"s1".desc, $"k").limit(maxD)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val l2 = base.orderBy($"s2".desc, $"k").limit(maxD)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = l1.length // = min(maxD, |customers|)
    val score = (l1 ++ l2).map(r => r._1 -> (r._2 + r._3)).toMap
    val ladder = Seq(8, 16, 32, 64, 128, 256, 512, 1024)
      .map(d => math.min(d, n)).distinct
    val (dPick, seenPick) = ladder.iterator.map { d =>
      val t = l1(d - 1)._2 + l2(d - 1)._3
      val seen: Seq[Long] =
        (l1.take(d).map(_._1) ++ l2.take(d).map(_._1)).distinct.toSeq
      val best = seen.map(i => (score(i), i)).sortBy(p => (-p._1, p._2))
      (d, seen, best.size >= 10 && best(9)._1 >= t)
    }.collectFirst { case (d, seen, true) => (d, seen) }
      .getOrElse((n,
        (l1.map(_._1) ++ l2.map(_._1)).distinct.toSeq: Seq[Long]))
    val top = seenPick.map(i => (score(i), i)).sortBy(p => (-p._1, p._2)).take(10)
    import org.apache.spark.sql.types._
    LocalReport.frame(s, top.zipWithIndex.map { case ((sc, k), i) =>
      org.apache.spark.sql.Row(i + 1L, k, sc, dPick.toLong,
        seenPick.size.toLong)
    },
      ("rank", LongType), ("custkey", LongType), ("score", LongType),
      ("ta_depth", LongType), ("n_seen", LongType))
  }

  def q280Skyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = t(s, dir, "part").select($"p_partkey".cast("long").as("partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_cents"),
      $"p_size".cast("long").as("size"))
    val perSize = p.groupBy($"size").agg(min($"price_cents").as("mn"))
    val w = Window.orderBy($"size")
      .rowsBetween(Window.unboundedPreceding, -1)
    val stairs = perSize
      .withColumn("m_prev", min($"mn").over(w))
      .withColumn("front_size",
        $"m_prev".isNull || $"mn" < $"m_prev")
    p.join(broadcast(stairs), Seq("size"))
      .filter($"front_size" && $"price_cents" === $"mn")
      .select($"partkey", $"price_cents", $"size")
      .orderBy($"size", $"partkey")
  }

  def q52RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = broadcast(
      (0 until 6).map(i => (s"band_$i", i * 100000L, (i + 1) * 100000L))
        .toDF("band", "lo_cents_k", "hi_cents_k")
        .select($"band", ($"lo_cents_k" * 100).as("lo_cents"),
          ($"hi_cents_k" * 100).as("hi_cents")))
    t(s, dir, "orders")
      .select(cents($"o_totalprice").as("price_cents"))
      .join(bands, $"price_cents" >= $"lo_cents" && $"price_cents" < $"hi_cents")
      .groupBy($"band", $"lo_cents")
      .agg(count(lit(1)).as("n_orders"),
        sum($"price_cents").as("sum_cents"))
      .orderBy($"lo_cents")
  }

  /** X137 — volume shipping (TPC-H Q7 analogue): bilateral revenue flow
    * between two nations — lineitems whose SUPPLIER sits in one nation of
    * the pair and whose ordering CUSTOMER sits in the other, grouped by
    * (supp_nation, cust_nation, ship year). The classic 6-table join
    * showcasing Catalyst's join planning: the dimension chain
    * (supplier/nation/customer-nation) broadcasts, the lineitem⋈orders
    * fact-fact join shuffles once on the order key after the nation
    * filters have pruned both sides.
    *
    * Scale: BOTH fact inputs are nation-pruned BEFORE the one fact-fact
    * shuffle — lineitem drops ~(1 − 2/\|nations\|) of its rows map-side
    * through the broadcast supplier-pair join, and orders is semi-joined
    * against the pair's customers first (X140's discipline: prune inside
    * the join graph, never after it). Revenue reduces per-row to integer
    * cents in the scan projection (order-independent partial sums); the
    * grouped frame is 2 nations × 2 directions × years. */
  def q169VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pair = Seq("NATION_3", "NATION_19")
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    // supplier side: nation filter rides the broadcast build, so the
    // lineitem scan keeps only the pair's suppliers' lines (map-side)
    val supPair = broadcast(t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation"))),
        $"s_nationkey" === $"s_nk")
      .select($"s_suppkey", $"supp_nation"))
    // customer side: prune orders down to the pair's customers BEFORE the
    // lineitem join — at scale this is a key-partitioned semi-join that
    // shrinks the orders shuffle by the same 2/|nations| factor
    val custPair = c
      .join(broadcast(t(s, dir, "nation")
        .filter($"n_name".isin(pair: _*))
        .select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation"))),
        $"c_nationkey" === $"c_nk")
      .select($"c_custkey", $"cust_nation")
    val oPair = o.join(custPair, o("o_custkey") === $"c_custkey")
      .select($"o_orderkey", $"cust_nation")
    li.join(supPair, li("l_suppkey") === $"s_suppkey")
      .join(oPair, li("l_orderkey") === $"o_orderkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
          .as("revenue_cents"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** X138 — market share (TPC-H Q8 analogue): within one region's
    * customers, the revenue share (integer ppm) captured by suppliers of
    * one nation, per order year. The two-level aggregate runs in ONE
    * grouped pass — the national slice is a conditional sum inside the
    * same fold as the regional total, so there is no second scan and no
    * share-vs-total join.
    *
    * Scale: the region predicate prunes ORDERS before the fact-fact
    * shuffle — customers filter through the broadcast nation/region chain,
    * orders semi-join against those keys, and only then does lineitem
    * shuffle against the ~1/\|regions\| surviving orders (X140's
    * prune-inside-the-join-graph discipline). Unlike X137 the lineitem
    * side cannot be supplier-pruned (Q8 needs ALL supplier nations), so
    * the fact gets X100's runtime filter instead: a Bloom sketch over the
    * region-pruned order keys drops ~80% of lineitem in a NARROW map
    * BEFORE its exchange. False positives die in the exact join, so the
    * result is bit-identical; the sketch is sized from a metadata-only
    * orders count (no extra join action) and CAPPED at 4M expected keys
    * (~5 MB) so the broadcast stays bounded at any corpus scale — past
    * the cap the fpp drifts up, which only weakens (never breaks) the
    * prefilter. The report frame is \|years\|-sized. */
  def q170MarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val targetNation = "NATION_3"
    val region = "ASIA"
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val sup = broadcast(t(s, dir, "supplier"))
    val nS = broadcast(t(s, dir, "nation")
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
    val nC = broadcast(t(s, dir, "nation")
      .select($"n_nationkey".as("c_nk"), $"n_regionkey".as("c_rk")))
    val r = broadcast(t(s, dir, "region").filter($"r_name" === region))
    // region-filtered customer keys, then orders pruned on them — the
    // 80% of orders outside the region never reaches the lineitem join
    val custRegion = c.join(nC, $"c_nationkey" === $"c_nk")
      .join(r, $"c_rk" === $"r_regionkey")
      .select($"c_custkey")
    val oRegion = o.join(custRegion, o("o_custkey") === $"c_custkey")
      .select($"o_orderkey", $"o_orderdate")
    // X100's runtime filter: expectedNumItems is a metadata-count upper
    // bound (~1/|regions| of orders, 4x headroom -> /4), so building the
    // sketch is the only extra pass over the oRegion join. The 4M-key cap
    // (~5 MB at fpp 0.01) keeps the broadcast BOUNDED at any corpus
    // scale: past the cap the effective fpp drifts up, which only
    // weakens (never breaks) the prefilter — the exact join still
    // removes every false positive
    val nKeys = math.min(math.max(o.count() / 4L, 1000L), 4L << 20)
    val bf = s.sparkContext.broadcast(
      oRegion.stat.bloomFilter("o_orderkey", nKeys, 0.01))
    val mightContain = udf((k: Long) => bf.value.mightContainLong(k))
    li.filter($"l_orderkey".isNotNull && mightContain($"l_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nS, $"s_nationkey" === $"s_nk")
      .join(oRegion, li("l_orderkey") === $"o_orderkey")
      .withColumn("vol_cents", cents($"l_extendedprice" * (lit(1) - $"l_discount")))
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(sum($"vol_cents").as("total_cents"),
        sum(when($"supp_nation" === targetNation, $"vol_cents")
          .otherwise(0L)).as("nation_cents"))
      .withColumn("share_ppm", expr("nation_cents * 1000000 div total_cents"))
      .orderBy($"o_year")
  }

  /** X139 — product margin (TPC-H Q9 analogue, partsupp-free): for parts
    * whose name carries a token, per (supplier nation, ship year): line
    * revenue against list-price cost (quantity × p_retailprice) — the
    * margin ledger grouped over a 9-way-join star. Both sides of the
    * margin reduce to integer cents per row before any aggregation.
    *
    * Scale: part dimension filters in the scan (pushed LIKE), then
    * broadcasts; the only wide join is lineitem⋈orders on the order key;
    * the grouped frame is \|nations\| × \|years\|. */
  def q171ProductMargin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val sup = broadcast(t(s, dir, "supplier"))
    val nS = broadcast(t(s, dir, "nation")
      .select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
    val p = broadcast(t(s, dir, "part").filter($"p_name".contains("red")))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nS, $"s_nationkey" === $"s_nk")
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"supp_nation", year($"o_orderdate").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
          .as("revenue_cents"),
        sum(cents($"l_quantity" * $"p_retailprice")).as("cost_cents"))
      .withColumn("margin_cents", $"revenue_cents" - $"cost_cents")
      .orderBy($"supp_nation", $"o_year")
  }

  /** X140 — local supplier volume (TPC-H Q5 analogue): revenue per nation
    * within one region where the SUPPLIER and the ordering CUSTOMER share
    * the nation — the "domestic trade" slice. The c_nationkey =
    * s_nationkey equality rides the customer join condition, so the
    * cross-nation volume is discarded before the aggregate, not filtered
    * after.
    *
    * Scale: same shape as X137 — broadcast dimension chain, ONE
    * lineitem⋈orders shuffle, a \|nations-in-region\| report frame. */
  def q172LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val sup = broadcast(t(s, dir, "supplier"))
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region").filter($"r_name" === "EUROPE"))
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey")
        && c("c_nationkey") === sup("s_nationkey"))
      .join(n, $"s_nationkey" === $"n_nationkey")
      .join(r, $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
          .as("revenue_cents"))
      .orderBy($"revenue_cents".desc, $"n_name")
  }

  /** X141 — returned-item reporting (TPC-H Q10 analogue): the top-20
    * customers by revenue lost to returns (l_returnflag = 'R'). The
    * return filter is pushed to the lineitem scan; the top-k cut is a
    * TakeOrdered over the customer-sized aggregate, not a global sort.
    *
    * Scale: returns are a small slice of lineitem (scan-filtered); ONE
    * fact-fact shuffle; the aggregate frame is customer-sized and the
    * k-row skim never materializes it. */
  def q173ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(count(lit(1)).as("n_returned_lines"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
          .as("lost_cents"))
      .orderBy($"lost_cents".desc, $"c_custkey")
      .limit(20)
  }

  /** X142 — customer order-count distribution (TPC-H Q13 analogue): how
    * many customers placed exactly k orders, including k = 0 — the
    * left-join histogram that sizes engagement tiers. Two combinable
    * folds: orders-per-customer, then customers-per-count.
    *
    * Scale: the left join preserves orderless customers; both aggregate
    * frames are customer- then \|distinct counts\|-sized. */
  def q174CustDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** X143 — large-volume customers (TPC-H Q18 analogue): orders whose
    * total line quantity clears 250 units, reported with their customer.
    * The HAVING-style gate runs on the order-key aggregate BEFORE the
    * customer join, so only qualifying orders (a tail of the
    * distribution) ever reach the join.
    *
    * Scale: ONE order-key fold (combinable), the qualifying-order frame
    * is tail-sized and broadcasts onto orders⋈customer. */
  def q175LargeVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").cast("long").as("sum_qty"))
      .filter($"sum_qty" > 250)
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select($"c_custkey", $"c_name", $"o_orderkey",
        year($"o_orderdate").cast("long").as("o_year"),
        cents($"o_totalprice").as("price_cents"), $"sum_qty")
      .orderBy($"sum_qty".desc, $"o_orderkey")
  }

  /** X147 — promotion effect (TPC-H Q14 analogue): per order month, the
    * revenue share (integer ppm) of PROMO-type parts — Q8's single-pass
    * conditional-share discipline on the part-type axis: the promo slice
    * is a conditional sum INSIDE the monthly fold, never a second scan.
    *
    * Scale: part dimension broadcasts; ONE lineitem⋈orders shuffle; the
    * report frame is \|months\|-sized. */
  def q179PromoEffect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val p = broadcast(t(s, dir, "part").select($"p_partkey", $"p_type"))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .withColumn("vol_cents", cents($"l_extendedprice" * (lit(1) - $"l_discount")))
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("o_month"))
      .agg(sum($"vol_cents").as("total_cents"),
        sum(when($"p_type" === "PROMO", $"vol_cents").otherwise(0L))
          .as("promo_cents"))
      .withColumn("promo_ppm", expr("promo_cents * 1000000 div total_cents"))
      .orderBy($"o_month")
  }

  /** X148 — top supplier (TPC-H Q15 analogue): the supplier(s) whose
    * quarterly revenue equals the maximum — the max-over-aggregate
    * pattern done without a second scan OR an unpartitioned window: the
    * per-supplier fold is computed once, the 1-row max broadcasts back
    * onto it (q90's broadcast-total rule), and the equality filter keeps
    * every tied supplier (ties are real data, not an ORDER BY accident).
    *
    * Scale: supplier fold is combinable and dimension-sized; the max is
    * one broadcast row; nothing rescans lineitem. */
  def q180TopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1995-04-01").cast("timestamp"))
    val sup = broadcast(t(s, dir, "supplier"))
    val rev = li.groupBy($"l_suppkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
        .as("total_cents"))
    val mx = rev.agg(max($"total_cents").as("max_cents"))
    rev.crossJoin(broadcast(mx))
      .filter($"total_cents" === $"max_cents")
      .join(sup, $"l_suppkey" === sup("s_suppkey"))
      .select($"s_suppkey", $"s_name", $"total_cents")
      .orderBy($"s_suppkey")
  }

  /** X149 — small-quantity revenue (TPC-H Q17 analogue): revenue locked
    * in lineitems whose quantity falls below HALF the part's average
    * quantity, for one brand — the per-group-average-threshold pattern:
    * the part-level average is its own combinable fold, joined back on
    * the SAME part key (exchange-reusable), never a correlated per-row
    * subquery.
    *
    * Exactness: the threshold compare runs on integers — 2·n·qty <
    * sum_qty avoids the average's division entirely.
    *
    * Scale: brand filter pushes into the part scan and broadcasts; both
    * the average fold and the line filter key on l_partkey, so the two
    * legs share one exchange; the report is one row per brand-year. */
  def q181SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = broadcast(t(s, dir, "part").filter($"p_brand" === "Brand#1")
      .select($"p_partkey", $"p_brand"))
    val li = t(s, dir, "lineitem").join(p, $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_partkey",
        $"l_quantity".cast("long").as("qty"),
        cents($"l_extendedprice").as("price_cents"))
    val avgQ = li.groupBy($"l_partkey".as("pk"))
      .agg(count(lit(1)).as("n"), sum($"qty").as("sum_qty"))
    li.join(avgQ, $"l_partkey" === $"pk")
      // qty < avg/2  ⟺  2·n·qty < sum_qty (integer-exact, no division)
      .filter($"qty" * $"n" * 2 < $"sum_qty")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_small_lines"),
        sum($"price_cents").as("locked_cents"))
      .orderBy($"p_brand")
  }

  /** X163 — supplier concentration (HHI): the Herfindahl–Hirschman index
    * of supplier revenue shares — Σ share_ppm² scaled back to ppm (10⁶ =
    * monopoly, 10⁶/n = perfectly even) — the standard concentration
    * measure, computed without floats: shares floor to integer ppm
    * per supplier, squares sum exactly (n·10¹² fits int64 to ~9M
    * suppliers), and the verdict is one division.
    *
    * Scale: one combinable supplier fold + a broadcast 1-row total; the
    * HHI fold runs on the supplier-dimension frame. Flooring loses < n
    * ppm of mass — bounded and deterministic, unlike float rounding. */
  def q194SupplierHhi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = t(s, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
        .as("c"))
    val total = rev.agg(sum($"c").as("tot"))
    rev.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("c * 1000000 div tot"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum($"share_ppm").as("share_mass_ppm"),
        sum($"share_ppm" * $"share_ppm").as("sum_sq"))
      .select($"n_suppliers", $"share_mass_ppm",
        expr("sum_sq div 1000000").as("hhi_ppm"))
  }

  /** X165 — new-vs-returning revenue split: per order month, revenue and
    * order counts split by whether the order falls in its customer's
    * FIRST month — the acquisition-vs-retention lens on the revenue
    * stream. The first-month flag rides ONE customer partitioning
    * (min-over-window, no self-join); the monthly fold is a combinable
    * conditional sum (Q8's one-pass discipline on the cohort axis).
    *
    * Scale: one custkey window + one \|months\| fold; orders scan once. */
  def q197NewVsReturning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
    t(s, dir, "orders")
      .withColumn("month", date_format($"o_orderdate", "yyyy-MM"))
      .withColumn("first_month", min($"month").over(w))
      .withColumn("cents", cents($"o_totalprice"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"month" === $"first_month", 1L).otherwise(0L))
          .as("new_orders"),
        sum($"cents").as("revenue_cents"),
        sum(when($"month" === $"first_month", $"cents").otherwise(0L))
          .as("new_revenue_cents"))
      .withColumn("new_revenue_ppm",
        expr("new_revenue_cents * 1000000 div revenue_cents"))
      .orderBy($"month")
  }

  /** X167 — order fan-out histogram: the lines-per-order distribution in
    * log2 bands — the join-cardinality shape behind every
    * lineitem⋈orders plan in the suite (X114 predicts one join's size
    * exactly; this is the standing profile a planner consults). Two
    * combinable folds: order-key count, then band histogram.
    *
    * Scale: the order fold is the same single shuffle every per-order
    * aggregate pays; the histogram is a ≤~10-row frame. */
  def q199OrderFanout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n_lines"))
      .withColumn("band", (length(bin($"n_lines")) - 1).cast("long"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_orders"),
        min($"n_lines").as("min_lines"), max($"n_lines").as("max_lines"),
        sum($"n_lines").as("sum_lines"))
      .orderBy($"band")
  }

  /** X174 — order-status mix by month: each status's share of the month's
    * orders in integer ppm — the categorical drift monitor on the order
    * stream (X94 watches a numeric distribution; this watches a discrete
    * one; a fulfillment regression shows up as the 'F' share bending).
    * Single-pass conditional shares via the same one-fold discipline as
    * Q8/Q14.
    *
    * Scale: narrow calendar projection + ONE combinable (month, status)
    * fold; the share window runs on the \|months\|×\|statuses\| frame. */
  def q206StatusMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byMonth = Window.partitionBy($"month")
    t(s, dir, "orders")
      .select(date_format($"o_orderdate", "yyyy-MM").as("month"),
        $"o_orderstatus")
      .groupBy($"month", $"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("month_total", sum($"n_orders").over(byMonth))
      .withColumn("share_ppm", expr("n_orders * 1000000 div month_total"))
      .select($"month", $"o_orderstatus", $"n_orders", $"share_ppm")
      .orderBy($"month", $"o_orderstatus")
  }

  /** X176 — late-order priority check (TPC-H Q4 analogue): orders placed
    * in 1996 with at least one lineitem shipped more than 60 days after
    * the order date, counted per priority — the EXISTS shape, executed as
    * a LEFT SEMI join so each order contributes once no matter how many
    * late lines it has.
    *
    * Scale: lineitem projects to (l_orderkey, l_shipdate) BEFORE its
    * exchange — the semi-join moves 16 bytes/line, never the payload; the
    * year filter is pushed to the orders scan; the fold after the
    * semi-join is a combinable \|priorities\|-row aggregate. */
  def q208LateOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy($"o_orderpriority")
  }

  /** X177 — disjunctive-predicate revenue (TPC-H Q19 analogue): revenue
    * from three OR'd (brand × size-band × quantity-band) branches. The
    * part-only disjunction ((brand,size) per branch) is applied to the
    * part side EXPLICITLY before the join — Catalyst can extract it from
    * the join filter too, but shrinking the build side by ~3 brands/25
    * ahead of time keeps the broadcast table small by construction
    * rather than by optimizer grace.
    *
    * Scale: part is a broadcast dim; lineitem never shuffles — scan →
    * broadcast hash join → combinable 1-row fold. */
  def q209DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val branch1 = ($"p_brand" === "Brand#4" && $"p_size".between(1, 15),
      $"l_quantity".between(1, 20))
    val branch2 = ($"p_brand" === "Brand#19" && $"p_size".between(10, 30),
      $"l_quantity".between(10, 30))
    val branch3 = ($"p_brand" === "Brand#8" && $"p_size".between(20, 50),
      $"l_quantity".between(20, 50))
    val p = broadcast(t(s, dir, "part")
      .filter(branch1._1 || branch2._1 || branch3._1)
      .select($"p_partkey", $"p_brand", $"p_size"))
    t(s, dir, "lineitem")
      .select($"l_partkey", $"l_quantity",
        cents($"l_extendedprice" * (lit(1) - $"l_discount")).as("net_cents"))
      .join(p, $"l_partkey" === $"p_partkey")
      .filter((branch1._1 && branch1._2) || (branch2._1 && branch2._2) ||
        (branch3._1 && branch3._2))
      .agg(count(lit(1)).as("n_lines"), sum($"net_cents").as("revenue_cents"))
  }

  /** X178 — dormant high-balance customers (TPC-H Q22 analogue): customers
    * whose balance is strictly above the positive-balance average and who
    * placed NO order on/after 2000-01-01, per nation. The scalar subquery
    * is a broadcast 1-row aggregate; "no recent order" is a LEFT ANTI join
    * against orders projected to o_custkey. The above-average test is the
    * exact integer inequality bal·n > sum (no float average).
    *
    * Scale: customer is dimension-sized but the same shape holds for a
    * fact-sized left side — the anti-join key is 8 bytes/order, the 1-row
    * average broadcasts, and the fold is \|nations\|-sized. */
  def q210DormantBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
      .select($"c_custkey", $"c_nationkey", cents($"c_acctbal").as("bal_cents"))
    val posAvg = c.filter($"bal_cents" > 0)
      .agg(sum($"bal_cents").as("pos_sum"), count(lit(1)).as("pos_n"))
    val recent = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    c.crossJoin(broadcast(posAvg))
      .filter($"bal_cents" * $"pos_n" > $"pos_sum")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey".cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_custs"), sum($"bal_cents").as("bal_sum_cents"))
      .orderBy($"nationkey")
  }

  /** X179 — ship-delay × priority mix (TPC-H Q12 analogue): lines banded
    * by ship delay (days between order and ship date), with the critical
    * (1-URGENT/2-HIGH) vs other split as conditional sums INSIDE the band
    * fold — Q12's two-column trick, no second pass and no pivot join.
    *
    * Scale: ONE lineitem⋈orders shuffle (the suite's standing fact-fact
    * join); the band fold is combinable into a 4-row frame. */
  def q211ShipDelayMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    val critical = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .withColumn("delay_days",
        datediff($"l_shipdate", $"o_orderdate").cast("long"))
      .withColumn("band",
        when($"delay_days" < 0, "0_early")
          .when($"delay_days" <= 30, "1_within_30d")
          .when($"delay_days" <= 90, "2_within_90d")
          .otherwise("3_over_90d"))
      .groupBy($"band")
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("critical_lines"),
        sum(when(critical, 0L).otherwise(1L)).as("other_lines"),
        min($"delay_days").as("min_delay"),
        max($"delay_days").as("max_delay"))
      .orderBy($"band")
  }

  /** X186 — shipping-priority top-10 (TPC-H Q3 analogue): the 10 highest-
    * revenue orders in one segment placed before the cut but (partly)
    * shipped after it. Customer membership rides a broadcast SEMI join
    * (the segment slice of a dimension); the cut predicates push to both
    * fact scans; top-10 via TakeOrdered on the order-sized fold — no
    * global sort.
    *
    * Scale: ONE lineitem⋈orders shuffle after both scans prune. */
  def q218ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = lit("1998-07-01").cast("timestamp")
    val c = broadcast(t(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey"))
    val o = t(s, dir, "orders")
      .filter($"o_orderdate" < cut)
      .join(c, $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = t(s, dir, "lineitem")
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey",
        cents($"l_extendedprice" * (lit(1) - $"l_discount")).as("net_cents"))
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
        $"o_orderpriority")
      .agg(sum($"net_cents").as("revenue_cents"))
      .orderBy($"revenue_cents".desc, $"o_orderkey")
      .limit(10)
  }

  /** X187 — forecast-revenue-change probe (TPC-H Q6 analogue): the
    * revenue that would be reclaimed by dropping small-quantity discounts
    * in one year — a pure scan-side query: every predicate (year band,
    * discount band, quantity cap) reaches the parquet scan, the fold is a
    * combinable 1-row aggregate, and nothing shuffles but partial-agg
    * rows. The simplest query in the suite and the purest pushdown test. */
  def q219RevenueForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(count(lit(1)).as("n_lines"),
        sum(cents($"l_extendedprice" * $"l_discount")).as("forecast_cents"))
  }

  /** X188 — promotion-capable suppliers (TPC-H Q20 analogue): suppliers
    * who shipped more than 100 units of some promoted ('red …') part —
    * a two-level SEMI chain: the (supplier, part) quantity fold gates on
    * the HAVING threshold, semi-joins the promoted-part list, and the
    * survivors semi-join the supplier dim. Qty threshold is the exact
    * integer compare on round(qty) (quantities are integral doubles).
    *
    * Scale: the fold shuffles lineitem once on its natural (supp, part)
    * key; the part list broadcasts; supplier-side semi touches only
    * 8-byte keys. */
  def q220PromotionSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promoted = broadcast(t(s, dir, "part")
      .filter($"p_name".startsWith("red ")).select($"p_partkey"))
    val gate = t(s, dir, "lineitem")
      .select($"l_suppkey", $"l_partkey", round($"l_quantity").cast("long").as("qty"))
      .join(promoted, $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum($"qty").as("total_qty"))
      .filter($"total_qty" > 100)
      .select($"l_suppkey").distinct()
    t(s, dir, "supplier")
      .join(gate, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  /** X189 — waiting-order blame report (TPC-H Q21 analogue): suppliers
    * whose line shipped more than a year after the order date on orders
    * where SOME OTHER supplier shipped within 90 days — the late party on
    * an otherwise-servable order. EXISTS(other supplier, on time) is a
    * LEFT SEMI against the same joined frame with the inequality in the
    * join condition; the (order, supplier) distinct collapses multi-line
    * blame before the count.
    *
    * Scale: the o⋈li frame is built ONCE and reused by both legs (the
    * semi probes a projection of it); one orderkey shuffle + one
    * supplier-sized fold; top-20 via TakeOrdered. */
  def q221BlameSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders").select($"o_orderkey", $"o_orderdate")
    val j = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(o, $"l_orderkey" === $"o_orderkey")
      .withColumn("delay", datediff($"l_shipdate", $"o_orderdate").cast("long"))
      .select($"l_orderkey", $"l_suppkey", $"delay")
    val late = j.filter($"delay" > 365)
      .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
    val onTime = j.filter($"delay" <= 90)
      .select($"l_orderkey".as("ok2"), $"l_suppkey".as("sk2"))
    late.join(onTime, $"ok" === $"ok2" && $"sk" =!= $"sk2", "left_semi")
      .groupBy($"sk".as("s_suppkey"))
      .agg(count(lit(1)).as("n_blamed_orders"))
      .orderBy($"n_blamed_orders".desc, $"s_suppkey")
      .limit(20)
  }

  /** X207 — min-cost regional supplier (TPC-H Q2 analogue): for each
    * large part (p_size >= 40), the cheapest EUROPE supplier. The test
    * corpus has no partsupp table, so the observed supply-cost relation
    * is the lineitem fold: per (part, supplier), the minimum unit cost
    * `cents(l_extendedprice)·1000 div qty` — quantities are integral
    * doubles, so milli-cents-per-unit is exact int64 in both engines
    * (positive operands: Spark `div` and DuckDB `//` agree).
    *
    * Scale: BOTH gates (big parts, EUROPE suppliers) broadcast-semi
    * onto the lineitem scan BEFORE the fold, so the one (part,
    * supplier) shuffle carries only qualifying lines; the per-part
    * argmin is a combinable `min(struct(cost, suppkey))` — partial
    * aggregation on the map side, no window, no per-part sort — and
    * the supplier/part details join back onto the part-cardinality
    * winners. Deterministic ties: (cost, s_suppkey); Q2's ordering
    * with p_partkey as the unique final key. */
  def q240MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region").filter($"r_name" === "EUROPE")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", cents($"s_acctbal").as("s_acctbal_cents"),
        $"n_name")
    val parts = t(s, dir, "part").filter($"p_size" >= 40)
      .select($"p_partkey", $"p_brand")
    val best = t(s, dir, "lineitem")
      .join(broadcast(parts.select($"p_partkey")),
        $"l_partkey" === $"p_partkey", "left_semi")
      .join(broadcast(sup.select($"s_suppkey")),
        $"l_suppkey" === $"s_suppkey", "left_semi")
      .select($"l_partkey",
        expr("(cast(round(l_extendedprice * 100) as bigint) * 1000) div cast(round(l_quantity) as bigint)")
          .as("unit_mc"), $"l_suppkey")
      .groupBy($"l_partkey")
      .agg(min(struct($"unit_mc", $"l_suppkey")).as("b"))
      .select($"l_partkey", $"b.unit_mc".as("cost_milli_cents"),
        $"b.l_suppkey".as("l_suppkey"))
    best
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      // no hint: both sides are part-cardinality frames — AQE picks
      .join(parts, $"l_partkey" === $"p_partkey")
      .select($"s_acctbal_cents", $"s_name", $"n_name", $"p_partkey",
        $"p_brand", $"cost_milli_cents")
      .orderBy($"s_acctbal_cents".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }

  /** X208 — important-stock audit (TPC-H Q11 analogue): per part, the
    * total observed supply value `cents(extprice·(1−discount))` from
    * NATION_7's suppliers, keeping parts whose value exceeds 1/10000 of
    * the nation's total. The threshold compare is `value > total div
    * 10000` — algebraically identical to `value·10000 > total` for
    * positive int64 (both engines floor-divide positives), without the
    * ×10000 overflow at corpus scale.
    *
    * Scale: the nation's supplier keys broadcast as a semi-join gate
    * pushed to the lineitem scan; ONE combinable part-key fold, persisted
    * — it has two consumers (the grand total and the survivors) and
    * recomputing would double the lineitem shuffle. The survivor set is
    * bounded BY CONSTRUCTION: at most 9999 parts can each exceed 1/10000
    * of the total, so the report collects to a local frame and the cache
    * releases before return (q117/q123 idiom). */
  def q241ImportantStock(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val natSup = broadcast(t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation").filter($"n_name" === "NATION_7")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey"))
    val v = t(s, dir, "lineitem")
      .join(natSup, $"l_suppkey" === $"s_suppkey", "left_semi")
      .groupBy($"l_partkey")
      .agg(sum(cents($"l_extendedprice" * (lit(1) - $"l_discount")))
        .as("value_cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // empty fold (a nation with no shipped lines) sums to NULL
      val tRow = v.agg(sum($"value_cents")).collect().head
      val tVal = if (tRow.isNullAt(0)) 0L else tRow.getLong(0)
      val rows = v.filter($"value_cents" > lit(tVal / 10000L))
        .select($"l_partkey".as("p_partkey"), $"value_cents")
        .orderBy($"value_cents".desc, $"p_partkey")
        .collect().toSeq
      import org.apache.spark.sql.types._
      LocalReport.frame(s, rows,
        ("p_partkey", LongType),
        ("value_cents", LongType))
    } finally v.unpersist(blocking = false)
  }

  /** X209 — parts/supplier relationship (TPC-H Q16 analogue): distinct
    * supplier count per (brand, type, size) over the OBSERVED lineitem
    * incidence, excluding one brand and the negative-balance suppliers
    * (the corpus's stand-in for Q16's 'Customer Complaints' comment
    * filter — no s_comment column exists).
    *
    * Scale: the complaint list is a broadcast anti-join on the distinct
    * (part, supplier) incidence (one lineitem shuffle); the part-dim
    * join shuffles only incidence-sized keys; countDistinct re-keys by
    * the attribute triple. */
  def q242PartsSupplierRel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bad = broadcast(t(s, dir, "supplier")
      .filter($"s_acctbal" < 0).select($"s_suppkey"))
    val inc = t(s, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(bad, $"l_suppkey" === $"s_suppkey", "left_anti")
    inc
      .join(t(s, dir, "part")
        .filter($"p_brand" =!= "Brand#45" && $"p_size" <= 25)
        .select($"p_partkey", $"p_brand", $"p_type", $"p_size"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }
}
