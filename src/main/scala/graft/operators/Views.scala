package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import graft.sqlrewrite.SqlRewriter

/** View path (SURVEY.md §3 E3): MySQL-dialect view bodies — written in the
  * style of the reference's fixture corpus (`scripts/mysql/create_view.sql`:
  * DATE_FORMAT/CONCAT/SUBSTRING_INDEX/JSON_EXTRACT/IF/IFNULL/GROUP_CONCAT
  * select lists over joins) — run through [[SqlRewriter]] and *executed* by
  * Catalyst. The reference only emitted rewritten text; executing it is the
  * capability upgrade.
  */
object Views {

  private def run(s: SparkSession, dir: String, mysqlSql: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.InetFunctions.register(s)
    graft.functions.JsonFunctions.register(s)
    SqlRewriter.sql(s, mysqlSql)
  }

  /** DATE_FORMAT %-token translation + TO_DAYS + MySQL LIMIT offset,n. */
  def q21ViewDates(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT o_orderkey,
      |  DATE_FORMAT(o_orderdate, '%Y-%m-%d') AS order_day,
      |  DATE_FORMAT(o_orderdate, '%d/%m/%y %H:%i:%S') AS euro_ts,
      |  TO_DAYS(o_orderdate) AS days_since_y0
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 5, 100""".stripMargin)

  /** GROUP_CONCAT with DISTINCT + SEPARATOR over a dimension join. */
  def q22ViewGroupConcat(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT n_name,
      |  GROUP_CONCAT(DISTINCT c_mktsegment SEPARATOR '|') AS segs,
      |  COUNT(*) AS n_members
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin)

  /** IF / IFNULL / NULLIF / STRCMP / CAST AS SIGNED conditional surface. */
  def q23ViewConditional(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT o_orderkey,
      |  IF(o_totalprice > 200000, 'big', 'small') AS size_tag,
      |  IFNULL(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
      |  STRCMP(o_orderstatus, 'F') AS strcmp_f,
      |  CAST(FLOOR(o_totalprice) AS SIGNED) AS price_floor
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin)

  /** JSON_EXTRACT / JSON_UNQUOTE over the events.props JSON column. */
  def q24ViewJson(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT event_type,
      |  SUM(CAST(JSON_UNQUOTE(JSON_EXTRACT(props, '$.k')) AS SIGNED)) AS sum_k,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin)

  /** Extended datetime surface: TIMESTAMPDIFF, ADDDATE/SUBDATE, DAYNAME,
    * MONTHNAME — §2.4 date table, second tranche. */
  def q28ViewDatetime(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT o_orderkey,
      |  TIMESTAMPDIFF(DAY, o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS days_to98,
      |  ADDDATE(CAST(o_orderdate AS DATE), 30) AS plus30,
      |  SUBDATE(CAST(o_orderdate AS DATE), 15) AS minus15,
      |  DAYNAME(o_orderdate) AS dname,
      |  MONTHNAME(o_orderdate) AS mname
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin)

  /** Network functions: INET_ATON / INET_NTOA (custom Catalyst
    * expressions — Spark has no native inet surface). */
  def q29ViewInet(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT n_nationkey,
      |  INET_ATON(CONCAT('10.', n_nationkey, '.0.', n_regionkey)) AS ip_num,
      |  INET_NTOA(167772161 + n_nationkey) AS ip_str
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin)

  /** Math/string surface (the reference's ~40-function view select lists,
    * create_view.sql:17-70): ROUND/CEIL/FLOOR/ABS/MOD/POWER/SQRT/GREATEST/
    * LEAST + HEX/CONV/SPACE/MID/REPEAT — only deterministic-exact functions
    * so the oracle stays hash-exact (no libm trig, see scaladoc). */
  def q44ViewMath(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT p_partkey,
      |  ROUND(p_retailprice) AS price_round,
      |  CEIL(p_retailprice) AS price_ceil,
      |  FLOOR(p_retailprice) AS price_floor,
      |  ABS(p_size - 25) AS size_abs,
      |  MOD(p_partkey, 7) AS key_mod7,
      |  CAST(POWER(p_size, 2) AS SIGNED) AS size_sq,
      |  SQRT(p_size) AS size_sqrt,
      |  CAST(GREATEST(p_size, 10) AS SIGNED) AS size_hi,
      |  CAST(LEAST(p_size, 10) AS SIGNED) AS size_lo,
      |  HEX(p_size) AS size_hex,
      |  CONV(p_size, 10, 2) AS size_bin,
      |  CONCAT('[', SPACE(2), ']') AS spaced,
      |  MID(p_name, 2, 4) AS name_mid,
      |  REPEAT(p_brand, 2) AS brand_x2
      |FROM part
      |ORDER BY p_partkey""".stripMargin)

  /** String-function view: CONCAT, SUBSTRING_INDEX, LOCATE, LPAD, CONVERT. */
  def q25ViewStrings(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT p_partkey,
      |  CONCAT(p_brand, '/', p_type) AS brand_type,
      |  SUBSTRING_INDEX(p_name, ' ', 1) AS first_word,
      |  CAST(LOCATE('widget', p_name) AS SIGNED) AS widget_pos,
      |  CONVERT(p_size, CHAR) AS size_str,
      |  LPAD(p_size, 4, '0') AS size_pad,
      |  LOWER(p_type) AS type_lower
      |FROM part
      |ORDER BY p_partkey
      |LIMIT 10, 50""".stripMargin)

  /** Remaining §2.4 scalar tranche executed end-to-end: ELT / FIELD /
    * FORMAT (thousands-separator formatting), MySQL INSERT→overlay, and
    * TIME_TO_SEC over a timestamp. */
  def q58ViewEltField(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT n_nationkey,
      |  ELT(n_regionkey + 1, 'africa', 'america', 'asia', 'europe', 'mideast') AS region_elt,
      |  FIELD(n_name, 'FRANCE', 'GERMANY', 'CHINA') AS field_pos,
      |  FORMAT(n_nationkey * 1000.5, 1) AS fmt,
      |  INSERT(n_name, 2, 3, '***') AS name_patched,
      |  TIME_TO_SEC(TIMESTAMP '1970-01-01 10:30:05') AS t2s
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin)

  /** JSON mutation surface: JSON_SET / JSON_REMOVE / JSON_MERGE_PATCH /
    * JSON_ARRAY_APPEND executed via the graft_json_* expressions
    * (sync_viewddl.go:39-45, :452-474). Outputs are extracted scalars, so
    * the oracle is engine-independent of JSON text formatting. */
  def q57ViewJsonMutate(s: SparkSession, dir: String): DataFrame = run(s, dir,
    """SELECT event_id,
      |  CAST(JSON_EXTRACT(JSON_SET(props, '$.n', CAST(JSON_EXTRACT(props, '$.k') AS SIGNED) * 2), '$.n') AS SIGNED) AS n2,
      |  CAST(JSON_EXTRACT(JSON_INSERT(props, '$.k', 0), '$.k') AS SIGNED) AS k_kept,
      |  CAST(JSON_EXTRACT(JSON_REMOVE(props, '$.k'), '$.k') AS SIGNED) AS k_removed,
      |  JSON_EXTRACT(JSON_MERGE_PATCH(props, '{"tag": "x"}'), '$.tag') AS tag,
      |  JSON_EXTRACT(JSON_ARRAY_APPEND(JSON_SET(props, '$.arr', 1), '$.arr', 2), '$.arr[1]') AS arr1
      |FROM events
      |ORDER BY event_id
      |LIMIT 500""".stripMargin)
}
