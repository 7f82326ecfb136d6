package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.TypeMapper
import graft.ddl.DdlConverter

/** Schema-conversion operators (SURVEY.md §1.2 type map + §2.3 D1/D2)
  * exposed at the driver contract: each produces a deterministic DataFrame
  * whose oracle is the expected mapping itself (a VALUES table in DuckDB) —
  * golden tests enforced by the correctness gate, not just ScalaTest.
  */
object SchemaOps {

  /** Representative corpus from the reference's typeMap
    * (sync_tableddl.go:113-167) — one row per mapping decision. */
  val typeCorpus: Seq[String] = Seq(
    "tinyint(1)", "tinyint", "smallint", "mediumint", "int", "int(11)",
    "bigint", "int unsigned", "bigint unsigned", "year",
    "decimal(10,2)", "numeric(20,4)", "float", "double", "real",
    "char(10)", "varchar(255)", "varchar(0)", "text", "longtext",
    "blob", "varbinary", "date", "time", "time(6)", "datetime",
    "timestamp(6)", "json", "json(1024)", "enum('a','b')", "set('x','y')",
    "point", "geometry")

  def q26TypeMapping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    typeCorpus.map { t =>
      val m = TypeMapper.map(t)
      (t, m.spark.simpleString, m.pg)
    }.toDF("mysql_type", "spark_type", "pg_type")
      .orderBy("mysql_type")
  }

  /** Fixture DDLs (FIXTURES.md §A shapes) converted to single-line PG DDL. */
  val ddlCorpus: Seq[(String, String)] = Seq(
    "case_11_autoincrement" ->
      "CREATE TABLE case_11_autoincrement (id int AUTO_INCREMENT PRIMARY KEY, name varchar(50) NOT NULL) ENGINE=InnoDB",
    "case_19_comments" ->
      "CREATE TABLE case_19_comments (c1 int COMMENT 'Simple comment') COMMENT='Table comment'",
    "case_27_check" ->
      "CREATE TABLE case_27_check (age int, CONSTRAINT chk_age CHECK (age > 18) ENFORCED)",
    "case_21_generated" ->
      "CREATE TABLE case_21_generated (c1 int, c2 int GENERATED ALWAYS AS (c1 * 2) VIRTUAL)")

  def q27DdlConvert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ddlCorpus.map { case (name, mysqlDdl) =>
      val stmts = DdlConverter.toPostgresDdl(DdlConverter.parse(mysqlDdl))
      (name, stmts.mkString("; ").replace("\n", " "))
    }.toDF("case_name", "pg_ddl")
      .orderBy("case_name")
  }
}
