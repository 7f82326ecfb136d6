package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sqlrewrite.SqlRewriter
import scala.io.Source

/** Parity gate against the reference's own fixture corpus: every view in
  * `scripts/mysql/create_view.sql` (read from the read-only reference
  * checkout at test time — never copied into this repo) must rewrite into
  * SQL that Spark's parser accepts. Execution needs the case_* tables,
  * which don't exist here; parseability is the round-1 bar, and it already
  * exceeds the reference's own guarantee (it never validated its emitted
  * text against a live parser at all).
  */
class ReferenceCorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val corpusPath = "/root/reference/scripts/mysql/create_view.sql"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("ref-corpus-spec")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Split the script into statements on ';' at end of line, keep the
    * CREATE VIEW ones. */
  private def viewStatements(): Seq[String] = {
    val text = {
      val s = Source.fromFile(corpusPath, "UTF-8")
      try s.mkString finally s.close()
    }
    text.split(";\\s*\\n")
      .map(_.trim)
      .filter(_.toUpperCase.contains("CREATE OR REPLACE VIEW"))
      .map(_.replaceAll("(?s)/\\*.*?\\*/", ""))   // block comments
      .map(_.replaceAll("(?m)^\\s*--.*$", ""))    // line comments
      .toSeq
  }

  test("reference corpus present and non-trivial") {
    val views = viewStatements()
    assert(views.size >= 10, s"expected >=10 views, got ${views.size}")
  }

  test("every reference view rewrites to parseable Spark SQL") {
    val parser = spark.sessionState.sqlParser
    val failures = viewStatements().flatMap { stmt =>
      // convert CREATE OR REPLACE VIEW x AS <body> → parse the full
      // statement (Spark supports CREATE OR REPLACE [TEMPORARY] VIEW)
      val rewritten = SqlRewriter.rewrite(stmt)
      try { parser.parsePlan(rewritten); None }
      catch { case e: Exception =>
        val name = "(?i)VIEW\\s+(\\S+)".r.findFirstMatchIn(stmt).map(_.group(1)).getOrElse("?")
        Some(s"$name: ${e.getMessage.linesIterator.take(2).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty, "unparseable rewritten views:\n" + failures.mkString("\n"))
  }
}
