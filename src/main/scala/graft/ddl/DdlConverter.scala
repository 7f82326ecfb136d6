package graft.ddl

import org.apache.spark.sql.types._
import graft.sqlrewrite.SqlRewriter.{matchParen, splitTopLevelCommas}
import graft.types.TypeMapper

/** MySQL `CREATE TABLE` → (Spark StructType, PostgreSQL DDL).
  *
  * Re-implements the reference's table-DDL conversion surface
  * (`ConvertTableDDL`, sync_tableddl.go:684-972 + helpers :178-681) with a
  * structural parser instead of ordered regex passes. Covered semantics:
  *  - quote-aware paren matching + top-level column-line splitting
  *    (:212-255, :709-776)
  *  - type mapping via [[TypeMapper]] (§1.2)
  *  - AUTO_INCREMENT → SERIAL/BIGSERIAL (:351-357, :793-821)
  *  - single-column PRIMARY KEY (:748-754, :914-924); composite PKs carried
  *  - CHECK constraints with ENFORCED strip + dedup (:424-437, :927-949)
  *  - charset/collate column+table modifiers removed (:369-384, :485-523)
  *  - engine/charset/row-format table options removed (:278-301)
  *  - PARTITION BY clauses removed (keywords.go:5-11, :270-276)
  *  - FULLTEXT / FOREIGN KEY / KEY / SPATIAL lines skipped (:737-745)
  *  - INVISIBLE columns dropped (:737-745)
  *  - column + table comments carried to COMMENT ON (:50-51, manager.go:1288-1414)
  *  - zero-date defaults dropped (:616-619); TEMPORARY kept (:182-186)
  *  - generated columns: VIRTUAL → STORED keyword rewrite (:627-673)
  *  - optional identifier lowercasing (config.go:67, :783-790)
  *  - MySQL version comments stripped (:63, :270)
  *
  * Driver-side, cold path: at scale this never touches executors — the data
  * plane reads the source schema from the catalog/parquet footer directly.
  */
object DdlConverter {

  final case class ColumnSpec(
      name: String,
      mysqlType: String,
      nullable: Boolean,
      default: Option[String],
      comment: Option[String],
      autoIncrement: Boolean,
      generated: Option[String]) {
    def mapped: TypeMapper.MappedType = TypeMapper.map(mysqlType)
  }

  final case class TableSpec(
      name: String,
      temporary: Boolean,
      columns: Seq[ColumnSpec],
      primaryKey: Seq[String],
      checks: Seq[String],
      comment: Option[String])

  private def unquoteIdent(s: String): String = {
    val t = s.trim
    if (t.startsWith("`"))
      // doubled backticks inside a backtick-quoted ident escape a backtick
      t.stripPrefix("`").stripSuffix("`").replace("``", "`")
    else t.stripPrefix("\"").stripSuffix("\"")
  }

  /** Backtick identifiers inside an expression → PG double quotes
    * (`` escapes unfolded). Literal-safe: only backtick runs are touched. */
  private def requoteIdents(expr: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < expr.length) {
      val c = expr.charAt(i)
      if (c == '`') {
        val e = new StringBuilder
        i += 1
        var done = false
        while (i < expr.length && !done) {
          if (expr.charAt(i) == '`' && i + 1 < expr.length && expr.charAt(i + 1) == '`') {
            e.append('`'); i += 2
          } else if (expr.charAt(i) == '`') { i += 1; done = true }
          else { e.append(expr.charAt(i)); i += 1 }
        }
        out.append('"').append(e.toString.replace("\"", "\"\"")).append('"')
      } else if (c == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < expr.length && !done) {
          if (expr.charAt(i) == '\\' && i + 1 < expr.length) i += 2
          else if (expr.charAt(i) == '\'' && i + 1 < expr.length && expr.charAt(i + 1) == '\'') i += 2
          else if (expr.charAt(i) == '\'') { i += 1; done = true }
          else i += 1
        }
        out.append(expr.substring(start, i))
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def stripVersionComments(s: String): String = {
    // single scan with JOINT literal/comment state: a mask-then-regex
    // approach mishandles an apostrophe INSIDE a comment (the masker,
    // which knows nothing of comments, opens a phantom literal there and
    // blanks past the newline, so the EOL-comment deletion overruns and
    // eats real DDL). Version-comment markers drop, their content stays;
    // `-- `/`# ` comments (whitespace-delimited, outside literals) run to
    // the REAL end of line.
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val quote = c
        val start = i
        i += 1
        var done = false
        while (i < s.length && !done) {
          val ch = s.charAt(i)
          if (ch == '\\' && quote != '`' && i + 1 < s.length) i += 2
          else if (ch == quote && i + 1 < s.length && s.charAt(i + 1) == quote) i += 2
          else if (ch == quote) { i += 1; done = true }
          else i += 1
        }
        out.append(s.substring(start, i))
      } else if (c == '/' && s.regionMatches(i, "/*!", 0, 3) &&
          i + 7 < s.length && s.substring(i + 3, i + 8).forall(_.isDigit)) {
        i += 8 // drop the version marker, keep its content
      } else if (c == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
        out.append(' '); i += 2
      } else if ((c == '-' && s.regionMatches(i, "-- ", 0, 3) ||
          c == '#' && s.regionMatches(i, "# ", 0, 2)) &&
          (out.isEmpty || out.last.isWhitespace)) {
        while (i < s.length && s.charAt(i) != '\n') i += 1 // to real EOL
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Length-preserving literal mask: contents of '...'/"..." literals are
    * replaced with spaces (quotes kept), so keyword/paren/comma positions
    * found on the masked copy are valid indexes into the RAW string.
    * Backtick-quoted identifiers have their content FULLY blanked too
    * (doubled-backtick escapes honored, the delimiting backticks kept):
    * a paren/comma inside an identifier — legal MySQL, e.g. `a(b` or
    * `x,y` — must not unbalance the paren matcher or split a column line,
    * a keyword inside one (CONSTRAINT `must check` ...) must not classify
    * the line, and an apostrophe inside one (`it's`) must not open a
    * phantom literal that would swallow the next separator.
    * `SqlRewriter.maskStringLiterals` swaps literals for tokens of a
    * different length and must never be mixed with raw-string offsets. */
  private def maskSameLen(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < out.length) {
      val quote = out(i)
      if (quote == '`') {
        i += 1
        var done = false
        while (i < out.length && !done) {
          val ch = out(i)
          if (ch == '`' && i + 1 < out.length && out(i + 1) == '`') {
            out(i) = ' '; out(i + 1) = ' '; i += 2
          }
          else if (ch == '`') { i += 1; done = true }
          else { out(i) = ' '; i += 1 }
        }
      } else if (quote == '\'' || quote == '"') {
        i += 1
        var done = false
        while (i < out.length && !done) {
          val ch = out(i)
          if (ch == '\\' && i + 1 < out.length) {
            out(i) = ' '; out(i + 1) = ' '; i += 2
          } else if (ch == quote && i + 1 < out.length && out(i + 1) == quote) {
            out(i) = ' '; out(i + 1) = ' '; i += 2
          } else if (ch == quote) { i += 1; done = true }
          else { out(i) = ' '; i += 1 }
        }
      } else i += 1
    }
    new String(out)
  }

  /** splitTopLevelCommas with literal awareness: depth/commas are tracked on
    * the same-length masked copy, slices are taken from the raw string — a
    * `COMMENT 'a, b'` or `DEFAULT ')('` can no longer split or unbalance. */
  private def splitLinesLiteralSafe(raw: String): List[String] = {
    val masked = maskSameLen(raw)
    val parts = List.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < masked.length) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          parts += raw.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    if (start <= raw.length) parts += raw.substring(start).trim
    parts.result()
  }

  // ------------------------------------------------------------- parsing

  def parse(ddl0: String): TableSpec = {
    val ddl = stripVersionComments(ddl0).trim
    val temporary = ddl.matches("(?is)^\\s*CREATE\\s+TEMPORARY\\s+.*")
    val nameM = "(?is)CREATE\\s+(?:TEMPORARY\\s+)?TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([`\"\\w.]+)".r
      .findFirstMatchIn(ddl)
      .getOrElse(throw new IllegalArgumentException(s"not a CREATE TABLE: ${ddl.take(60)}"))
    val tableName = unquoteIdent(nameM.group(1).split('.').last)

    val maskedDdl = maskSameLen(ddl)
    val open = maskedDdl.indexOf('(', nameM.end - 1)
    require(open >= 0, s"no column body (LIKE/AS-SELECT copy form?): ${ddl.take(60)}")
    val close = matchParen(maskedDdl, open)
    require(close > open, "unbalanced CREATE TABLE body")
    val body = ddl.substring(open + 1, close)
    val tail = ddl.substring(close + 1)

    val lines = splitLinesLiteralSafe(body)
    val cols = Vector.newBuilder[ColumnSpec]
    var pk: Seq[String] = Nil
    val checks = Vector.newBuilder[String]

    lines.foreach { raw =>
      val line = raw.trim
      // classify on a literal-masked, word-boundary basis: a column named
      // `keyword`/`checksum` must NOT be eaten by the KEY/CHECK branches,
      // and keywords inside COMMENT/DEFAULT literals must not classify.
      // The mask is LENGTH-PRESERVING, so every index found on `upper` is
      // a valid index into the raw `line` (a token mask would drift once a
      // literal precedes the keyword).
      val upper = maskSameLen(line).toUpperCase
      def starts(kw: String): Boolean = upper.matches(s"^$kw\\b.*")
      if (upper.startsWith("PRIMARY KEY")) {
        val o = upper.indexOf('(')
        if (o >= 0) {
          val c = matchParen(upper, o)
          pk = splitLinesLiteralSafe(line.substring(o + 1, c))
            .map(x => unquoteIdent(x.replaceAll("\\(\\d+\\)\\s*$", ""))) // prefix length
        }
      } else if (starts("CONSTRAINT") || starts("CHECK")) {
        val ci = "\\bCHECK\\b".r.findFirstMatchIn(upper).map(_.start).getOrElse(-1)
        if (ci >= 0) {
          val o = upper.indexOf('(', ci)
          if (o >= 0) {
            val c = matchParen(upper, o)
            if (c > o) {
              val expr = line.substring(o, c + 1)
                .replaceAll("(?i)\\s+(NOT\\s+)?ENFORCED\\s*", "")
              checks += expr.trim
            }
          }
        }
      } else if (starts("UNIQUE KEY") || starts("UNIQUE INDEX") ||
                 starts("KEY") || starts("INDEX") ||
                 starts("FULLTEXT") || starts("SPATIAL") ||
                 starts("FOREIGN KEY")) {
        // handled by the index converter / intentionally dropped (:737-745)
      } else if (line.nonEmpty) {
        parseColumn(line).foreach { c =>
          cols += c
          // inline PRIMARY KEY (masked: 'PRIMARY KEY' in a COMMENT literal
          // must not promote the column)
          if (upper.matches(".*\\bPRIMARY\\s+KEY\\b.*") && pk.isEmpty)
            pk = Seq(c.name)
        }
      }
    }

    // table options: comment + everything else dropped (incl. PARTITION BY)
    val comment = "(?is)\\bCOMMENT\\s*=?\\s*'((?:[^']|'')*)'".r
      .findFirstMatchIn(tail).map(_.group(1).replace("''", "'"))

    // CHECK dedup (:927-949)
    val dedupChecks = checks.result().distinct

    TableSpec(tableName, temporary, cols.result(), pk, dedupChecks, comment)
  }

  private val ZeroDate = "(?i)^'0000-00-00.*'$".r

  /** Parse one column definition line. Returns None for INVISIBLE columns. */
  private def parseColumn(line0: String): Option[ColumnSpec] = {
    var line = line0.trim
    // backtick idents may contain doubled-backtick escapes (`a``b`)
    val nameM = "^(`(?:[^`]|``)+`|\"[^\"]+\"|\\w+)\\s+".r.findFirstMatchIn(line)
      .getOrElse(return None)
    val name = unquoteIdent(nameM.group(1))
    line = line.substring(nameM.end)

    // flag checks run on a literal-masked copy so COMMENT/DEFAULT text
    // ('marks INVISIBLE rows', 'the PRIMARY KEY is...') can't trigger them
    def masked(s: String): String = maskSameLen(s).toUpperCase
    if (masked(line).contains(" INVISIBLE")) return None

    // type: word(+args) plus optional unsigned/zerofill modifiers
    val typeM = "(?i)^([a-z]+(?:\\s+precision|\\s+varying)?(?:\\s*\\([^)]*\\))?(?:\\s+unsigned)?(?:\\s+zerofill)?)".r
      .findFirstMatchIn(line).getOrElse(return None)
    val mysqlType = typeM.group(1).trim
    var rest = line.substring(typeM.end)

    // strip charset/collation column modifiers (:369-384, :485-523)
    rest = rest.replaceAll("(?i)\\s+CHARACTER\\s+SET\\s+\\w+", "")
      .replaceAll("(?i)\\s+COLLATE\\s+\\w+", "")
      .replaceAll("(?i)\\s+ON\\s+UPDATE\\s+CURRENT_TIMESTAMP(\\(\\d*\\))?", "")

    val upperRest = masked(rest)
    val autoInc = upperRest.contains("AUTO_INCREMENT")
    val notNull = upperRest.contains("NOT NULL")

    // keyword clauses are LOCATED on the literal-blanked mask (a COMMENT
    // string containing 'DEFAULT 0' or 'GENERATED ALWAYS AS (x)' must not
    // fabricate a clause) and their text EXTRACTED from the raw string by
    // index — maskedRest is same-length by construction
    val maskedRest = upperRest // same maskSameLen pass, uppercase is index-safe
    val generated = "(?i)GENERATED\\s+ALWAYS\\s+AS\\s*(\\(.*\\))\\s*(VIRTUAL|STORED)?".r
      .findFirstMatchIn(maskedRest)
      .map(m => rest.substring(m.start(1), m.end(1))) // VIRTUAL→STORED at emit (:627-673)

    val default = "(?i)\\bDEFAULT\\s+('(?:[^']|'')*'|[\\w.()+-]+)".r
      .findFirstMatchIn(maskedRest)
      .map(m => rest.substring(m.start(1), m.end(1))).filter {
        case ZeroDate() => false // zero dates dropped (:616-619)
        case _ => true
      }

    val comment = "(?i)\\bCOMMENT\\s+'((?:[^']|'')*)'".r
      .findFirstMatchIn(maskedRest)
      .map(m => rest.substring(m.start(1), m.end(1)).replace("''", "'"))

    Some(ColumnSpec(name, mysqlType, nullable = !notNull, default, comment,
      autoIncrement = autoInc, generated = generated))
  }

  // ------------------------------------------------------------ emission

  /** PostgreSQL reserved-word-safe identifier: always double-quote, like the
    * reference (sync_viewddl.go:923-934, sync_tableddl.go:891). */
  private def q(ident: String, lower: Boolean): String =
    "\"" + (if (lower) ident.toLowerCase else ident) + "\""

  /** Original→converted identifier map threaded from DDL conversion to
    * index/comment conversion (reference sync_tableddl.go:173,
    * manager.go:30,1219-1220,1464-1466). */
  def columnNameMap(spec: TableSpec, lowercase: Boolean): Map[String, String] =
    (spec.columns.map(_.name).map(n => n -> (if (lowercase) n.toLowerCase else n))
      :+ (spec.name -> (if (lowercase) spec.name.toLowerCase else spec.name))).toMap

  /** Transfer-facing StructType; `mysqlCompat = true` keeps MySQL's own
    * runtime typing (tinyint(1) numeric, native TIME) for serving the
    * source's views rather than the PG-target mapping. */
  def toStructType(spec: TableSpec, mysqlCompat: Boolean = false): StructType =
    StructType(spec.columns.filter(_.generated.isEmpty).map { c =>
      val m = new MetadataBuilder()
      c.comment.foreach(m.putString("comment", _))
      c.default.foreach(m.putString("default", _))
      val t =
        if (mysqlCompat)
          TypeMapper.map(c.mysqlType, tinyint1Boolean = false, timeNative = true).spark
        else c.mapped.spark
      StructField(c.name, t, c.nullable, m.build())
    })

  /** Emit PG CREATE TABLE + COMMENT ON statements. */
  def toPostgresDdl(spec: TableSpec, lowercase: Boolean = false): Seq[String] = {
    val colLines = spec.columns.map { c =>
      val pgType =
        if (c.autoIncrement) TypeMapper.serialFor(c.mysqlType).getOrElse(c.mapped.pg)
        else c.mapped.pg
      val base = s"  ${q(c.name, lowercase)} $pgType"
      val gen = c.generated.map(g =>
        s" GENERATED ALWAYS AS ${requoteIdents(g)} STORED").getOrElse("")
      val nn = if (!c.nullable && !c.autoIncrement) " NOT NULL" else ""
      val dflt = c.default.filter(_ => c.generated.isEmpty && !c.autoIncrement)
        .map(d => s" DEFAULT $d").getOrElse("")
      base + gen + nn + dflt
    }
    val pkLine =
      if (spec.primaryKey.nonEmpty)
        Seq(s"  PRIMARY KEY (${spec.primaryKey.map(q(_, lowercase)).mkString(", ")})")
      else Nil
    // real SHOW CREATE TABLE output backtick-quotes identifiers inside
    // constraint bodies — PG needs double quotes
    val checkLines = spec.checks.map(c => s"  CHECK ${requoteIdents(c)}")
    val tempKw = if (spec.temporary) "TEMPORARY " else ""
    val create =
      s"CREATE ${tempKw}TABLE ${q(spec.name, lowercase)} (\n" +
        (colLines ++ pkLine ++ checkLines).mkString(",\n") + "\n)"
    val tableComment = spec.comment.map(c =>
      s"COMMENT ON TABLE ${q(spec.name, lowercase)} IS '${c.replace("'", "''")}'")
    val colComments = spec.columns.flatMap(c => c.comment.map(cm =>
      s"COMMENT ON COLUMN ${q(spec.name, lowercase)}.${q(c.name, lowercase)} IS '${cm.replace("'", "''")}'"))
    Seq(create) ++ tableComment ++ colComments
  }

  /** The reference's multi-format `COMMENT ON COLUMN` retry
    * (manager.go:1337-1414): a comment that fails under the emitted
    * quoting is re-tried under the other casings/quotings a PG-side
    * identifier may have folded to — quoted lower, quoted upper, fully
    * unquoted — before being reported as failed. Pure variant
    * generation; [[graft.pipeline.Pipeline.execLenient]] walks the list
    * on execution failure. Returns Nil for anything that is not a
    * single-column comment statement. */
  def columnCommentFallbacks(ddl: String): Seq[String] = {
    // optional leading schema qualifier (schema.table.col) passes through
    // unchanged — PG-side folding can affect any emitted identifier, and
    // a schema-qualified comment previously got no retry variants at all
    val Re = ("(?is)^\\s*COMMENT\\s+ON\\s+COLUMN\\s+" +
      "(?:(\"?)([\\w$]+)\\1\\.)?(\"?)([\\w$]+)\\3\\.(\"?)([\\w$]+)\\5" +
      "\\s+IS\\s+(.+)$").r
    ddl.trim match {
      case Re(_, schema, _, tbl, _, col, lit) =>
        val pre = Option(schema).map(s => s""""$s".""").getOrElse("")
        // the schema qualifier can fold independently of the table (an
        // unquoted CREATE SCHEMA folds to lowercase while the table kept
        // its quoted case) — retry the folded-schema spelling too
        val preLower =
          Option(schema).map(s => s""""${s.toLowerCase}".""").getOrElse("")
        val preBare = Option(schema).map(_ + ".").getOrElse("")
        Seq(
          s"""COMMENT ON COLUMN $pre"$tbl"."$col" IS $lit""",
          s"""COMMENT ON COLUMN $pre"$tbl"."${col.toLowerCase}" IS $lit""",
          s"""COMMENT ON COLUMN $pre"$tbl"."${col.toUpperCase}" IS $lit""",
          s"""COMMENT ON COLUMN $pre"${tbl.toLowerCase}"."${col.toLowerCase}" IS $lit""",
          s"""COMMENT ON COLUMN $preLower"$tbl"."${col.toLowerCase}" IS $lit""",
          s"""COMMENT ON COLUMN $preLower"${tbl.toLowerCase}"."${col.toLowerCase}" IS $lit""",
          s"""COMMENT ON COLUMN $preBare$tbl.$col IS $lit""")
          .distinct.filterNot(_ == ddl.trim)
      case _ => Nil
    }
  }

  /** Target CREATE TABLE straight from a Spark schema (for sources that
    * carry schema natively — parquet footers, JDBC metadata — where no
    * MySQL DDL text exists to parse). Types are the ANSI spellings Derby
    * and PostgreSQL share (DOUBLE PRECISION, not DOUBLE — PG has no bare
    * DOUBLE); binary is the one divergent type, chosen per target dialect
    * (PG BYTEA / everywhere-else BLOB). */
  def ddlForSchema(table: String, schema: StructType,
                   lowercase: Boolean = false,
                   targetUrl: String = "jdbc:postgresql:"): String = {
    val binary = if (targetUrl.startsWith("jdbc:postgresql")) "BYTEA" else "BLOB"
    def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case BinaryType => binary
      case StringType => "VARCHAR(4000)"
      case other => "VARCHAR(4000)"
    }
    val cols = schema.fields.map { f =>
      s"  ${q(f.name, lowercase)} ${sqlType(f.dataType)}" +
        (if (f.nullable) "" else " NOT NULL")
    }
    s"CREATE TABLE ${q(table, lowercase)} (\n${cols.mkString(",\n")}\n)"
  }

  // ------------------------------------------- view (sync_viewddl.go)

  /** `ConvertViewDDL` (sync_viewddl.go:141-917): rewrite the MySQL SELECT
    * body via [[graft.sqlrewrite.SqlRewriter]] and wrap it as a drop +
    * create-or-replace pair (the reference emits
    * `DROP VIEW IF EXISTS ... CASCADE; CREATE OR REPLACE VIEW ... AS ...`).
    * Returned as two statements because JDBC `Statement.execute` targets
    * generally reject multi-statement strings; the drop is best-effort
    * (ignorable failure) so a fresh target works without it. */
  def viewDdl(view: String, selectBody: String,
              lowercase: Boolean = false): Seq[String] = {
    val body0 = graft.sqlrewrite.SqlRewriter.rewrite(selectBody.trim)
      .stripSuffix(";").trim
    // lowercase with literals MASKED: the reference lowercases the whole
    // statement including string literals (sync_viewddl.go:915), which
    // silently changes WHERE status = 'ACTIVE' semantics — masking first
    // keeps identifier folding without corrupting data comparisons
    val body1 =
      if (lowercase) graft.sqlrewrite.SqlRewriter.lowercaseOutsideLiterals(body0)
      else body0
    // DIALECT BOUNDARY: SqlRewriter targets Spark SQL (the repo executes
    // rewritten views through Catalyst — operators/Views.scala); when the
    // emitted DDL runs on a JDBC target instead, the unambiguous swaps are
    // applied here (backtick identifiers → double quotes, IFNULL →
    // COALESCE — FunctionDdl's pgScrub rule), LITERAL-SAFE: both run on
    // the masked copy so 'use IFNULL(..)' inside a string survives.
    // Views whose bodies need Spark-specific constructs (GROUP_CONCAT's
    // collect_list lambdas, Java date patterns) remain Spark-dialect and
    // will be reported as stage failures on targets that cannot parse
    // them rather than silently rewritten to something different.
    val body = {
      val (masked, lits) = graft.sqlrewrite.SqlRewriter.maskStringLiterals(body1)
      val swapped = masked.replaceAll("(?i)\\bIFNULL\\s*\\(", "COALESCE(")
      val requoted = lits.map { l =>
        if (l.length >= 2 && l.head == '`')
          "\"" + l.substring(1, l.length - 1)
            .replace("``", "`").replace("\"", "\"\"") + "\""
        else l
      }
      graft.sqlrewrite.SqlRewriter.unmask(swapped, requoted)
    }
    Seq(
      s"DROP VIEW IF EXISTS ${q(view, lowercase)} CASCADE",
      s"CREATE OR REPLACE VIEW ${q(view, lowercase)} AS $body")
  }

  // ------------------------------------------- index / user / priv (D2-D4)

  /** `ConvertIndexDDL` (sync_indexes.go:11-87): table-prefixed name,
    * truncated to PG's 63-byte identifier limit. */
  def indexDdl(table: String, index: String, columns: Seq[String],
               unique: Boolean, lowercase: Boolean = false): Option[String] = {
    if (columns.isEmpty || index.equalsIgnoreCase("PRIMARY")) return None
    val name0 = s"${table}_$index"
    val name = if (name0.length > 63) name0.substring(0, 63) else name0
    val u = if (unique) "UNIQUE " else ""
    Some(s"CREATE ${u}INDEX IF NOT EXISTS ${q(name, lowercase)} ON ${q(table, lowercase)} " +
      s"(${columns.map(q(_, lowercase)).mkString(", ")})")
  }

  /** `ConvertUserDDL` (sync_user_privilege.go:11-74): host part stripped
    * (`'u'@'%'` → `u`, :15-19 — PG roles have no host), skip mysql.*
    * accounts, dots → underscores, CREATE USER + grant expansion. The
    * stripped name is what the privileges stage grants to, so both stages
    * target the SAME role. */
  def userDdl(user: String, grants: Seq[String]): Seq[String] = {
    val bare = user.split("@")(0)
    if (bare.startsWith("mysql.")) return Nil
    val u = bare.replace(".", "_")
    val create =
      s"""DO $$$$ BEGIN CREATE USER "$u"; EXCEPTION WHEN duplicate_object THEN NULL; END $$$$"""
    val converted = grants.flatMap { g =>
      // parse the privilege LIST (everything before ON), word-bounded:
      // a substring scan over the whole statement matched object names —
      // "GRANT SELECT ON `insert_log`" silently granted INSERT too
      // (privilege escalation on the target)
      val head = g.toUpperCase.split("(?i)\\bON\\b")(0)
      if (head.contains("ALL PRIVILEGES"))
        Seq(s"""GRANT ALL PRIVILEGES ON ALL TABLES IN SCHEMA public TO "$u"""",
            s"""GRANT ALL PRIVILEGES ON ALL SEQUENCES IN SCHEMA public TO "$u"""")
      else {
        val privs = Seq("SELECT", "INSERT", "UPDATE", "DELETE")
          .filter(p => ("\\b" + p + "\\b").r.findFirstIn(head).isDefined)
        if (privs.nonEmpty)
          Seq(s"""GRANT ${privs.mkString(", ")} ON ALL TABLES IN SCHEMA public TO "$u"""")
        else Nil
      }
    }
    create +: converted
  }

  /** `ConvertTablePrivilegeDDL` (sync_table_privilege.go:12-51); user
    * names normalize exactly like [[userDdl]] (host stripped,
    * dots → underscores) so grants land on the role that stage created. */
  def tablePrivDdl(user: String, table: String, privCsv: String): Seq[String] =
    privCsv.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
      s"""GRANT ${p.toUpperCase} ON "$table" TO "${user.split("@")(0).replace(".", "_")}""""
    }.toSeq
}
