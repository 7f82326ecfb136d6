package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.{MySqlGraftDialect, TypeMapper}
import graft.types.TypeMapper.MappedType

/** Golden tests from the reference's 63-case corpus (FIXTURES.md §A). */
class TypeMapperSpec extends AnyFunSuite {

  private def m(t: String) = TypeMapper.map(t)

  test("case_01_integers: widths") {
    assert(m("tinyint") == MappedType(ShortType, "SMALLINT"))
    assert(m("smallint") == MappedType(ShortType, "SMALLINT"))
    assert(m("mediumint") == MappedType(IntegerType, "INTEGER"))
    assert(m("int") == MappedType(IntegerType, "INTEGER"))
    assert(m("integer") == MappedType(IntegerType, "INTEGER"))
    assert(m("bigint") == MappedType(LongType, "BIGINT"))
    // display width dropped
    assert(m("int(11)") == MappedType(IntegerType, "INTEGER"))
    assert(m("bigint(20)") == MappedType(LongType, "BIGINT"))
  }

  test("case_02_boolean: tinyint(1) special case") {
    assert(m("tinyint(1)") == MappedType(BooleanType, "BOOLEAN"))
    assert(m("TINYINT(1)") == MappedType(BooleanType, "BOOLEAN"))
    assert(m("tinyint(4)") == MappedType(ShortType, "SMALLINT"))
  }

  test("case_03_floats: precision preservation") {
    assert(m("float") == MappedType(FloatType, "REAL"))
    assert(m("float(10,2)") == MappedType(FloatType, "REAL"))
    assert(m("double") == MappedType(DoubleType, "DOUBLE PRECISION"))
    assert(m("double precision") == MappedType(DoubleType, "DOUBLE PRECISION"))
    assert(m("real") == MappedType(DoubleType, "DOUBLE PRECISION"))
    assert(m("decimal(10,2)") == MappedType(DecimalType(10, 2), "DECIMAL(10,2)"))
    assert(m("numeric(10,2)") == MappedType(DecimalType(10, 2), "NUMERIC(10,2)"))
    assert(m("decimal") == MappedType(DecimalType(10, 0), "DECIMAL(10,0)"))
  }

  test("case_09_datetime: temporal types") {
    assert(m("date") == MappedType(DateType, "DATE"))
    assert(m("time") == MappedType(LongType, "TIME"))
    assert(m("time(6)") == MappedType(LongType, "TIME(6)"))
    assert(m("datetime") == MappedType(TimestampType, "TIMESTAMP"))
    assert(m("datetime(3)") == MappedType(TimestampType, "TIMESTAMP(3)"))
    assert(m("timestamp") == MappedType(TimestampType, "TIMESTAMP"))
    assert(m("timestamp(6)") == MappedType(TimestampType, "TIMESTAMP(6)"))
    assert(m("year") == MappedType(IntegerType, "INTEGER"))
  }

  test("strings, enum/set, char(0) clamps") {
    assert(m("char(10)") == MappedType(StringType, "CHAR(10)"))
    assert(m("varchar(255)") == MappedType(StringType, "VARCHAR(255)"))
    assert(m("char(0)") == MappedType(StringType, "CHAR(1)"))
    assert(m("varchar(0)") == MappedType(StringType, "VARCHAR(1)"))
    assert(m("text") == MappedType(StringType, "TEXT"))
    assert(m("longtext") == MappedType(StringType, "TEXT"))
    assert(m("enum('a','b','c')") == MappedType(StringType, "VARCHAR(255)"))
    assert(m("set('x','y')") == MappedType(StringType, "VARCHAR(255)"))
  }

  test("case_14 binary family / case_22 spatial") {
    Seq("blob", "longblob", "mediumblob", "tinyblob", "binary", "varbinary")
      .foreach(t => assert(m(t).spark == BinaryType))
    assert(m("blob").pg == "BYTEA")
    assert(m("point") == MappedType(BinaryType, "POINT"))
    Seq("geometry", "linestring", "polygon", "multipoint", "geometrycollection")
      .foreach(t => assert(m(t) == MappedType(BinaryType, "BYTEA")))
  }

  test("json display-width collapse") {
    assert(m("json") == MappedType(StringType, "JSON"))
    assert(m("json(1024)") == MappedType(StringType, "JSON"))
    assert(m("jsonb") == MappedType(StringType, "JSONB"))
  }

  test("case_12 unsigned: widened (fidelity fix over reference)") {
    assert(m("int unsigned") == MappedType(LongType, "BIGINT"))
    assert(m("tinyint unsigned") == MappedType(IntegerType, "INTEGER"))
    assert(m("bigint unsigned") == MappedType(DecimalType(20, 0), "NUMERIC(20,0)"))
    // reference-compat mode strips instead
    assert(TypeMapper.map("int unsigned", widenUnsigned = false) ==
      MappedType(IntegerType, "INTEGER"))
    // zerofill stripped either way
    assert(m("int(10) zerofill") == MappedType(IntegerType, "INTEGER"))
    // tinyint(1) unsigned is NOT boolean
    assert(m("tinyint(1) unsigned") == MappedType(IntegerType, "INTEGER"))
  }

  test("case_11/24 auto-increment serial mapping") {
    assert(TypeMapper.serialFor("int") == Some("SERIAL"))
    assert(TypeMapper.serialFor("bigint") == Some("BIGSERIAL"))
    assert(TypeMapper.serialFor("smallint") == Some("SMALLSERIAL"))
    assert(TypeMapper.serialFor("varchar(10)") == None)
    // unsigned widens one step, consistent with map()'s widening (ADVICE r1)
    assert(TypeMapper.serialFor("int unsigned") == Some("BIGSERIAL"))
    assert(TypeMapper.serialFor("int(10) unsigned") == Some("BIGSERIAL"))
    assert(TypeMapper.serialFor("smallint unsigned") == Some("SERIAL"))
    assert(TypeMapper.serialFor("tinyint unsigned") == Some("SERIAL"))
    assert(TypeMapper.serialFor("bigint unsigned") == Some("BIGSERIAL"))
  }

  test("MySqlGraftDialect maps JDBC metadata like the reference typeMap") {
    import org.apache.spark.sql.types._
    val d = MySqlGraftDialect
    def ct(tn: String, size: Int = 0) =
      d.getCatalystType(java.sql.Types.OTHER, tn, size, new MetadataBuilder)
    assert(ct("TINYINT", 1) == Some(BooleanType))
    assert(ct("TINYINT UNSIGNED", 1) == Some(IntegerType))  // unsigned: never boolean
    assert(ct("SMALLINT UNSIGNED") == Some(IntegerType))
    assert(ct("INT UNSIGNED") == Some(LongType))
    assert(ct("MEDIUMINT UNSIGNED") == Some(LongType))
    assert(ct("BIGINT UNSIGNED") == Some(DecimalType(20, 0)))
    assert(ct("INT") == None)           // signed ints: Spark defaults are right
    assert(ct("YEAR") == Some(IntegerType))
    assert(ct("JSON") == Some(StringType))
    assert(ct("POINT") == Some(BinaryType))
    assert(ct("TIME") == None)          // deliberate: JDBC Time conversion intact
    assert(d.quoteIdentifier("or`der") == "`or``der`")
    assert(MySqlGraftDialect.sourceUrl("jdbc:mysql://h/db")
      .contains("?zeroDateTimeBehavior=convertToNull"))
    assert(MySqlGraftDialect.sourceUrl("jdbc:mysql://h/db?x=1")
      .contains("&zeroDateTimeBehavior=convertToNull"))
    // registration resolves for mysql URLs: the registry aggregates this
    // dialect with Spark's built-in MySQL dialect, ours taking precedence
    MySqlGraftDialect.install()
    val resolved = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:mysql://h/db")
    assert(resolved.canHandle("jdbc:mysql://h/db"))
    assert(resolved.getCatalystType(java.sql.Types.OTHER, "INT UNSIGNED", 0,
      new MetadataBuilder) == Some(LongType))
    assert(resolved.getCatalystType(java.sql.Types.OTHER, "BIGINT UNSIGNED", 0,
      new MetadataBuilder) == Some(DecimalType(20, 0)))
  }
}
