package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, DriverManager, ResultSet}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcSource

/** Exercises JdbcSource's metadata paths (O1/O3/O4) against a mock JDBC
  * driver built from JDK dynamic proxies — no database and no driver jar
  * needed. The mock registers for `jdbc:graftmock:` URLs, so the
  * production code path (DriverManager → Connection → DatabaseMetaData)
  * runs unmodified.
  */
class JdbcSourceSpec extends AnyFunSuite with SparkSuite {

  /** A forward-only ResultSet over (columnLabel → value) rows. A missing
    * label throws, like a real driver's unknown-column SQLException —
    * which exercises the production code's `Try(IS_AUTOINCREMENT)` guard.
    */
  private def resultSet(rows: Seq[Map[String, Any]]): ResultSet = {
    var i = -1
    proxy[ResultSet] { (m, args) =>
      m.getName match {
        case "next"      => i += 1; java.lang.Boolean.valueOf(i < rows.length)
        case "getString" => rows(i)(args(0).asInstanceOf[String]).asInstanceOf[String]
        case "getInt"    => Int.box(rows(i)(args(0).asInstanceOf[String]).asInstanceOf[Int])
        case "getShort"  => Short.box(rows(i)(args(0).asInstanceOf[String]).asInstanceOf[Int].toShort)
        case "close"     => null
        case _           => null
      }
    }
  }

  private def proxy[T](handler: (Method, Array[AnyRef]) => AnyRef)(
      implicit ct: scala.reflect.ClassTag[T]): T =
    Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array(ct.runtimeClass),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          handler(m, if (args == null) Array.empty else args)
      }).asInstanceOf[T]

  private val tableRows = Seq(
    Map[String, Any]("TABLE_NAME" -> "users"),
    Map[String, Any]("TABLE_NAME" -> "accounts"))

  private val columnRows = Map(
    "users" -> Seq(
      Map[String, Any]("COLUMN_NAME" -> "id", "TYPE_NAME" -> "BIGINT",
        "NULLABLE" -> DatabaseMetaData.columnNoNulls, "COLUMN_DEF" -> null),
      Map[String, Any]("COLUMN_NAME" -> "email", "TYPE_NAME" -> "TEXT",
        "NULLABLE" -> DatabaseMetaData.columnNullable, "COLUMN_DEF" -> "''")),
    "accounts" -> Seq(
      Map[String, Any]("COLUMN_NAME" -> "user_id", "TYPE_NAME" -> "BIGINT",
        "NULLABLE" -> DatabaseMetaData.columnNoNulls, "COLUMN_DEF" -> null)))

  private val fkRows = Map(
    "users" -> Seq.empty[Map[String, Any]],
    "accounts" -> Seq(
      Map[String, Any]("FKTABLE_NAME" -> "accounts", "FKCOLUMN_NAME" -> "user_id",
        "PKTABLE_NAME" -> "users", "PKCOLUMN_NAME" -> "id")))

  /** Swappable recorded-metadata fixtures (default: the generic shape;
    * tests below swap in MySQL- and Postgres-driver shapes).
    */
  private var columnFixture: Map[String, Seq[Map[String, Any]]] = columnRows
  private var pkFixture: Map[String, Seq[Map[String, Any]]] = Map.empty.withDefaultValue(Seq.empty)

  private def metaData: DatabaseMetaData = proxy[DatabaseMetaData] { (m, args) =>
    m.getName match {
      case "getTables"       => resultSet(tableRows)
      case "getColumns"      => resultSet(columnFixture(args(2).asInstanceOf[String]))
      case "getImportedKeys" => resultSet(fkRows(args(2).asInstanceOf[String]))
      case "getPrimaryKeys"  => resultSet(pkFixture(args(2).asInstanceOf[String]))
      case _                 => null
    }
  }

  private def connection: Connection = proxy[Connection] { (m, _) =>
    m.getName match {
      case "getMetaData" => metaData
      case "close"       => null
      case _             => null
    }
  }

  // java.sql.Driver is small enough to implement directly; registering it
  // routes DriverManager.getConnection("jdbc:graftmock:...") to the mock.
  private object MockDriver extends java.sql.Driver {
    override def connect(url: String, info: java.util.Properties): Connection =
      if (acceptsURL(url)) connection else null
    override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftmock:")
    override def getPropertyInfo(u: String, i: java.util.Properties) = Array.empty
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
  }
  DriverManager.registerDriver(MockDriver)

  private def source = JdbcSource(spark, "jdbc:graftmock:db", "u", "p")

  test("tables: listed and sorted (O1 contract)") {
    assert(source.tables == Seq("accounts", "users"))
  }

  test("columns: name/type/nullability/default from DatabaseMetaData (O3)") {
    val cols = source.columns("users")
    assert(cols.map(_.name) == Seq("id", "email"))
    assert(cols.head.dataType == "BIGINT" && !cols.head.isNullable)
    assert(cols(1).isNullable && cols(1).default.contains("''"))
  }

  test("foreignKeys: edges assembled across tables (O4)") {
    val fks = source.foreignKeys
    assert(fks.size == 1)
    val fk = fks.head
    assert(fk.table == "accounts" && fk.column == "user_id")
    assert(fk.referencedTable == "users" && fk.referencedColumn == "id")
  }

  test("renderType: MySQL and Postgres catalog TYPE_NAME shapes") {
    import JdbcSource.renderType
    // MySQL DatabaseMetaData reports upper-case names with sizes
    assert(renderType("VARCHAR", 255, 0) == "VARCHAR(255)")
    assert(renderType("CHAR", 2, 0) == "CHAR(2)")
    assert(renderType("DECIMAL", 10, 2) == "DECIMAL(10,2)")
    assert(renderType("BIGINT", 19, 0) == "BIGINT")
    assert(renderType("DATETIME", 19, 0) == "DATETIME")
    assert(renderType("TEXT", 65535, 0) == "TEXT")
    // Postgres (pgjdbc) reports lower-case names; sized families render
    // upper-cased with their size, the rest pass through
    assert(renderType("varchar", 120, 0) == "VARCHAR(120)")
    assert(renderType("numeric", 12, 4) == "NUMERIC(12,4)")
    assert(renderType("int8", 19, 0) == "INT8")
    assert(renderType("timestamptz", 35, 6) == "TIMESTAMPTZ")
    // degenerate sizes never emit "(0)"
    assert(renderType("VARCHAR", 0, 0) == "VARCHAR")
    // a negative DECIMAL_DIGITS (seen from some drivers) clamps to 0
    assert(renderType("NUMERIC", 10, -1) == "NUMERIC(10,0)")
    assert(renderType(null, 5, 0) == "")
  }

  test("schemaDDL: MySQL-shaped metadata (sizes, auto-increment, defaults)") {
    val saved = (columnFixture, pkFixture)
    try {
      columnFixture = Map("users" -> Seq(
        Map[String, Any]("COLUMN_NAME" -> "id", "TYPE_NAME" -> "BIGINT",
          "COLUMN_SIZE" -> 19, "DECIMAL_DIGITS" -> 0,
          "NULLABLE" -> DatabaseMetaData.columnNoNulls, "COLUMN_DEF" -> null,
          "IS_AUTOINCREMENT" -> "YES"),
        Map[String, Any]("COLUMN_NAME" -> "email", "TYPE_NAME" -> "VARCHAR",
          "COLUMN_SIZE" -> 255, "DECIMAL_DIGITS" -> 0,
          "NULLABLE" -> DatabaseMetaData.columnNullable, "COLUMN_DEF" -> "''",
          "IS_AUTOINCREMENT" -> "NO"),
        Map[String, Any]("COLUMN_NAME" -> "balance", "TYPE_NAME" -> "DECIMAL",
          "COLUMN_SIZE" -> 10, "DECIMAL_DIGITS" -> 2,
          "NULLABLE" -> DatabaseMetaData.columnNullable, "COLUMN_DEF" -> null,
          "IS_AUTOINCREMENT" -> "NO"),
        Map[String, Any]("COLUMN_NAME" -> "created", "TYPE_NAME" -> "DATETIME",
          "COLUMN_SIZE" -> 19, "DECIMAL_DIGITS" -> 0,
          "NULLABLE" -> DatabaseMetaData.columnNoNulls,
          "COLUMN_DEF" -> "CURRENT_TIMESTAMP", "IS_AUTOINCREMENT" -> "NO")))
      pkFixture = Map("users" -> Seq(
        Map[String, Any]("KEY_SEQ" -> 1, "COLUMN_NAME" -> "id")))
      assert(source.schemaDDL("users") ==
        """CREATE TABLE "users" (
          |  "id" BIGINT GENERATED BY DEFAULT AS IDENTITY NOT NULL,
          |  "email" VARCHAR(255) DEFAULT '',
          |  "balance" DECIMAL(10,2),
          |  "created" DATETIME DEFAULT CURRENT_TIMESTAMP NOT NULL,
          |  PRIMARY KEY ("id")
          |);""".stripMargin)
    } finally { columnFixture = saved._1; pkFixture = saved._2 }
  }

  test("schemaDDL: Postgres-shaped metadata (lower-case types, nextval default, composite PK)") {
    val saved = (columnFixture, pkFixture)
    try {
      // pgjdbc shape: lower-case TYPE_NAME; serial columns surface as
      // int4 + nextval() default and IS_AUTOINCREMENT=YES; NO metadata
      // row carries IS_AUTOINCREMENT for "plain" drivers — the ledger
      // row omits the key entirely to exercise the Try fallback
      columnFixture = Map("users" -> Seq(
        Map[String, Any]("COLUMN_NAME" -> "id", "TYPE_NAME" -> "int4",
          "COLUMN_SIZE" -> 10, "DECIMAL_DIGITS" -> 0,
          "NULLABLE" -> DatabaseMetaData.columnNoNulls,
          "COLUMN_DEF" -> "nextval('users_id_seq'::regclass)",
          "IS_AUTOINCREMENT" -> "YES"),
        Map[String, Any]("COLUMN_NAME" -> "region", "TYPE_NAME" -> "varchar",
          "COLUMN_SIZE" -> 32, "DECIMAL_DIGITS" -> 0,
          "NULLABLE" -> DatabaseMetaData.columnNoNulls, "COLUMN_DEF" -> null,
          "IS_AUTOINCREMENT" -> "NO"),
        // no IS_AUTOINCREMENT key at all: the production Try must treat
        // it as not-auto and keep the declared default
        Map[String, Any]("COLUMN_NAME" -> "ledger", "TYPE_NAME" -> "numeric",
          "COLUMN_SIZE" -> 12, "DECIMAL_DIGITS" -> 4,
          "NULLABLE" -> DatabaseMetaData.columnNullable, "COLUMN_DEF" -> "0")))
      pkFixture = Map("users" -> Seq(
        Map[String, Any]("KEY_SEQ" -> 2, "COLUMN_NAME" -> "region"),
        Map[String, Any]("KEY_SEQ" -> 1, "COLUMN_NAME" -> "id")))
      assert(source.schemaDDL("users") ==
        """CREATE TABLE "users" (
          |  "id" INT4 GENERATED BY DEFAULT AS IDENTITY NOT NULL,
          |  "region" VARCHAR(32) NOT NULL,
          |  "ledger" NUMERIC(12,4) DEFAULT 0,
          |  PRIMARY KEY ("id", "region")
          |);""".stripMargin)
    } finally { columnFixture = saved._1; pkFixture = saved._2 }
  }
}
