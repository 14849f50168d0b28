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

  /** A forward-only ResultSet over (columnLabel → value) rows. */
  private def resultSet(rows: Seq[Map[String, Any]]): ResultSet = {
    var i = -1
    proxy[ResultSet] { (m, args) =>
      m.getName match {
        case "next"      => i += 1; java.lang.Boolean.valueOf(i < rows.length)
        case "getString" => rows(i)(args(0).asInstanceOf[String]).asInstanceOf[String]
        case "getInt"    => Int.box(rows(i)(args(0).asInstanceOf[String]).asInstanceOf[Int])
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

  private def metaData: DatabaseMetaData = proxy[DatabaseMetaData] { (m, args) =>
    m.getName match {
      case "getTables"       => resultSet(tableRows)
      case "getColumns"      => resultSet(columnRows(args(2).asInstanceOf[String]))
      case "getImportedKeys" => resultSet(fkRows(args(2).asInstanceOf[String]))
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
}
