package graft.dialect

/** SQL dialect objects: identifier quoting, DROP statements, and dump
  * framing (header/footer), mirroring the reference's per-dialect behavior.
  *
  * Reference: /root/reference/internal/database/{mysql,postgres,sqlite}.go
  * QuoteIdentifier (mysql.go:238-240, postgres.go:289-291, sqlite.go:252-254)
  * and /root/reference/internal/exporter/exporter.go:91-166 (framing),
  * :259-271 (DROP TABLE).
  */
sealed trait Dialect {
  def name: String

  /** Quote an identifier, doubling any embedded quote character. */
  def quoteIdentifier(id: String): String

  /** DROP TABLE statement emitted before each CREATE in the dump. */
  def dropTableStatement(table: String): String =
    s"DROP TABLE IF EXISTS ${quoteIdentifier(table)};"

  /** Dialect-specific settings block after the dump banner. */
  def header: String

  /** Dialect-specific dump footer. */
  def footer: String

  /** Binary → replayable literal. `X'…'` is a hex BLOB literal in MySQL
    * and SQLite; PostgreSQL overrides (there `X'…'` is a BIT-string
    * literal, not bytea).
    */
  def binaryLiteral(b: Array[Byte]): String = SqlValueCodec.formatBinary(b)
}

case object MySqlDialect extends Dialect {
  val name = "mysql"
  def quoteIdentifier(id: String): String = "`" + id.replace("`", "``") + "`"
  /** Header follows the reference (exporter.go:106-108) plus
    * ANSI_QUOTES: the reference replays backticked `SHOW CREATE TABLE`
    * text verbatim (mysql.go:68-78), while our DDL is reconstructed
    * with ANSI double-quoted identifiers — without ANSI_QUOTES a real
    * MySQL server would reject the CREATE statements on replay
    * (surfaced by the JdbcDumpGoldenSpec e2e snapshot).
    */
  val header: String =
    """SET NAMES utf8mb4;
      |SET FOREIGN_KEY_CHECKS = 0;
      |SET SQL_MODE = 'NO_AUTO_VALUE_ON_ZERO,ANSI_QUOTES';
      |SET AUTOCOMMIT = 0;
      |START TRANSACTION;
      |
      |""".stripMargin
  val footer: String =
    """
      |COMMIT;
      |SET FOREIGN_KEY_CHECKS = 1;
      |""".stripMargin
}

case object PostgresDialect extends Dialect {
  val name = "postgres"
  def quoteIdentifier(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
  override def dropTableStatement(table: String): String =
    s"DROP TABLE IF EXISTS ${quoteIdentifier(table)} CASCADE;"
  /** bytea hex-format input: '\xDEADBEEF' (the header sets
    * standard_conforming_strings = on, so the backslash is literal).
    */
  override def binaryLiteral(b: Array[Byte]): String =
    "'\\x" + SqlValueCodec.hex(b) + "'"
  val header: String =
    """SET client_encoding = 'UTF8';
      |SET standard_conforming_strings = on;
      |SET check_function_bodies = false;
      |SET client_min_messages = warning;
      |
      |""".stripMargin
  val footer: String =
    """
      |-- End of dump
      |""".stripMargin
}

case object SqliteDialect extends Dialect {
  val name = "sqlite"
  def quoteIdentifier(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
  val header: String = "PRAGMA foreign_keys = OFF;\n\n"
  val footer: String = "\nPRAGMA foreign_keys = ON;\n"
}

object Dialect {
  val all: Seq[Dialect] = Seq(MySqlDialect, PostgresDialect, SqliteDialect)

  def forName(name: String): Dialect = name.toLowerCase match {
    case "mysql"                  => MySqlDialect
    case "postgres" | "postgresql" => PostgresDialect
    case "sqlite" | "sqlite3"     => SqliteDialect
    case other => throw new IllegalArgumentException(s"unsupported database type: $other")
  }
}
