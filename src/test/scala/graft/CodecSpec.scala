package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dialect._

/** Golden vectors ported from the reference's codec contract tests
  * (/root/reference/internal/exporter/exporter_test.go:377-439) plus the
  * dialect quoting tests (sqlite_test.go:425-447).
  */
class CodecSpec extends AnyFunSuite {

  test("formatValue matches reference vectors") {
    val vectors: Seq[(Any, String)] = Seq(
      (null, "NULL"),
      (true, "1"),
      (false, "0"),
      (42, "42"),
      (123L, "123"),
      (-5, "-5"),
      (100L, "100"),
      (3.14, "3.14"),
      (2.5f, "2.5"),
      ("hello", "'hello'"),
      ("it's", "'it''s'"),
      ("a\\b", "'a\\\\b'"),
      ("line1\nline2", "'line1\\nline2'"),
      ("a\rb", "'a\\rb'"),
      ("binary".getBytes("UTF-8"), "'binary'"),
      (java.sql.Timestamp.valueOf("2024-01-15 10:30:00"), "'2024-01-15 10:30:00'"),
    )
    for ((in, want) <- vectors)
      assert(SqlValueCodec.formatValue(in) == want, s"input: $in")
  }

  test("whole doubles print without fraction (Go %v parity)") {
    assert(SqlValueCodec.formatValue(5.0) == "5")
    assert(SqlValueCodec.formatValue(-3.0) == "-3")
    assert(SqlValueCodec.formatValue(0.5) == "0.5")
  }

  test("escapeString matches reference vectors") {
    val vectors = Seq(
      ("hello", "'hello'"),
      ("it's a test", "'it''s a test'"),
      ("back\\slash", "'back\\\\slash'"),
      ("new\nline", "'new\\nline'"),
      ("carriage\rreturn", "'carriage\\rreturn'"),
      ("null\u0000char", "'null\\0char'"),
      ("ctrl-z\u001achar", "'ctrl-z\\Zchar'"),
      ("", "''"),
      ("multiple''quotes", "'multiple''''quotes'"),
    )
    for ((in, want) <- vectors)
      assert(SqlValueCodec.escapeString(in) == want, s"input: ${in.replace("\u0000", "<NUL>")}")
  }

  test("identifier quoting per dialect (reference sqlite_test.go:425-447)") {
    assert(MySqlDialect.quoteIdentifier("users") == "`users`")
    assert(MySqlDialect.quoteIdentifier("weird`name") == "`weird``name`")
    assert(PostgresDialect.quoteIdentifier("users") == "\"users\"")
    assert(SqliteDialect.quoteIdentifier("weird\"name") == "\"weird\"\"name\"")
  }

  test("drop statements per dialect (exporter.go:259-271)") {
    assert(MySqlDialect.dropTableStatement("t") == "DROP TABLE IF EXISTS `t`;")
    assert(PostgresDialect.dropTableStatement("t") == "DROP TABLE IF EXISTS \"t\" CASCADE;")
    assert(SqliteDialect.dropTableStatement("t") == "DROP TABLE IF EXISTS \"t\";")
  }

  test("dialect headers/footers match reference framing (exporter.go:91-166)") {
    assert(MySqlDialect.header.contains("SET FOREIGN_KEY_CHECKS = 0;"))
    assert(MySqlDialect.header.contains("START TRANSACTION;"))
    assert(MySqlDialect.footer.contains("COMMIT;"))
    assert(MySqlDialect.footer.contains("SET FOREIGN_KEY_CHECKS = 1;"))
    assert(PostgresDialect.header.contains("SET client_encoding = 'UTF8';"))
    assert(PostgresDialect.footer.contains("-- End of dump"))
    assert(SqliteDialect.header.contains("PRAGMA foreign_keys = OFF;"))
    assert(SqliteDialect.footer.contains("PRAGMA foreign_keys = ON;"))
  }
}
