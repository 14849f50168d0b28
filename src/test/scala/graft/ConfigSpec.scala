package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config._

/** Config-parsing semantics ported from the reference's tests
  * (/root/reference/internal/config/config_test.go): YAML + JSON loading,
  * polymorphic retain, the four date formats, validation, rule parsing.
  */
class ConfigSpec extends AnyFunSuite {

  private val yaml =
    """connection:
      |  type: mysql
      |  host: localhost
      |  port: 3306
      |  username: root
      |  password: secret
      |  database_name: myapp
      |configuration:
      |  sessions:
      |    truncate: true
      |  audit_logs:
      |    retain: 1000
      |  orders:
      |    retain:
      |      column_name: created_at
      |      after_date: "2024-01-01"
      |    columns:
      |      customer_email: "{{faker.email}}"
      |      notes: "Order notes redacted"
      |  payments:
      |    columns:
      |      card_number: null
      |""".stripMargin

  test("YAML load: connection + polymorphic retain + rules") {
    val cfg = GraftConfig.parse(yaml)
    cfg.validate()
    assert(cfg.connection.dbType == "mysql")
    assert(cfg.connection.port == 3306)
    assert(cfg.tableConfig("sessions").exists(_.truncate))
    assert(cfg.tableConfig("audit_logs").map(_.retain).contains(RetainCount(1000)))
    val ordersRetain = cfg.tableConfig("orders").map(_.retain)
    assert(ordersRetain.exists {
      case RetainAfter("created_at", d) => d == GraftConfig.parseDate("2024-01-01")
      case _ => false
    })
    assert(cfg.tableConfig("orders").get.columns("customer_email") == FakerRule("email"))
    assert(cfg.tableConfig("orders").get.columns("notes") == StaticRule("Order notes redacted"))
    assert(cfg.tableConfig("payments").get.columns("card_number") == NullRule)
    assert(cfg.tableOrder == Seq("sessions", "audit_logs", "orders", "payments"))
  }

  test("JSON load (config.go:181-214 fallback path)") {
    val json =
      """{"connection": {"type": "sqlite", "file": "/tmp/db.sqlite"},
        |"configuration": {"users": {"retain": 50,
        |"columns": {"email": "{{faker.email}}"}}}}""".stripMargin
    val cfg = GraftConfig.parse(json)
    cfg.validate()
    assert(cfg.connection.dbType == "sqlite")
    assert(cfg.tableConfig("users").map(_.retain).contains(RetainCount(50)))
  }

  test("all four date formats accepted (config.go:157-172)") {
    val want = java.time.Instant.parse("2024-01-02T03:04:05Z")
    assert(GraftConfig.parseDate("2024-01-02") ==
      java.time.Instant.parse("2024-01-02T00:00:00Z"))
    assert(GraftConfig.parseDate("2024-01-02T03:04:05") == want)
    assert(GraftConfig.parseDate("2024-01-02 03:04:05") == want)
    assert(GraftConfig.parseDate("2024-01-02T03:04:05Z") == want)
    assertThrows[IllegalArgumentException](GraftConfig.parseDate("02/01/2024"))
  }

  test("retain object requires column_name and after_date (config.go:80-94)") {
    val bad =
      """connection: {type: sqlite, file: x}
        |configuration:
        |  t: {retain: {column_name: c}}
        |""".stripMargin
    assertThrows[IllegalArgumentException](GraftConfig.parse(bad))
  }

  test("validation rules (config.go:217-237)") {
    assertThrows[IllegalArgumentException](
      GraftConfig(Connection("oracle")).validate())
    assertThrows[IllegalArgumentException](
      GraftConfig(Connection("sqlite")).validate()) // missing file
    assertThrows[IllegalArgumentException](
      GraftConfig(Connection("mysql", host = "h")).validate()) // missing database_name
    GraftConfig(Connection("postgres", host = "h", databaseName = "d")).validate()
  }

  test("rule parsing matches AnonymiseRow dispatch (anonymiser.go:50-96)") {
    assert(ColumnRule.parse("null") == NullRule)
    assert(ColumnRule.parse("") == NullRule)
    assert(ColumnRule.parse("{{faker.email}}") == FakerRule("email"))
    assert(ColumnRule.parse("{{faker.unknownFn}}") == FakerRule("unknownFn"))
    assert(ColumnRule.parse("static value") == StaticRule("static value"))
  }

  test("addTable / hasTable / sync round-trip (config.go:303-323)") {
    val cfg = GraftConfig.parse(yaml)
    assert(cfg.hasTable("sessions"))
    assert(!cfg.hasTable("newtable"))
    val cfg2 = cfg.addTable("newtable", TableConfig(truncate = true))
    assert(cfg2.hasTable("newtable"))
    assert(cfg2.addTable("newtable", TableConfig()) == cfg2) // no overwrite
    val rendered = GraftConfig.renderYaml(cfg2)
    val reparsed = GraftConfig.parse(rendered)
    assert(reparsed.configuration == cfg2.configuration)
    assert(reparsed.tableOrder == cfg2.tableOrder)
  }

  test("DSN building (config.go:249-272)") {
    assert(Connection("mysql", host = "h", username = "u", password = "p",
      databaseName = "d").dsn == "jdbc:mysql://h:3306/d")
    assert(Connection("postgres", host = "h", port = 5433,
      databaseName = "d").dsn == "jdbc:postgresql://h:5433/d")
    assert(Connection("sqlite", file = "/tmp/x.db").dsn == "jdbc:sqlite:/tmp/x.db")
  }

  test("unknown faker functions produce warnings (anonymiser.go:167-189)") {
    val cfg = GraftConfig(Connection("sqlite", file = "x"),
      Map("t" -> TableConfig(columns = Map("c" -> FakerRule("bogus"),
        "d" -> FakerRule("email")))), Seq("t"))
    val warnings = graft.anonymise.Anonymiser.validateRules(cfg)
    assert(warnings == Seq("unknown faker function 'bogus' for t.c"))
  }
}
