package graft.config

import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** The configuration "query language": connection + per-table transform
  * specs, loadable from YAML or JSON.
  *
  * Mirrors /root/reference/internal/config/config.go — polymorphic
  * `retain` (int → count-based; `{column_name, after_date}` → date-based,
  * config.go:64-126), the four accepted date formats (config.go:157-172),
  * validation (config.go:217-237), DSN building (config.go:249-272) and
  * save/sync helpers (config.go:276-323).
  */
final case class Connection(
    dbType: String,
    host: String = "",
    port: Int = 0,
    username: String = "",
    password: String = "",
    databaseName: String = "",
    file: String = "") {

  /** JDBC-style DSN; mirrors config.go:249-272 (defaults 3306 / 5432). */
  def dsn: String = dbType match {
    case "mysql" =>
      val p = if (port == 0) 3306 else port
      s"jdbc:mysql://$host:$p/$databaseName"
    case "postgres" =>
      val p = if (port == 0) 5432 else port
      s"jdbc:postgresql://$host:$p/$databaseName"
    case "sqlite" => s"jdbc:sqlite:$file"
    case _        => ""
  }
}

/** Row-retention spec — ADT form of the reference's RetainConfig. */
sealed trait Retain {
  def isEmpty: Boolean = this == RetainAll
}
case object RetainAll extends Retain
final case class RetainCount(n: Int) extends Retain
final case class RetainAfter(columnName: String, afterDate: Instant) extends Retain

final case class TableConfig(
    truncate: Boolean = false,
    retain: Retain = RetainAll,
    columns: Map[String, ColumnRule] = Map.empty)

/** Column anonymisation rule ADT (anonymiser.go:50-96):
  * "null"/"" → NULL; "{{faker.X}}" → generator X; anything else → static.
  */
sealed trait ColumnRule
case object NullRule extends ColumnRule
final case class FakerRule(function: String) extends ColumnRule
final case class StaticRule(value: String) extends ColumnRule

object ColumnRule {
  private val fakerPattern = """\{\{faker\.(\w+)\}\}""".r

  /** Parse a raw rule string exactly like AnonymiseRow's dispatch. */
  def parse(raw: String): ColumnRule = raw match {
    case null | "" | "null" => NullRule
    case s =>
      fakerPattern.findFirstMatchIn(s) match {
        case Some(m) => FakerRule(m.group(1))
        case None    => StaticRule(s)
      }
  }

  def render(rule: ColumnRule): String = rule match {
    case NullRule        => "null"
    case FakerRule(f)    => s"{{faker.$f}}"
    case StaticRule(s)   => s
  }
}

final case class GraftConfig(
    connection: Connection,
    configuration: Map[String, TableConfig] = Map.empty,
    /** preserves file order of the `configuration` block for stable output */
    tableOrder: Seq[String] = Seq.empty) {

  def tableConfig(table: String): Option[TableConfig] = configuration.get(table)
  def hasTable(table: String): Boolean = configuration.contains(table)

  def addTable(table: String, cfg: TableConfig): GraftConfig =
    if (hasTable(table)) this
    else copy(configuration = configuration + (table -> cfg), tableOrder = tableOrder :+ table)

  /** Validation per config.go:217-237. */
  def validate(): Unit = {
    val validTypes = Set("mysql", "postgres", "sqlite")
    require(validTypes(connection.dbType),
      s"invalid connection type '${connection.dbType}', must be mysql, postgres, or sqlite")
    if (connection.dbType == "sqlite")
      require(connection.file.nonEmpty, "sqlite connection requires 'file' parameter")
    else {
      require(connection.host.nonEmpty, "connection requires 'host' parameter")
      require(connection.databaseName.nonEmpty, "connection requires 'database_name' parameter")
    }
  }
}

object GraftConfig {

  /** The four accepted date formats (config.go:157-172). */
  def parseDate(s: String): Instant = {
    def tryParse[T](f: => Instant): Option[Instant] =
      try Some(f) catch { case _: Exception => None }
    tryParse(LocalDate.parse(s, DateTimeFormatter.ISO_LOCAL_DATE).atStartOfDay.toInstant(ZoneOffset.UTC))
      .orElse(tryParse(LocalDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")).toInstant(ZoneOffset.UTC)))
      .orElse(tryParse(LocalDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")).toInstant(ZoneOffset.UTC)))
      .orElse(tryParse(OffsetDateTime.parse(s).toInstant))
      .getOrElse(throw new IllegalArgumentException(
        s"could not parse date '$s', supported formats: YYYY-MM-DD, YYYY-MM-DDTHH:MM:SS"))
  }

  /** Load from a YAML or JSON file by extension, falling back to trying
    * both (config.go:181-214). JSON is parsed by the YAML reader (JSON is
    * a YAML subset for our config shapes).
    */
  def load(path: String): GraftConfig = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val cfg = parse(text)
    cfg.validate()
    cfg
  }

  def parse(text: String): GraftConfig = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, AnyRef]](text)
    require(root != null, "empty config")
    fromJava(root)
  }

  private def str(m: java.util.Map[String, AnyRef], k: String, dflt: String = ""): String =
    Option(m.get(k)).map(_.toString).getOrElse(dflt)

  private def fromJava(root: java.util.Map[String, AnyRef]): GraftConfig = {
    val connRaw = Option(root.get("connection"))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, AnyRef]] }
      .getOrElse(new java.util.LinkedHashMap[String, AnyRef]())
    val conn = Connection(
      dbType = str(connRaw, "type"),
      host = str(connRaw, "host"),
      port = Option(connRaw.get("port")).map(_.toString.toInt).getOrElse(0),
      username = str(connRaw, "username"),
      password = str(connRaw, "password"),
      databaseName = str(connRaw, "database_name"),
      file = str(connRaw, "file"))

    val cfgRaw = Option(root.get("configuration"))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, AnyRef]] }
      .getOrElse(new java.util.LinkedHashMap[String, AnyRef]())

    val order = cfgRaw.keySet.asScala.toSeq
    val tables = order.map { name =>
      val tc = Option(cfgRaw.get(name))
        .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, AnyRef]] }
        .getOrElse(new java.util.LinkedHashMap[String, AnyRef]())
      name -> parseTableConfig(tc)
    }.toMap
    GraftConfig(conn, tables, order)
  }

  private def parseTableConfig(tc: java.util.Map[String, AnyRef]): TableConfig = {
    val truncate = Option(tc.get("truncate")).exists {
      case b: java.lang.Boolean => b
      case s                    => s.toString.toBoolean
    }
    val retain = Option(tc.get("retain")) match {
      case None => RetainAll
      case Some(i: java.lang.Integer) => if (i > 0) RetainCount(i) else RetainAll
      case Some(l: java.lang.Long)    => if (l > 0) RetainCount(l.toInt) else RetainAll
      case Some(m: java.util.Map[_, _]) =>
        val mm = m.asInstanceOf[java.util.Map[String, AnyRef]]
        val col = str(mm, "column_name")
        require(col.nonEmpty, "retain object requires column_name")
        // snakeyaml parses unquoted YAML-1.1 timestamps into java.util.Date
        val after = Option(mm.get("after_date")) match {
          case Some(d: java.util.Date) => d.toInstant
          case Some(s) if s.toString.nonEmpty => parseDate(s.toString)
          case _ => throw new IllegalArgumentException("retain object requires after_date")
        }
        RetainAfter(col, after)
      case Some(other) =>
        throw new IllegalArgumentException(
          s"retain must be an integer or an object with column_name and after_date, got: $other")
    }
    val columns = Option(tc.get("columns")) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asInstanceOf[java.util.Map[String, AnyRef]].asScala.toSeq.map {
          case (k, v) => k -> ColumnRule.parse(if (v == null) "" else v.toString)
        }.toMap
      case _ => Map.empty[String, ColumnRule]
    }
    TableConfig(truncate, retain, columns)
  }

  /** Serialise back to YAML (config sync, config.go:276-299). */
  def renderYaml(cfg: GraftConfig): String = {
    val sb = new StringBuilder
    sb.append("connection:\n")
    sb.append(s"  type: ${cfg.connection.dbType}\n")
    if (cfg.connection.dbType == "sqlite") sb.append(s"  file: ${cfg.connection.file}\n")
    else {
      sb.append(s"  host: ${cfg.connection.host}\n")
      if (cfg.connection.port != 0) sb.append(s"  port: ${cfg.connection.port}\n")
      if (cfg.connection.username.nonEmpty) sb.append(s"  username: ${cfg.connection.username}\n")
      if (cfg.connection.password.nonEmpty) sb.append(s"  password: ${cfg.connection.password}\n")
      sb.append(s"  database_name: ${cfg.connection.databaseName}\n")
    }
    sb.append("configuration:\n")
    val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
    for (name <- cfg.tableOrder; tc <- cfg.configuration.get(name)) {
      sb.append(s"  $name:")
      if (!tc.truncate && tc.retain.isEmpty && tc.columns.isEmpty) sb.append(" {}\n")
      else {
        sb.append("\n")
        if (tc.truncate) sb.append("    truncate: true\n")
        tc.retain match {
          case RetainCount(n) => sb.append(s"    retain: $n\n")
          case RetainAfter(c, d) =>
            sb.append("    retain:\n")
            sb.append(s"      column_name: $c\n")
            sb.append(s"""      after_date: "${dateFmt.format(d)}"\n""")
          case RetainAll =>
        }
        if (tc.columns.nonEmpty) {
          sb.append("    columns:\n")
          for ((c, rule) <- tc.columns.toSeq.sortBy(_._1))
            sb.append(s"      $c: ${quoteYaml(ColumnRule.render(rule))}\n")
        }
      }
    }
    sb.toString
  }

  private def quoteYaml(s: String): String =
    if (s == "null" || s.exists(c => ":#{}[]".contains(c))) "\"" + s.replace("\"", "\\\"") + "\""
    else s

  /** Serialise matching the target file's extension — `.json` stays
    * JSON, anything else YAML (config.go:276-299: SaveConfig marshals
    * by extension; a sync must not silently convert the user's format).
    */
  def render(cfg: GraftConfig, path: String): String =
    if (path.toLowerCase.endsWith(".json")) renderJson(cfg) else renderYaml(cfg)

  /** JSON twin of `renderYaml` — same keys, same field selection. */
  def renderJson(cfg: GraftConfig): String = {
    def js(s: String): String =
      "\"" + s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val conn = new StringBuilder
    conn.append(s"    \"type\": ${js(cfg.connection.dbType)}")
    if (cfg.connection.dbType == "sqlite")
      conn.append(s",\n    \"file\": ${js(cfg.connection.file)}")
    else {
      conn.append(s",\n    \"host\": ${js(cfg.connection.host)}")
      if (cfg.connection.port != 0) conn.append(s",\n    \"port\": ${cfg.connection.port}")
      if (cfg.connection.username.nonEmpty)
        conn.append(s",\n    \"username\": ${js(cfg.connection.username)}")
      if (cfg.connection.password.nonEmpty)
        conn.append(s",\n    \"password\": ${js(cfg.connection.password)}")
      conn.append(s",\n    \"database_name\": ${js(cfg.connection.databaseName)}")
    }
    val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)
    val tables = cfg.tableOrder.flatMap(name => cfg.configuration.get(name).map { tc =>
      val fields = Seq.newBuilder[String]
      if (tc.truncate) fields += "\"truncate\": true"
      tc.retain match {
        case RetainCount(n)    => fields += s""""retain": $n"""
        case RetainAfter(c, d) =>
          fields += s""""retain": {"column_name": ${js(c)}, "after_date": ${js(dateFmt.format(d))}}"""
        case RetainAll =>
      }
      if (tc.columns.nonEmpty)
        fields += "\"columns\": {" + tc.columns.toSeq.sortBy(_._1).map {
          case (c, rule) => s"${js(c)}: ${js(ColumnRule.render(rule))}"
        }.mkString(", ") + "}"
      s"    ${js(name)}: {${fields.result().mkString(", ")}}"
    })
    s"{\n  \"connection\": {\n$conn\n  },\n  \"configuration\": {\n${tables.mkString(",\n")}\n  }\n}\n"
  }
}
