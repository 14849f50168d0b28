package graft.anonymise

import graft.config.{ColumnRule, FakerRule, NullRule, StaticRule}
import graft.dialect.Dialect
import graft.analyse.ColumnInfo

/** Minimisation AT SOURCE: per-dialect `CREATE VIEW` DDL that applies a
  * table's masking rules inside the database, so consumers without
  * export privileges read the masked relation directly — the in-
  * database complement of the batch anonymiser.
  *
  * Rule rendering:
  *  - `NullRule`   → `CAST(NULL AS <type>)` (type preserved, the o10
  *    contract);
  *  - `StaticRule` → a quoted literal;
  *  - `FakerRule`  → the engine's consistent keyed pseudonym
  *    ([[Anonymiser.pseudonym]]) re-expressed in the DIALECT's own
  *    functions (`SUBSTR(MD5(CONCAT(salt, CAST(col))), 1, 16)`), so
  *    in-database reads and exported dumps agree on identity-safe
  *    join keys. Faker TEXT GENERATION itself cannot run in-database
  *    (no seeded generator there) — the pseudonym is the documented
  *    in-database contract for faker-ruled columns. SQLite ships no
  *    `MD5`, so there faker columns degrade to the constant `'***'`
  *    (loudly visible in the DDL).
  *
  * Everything is driver-side string assembly over o3 column metadata —
  * metadata-scale, no data touched.
  */
object MaskedViews {

  /** The dialect's string-cast target for pseudonym input. */
  private def stringCast(d: Dialect): String =
    if (d.name == "mysql") "CHAR" else "TEXT"

  /** The dialect's CAST target for a typed NULL. Postgres and SQLite
    * accept the engine's portable type names verbatim; MySQL's CAST
    * only takes its own conversion-target vocabulary (CHAR, SIGNED,
    * DECIMAL, DATETIME, ... — never TEXT or BIGINT), so the portable
    * names are mapped. DOUBLE is a valid MySQL target from 8.0.17,
    * the oldest release the dialect supports.
    */
  private def nullCast(d: Dialect, portable: String): String = {
    if (d.name != "mysql") portable
    else portable match {
      case "TEXT"                                          => "CHAR"
      case "TINYINT" | "SMALLINT" | "INTEGER" | "BIGINT"
           | "BOOLEAN"                                     => "SIGNED"
      case "REAL" | "DOUBLE PRECISION"                     => "DOUBLE"
      case "BLOB"                                          => "BINARY"
      case "TIMESTAMP"                                     => "DATETIME"
      case other                                           => other // DECIMAL(p,s), DATE
    }
  }

  private def maskedExpr(d: Dialect, c: ColumnInfo,
                         rule: ColumnRule, salt: String): String = {
    val q = d.quoteIdentifier(c.name)
    rule match {
      case NullRule => s"CAST(NULL AS ${nullCast(d, c.dataType)}) AS $q"
      case StaticRule(v) => s"'${v.replace("'", "''")}' AS $q"
      case FakerRule(_) if d.name == "sqlite" => s"'***' AS $q"
      case FakerRule(_) =>
        s"SUBSTR(MD5(CONCAT('${salt.replace("'", "''")}', " +
          s"CAST($q AS ${stringCast(d)}))), 1, 16) AS $q"
    }
  }

  /** The `CREATE VIEW <table>_masked` statement for one table. */
  def viewDDL(d: Dialect, table: String, columns: Seq[ColumnInfo],
              rules: Map[String, ColumnRule], salt: String = "graft:"): String = {
    val cols = columns.map { c =>
      rules.get(c.name) match {
        case Some(r) => maskedExpr(d, c, r, salt)
        case None    => d.quoteIdentifier(c.name)
      }
    }
    val viewName = d.quoteIdentifier(table + "_masked")
    // SQLite has no OR REPLACE for views — replace = DROP + CREATE
    val create =
      if (d.name == "sqlite") s"DROP VIEW IF EXISTS $viewName;\nCREATE VIEW $viewName AS\n"
      else s"CREATE OR REPLACE VIEW $viewName AS\n"
    create +
      s"SELECT ${cols.mkString(", ")}\n" +
      s"FROM ${d.quoteIdentifier(table)};"
  }
}
