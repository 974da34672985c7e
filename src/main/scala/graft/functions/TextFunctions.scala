package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions with genuinely custom semantics (SURVEY.md §2.8).
  * Implemented as compositions of Catalyst higher-order functions — not
  * Scala UDFs — so they stay inside whole-stage codegen and need no
  * serialization of row data to the JVM heap.
  */
object TextFunctions {

  /** `combineEmbroideryInfo` (reference: routes/makeRouter.js:40-54).
    *
    * Input: the raw `MetaData` map parsed with `map<string,string>` value
    * type — scalar selections stay scalars, nested "group" objects (the
    * embroidery position groups) arrive as their JSON text in document
    * order.
    *
    * Semantics reproduced exactly:
    *  - an entry is a group iff its value is an object AND its `Position`
    *    sub-field is truthy (non-null, non-empty) — makeRouter.js:44;
    *  - sub-fields with the sentinel value `"No"` are dropped — :47;
    *  - each group renders as `key:\n  subKey: value\n` lines — :45-48;
    *  - blocks are separated by a blank line and the whole result is
    *    trimmed — :50-53.
    */
  /** JS-semantics trim: Spark's `trim` strips only spaces; JS `.trim()`
    * strips all whitespace (incl. newlines). The reference trims rendered
    * blocks that end in `\n`, so the distinction matters.
    */
  def jsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  def embroideryText(metaData: Column): Column = {
    val blocks = filter(
      transform(map_entries(metaData), e => {
        val groupJson = e.getField("value")
        val group = from_json(groupJson,
          org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))
        val pos = element_at(group, "Position")
        val lines = transform(
          filter(map_entries(group), kv => kv.getField("value") =!= "No"),
          kv => concat(lit("  "), kv.getField("key"), lit(": "),
            kv.getField("value"), lit("\n")))
        when(groupJson.startsWith("{") && pos.isNotNull && pos =!= "",
          jsTrim(concat(e.getField("key"), lit(":\n"), array_join(lines, ""))))
      }),
      b => b.isNotNull)
    coalesce(jsTrim(array_join(blocks, "\n\n")), lit(""))
  }

  /** Map-key extraction with the reference's `|| ""` default
    * (makeRouter.js:63-72). */
  def metaOrEmpty(metaData: Column, key: String): Column =
    coalesce(element_at(metaData, lit(key)), lit(""))
}
