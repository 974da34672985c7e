package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Envelope
import graft.functions.TextFunctions._

/** EP3 — `transformToSimpleRecords` (reference: routes/makeRouter.js:56-75).
  *
  * The website order object's `order[]` array flattens to one 13-column
  * record per line item: renames, a computed lookup key, numeric→string
  * casts, map-key extraction with `""` defaults, and the embroidery
  * group-flatten (P1–P3 in SURVEY.md §2.2).
  *
  * Pure DataFrame→DataFrame — reused verbatim by the batch entry point,
  * the streaming form, and the golden tests. `explode` is the only
  * generator; at scale the operator is embarrassingly parallel (no
  * shuffle at all).
  */
object SimpleRecords {

  /** Parse raw webhook JSON bodies (column `body`) into the typed order
    * shape, with the reference's sanitize step (server.js:21-39): strip
    * null bytes, trim, empty→`{}`. Unparseable rows yield a null `order`
    * — route them to a dead-letter sink rather than failing the job.
    */
  def parse(raw: DataFrame, bodyCol: String = "body"): DataFrame = {
    val clean = graft.functions.TextFunctions.jsTrim(
      regexp_replace(col(bodyCol), "\\u0000", ""))
    val body = when(length(clean) === 0, lit("{}")).otherwise(clean)
    raw.withColumn("__parsed", from_json(body, Envelope.websiteOrderSchema))
      .withColumn("order", col("__parsed.order"))
      .drop("__parsed")
  }

  /** The projection itself: explode + 13 select expressions. */
  def transform(parsed: DataFrame): DataFrame = {
    val item = col("item")
    val meta = item.getField("MetaData")
    def m(key: String): Column = metaOrEmpty(meta, key)
    parsed
      .select(explode(col("order")).as("item"))
      .select(
        item.getField("productId").as("product_id"),
        concat(item.getField("productId"), lit(" - "), m("Color Selection"))
          .as("bag_lookup_website"),
        item.getField("Name").as("bag_model_website"),
        m("Color Selection").as("bag_color_website"),
        item.getField("Quantity").cast("string").as("qty_website"),
        item.getField("Subtotal").as("rate_website"),
        item.getField("Total").as("total_website"),
        m("Rigid or Lightened Selection").as("rigid_lightened_website"),
        m("Divider Option Selection").as("divider_website"),
        m("Wheel Type").as("wheel_option_website"),
        m("Company Logo").as("logo_website"),
        embroideryText(meta).as("order_details_website"),
        m("Additional Notes").as("notes_website"))
  }

  /** End-to-end: raw JSON bodies → flat records. */
  def apply(raw: DataFrame, bodyCol: String = "body"): DataFrame =
    transform(parse(raw, bodyCol))
}
