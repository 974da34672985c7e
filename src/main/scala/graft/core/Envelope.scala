package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Kintone record-envelope codec (SURVEY.md §1.1, FIXTURES.md §A).
  *
  * Every field in a Kintone record arrives wrapped as `{"value": ...}` and
  * numbers arrive as strings (reference: routes/makeRouter.js:81-91,
  * 108-118). This object centralizes unwrap/wrap so operator code reads
  * flat, typed columns — the envelope never leaks into pipeline logic
  * (SURVEY §7 risk 6).
  */
object Envelope {

  /** `x.value` — one envelope hop. */
  def v(c: Column): Column = c.getField("value")

  /** Kintone numeric-as-string → int with the reference's `parseInt(x || 0)`
    * semantics (makeRouter.js:108 etc.): leading integer prefix parsed
    * (`parseInt("12abc") = 12`), null/empty/garbage → 0. The regexp guard
    * also keeps ANSI mode (Spark 4 default) from throwing on malformed
    * input (SURVEY §2.8 C4).
    */
  def intOrZero(c: Column): Column =
    coalesce(
      nullif(regexp_extract(c.cast("string"), "^\\s*(-?[0-9]+)", 1), lit(""))
        .cast("int"),
      lit(0))

  private def ddl(s: String): StructType =
    DataType.fromDDL(s).asInstanceOf[StructType]

  /** EP1 order-approval webhook body (FIXTURES.md A1; makeRouter.js:80-96). */
  val orderWebhookSchema: StructType = ddl(
    """record struct<
      |  Status: struct<value: string>,
      |  order_details_table_website: struct<value: array<struct<
      |    id: string,
      |    value: struct<
      |      inventory_id: struct<value: string>,
      |      bag_model_website: struct<value: string>,
      |      qty_website: struct<value: string>,
      |      bag_color_website: struct<value: string>,
      |      rate_website: struct<value: string>,
      |      total_website: struct<value: string>
      |    >
      |  >>>
      |>""".stripMargin)

  /** EP2 process-movement webhook body (FIXTURES.md A2; makeRouter.js:141-145). */
  val processWebhookSchema: StructType = ddl(
    """record struct<
      |  Status: struct<value: string>,
      |  Previous_Status: struct<value: string>,
      |  bag_model: struct<value: string>,
      |  inventory_id: struct<value: string>
      |>""".stripMargin)

  /** Inventory record (FIXTURES.md A3; fields read at makeRouter.js:108,117,181-191). */
  val inventorySchema: StructType = ddl(
    """inventory_id string,
      |general_stock_qty struct<value: string>,
      |qty_office struct<value: string>,
      |qty_warehouse struct<value: string>,
      |qty_art struct<value: string>,
      |qty_embroidery struct<value: string>,
      |qty_sewer struct<value: string>,
      |qty_completed struct<value: string>""".stripMargin)

  /** EP3 website-order object (FIXTURES.md A4; makeRouter.js:56-75).
    * `MetaData` is heterogeneous (scalar strings + nested group objects);
    * with `map<string,string>`, Spark's JSON parser keeps scalar entries
    * as-is and stringifies object values to their JSON text in document
    * order — groups are re-parsed on demand (see functions.embroideryText).
    */
  val websiteOrderSchema: StructType = ddl(
    """order array<struct<
      |  productId: string,
      |  Name: string,
      |  Quantity: bigint,
      |  Subtotal: string,
      |  Total: string,
      |  MetaData: map<string,string>
      |>>""".stripMargin)

  /** All station counter columns of the inventory ledger. */
  val counterCols: Seq[String] = Seq(
    "qty_office", "qty_warehouse", "qty_art", "qty_embroidery",
    "qty_sewer", "qty_completed")

  /** Enveloped inventory record → flat typed columns. */
  def unwrapInventory: Seq[Column] =
    col("inventory_id") +:
      ("general_stock_qty" +: counterCols).map(n => intOrZero(v(col(n))).as(n))
}
