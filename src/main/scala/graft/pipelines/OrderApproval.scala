package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Envelope
import graft.core.Envelope.{intOrZero, v}

/** EP1 — order-approval stock transfer (reference: routes/makeRouter.js:78-134).
  *
  * Reference dataflow, re-expressed set-oriented (SURVEY.md §3 EP1):
  * status gate → subtable explode → required-field skip → first-wins dedup
  * per inventory key → inventory lookup join → stock constraint → move
  * `general_stock_qty → qty_office`.
  *
  * Structural divergences from the reference, both deliberate (SURVEY §7
  * risk 2):
  *  - the reference's per-row GET/PUT loop (the N+1 anti-pattern) becomes
  *    one keyed join + one merged write;
  *  - the reference aborts mid-loop on a stock violation, leaving earlier
  *    PUTs applied (non-atomic). We validate first and split violations to
  *    a dead-letter output — no partial application.
  *
  * Scale: order events shuffle only for the per-event dedup window
  * (partitioned by event × inventory key — high cardinality); the merge is
  * one keyed outer join with NO broadcast hints — every join side here is
  * batch-derived, and AQE broadcast-converts while a side is actually
  * small instead of the hint forcing driver materialization at any
  * cardinality.
  */
object OrderApproval {

  final case class Result(
      inventory: DataFrame,   // inventory with transfers applied
      violations: DataFrame,  // line items rejected by the stock constraint
      missing: DataFrame)     // line items whose inventory_id has no record (Kintone 404 path)

  /** Flatten approved order webhooks to candidate transfer rows.
    * `events` needs an `event_id` column plus the parsed `record` struct
    * (Envelope.orderWebhookSchema).
    */
  /** P4 gate + F1 explode + P5 required-field skip (makeRouter.js:81-96).
    * `line_no` preserves subtable position for the first-wins dedup order.
    */
  private def lineItemsRaw(events: DataFrame): DataFrame =
    events
      // P4: silent status gate (makeRouter.js:81)
      .filter(v(col("record.Status")) === "Approved")
      // F1: subtable explode, keeping subtable position for first-wins order
      .select(col("event_id"),
        posexplode(v(col("record.order_details_table_website"))).as(Seq("line_no", "item")))
      .select(col("event_id"), col("line_no"),
        v(col("item.value.inventory_id")).as("inventory_id"),
        v(col("item.value.bag_model_website")).as("bag_model"),
        intOrZero(v(col("item.value.qty_website"))).as("qty"))
      // P5: skip rows missing key fields or with falsy qty (0 dropped, as
      // the reference's `!qty` does — makeRouter.js:94-96)
      .filter(
        col("inventory_id").isNotNull && col("inventory_id") =!= "" &&
          col("bag_model").isNotNull && col("bag_model") =!= "" &&
          col("qty") =!= 0)

  /** D1: first-wins dedup by inventory_id within each webhook, in subtable
    * order (makeRouter.js:86,99-101,127). Faithful to the reference bug:
    * later duplicate rows are dropped entirely, NOT accumulated.
    */
  def lineItems(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_id"), col("inventory_id")).orderBy(col("line_no"))
    lineItemsRaw(events)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Corrected-variant dedup (SURVEY §2.5 D1 note): accumulate duplicate
    * SKU rows instead of dropping them — the "fixed" semantics shipped
    * alongside the faithful one.
    */
  def lineItemsAccumulating(events: DataFrame): DataFrame =
    lineItemsRaw(events)
      .groupBy(col("event_id"), col("inventory_id"))
      .agg(min(col("line_no")).as("line_no"),
        // min_by, not first: first() in an unordered groupBy is
        // partition-order nondeterministic
        min_by(col("bag_model"), col("line_no")).as("bag_model"),
        sum(col("qty")).cast("int").as("qty"))

  /** Apply approved transfers against a flat inventory snapshot
    * (columns: inventory_id, general_stock_qty, qty_office, ...).
    */
  def apply(events: DataFrame, inventory: DataFrame): Result = {
    val items = lineItems(events)

    // J1: keyed lookup join. Aggregate deltas per key first so the join is
    // one row per inventory key (map-side combine before the shuffle).
    val deltas = items.groupBy(col("inventory_id"))
      .agg(sum(col("qty")).cast("int").as("delta"))

    // Missing inventory key = the reference's GET-404 error path → dead letter.
    val missing = items.join(inventory.select("inventory_id"), Seq("inventory_id"), "left_anti")

    // deltas is one row per touched inventory key — BATCH-DERIVED, so no
    // broadcast hint: a hint would force driver materialization at any
    // key cardinality, while the plain keyed join lets AQE
    // broadcast-convert only while the side is actually small (the
    // Analog pattern).
    val joined = inventory.join(deltas, Seq("inventory_id"), "left")

    // P7: stock constraint — validated atomically BEFORE any update.
    val violating = joined
      .filter(col("delta").isNotNull && col("general_stock_qty") < col("delta"))
      .select(col("inventory_id"), col("general_stock_qty"), col("delta"))
    val violatingKeys = violating.select("inventory_id")

    // A1: the transfer — general_stock_qty -= qty; qty_office += qty.
    // violatingKeys is batch-derived too — same no-hint discipline.
    val applied = joined
      .join(violatingKeys.withColumn("__viol", lit(true)), Seq("inventory_id"), "left")
      .withColumn("__apply", col("delta").isNotNull && col("__viol").isNull)
      .withColumn("general_stock_qty",
        when(col("__apply"), col("general_stock_qty") - col("delta"))
          .otherwise(col("general_stock_qty")))
      .withColumn("qty_office",
        when(col("__apply"), col("qty_office") + col("delta"))
          .otherwise(col("qty_office")))
      .drop("delta", "__viol", "__apply")

    Result(applied, violating, missing)
  }
}
