package graft.pipelines

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Envelope

class ProcessMovementSpec extends SparkSpec {
  import spark.implicits._

  private def webhook(inv: String, status: String, prev: Option[String]): String = {
    val prevField = prev.map(p => s""","Previous_Status":{"value":"$p"}""").getOrElse("")
    s"""{"record":{"Status":{"value":"$status"},
       |"bag_model":{"value":"Tour"},
       |"inventory_id":{"value":${if (inv == null) "null" else s""""$inv""""}}$prevField}}""".stripMargin
  }

  private def parse(bodies: Seq[String]) =
    bodies.zipWithIndex.toDF("body", "event_id")
      .withColumn("record", from_json(col("body"), Envelope.processWebhookSchema).getField("record"))

  private val inventory = Seq(
    ("101", 10, 5, 0, 0, 0, 0, 0), ("102", 10, 0, 3, 0, 0, 2, 0)
  ).toDF("inventory_id", "general_stock_qty", "qty_office", "qty_warehouse",
    "qty_art", "qty_embroidery", "qty_sewer", "qty_completed")

  private def counters(r: ProcessMovement.Result) =
    r.inventory.orderBy("inventory_id").collect().map(x =>
      (x.getAs[String]("inventory_id"),
        Envelope.counterCols.map(c => x.getAs[Long](c)))).toMap

  test("EP2 golden: station transfer, Cutting alias, Complete terminal") {
    val events = parse(Seq(
      webhook("101", "Warehouse", Some("Office")),   // office-1, warehouse+1
      webhook("101", "Cutting", Some("Warehouse")),  // warehouse-1, embroidery+1 (alias)
      webhook("102", "Complete", Some("Sewer Pickup")), // sewer-1, completed+1, NO station col
      webhook("101", "Office", None),                // P6: no Previous_Status → skip
      webhook("102", "Warehouse", Some("Warehouse")))) // P6: no-op transition → skip
    val r = ProcessMovement(events, inventory)
    val c = counters(r)
    // 101: office 5-1=4, warehouse 0+1-1=0, embroidery 0+1=1
    assert(c("101") === Seq(4L, 0L, 0L, 1L, 0L, 0L))
    // 102: sewer 2-1=1, completed 0+1=1, warehouse untouched at 3
    assert(c("102") === Seq(0L, 3L, 0L, 0L, 1L, 1L))
    assert(r.deadLetter.count() === 0)
  }

  test("EP2 quirk: same-column transition nets +1 (reference overwrite bug)") {
    // Need Sewer Assigned → With Sewer: both map qty_sewer; the reference's
    // update object overwrite makes the net +1, not 0 (makeRouter.js:180-189)
    val events = parse(Seq(webhook("102", "With Sewer", Some("Need Sewer Assigned"))))
    val c = counters(ProcessMovement(events, inventory))
    assert(c("102")(4) === 3L) // qty_sewer 2 + 1
  }

  test("EP2: missing inventory key is an error row (P8), not a silent skip") {
    val events = parse(Seq(webhook(null, "Warehouse", Some("Office"))))
    val r = ProcessMovement(events, inventory)
    assert(r.deadLetter.count() === 1)
    assert(counters(r)("101") === Seq(5L, 0L, 0L, 0L, 0L, 0L))
  }

  test("EP2 property: deltas are commutative — event order never matters") {
    val bodies = Seq(
      webhook("101", "Warehouse", Some("Office")),
      webhook("101", "Art", Some("Warehouse")),
      webhook("101", "Cutting", Some("Art")),
      webhook("102", "Complete", Some("With Sewer")),
      webhook("102", "Office", Some("Complete")))
    val fwd = counters(ProcessMovement(parse(bodies), inventory))
    val rev = counters(ProcessMovement(parse(bodies.reverse), inventory))
    assert(fwd === rev)
  }
}
