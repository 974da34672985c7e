package graft.pipelines

import graft.SparkSpec

class SimpleRecordsSpec extends SparkSpec {
  import spark.implicits._

  test("EP3 golden: canonical fixture flattens to 13-column records") {
    val out = SimpleRecords(Seq(Analog.Fixtures.websiteOrderJson).toDF("body"))
    assert(out.columns.toSeq === Seq(
      "product_id", "bag_lookup_website", "bag_model_website", "bag_color_website",
      "qty_website", "rate_website", "total_website", "rigid_lightened_website",
      "divider_website", "wheel_option_website", "logo_website",
      "order_details_website", "notes_website"))
    val rows = out.orderBy("product_id").collect()
    assert(rows.length === 2)
    val r1 = rows(0)
    assert(r1.getString(0) === "BAG-001")
    assert(r1.getString(1) === "BAG-001 - Red")
    assert(r1.getString(4) === "2") // Quantity stringified (makeRouter.js:64)
    assert(r1.getString(11) ===
      "Front Panel:\n  Position: Center\n  Text: WB\n  Thread Color: Gold" +
        "\n\nBack Panel:\n  Position: Low")
    val r2 = rows(1)
    assert(r2.getString(1) === "BAG-002 - ")   // missing color → "" default
    assert(r2.getString(11) === "")            // no embroidery groups
    assert(r2.getString(12) === "")            // missing notes → ""
  }

  test("embroidery quirks: falsy Position skips group; all-No group keeps bare header") {
    val json =
      """{"order":[{"productId":"P","Name":"N","Quantity":1,"Subtotal":"1","Total":"1",
        |"MetaData":{
        |  "G1":{"Position":"","Text":"skipped entirely"},
        |  "G2":{"Position":"Top","A":"No","B":"No"},
        |  "G3":{"Text":"no position key"}}}]}""".stripMargin
    val out = SimpleRecords(Seq(json).toDF("body")).collect()(0)
    // G1: empty Position is falsy → group skipped (makeRouter.js:44)
    // G2: Position itself renders; A/B are "No" → dropped (:47)
    // G3: no Position → not a group
    assert(out.getAs[String]("order_details_website") === "G2:\n  Position: Top")
  }

  test("sanitize: null bytes stripped, empty body → {}, corrupt JSON → no rows") {
    val bodies = Seq(
      "\u0000 \u0000",            // null bytes + empty → "{}" → no order array
      "   ",                     // whitespace-only → "{}"
      "{not json at all",        // corrupt → null order → no rows
      """{"order":[]}""")        // empty order array
    val out = SimpleRecords(bodies.toDF("body"))
    assert(out.count() === 0)
  }
}
