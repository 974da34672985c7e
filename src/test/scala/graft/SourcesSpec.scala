package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond Parquet (SURVEY.md §2.1): CSV and
  * JSON round-trips with explicit schemas, plus keyed-overwrite semantics.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves the documents table") {
    val dir = tmp("csv-rt")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(docs.schema)
      .option("header", "true")
      .csv(dir)
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a === b)
  }

  test("JSON-lines round-trip preserves types under an explicit schema") {
    val dir = tmp("json-rt")
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.orderBy("doc_id").collect().map(_.toSeq) ===
      docs.orderBy("doc_id").collect().map(_.toSeq))
  }

  test("keyed upsert into a parquet ledger (S4 batch form)") {
    import spark.implicits._
    val dir = tmp("ledger")
    val base = Seq(("101", 10), ("102", 20)).toDF("inventory_id", "qty")
    base.write.mode("overwrite").parquet(dir)
    // merge-by-key: updates win over base, inserts appended
    val updates = Seq(("102", 25), ("103", 5)).toDF("inventory_id", "qty")
    val current = spark.read.parquet(dir)
    val merged = current.join(updates.select(col("inventory_id")), Seq("inventory_id"), "left_anti")
      .unionByName(updates)
    val out = tmp("ledger2")
    merged.write.mode("overwrite").parquet(out)
    val got = spark.read.parquet(out).as[(String, Int)].collect().toMap
    assert(got === Map("101" -> 10, "102" -> 25, "103" -> 5))
  }

  test("EP1 streaming via foreachBatch converges to the batch result") {
    import graft.pipelines.OrderApproval
    import graft.core.Envelope
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val src = tmp("order-src")
    def webhook(inv: String, qty: Int): String =
      s"""{"record":{"Status":{"value":"Approved"},"order_details_table_website":{"value":[{"id":"1","value":{"inventory_id":{"value":"$inv"},"bag_model_website":{"value":"Tour"},"qty_website":{"value":"$qty"}}}]}}}"""
    val inventory0 = Seq(("101", 10, 0), ("102", 8, 1))
      .toDF("inventory_id", "general_stock_qty", "qty_office")
    val bodies = Seq(webhook("101", 2), webhook("102", 3))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src, "b.json"), bodies.mkString("\n"))
    var state = inventory0
    val q = graft.streaming.Streams.runOrderApprovalStream(spark, src, () => state, df => {
      val rows = java.util.Arrays.asList(df.collect(): _*)
      state = spark.createDataFrame(rows, df.schema)
      ()
    }, Trigger.AvailableNow())
    q.awaitTermination(60000)
    val expected = OrderApproval(
      bodies.zipWithIndex.toDF("body", "event_id")
        .withColumn("record", from_json(col("body"), Envelope.orderWebhookSchema).getField("record")),
      inventory0).inventory.orderBy("inventory_id").collect().map(_.toSeq)
    assert(state.drop(graft.streaming.IdempotentMerge.BatchCol)
      .orderBy("inventory_id").collect().map(_.toSeq) === expected)
  }
}
