package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.Envelope

/** Checkpointed restart semantics: a NEW streaming query resuming from the
  * same checkpoint processes only unseen files — the exactly-once story
  * across restarts (without a checkpoint, a restarted file-source query
  * re-reads everything and double-applies).
  */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("restarted foreachBatch stream resumes from checkpoint without re-applying") {
    val src = Files.createTempDirectory("ckpt-src").toString
    val ckpt = Files.createTempDirectory("ckpt-loc").toString
    def webhook(inv: String, status: String, prev: String): String =
      s"""{"record":{"Status":{"value":"$status"},"Previous_Status":{"value":"$prev"},"bag_model":{"value":"T"},"inventory_id":{"value":"$inv"}}}"""
    val inventory0 = Seq(("101", 10, 5, 0, 0, 0, 0, 0))
      .toDF("inventory_id", "general_stock_qty", "qty_office", "qty_warehouse",
        "qty_art", "qty_embroidery", "qty_sewer", "qty_completed")

    var state = inventory0
    def sink(df: DataFrame): Unit = {
      val rows = java.util.Arrays.asList(df.collect(): _*)
      state = spark.createDataFrame(rows, df.schema)
      ()
    }
    def run(): Unit = {
      val parsed = spark.readStream.text(src)
        .withColumnRenamed("value", "body")
        .withColumn("record",
          from_json(col("body"), Envelope.processWebhookSchema).getField("record"))
        .withColumn("event_id", xxhash64(col("body")))
      val q = parsed.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          sink(graft.pipelines.ProcessMovement(batch, state).inventory)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      ()
    }

    // run 1: Office -> Warehouse (office 5-1=4, warehouse +1)
    Files.writeString(Paths.get(src, "b1.json"), webhook("101", "Warehouse", "Office"))
    run()
    // STOPPED. run 2 is a brand-new query on the same checkpoint; b1 must
    // NOT be re-applied, only the new file b2 (Warehouse -> Art)
    Files.writeString(Paths.get(src, "b2.json"), webhook("101", "Art", "Warehouse"))
    run()

    val r = state.orderBy("inventory_id").collect()(0)
    assert(r.getAs[Long]("qty_office") === 4L, "b1 re-applied after restart!")
    assert(r.getAs[Long]("qty_warehouse") === 0L) // +1 (b1) -1 (b2)
    assert(r.getAs[Long]("qty_art") === 1L)
  }

  test("parquet ledger: merged state and idempotency watermark survive a process restart") {
    val src = Files.createTempDirectory("pl-src").toString
    val ckpt = Files.createTempDirectory("pl-ckpt").toString
    val ldir = Files.createTempDirectory("pl-ledger").toString
    def webhook(inv: String, status: String, prev: String): String =
      s"""{"record":{"Status":{"value":"$status"},"Previous_Status":{"value":"$prev"},"bag_model":{"value":"T"},"inventory_id":{"value":"$inv"}}}"""
    val inventory0 = Seq(("101", 10, 5, 0, 0, 0, 0, 0))
      .toDF("inventory_id", "general_stock_qty", "qty_office", "qty_warehouse",
        "qty_art", "qty_embroidery", "qty_sewer", "qty_completed")
    // a NEW ledger object per run simulates a process restart: the only
    // carried state is what the parquet commit protocol persisted
    def mkLedger() = new ParquetLedger(spark, ldir, inventory0)
    def run(ledger: ParquetLedger, sink: SinkConfig): Unit = {
      val q = Streams.runProcessMovementStream(spark, src,
        () => ledger.get(), ledger.set _, Trigger.AvailableNow(), sink)
      q.awaitTermination(60000)
      ()
    }
    val checkpointed = SinkConfig(checkpointLocation = Some(ckpt))
    Files.writeString(Paths.get(src, "b1.json"), webhook("101", "Warehouse", "Office"))
    run(mkLedger(), checkpointed)
    Files.writeString(Paths.get(src, "b2.json"), webhook("101", "Art", "Warehouse"))
    run(mkLedger(), checkpointed) // restart: only b2 is new
    val afterRestart = mkLedger().get()
    val r = afterRestart.orderBy("inventory_id").collect()(0)
    assert(r.getAs[Long]("qty_office") === 4L, "b1 re-applied after restart!")
    assert(r.getAs[Long]("qty_warehouse") === 0L)
    assert(r.getAs[Long]("qty_art") === 1L)
    // lost checkpoint, same ledger: everything re-delivered as batchId 0 —
    // the watermark PERSISTED IN THE PARQUET makes the replay a no-op
    run(mkLedger(), SinkConfig())
    val afterReplay = mkLedger().get().orderBy("inventory_id").collect()(0)
    assert(afterReplay.getAs[Long]("qty_office") === 4L,
      "replay after checkpoint loss double-applied despite the persisted watermark")
    assert(afterReplay.getAs[Long]("qty_art") === 1L)
  }

  test("parquet ledger reads pre-marker ledger dirs and never clobbers their versions") {
    // a ledger written by the pre-marker format has CURRENT + v<N> dirs
    // but no _GRAFT_COMMITTED files: the pointer path must still resolve
    // (marker not required there), and the next commit must top the
    // existing versions rather than restart at v0
    val ldir = Files.createTempDirectory("pl-legacy").toString
    val initial = Seq(("k", 0L)).toDF("key", "v")
    Seq(("k", 1L)).toDF("key", "v").write.parquet(s"$ldir/v0")
    Seq(("k", 2L)).toDF("key", "v").write.parquet(s"$ldir/v1")
    Files.writeString(Paths.get(ldir, "CURRENT"), "1")
    val ledger = new ParquetLedger(spark, ldir, initial)
    assert(ledger.get().collect().head.getLong(1) === 2L,
      "pre-marker ledger state was discarded")
    ledger.set(Seq(("k", 3L)).toDF("key", "v"))
    assert(Files.exists(Paths.get(ldir, "v2")), "commit clobbered an existing version")
    assert(ledger.get().collect().head.getLong(1) === 3L)
  }

  test("parquet ledger recovers committed state when the pointer file is lost") {
    // the delete-then-rename pointer flip has a crash window with NO
    // CURRENT file — a reader must recover the highest committed version
    // from the per-version markers, not silently fall back to `initial`
    val ldir = Files.createTempDirectory("pl-crash").toString
    val initial = Seq(("k", 0L)).toDF("key", "v")
    val ledger = new ParquetLedger(spark, ldir, initial)
    ledger.set(Seq(("k", 1L)).toDF("key", "v"))
    ledger.set(Seq(("k", 2L)).toDF("key", "v"))
    // simulate the crash window: CURRENT deleted, rename never happened
    Files.delete(Paths.get(ldir, "CURRENT"))
    val recovered = new ParquetLedger(spark, ldir, initial)
    assert(recovered.get().collect().head.getLong(1) === 2L,
      "lost pointer fell back to initial instead of the committed v1 snapshot")
    // and the next commit continues the version chain instead of clobbering
    recovered.set(Seq(("k", 3L)).toDF("key", "v"))
    assert(new ParquetLedger(spark, ldir, initial).get()
      .collect().head.getLong(1) === 3L)
  }
}
