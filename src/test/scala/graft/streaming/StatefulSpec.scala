package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.SparkSpec

case class Move(inventoryId: String, station: String, delta: Long)
case class Counters(counts: Map[String, Long])

/** Custom keyed state via `mapGroupsWithState` (SURVEY.md §2.9): the
  * inventory-counter state machine held in Spark-managed per-key state
  * instead of an external ledger — the alternative to foreachBatch merge
  * when state must live inside the stream.
  */
class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState accumulates per-key station counters across batches") {
    val src = Files.createTempDirectory("state-src").toString

    def update(key: String, rows: Iterator[Move], state: GroupState[Counters]): (String, Map[String, Long]) = {
      val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
      val merged = rows.foldLeft(prev) { (acc, m) =>
        acc.updated(m.station, acc.getOrElse(m.station, 0L) + m.delta)
      }
      state.update(Counters(merged))
      key -> merged
    }

    // batch 1
    Seq("101,qty_office,-1", "101,qty_warehouse,1", "102,qty_sewer,1")
      .toDF("v").coalesce(1).write.mode("append").text(src)

    val stream = spark.readStream.text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).as("inventoryId"),
        col("p").getItem(1).as("station"),
        col("p").getItem(2).cast("long").as("delta"))
      .as[Move]

    val counted = stream
      .groupByKey(_.inventoryId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)

    val q = counted.toDF("key", "counts").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("state_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      // batch 2: same keys again — state must carry over
      Seq("101,qty_warehouse,-1", "101,qty_art,1").toDF("v")
        .coalesce(1).write.mode("append").text(src)
      q.processAllAvailable()
    } finally q.stop()

    // memory sink in Update mode appends updated rows; take the LAST row per key
    val rows = spark.table("state_out").collect()
    val latest = rows.zipWithIndex
      .groupBy(_._1.getString(0)).view
      .mapValues(_.maxBy(_._2)._1.getAs[Map[String, Long]]("counts")).toMap
    assert(latest("101") === Map("qty_office" -> -1L, "qty_warehouse" -> 0L, "qty_art" -> 1L))
    assert(latest("102") === Map("qty_sewer" -> 1L))
  }

  test("flatMapGroupsWithState emits zero-or-more rows per key with carried state") {
    import org.apache.spark.sql.streaming.GroupState
    val src = Files.createTempDirectory("flat-src").toString
    // emit a row only when a key's NET movement for a station crosses zero
    // downward (an alerting shape: flatMap = variable fan-out per group)
    def alert(key: String, rows: Iterator[Move], state: GroupState[Counters]): Iterator[String] = {
      val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
      val merged = rows.foldLeft(prev) { (acc, m) =>
        acc.updated(m.station, acc.getOrElse(m.station, 0L) + m.delta)
      }
      state.update(Counters(merged))
      merged.collect { case (st, n) if n < 0 => s"$key:$st" }.iterator
    }
    Seq("201,qty_office,-1", "201,qty_art,2", "202,qty_sewer,1").toDF("v")
      .coalesce(1).write.mode("append").text(src)
    val stream = spark.readStream.text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).as("inventoryId"),
        col("p").getItem(1).as("station"),
        col("p").getItem(2).cast("long").as("delta"))
      .as[Move]
    val alerts = stream.groupByKey(_.inventoryId)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(alert)
    val q = alerts.toDF("alert").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("alert_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("alert_out").collect().map(_.getString(0)).toSet
    // only the negative counter alerts; 202 stays silent (fan-out 0)
    assert(got === Set("201:qty_office"))
  }

  test("dropDuplicatesWithinWatermark dedups replayed events across micro-batches") {
    // The streaming dedup for at-least-once sources: duplicate event ids
    // arriving within the watermark window are dropped even across
    // micro-batches (state bounded by the watermark — the 100 TB-safe
    // alternative to an unbounded dropDuplicates state store).
    val src = Files.createTempDirectory("dedup-src").toString
    def write(file: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, file),
        rows.mkString("\n"))
    // batch 1: e1, e2; batch 2 replays e2 and adds e3 (same event time)
    write("b1.txt", Seq("e1,2024-01-01 10:00:00", "e2,2024-01-01 10:01:00"))
    val stream = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).as("event_id"),
        col("p").getItem(1).cast("timestamp").as("ts"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      write("b2.txt", Seq("e2,2024-01-01 10:01:00", "e3,2024-01-01 10:02:00"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out").collect().map(_.getString(0)).toSeq
    assert(got.sorted === Seq("e1", "e2", "e3")) // e2 replay dropped
  }

  test("streaming funnel over two micro-batches equals the q69 batch fold") {
    import graft.streaming.Streams
    import graft.streaming.Streams.FunnelEvent
    val sfDir = sf
    // real corpus events, split into two event-time-ordered batches at
    // the median timestamp — hop state must CARRY across the boundary
    // (a view in batch 1 converting on a click in batch 2 still counts)
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._3)
    val cut = ev(ev.length / 2)._3
    val src = Files.createTempDirectory("funnel-src").toString
    def write(file: String, rows: Seq[(Long, String, Long)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, file),
        rows.map { case (u, t, us) => s"$u,$t,$us" }.mkString("\n"))
    write("b1.txt", ev.filter(_._3 <= cut).toSeq)

    val stream = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).cast("long").as("userId"),
        col("p").getItem(1).as("et"),
        col("p").getItem(2).cast("long").as("us"))
      .as[FunnelEvent]
    val q = Streams.funnelStream(stream).toDF("user_id", "stage").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      write("b2.txt", ev.filter(_._3 > cut).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // Update mode appends per-batch rows; the LAST row per user is final
    val rows = spark.table("funnel_out").collect()
    val streamed = rows.zipWithIndex.groupBy(_._1.getLong(0)).view
      .mapValues(_.maxBy(_._2)._1.getLong(1)).toMap
    val batch = graft.SparkEntry.registry.find(_.name == "q69_event_funnel").get
      .run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch,
      "streaming funnel state diverged from the batch fold across the batch cut")
  }

  test("ordered funnel equals the batch fold under seeded shuffled delivery") {
    import graft.streaming.Streams
    import graft.streaming.Streams.FunnelEvent
    val sfDir = sf
    // the SAME corpus as the in-order equality test, but delivery order
    // is randomly shuffled ACROSS micro-batches — the configuration
    // where plain funnelStream's documented boundary diverges; the
    // watermark-buffered form must still match the batch fold exactly
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val shuffled = new scala.util.Random(11).shuffle(ev.toSeq)
    val maxUs = ev.map(_._3).max
    // equality holds for any delivery whose delay is within `lateness`;
    // a full shuffle can displace an event by the whole corpus span, so
    // the lateness horizon must cover it
    val spanDays = ((maxUs - ev.map(_._3).min) / 86400000000L + 2).toString + " days"
    val src = Files.createTempDirectory("funnel-ord-src").toString
    def write(file: String, rows: Seq[(Long, String, Long)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, file),
        rows.map { case (u, t, us) => s"$u,$t,$us" }.mkString("\n"))
    val third = (shuffled.length + 2) / 3
    shuffled.grouped(third).zipWithIndex.foreach { case (chunk, i) =>
      write(s"b$i.txt", chunk)
    }
    val stream = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).cast("long").as("userId"),
        col("p").getItem(1).as("et"),
        col("p").getItem(2).cast("long").as("us"))
      .as[FunnelEvent]
    val q = Streams.funnelStreamOrdered(stream, lateness = spanDays)
      .toDF("user_id", "stage").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_ord_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      // flush: one far-future dummy event advances the watermark past
      // every real event, ripening all held state via event-time timers
      write("flush.txt", Seq((-1L, "other", maxUs + 400L * 86400000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_ord_out").collect()
    val streamed = rows.zipWithIndex.groupBy(_._1.getLong(0)).view
      .mapValues(_.maxBy(_._2)._1.getLong(1)).toMap - (-1L)
    val batch = graft.SparkEntry.registry.find(_.name == "q69_event_funnel").get
      .run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch,
      "ordered streaming funnel diverged from the batch fold under shuffled delivery")
  }

  test("ordered funnel ripens incrementally and recovers the cross-batch hop") {
    import graft.streaming.Streams
    import graft.streaming.Streams.FunnelEvent
    val src = Files.createTempDirectory("funnel-inc-src").toString
    def write(file: String, rows: Seq[(Long, String, Long)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, file),
        rows.map { case (u, t, us) => s"$u,$t,$us" }.mkString("\n"))
    val base = 1700000000000000L
    def t(i: Int): Long = base + i * 1000000L
    // user 100's click is delivered a batch BEFORE its view — the exact
    // shape plain funnelStream documents as divergent (it would land at
    // stage 1: the orphan click is unusable by the time the view
    // arrives, and the purchase finds no click). The ordered form
    // buffers inside the 2 s lateness horizon and folds via event-time
    // timers as the watermark advances. An event can never fold in its
    // own arrival batch (kept means ts > wm, ripe means ts <= wm), so
    // ripening is necessarily staged across batches: b3's junk event
    // advances the watermark to t3, folding view+click (stage 2,
    // purchase still held); the flush then completes the chain
    // (stage 3). The intermediate 2 is asserted — partial per-user
    // ripening, not one big flush.
    write("b0.txt", Seq((100L, "click", t(2))))
    val stream = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).cast("long").as("userId"),
        col("p").getItem(1).as("et"),
        col("p").getItem(2).cast("long").as("us"))
      .as[FunnelEvent]
    val q = Streams.funnelStreamOrdered(stream, lateness = "2 seconds")
      .toDF("user_id", "stage").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_inc_out")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      write("b1.txt", Seq((100L, "view", t(1))))   // wm=t0: kept, held
      q.processAllAvailable()
      write("b2.txt", Seq((100L, "purchase", t(5))))
      q.processAllAvailable()
      write("b3.txt", Seq((400L, "other", t(8)))) // wm t3: view+click ripen
      q.processAllAvailable()
      write("b4.txt", Seq((999L, "other", t(8) + 3600L * 1000000L)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("funnel_inc_out").collect()
    val hundred = rows.filter(_.getLong(0) == 100L).map(_.getLong(1)).toSeq
    val latest = rows.zipWithIndex.groupBy(_._1.getLong(0)).view
      .mapValues(_.maxBy(_._2)._1.getLong(1)).toMap
    assert(latest(100L) === 3L,
      s"ordered funnel failed to recover the early-delivered click: $latest / $hundred")
    assert(hundred.contains(2L),
      s"no partial ripening observed (expected an intermediate stage 2): $hundred")
    assert(latest(400L) === 0L) // other-type events establish presence only
  }

  test("funnel state TTL and the cross-batch out-of-order boundary") {
    import graft.streaming.Streams
    import graft.streaming.Streams.FunnelEvent
    val src = Files.createTempDirectory("funnel-ttl-src").toString
    def write(file: String, rows: Seq[(Long, String, Long)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, file),
        rows.map { case (u, t, us) => s"$u,$t,$us" }.mkString("\n"))
    val base = 1700000000000000L
    // user 1: view in batch 1, then IDLE past the TTL — its state must
    // expire, so the click in batch 3 folds from empty state (stage 0).
    // user 7: click delivered in batch 1, its view only in batch 2 —
    // cross-batch OUT-OF-ORDER. The batch fold's global sort would give
    // stage 2; the stream cannot revisit the earlier batch's click, so
    // it lands at stage 1. Both boundaries are the documented contract.
    write("b1.txt", Seq((1L, "view", base), (7L, "click", base + 200L)))
    val stream = spark.readStream.option("maxFilesPerTrigger", "1").text(src)
      .select(split(col("value"), ",").as("p"))
      .select(col("p").getItem(0).cast("long").as("userId"),
        col("p").getItem(1).as("et"),
        col("p").getItem(2).cast("long").as("us"))
      .as[FunnelEvent]
    val q = Streams.funnelStream(stream, idleTimeout = Some("1 second"))
      .toDF("user_id", "stage").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("funnel_ttl_out")
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    // With a processing-time timeout every trigger requires another
    // batch (timers re-check), so processAllAvailable never latches "no
    // new data" — synchronize on SINK CONTENTS with a deadline instead
    // (the contract funnelStream's scaladoc documents for opt-in users).
    def awaitRow(what: String)(pred: Map[Long, Long] => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while ({
        val rows = spark.table("funnel_ttl_out").collect()
        val latest = rows.zipWithIndex.groupBy(_._1.getLong(0)).view
          .mapValues(_.maxBy(_._2)._1.getLong(1)).toMap
        if (pred(latest)) false
        else if (System.nanoTime() > deadline)
          fail(s"timed out waiting for $what; sink: $latest")
        else { Thread.sleep(200); true }
      }) ()
    }
    try {
      awaitRow("batch 1 (view for 1, orphan click for 7)")(m =>
        m.get(1L).contains(1L) && m.contains(7L))
      Thread.sleep(1500) // let users 1 and 7 pass the 1s idle TTL
      write("b2.txt", Seq((7L, "view", base + 100L)))
      awaitRow("user 7's late view")(m => m.get(7L).contains(1L))
      Thread.sleep(1500)
      write("b3.txt", Seq((1L, "click", base + 300L), (9L, "view", base)))
      awaitRow("batch 3 (click for expired 1, view for 9)")(m =>
        m.contains(9L) && m.get(1L).contains(0L))
    } finally q.stop()
    val rows = spark.table("funnel_ttl_out").collect()
    val latest = rows.zipWithIndex.groupBy(_._1.getLong(0)).view
      .mapValues(_.maxBy(_._2)._1.getLong(1)).toMap
    // TTL boundary: user 1's view expired before its click arrived
    assert(latest(1L) === 0L, s"user 1 state should have expired: $latest")
    // out-of-order boundary: user 7's earlier-batch click cannot advance
    // the funnel once the view arrives (and its pre-view state also
    // expired by batch 3, leaving the view-only stage)
    assert(latest(7L) === 1L, s"user 7 should be view-only: $latest")
    assert(latest(9L) === 1L)
  }
}
