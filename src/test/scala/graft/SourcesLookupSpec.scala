package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.sources.{MapFetcher, RecordFetcher, RemoteLookup}

/** Call-counting fetcher for the batching assertions: local-mode tests
  * share one JVM, so a static counter observes executor-side calls.
  */
object CountingFetcher {
  val calls = new AtomicInteger(0)
  val idsSeen = new AtomicInteger(0)
}
final case class CountingMapFetcher(records: Map[String, Map[String, String]])
    extends RecordFetcher {
  def fetch(ids: Seq[String]): Map[String, Map[String, String]] = {
    CountingFetcher.calls.incrementAndGet()
    CountingFetcher.idsSeen.addAndGet(ids.size)
    MapFetcher(records).fetch(ids)
  }
}

class SourcesLookupSpec extends SparkSpec {
  import spark.implicits._

  private val remote = Map(
    "a" -> Map("name" -> "Alpha", "seg" -> "X"),
    "b" -> Map("name" -> "Beta", "seg" -> "Y"),
    "c" -> Map("name" -> "Gamma", "seg" -> "Z"))

  test("lookup equals the equivalent left join; missing keys yield nulls") {
    val input = Seq((1L, "a"), (2L, "b"), (3L, "nope"), (4L, "a"))
      .toDF("row_id", "key")
    val out = RemoteLookup.withLookup(input, "key", Seq("name", "seg"), MapFetcher(remote))
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3))).toSet
    assert(out === Set((1L, "Alpha", "X"), (2L, "Beta", "Y"),
      (3L, null, null), (4L, "Alpha", "X")))
  }

  test("lookups are batched per partition, ids de-duplicated within a batch") {
    CountingFetcher.calls.set(0)
    CountingFetcher.idsSeen.set(0)
    // 10 rows over ONE partition with batchSize 4 → exactly 3 calls;
    // ids repeat 5× each so de-dup must shrink the requested id count
    val input = (1 to 10).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("row_id", "key").coalesce(1)
    RemoteLookup.withLookup(input, "key", Seq("name"), CountingMapFetcher(remote),
      batchSize = 4).write.format("noop").mode("overwrite").save()
    assert(CountingFetcher.calls.get() === 3)   // ceil(10/4): never row-at-a-time
    assert(CountingFetcher.idsSeen.get() <= 6)  // ≤2 distinct ids per batch
  }

  test("registered q60 matches the broadcast-join formulation on star data") {
    val q = RemoteLookup.registry.find(_.name == "q60_remote_lookup").get
    val viaConnector = q.run(spark, sf)
      .orderBy("o_orderkey").collect().map(_.toSeq)
    val viaJoin = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey").cast("string").as("cust_id"))
      .join(broadcast(Tables.customer(spark, sf)
        .select(col("c_custkey").cast("string").as("cust_id"),
          col("c_name"), col("c_mktsegment"))), Seq("cust_id"))
      .select(col("o_orderkey"), col("cust_id"), col("c_name"), col("c_mktsegment"))
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(viaConnector === viaJoin)
  }
}
