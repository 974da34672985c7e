package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.{OpQuery, Tables}
import graft.OpQuery.sql

/** Batched point-lookup contract for a remote keyed store. The reference
  * fetches ONE record per HTTP GET per input row
  * (`/root/reference/routes/makeRouter.js:20-38`, call sites `:104`,
  * `:160`) — the N+1 pattern. Implementations receive a BATCH of ids per
  * call; absent ids are simply missing from the result (the reference's
  * GET-404 path, surfaced as nulls by [[RemoteLookup.withLookup]]).
  */
trait RecordFetcher extends Serializable {
  def fetch(ids: Seq[String]): Map[String, Map[String, String]]
}

/** In-memory fetcher: the stand-in for the remote app in tests and the
  * oracle-gated fixture (this container has no egress; a production
  * implementation would issue the batched GETs with a
  * [[graft.streaming.SinkConfig]] token).
  */
final case class MapFetcher(records: Map[String, Map[String, String]])
    extends RecordFetcher {
  def fetch(ids: Seq[String]): Map[String, Map[String, String]] = {
    val want = ids.toSet
    records.view.filterKeys(want).toMap
  }
}

/** API-parity remote point-lookup connector (SURVEY.md §2.1 S3 variant).
  *
  * The analytically superior mapping of the reference's per-row GET is a
  * snapshot + broadcast join (what the EP pipelines do). THIS connector
  * exists for stores that only expose point reads: per-partition BATCHED
  * lookups through a pluggable [[RecordFetcher]], so an input of R rows
  * in P partitions costs ~⌈R/batch⌉ round trips issued from P executors
  * in parallel — never R sequential calls like the reference. Ids are
  * de-duplicated within each batch (the reference's `updatedInventoryIds`
  * guard, makeRouter.js:86).
  */
object RemoteLookup {

  /** Append `fields` from the remote record keyed by `keyCol` to every
    * input row (left-lookup: missing key → null fields).
    */
  def withLookup(input: DataFrame, keyCol: String, fields: Seq[String],
      fetcher: RecordFetcher, batchSize: Int = 100): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val spark = input.sparkSession
    val schema = StructType(input.schema.fields ++
      fields.map(f => StructField(f, StringType, nullable = true)))
    val keyIdx = input.schema.fieldIndex(keyCol)
    // genuine per-partition imperative logic — the sanctioned RDD case:
    // iterator → fixed-size batches → one fetch per batch, constant memory
    val looked = input.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val ids = batch.map(r => String.valueOf(r.get(keyIdx))).distinct
        val got = fetcher.fetch(ids)
        batch.map { r =>
          val rec = got.get(String.valueOf(r.get(keyIdx)))
          Row.fromSeq(r.toSeq ++ fields.map(f => rec.flatMap(_.get(f)).orNull))
        }
      }
    }
    spark.createDataFrame(looked, schema)
  }

  def registry: Seq[OpQuery] = Seq(

    // ---- the connector against a customer-snapshot "remote app" ----------
    // The MapFetcher fixture IS the simulated remote store (collected once
    // on the driver like the reference's Kintone app holds the table) —
    // the connector itself never sees more than `batchSize` ids at a time.
    // Oracle: the equivalent lookup join.
    sql("q60_remote_lookup",
      """SELECT o_orderkey, CAST(o_custkey AS VARCHAR) AS cust_id,
        |  c_name, c_mktsegment
        |FROM orders JOIN customer ON c_custkey = o_custkey""".stripMargin) { (s, d) =>
      val remoteApp = Tables.customer(s, d)
        .select(col("c_custkey").cast("string"), col("c_name"), col("c_mktsegment"))
        .collect()
        .map(r => r.getString(0) ->
          Map("c_name" -> r.getString(1), "c_mktsegment" -> r.getString(2)))
        .toMap
      // spread: a single-file orders scan would issue every batch from
      // one task — the connector's parallelism claim is per-partition
      withLookup(
        Tables.spread(Tables.orders(s, d))
          .select(col("o_orderkey"), col("o_custkey").cast("string").as("cust_id")),
        "cust_id", Seq("c_name", "c_mktsegment"), MapFetcher(remoteApp))
    }
  )
}
