package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's Parquet star schema (TESTDATA.md / FIXTURES.md §B).
  *
  * All operators take a scale-factor directory (`/root/testdata/sf0.01` etc.)
  * and read columnar Parquet; Catalyst pushes filters/projections down to the
  * scan, so at 100 TB a query touching 2 of 11 lineitem columns reads only
  * those column chunks. Never cache here — callers decide lifetime.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` has shipped as BOTH Parquet TIMESTAMP(MICROS) (reads as a
    * native TimestampType/NTZ) and TIMESTAMP(NANOS) (rejected by the
    * vectorized reader unless `spark.sql.legacy.parquet.nanosAsLong=true`
    * surfaces it as a raw nanosecond LongType). Branch on the loaded type so
    * either encoding works: longs get integer-division conversion (`div`,
    * not `/` — a double divide would lose precision above 2^53 ns);
    * timestamps pass through as-is. The nanosAsLong session flag is owned by
    * [[GraftSession.builder]]; a loader must not mutate session conf.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType =>
        raw
      case TimestampNTZType =>
        // UTC session tz (GraftSession) makes this cast a pure re-tag; it
        // restores the TimestampType every downstream consumer was built on.
        raw.withColumn("ts", raw("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: expected LongType (nanos-as-long) or Timestamp(NTZ)Type, got $other. " +
            "If events.parquet is TIMESTAMP(NANOS), build the session with GraftSession.builder " +
            "(or set spark.sql.legacy.parquet.nanosAsLong=true).")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Ensure at least the session's default parallelism ahead of a
    * row-AMPLIFYING transform (char-gram explode, per-row decode): a
    * small single-file scan otherwise pins the whole downstream stage on
    * one task. No-op — no shuffle — when the scan already has enough
    * partitions, which is always the case at real scale; the shuffle it
    * does introduce moves only the small pre-amplification rows.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Name-based loader that routes through the schema-aware accessors
    * (`events` needs the nanos handling).
    */
  def load(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events" => events(s, d)
    case other    => table(s, d, other)
  }
}
