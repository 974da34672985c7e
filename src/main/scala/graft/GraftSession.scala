package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory for the engine. The driver harness builds its own
  * sessions (Verify/Bench honor its env contract); library users get the
  * scale posture here. Engine lifecycle knobs (spill-dir retention,
  * streaming-ledger compaction cadence) are ordinary `spark.graft.*`
  * conf keys — see [[GraftConfig]] for the documented surface; set them
  * on this builder like any other Spark setting.
  */
object GraftSession {

  /** Builder with the settings every graft job wants:
    *  - AQE on (runtime re-plan: skew-join splitting, partition coalescing,
    *    broadcast promotion) — the main lever that makes a static plan
    *    survive real data distributions at 100 TB;
    *  - shuffle partitions sized to the environment, not the 200 default;
    *  - 128 MB scan partitions (`files.maxPartitionBytes`) so map tasks
    *    neither starve (tiny tasks) nor spill (huge ones);
    *  - UTC session timezone (oracle parity and sanity).
    */
  def builder(appName: String = "graft",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has shipped as both TIMESTAMP(NANOS) and (MICROS);
      // the flag is a no-op for micros but lets a nanos file load as a raw
      // long that Tables.events converts (session-level flag lives HERE,
      // not in a loader)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r20 (guide §6): serial driver listing beats a distributed
      // listing job up to hundreds of partition dirs; the 32-path
      // default sat just under the engine's √N cell-partitioned index
      // stores. Object-store deployments with thousands of partitions
      // can lower it — it is an ordinary overridable conf.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      // r21: the generated-class cache defaults to 100 entries — smaller
      // than this engine's operator surface, so a long-lived session
      // re-pays Janino compilation on every plan revisit. Sized to the
      // registry, not the host (ordinary static conf, overridable).
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.extensions", "graft.GraftExtensions")

  /** Local session for tools/tests. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession =
    builder(shufflePartitions = cores).master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
