package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Similarity

/** Drift-aware STREAMING index lifecycle (st12) — the s18/s19/s20 arc
  * run continuously: vector batches arrive as a stream, in-distribution
  * batches land as idempotent per-batch DELTAS on the current index
  * generation, and a drifted batch (bias-corrected PSI ≥ 0.2,
  * [[Similarity.correctedMaxPsi]]) triggers a REBUILD into a new
  * generation directory with a pointer cutover — a serving reader never
  * observes a half-built index.
  *
  * Layout under `lcRoot`:
  * {{{
  *   gen-init/, gen-b<batchId>/   full index roots (centroids +
  *                                assignments [+ deltas/batch=<id>])
  *   CURRENT                      pointer file naming the serving gen
  * }}}
  *
  * Exactly-once without a fragile after-effect marker (the manifest
  * lesson, applied twice):
  *  - a DELTA batch writes `deltas/batch=<id>` with OVERWRITE — replay
  *    rewrites identical content, never double-appends (the reason
  *    st12 does not reuse s18's in-place parquet `append`, which cannot
  *    be replayed safely);
  *  - a RETRAIN batch builds its generation under the DETERMINISTIC
  *    name `gen-b<id>` (replay overwrites the same dir), records the
  *    applied-batch set INSIDE the generation before the pointer flip,
  *    and commits by the flip — so a replayed retrain either re-does
  *    work idempotently (crash before flip) or no-ops on the applied
  *    set (after).
  *  - the pointer flip is delete-then-rename guarded by a per-gen
  *    `_GRAFT_COMMITTED` marker ([[ParquetLedger]]'s discipline): a
  *    reader finding no valid pointer recovers the newest committed
  *    generation instead of failing or resetting.
  *
  * A retrain generation absorbs every prior delta (the rebuild reads
  * base ∪ deltas), so retrains double as delta compaction; the RTBF
  * cascade ([[Similarity.ivfIndexPurge]]) reaches base and deltas of
  * the CURRENT generation (prior generations are dead directories the
  * retention policy reclaims — purge after cutover touches only the
  * serving tree).
  */
object IndexLifecycle {

  private val CommitMarker = "_GRAFT_COMMITTED"

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  /** Recovery ordering of generation names: the embedded batch id
    * (`gen-init` = −1, `gen-b<id>` = id) — monotone by construction.
    */
  private def genOrder(name: String): Long =
    if (name == "gen-init") -1L
    else scala.util.Try(name.stripPrefix("gen-b").toLong).getOrElse(-2L)

  /** Serving generation root: the pointer when it names a committed
    * generation; else the newest committed generation (crash between
    * pointer delete and rename). None = lifecycle not initialized.
    */
  def currentRoot(spark: SparkSession, lcRoot: String): Option[String] = {
    val fs = fsOf(spark, lcRoot)
    val ptr = new Path(lcRoot, "CURRENT")
    def committed(name: String): Boolean =
      fs.exists(new Path(new Path(lcRoot, name), CommitMarker))
    val fromPtr =
      try {
        if (!fs.exists(ptr)) None
        else {
          val in = fs.open(ptr)
          val name =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some(name).filter(n => n.nonEmpty && committed(n))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    fromPtr.orElse {
      val root = new Path(lcRoot)
      if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
        .filter(st => committed(st.getPath.getName))
        // order by the BATCH ID embedded in the name (init = −1), not
        // marker mtime: batch ids are monotone by construction while
        // two commits can share a filesystem timestamp tick (and
        // clocks can step) — the deterministic order is the safe one
        .sortBy(st => genOrder(st.getPath.getName))
        .lastOption.map(_.getPath.getName)
    }.map(n => s"$lcRoot/$n")
  }

  private def commitGen(spark: SparkSession, lcRoot: String, name: String): Unit = {
    val fs = fsOf(spark, lcRoot)
    fs.create(new Path(new Path(lcRoot, name), CommitMarker), true).close()
    val tmp = new Path(lcRoot, "CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write((name + "\n").getBytes("UTF-8")) finally out.close()
    val ptr = new Path(lcRoot, "CURRENT")
    fs.delete(ptr, false)
    fs.rename(tmp, ptr)
    ()
  }

  /** Build the initial generation from a base corpus and commit it. */
  def init(spark: SparkSession, lcRoot: String, baseVecs: DataFrame): String = {
    val root = s"$lcRoot/gen-init"
    fsOf(spark, lcRoot).delete(new Path(root), true) // replayed init rebuilds
    Similarity.ivfIndexBuild(baseVecs, targetDir = Some(root))
    commitGen(spark, lcRoot, "gen-init")
    root
  }

  /** One lifecycle tick for a (vec_id, embedding) batch. Returns true
    * iff the batch triggered a retrain cutover.
    */
  def tick(spark: SparkSession, lcRoot: String, batchVecs: DataFrame,
      batchId: Long,
      psiThreshold: Double = Similarity.RetrainPsiThreshold): Boolean = {
    val g = currentRoot(spark, lcRoot).getOrElse(
      throw new IllegalStateException(
        s"IndexLifecycle at $lcRoot not initialized — call init() first"))
    val fs = fsOf(spark, lcRoot)
    val applied = Streams.readAppliedBatches(fs, new Path(g))
    if (applied.contains(batchId)) false
    else {
      val old = Similarity.ivfIndexAssignments(spark, g)
        .select(col("vid").as("vec_id"), col("ve").as("embedding"))
      val batch = batchVecs.select(col("vec_id"), col("embedding"))
      if (Similarity.correctedMaxPsi(old, batch) >= psiThreshold) {
        val name = s"gen-b$batchId"
        val newRoot = s"$lcRoot/$name"
        fs.delete(new Path(newRoot), true) // crashed prior attempt
        Similarity.ivfIndexBuild(old.unionByName(batch),
          targetDir = Some(newRoot))
        Streams.writeAppliedBatches(fs, new Path(newRoot), applied + batchId)
        commitGen(spark, lcRoot, name)
        true
      } else {
        Similarity.ivfIndexAppendDelta(spark, g, batch, batchId)
        // informational (the delta overwrite is the idempotence); also
        // lets a replay skip the drift scan entirely
        Streams.writeAppliedBatches(fs, new Path(g), applied + batchId)
        false
      }
    }
  }

  /** Serve top-k from the current generation (base ∪ deltas). */
  def serve(spark: SparkSession, lcRoot: String, queries: DataFrame,
      k: Int): DataFrame = {
    val g = currentRoot(spark, lcRoot).getOrElse(
      throw new IllegalStateException(s"IndexLifecycle at $lcRoot not initialized"))
    Similarity.ivfIndexQuery(spark, g, queries, k)
  }

  /** Drive the lifecycle from a parquet stream of (vec_id, embedding)
    * batches. `init` must have run against the base corpus first.
    */
  def runStream(spark: SparkSession, srcDir: String, lcRoot: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      psiThreshold: Double = Similarity.RetrainPsiThreshold): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val reader = maxFilesPerTrigger.foldLeft(
      spark.readStream.schema(schema).format("parquet")) {
      (r, n) => r.option("maxFilesPerTrigger", n)
    }
    reader.load(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tick(spark, lcRoot, batch, batchId, psiThreshold)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
