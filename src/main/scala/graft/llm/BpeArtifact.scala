package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, VERSIONED BPE model artifact — the tokenizer's train/serve
  * split (r16, closing the r15 verdict's #1). The learned merge table
  * feeds six registry entries (t38/t40–t43, st13) and until now lived as
  * a caller-held in-memory `Seq`; an unversioned table means a retrain
  * silently reprices every downstream manifest/mixture number with no
  * record of which model did the pricing. This store gives the table the
  * ParquetLedger treatment:
  *
  * {{{
  *   <root>/v=<n>/merges/            parquet (rank, left, right, merged, weight)
  *   <root>/v=<n>/meta/              one-row parquet (version, top_v, rounds,
  *                                   corpus_docs, corpus_fingerprint)
  *   <root>/v=<n>/_GRAFT_COMMITTED   commit marker (after both stores land)
  *   <root>/CURRENT                  pointer file "v=<n>", tmp-write + rename
  * }}}
  *
  * Write discipline = [[graft.streaming.IndexLifecycle]]'s generation
  * commit: data first, then the marker, then the atomic pointer flip — a
  * reader sees the previous committed version or the new one, never a torn
  * table. A version dir without its marker is invisible (its writer
  * crashed mid-publish); the next train takes the next version NUMBER
  * regardless, so a replayed crashed train never collides with the torn
  * dir's content. If the pointer itself is torn or missing (crash between
  * delete and rename), readers fall back to the NEWEST committed version —
  * the same recovery order [[graft.streaming.IndexLifecycle.currentRoot]]
  * uses, by embedded version number, not file mtime.
  *
  * Provenance rides IN the artifact: the resolved train knobs
  * ([[TextStats.bpeTrainParams]] — the same values that trained it, one
  * resolution point) and a deterministic corpus fingerprint
  * (`bit_xor(xxhash64(doc_id, text))` + the doc count — order-independent,
  * partitioning-independent), so "which table priced this manifest" is
  * answerable from disk and a retrain against a changed corpus shows as a
  * fingerprint change, not a silent repricing.
  *
  * Registry entries do NOT read through this store: their oracles re-learn
  * the table inside the query (the whole point of the t37+ family), so
  * they stay pure functions of the corpus. The artifact is the
  * PRODUCTION path — st13's streaming form in StreamsSpec deploys the
  * gate from a persisted model, and BpeArtifactSpec pins the round trip
  * token-for-token against the in-memory table.
  */
object BpeArtifact {

  val CommitMarker = "_GRAFT_COMMITTED"

  /** A loaded model version: train parameters + provenance + the
    * train-time compression BASELINE + the merge table in rank order
    * (exactly [[TextStats.bpeLearnMerges]]' shape).
    *
    * `baselineNcp`/`baselineNtok` (r16, the lifecycle's drift anchor):
    * the TRAIN corpus's total non-whitespace codepoints and its
    * learned-token count under THIS table — exact integers, so a later
    * batch's compression can be compared by integer cross-
    * multiplication with no float rounding to disagree across engines.
    * Their ratio (codepoints per token) is what the model "promised" at
    * train time; a batch the table compresses materially worse is
    * distribution drift ([[graft.streaming.BpeLifecycle.tick]]).
    */
  case class Model(version: Long, topV: Int, rounds: Int,
      corpusDocs: Long, corpusFingerprint: Long,
      baselineNcp: Long, baselineNtok: Long,
      merges: Seq[(Int, String, String, String, Long)]) {

    /** (left, right) pairs in rank order — the
      * [[graft.functions.Bpe.count]]/`tokens` input shape.
      */
    def pairs: Seq[(String, String)] = merges.map(m => (m._2, m._3))

    /** Fingerprint of the MERGE TABLE itself (vs [[corpusFingerprint]],
      * which names the training data): [[TextStats.bpeTableFingerprint]]
      * — the 60-bit sha256 prefix of the canonical rank-ordered
      * rendering, DuckDB-replayable via [[TextStats.bpeTableFpCte]]
      * (the t41 manifest column hash-proves the equivalence). This is
      * the value a downstream metering output (shard manifest, mixture
      * table, budget ledger) carries to name the model that priced it —
      * two models trained on different corpora or knobs that happen to
      * learn the SAME table price identically, and this says so where
      * the provenance fields cannot. Derived, not stored: recomputed
      * from the table on every load, so it can never drift from the
      * merges it describes.
      */
    def tableFingerprint: Long = TextStats.bpeTableFingerprint(merges)
  }

  private def fsOf(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  /** "v=<n>" → n; anything else → −1 (ignored). */
  private def verOf(name: String): Long =
    if (!name.startsWith("v=")) -1L
    else scala.util.Try(name.stripPrefix("v=").toLong).getOrElse(-1L)

  private def committed(spark: SparkSession, root: String, v: Long): Boolean =
    fsOf(spark, root).exists(new Path(s"$root/v=$v/$CommitMarker"))

  /** All version numbers present under the root (committed or torn). */
  private def allVersions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val rp = new Path(root)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq
      .filter(_.isDirectory).map(st => verOf(st.getPath.getName)).filter(_ >= 1L)
  }

  /** The serving version: the pointer when it names a committed version,
    * else the newest committed version (crash between pointer delete and
    * rename). None = no committed model yet.
    */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val ptr = new Path(root, "CURRENT")
    val fromPtr =
      try {
        if (!fs.exists(ptr)) None
        else {
          val in = fs.open(ptr)
          val name =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some(verOf(name)).filter(v => v >= 1L && committed(spark, root, v))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    fromPtr.orElse(
      allVersions(spark, root).filter(committed(spark, root, _)).sorted.lastOption)
  }

  /** Train under the session's `spark.graft.bpe.*` knobs (resolved
    * through [[TextStats.bpeTrainParams]] — the production train entry
    * point) and publish the result as the next version. Returns the
    * published [[Model]].
    */
  def train(docs: DataFrame, root: String): Model = {
    val spark = docs.sparkSession
    val (topV, rounds) = TextStats.bpeTrainParams(spark)
    // ONE corpus-sized aggregation: the word histogram. The top-V
    // sample, the merge loop, and the train-time baseline are all
    // functions of it; persist so the baseline pass below re-reads the
    // (vocabulary-sized) histogram, not the corpus.
    val hist = TextStats.bpeWordHistogram(docs).persist()
    try {
      // provenance scan: one pass over (doc_id, text); order- and
      // partitioning-independent by construction (bit_xor is
      // commutative). r20: it reads the CORPUS, not the histogram, and
      // shares no input with the merge learning — run it concurrently
      // with the top-V collect + driver-side merge loop (guide §2.6).
      val (prov, (merges, (ncp, ntok))) = graft.llm.Similarity.inParallel(
        docs.agg(
          count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(doc_id, text))").as("fp")).head(),
        {
          val m = TextStats.bpeLearnMergesFromHist(hist, topV, rounds)
          (m, baselineOf(hist, m))
        })
      val fp = if (prov.isNullAt(1)) 0L else prov.getLong(1)
      val v = write(spark, root, merges, topV, rounds, prov.getLong(0), fp,
        ncp, ntok)
      Model(v, topV, rounds, prov.getLong(0), fp, ncp, ntok, merges)
    } finally { hist.unpersist(); () }
  }

  /** [[train]] from a pre-aggregated (w, freq) word histogram — the
    * lifecycle's retrain entry point ([[graft.streaming.BpeLifecycle]]
    * persists per-batch histograms, vocabulary-sized, instead of raw
    * text; summed histograms retrain EXACTLY because the whole trainer
    * is a function of the histogram). `corpusDocs` is caller-supplied
    * (a histogram no longer knows its document count); the provenance
    * fingerprint is over the histogram itself — bit_xor(xxhash64(w,
    * freq)), order- and partitioning-independent — which names the
    * training data just as well: two corpora with the same word
    * histogram train the same model by construction.
    */
  def trainFromHist(spark: SparkSession, hist: DataFrame, root: String,
      corpusDocs: Long): Model = {
    val (topV, rounds) = TextStats.bpeTrainParams(spark)
    val h = hist.persist()
    try {
      val merges = TextStats.bpeLearnMergesFromHist(h, topV, rounds)
      // r20: baseline pricing + provenance fingerprint in ONE fused
      // 1-row aggregate over the persisted histogram (was two
      // driver-synchronous head() jobs over the same input); the
      // pricing columns stay [[TextStats.bpeHistMeter]]'s own
      // expressions — see bpeHistMeterWithFp
      val (ncp, ntok, fp) =
        TextStats.bpeHistMeterWithFp(h, merges.map(m => (m._2, m._3)))
      val v = write(spark, root, merges, topV, rounds, corpusDocs, fp,
        ncp, ntok)
      Model(v, topV, rounds, corpusDocs, fp, ncp, ntok, merges)
    } finally { h.unpersist(); () }
  }

  /** Exact train-corpus compression totals off the histogram —
    * [[TextStats.bpeHistMeter]], the ONE pricing expression shared with
    * the lifecycle's per-batch drift metering (the drift compare is
    * only sound while both sides price identically).
    */
  private def baselineOf(hist: DataFrame,
      merges: Seq[(Int, String, String, String, Long)]): (Long, Long) =
    TextStats.bpeHistMeter(hist, merges.map(m => (m._2, m._3)))

  /** Publish a trained table as the next version: merges + meta parquet,
    * then the commit marker, then the atomic pointer flip. Returns the
    * new version number. Idempotence posture: a crashed publish leaves a
    * marker-less dir that readers never see; the retry takes a FRESH
    * version number (never rewrites the torn dir), so no reader can
    * observe a half-overwritten store.
    */
  def write(spark: SparkSession, root: String,
      merges: Seq[(Int, String, String, String, Long)],
      topV: Int, rounds: Int,
      corpusDocs: Long, corpusFingerprint: Long,
      baselineNcp: Long = 0L, baselineNtok: Long = 0L): Long = {
    require(merges.nonEmpty, "refusing to publish an empty merge table")
    import spark.implicits._
    val v = allVersions(spark, root).sorted.lastOption.getOrElse(0L) + 1L
    val dir = s"$root/v=$v"
    // r20: merges and meta are independent pre-marker outputs of the
    // same uncommitted version dir — overlap the two tiny writes (guide
    // §2.6); the commit marker still lands strictly after both, so a
    // torn publish stays invisible exactly as before
    graft.llm.Similarity.inParallel(
      merges.toDF("rank", "left", "right", "merged", "weight")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges"),
      Seq((v, topV, rounds, corpusDocs, corpusFingerprint,
          baselineNcp, baselineNtok))
        .toDF("version", "top_v", "rounds", "corpus_docs", "corpus_fingerprint",
          "baseline_ncp", "baseline_ntok")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta"))
    val fs = fsOf(spark, root)
    fs.create(new Path(dir, CommitMarker), true).close()
    val tmp = new Path(root, "CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write((s"v=$v" + "\n").getBytes("UTF-8")) finally out.close()
    val ptr = new Path(root, "CURRENT")
    fs.delete(ptr, false)
    fs.rename(tmp, ptr)
    v
  }

  /** Load a committed model: the pointed-at version by default, or an
    * explicit historical version (every committed version stays readable
    * — the downstream manifest that was priced under v=1 can always name
    * its model again).
    */
  def load(spark: SparkSession, root: String,
      version: Option[Long] = None): Model = {
    val v = version.getOrElse(currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed BPE model under $root")))
    require(committed(spark, root, v),
      s"BPE model version v=$v under $root is absent or uncommitted (torn write?)")
    val dir = s"$root/v=$v"
    val m = spark.read.parquet(s"$dir/meta").head()
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // schema-by-name reads so a pre-baseline meta row (none shipped, but
    // the discipline is cheap) and any future column append stay readable
    def lOf(f: String, default: Long): Long = {
      val i = m.schema.fieldNames.indexOf(f)
      if (i < 0) default else m.getLong(i)
    }
    Model(m.getLong(0), m.getInt(1), m.getInt(2), m.getLong(3), m.getLong(4),
      lOf("baseline_ncp", 0L), lOf("baseline_ntok", 0L), merges)
  }

  /** The serving table's (left, right) pairs — the one-call read path for
    * metering sites ([[graft.streaming.Streams.bpeBudgetRouteFromArtifact]]).
    */
  def loadPairs(spark: SparkSession, root: String): Seq[(String, String)] =
    load(spark, root).pairs

  /** Version retention (r16 — [[graft.streaming.IndexLifecycle
    * .reclaimDeadGenerations]]' keepN discipline on the model store):
    * delete committed versions older than the newest `keepN`, never the
    * serving one (the CURRENT target is always within the newest keepN
    * by construction — versions are monotone and the pointer names the
    * newest commit). Torn (marker-less) dirs older than the newest
    * committed version are crashed publishes a later train superseded —
    * reclaimed too. Keeping every version is the DEFAULT (provenance:
    * an old manifest can always reload the table that priced it);
    * retention is for deployments that retrain continuously, where
    * "every version forever" is unbounded growth and the fingerprint
    * (recomputable from any surviving copy, carried by downstream
    * manifests) remains the durable provenance. Returns deleted
    * version numbers.
    */
  def retainVersions(spark: SparkSession, root: String,
      keepN: Int): Seq[Long] = {
    require(keepN >= 1, s"keepN must be >= 1, got $keepN")
    val fs = fsOf(spark, root)
    val all = allVersions(spark, root).sorted
    val live = all.filter(committed(spark, root, _))
    if (live.isEmpty) Seq.empty
    else {
      val keep = live.takeRight(keepN).toSet
      val newest = live.last
      val dead = all.filter(v => !keep.contains(v) &&
        (live.contains(v) || v < newest))
      dead.foreach(v => fs.delete(new Path(s"$root/v=$v"), true))
      dead
    }
  }
}
