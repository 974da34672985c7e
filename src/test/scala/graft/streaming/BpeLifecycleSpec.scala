package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.llm.{BpeArtifact, TextStats}

/** The drift-aware TOKENIZER lifecycle (st15, r16): record vs retrain
  * decisions, histogram-exact retrains, replay idempotence, torn-batch
  * invisibility, and the RTBF purge's exactness law — a purged
  * lifecycle's model must equal a model trained FROM SCRATCH on the
  * corpus that never contained the forgotten docs (histogram
  * subtraction is exact, not approximate).
  */
class BpeLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** The st15 fixture: base third unchanged, middle third unchanged
    * (same distribution), last third vowel-remapped (drifted).
    */
  private def fixture(): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, sf)
    val shifted = docs.select(col("doc_id"), col("source"),
      when(pmod(col("doc_id"), lit(3)) === 2,
        translate(col("text"), "aeiou", "01234"))
        .otherwise(col("text")).as("text"))
    (shifted,
      shifted.filter(pmod(col("doc_id"), lit(3)) === 0),
      shifted.filter(pmod(col("doc_id"), lit(3)) === 1),
      shifted.filter(pmod(col("doc_id"), lit(3)) === 2))
  }

  test("record vs retrain: same-dist batch records, drifted batch flips the version") {
    val (all, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc") + "/lc"
    val v1 = BpeLifecycle.init(spark, lcRoot, base)
    assert(v1.version === 1L && v1.baselineNtok > 0L)
    assert(v1.merges === TextStats.bpeLearnMerges(base),
      "init must train exactly the one-shot table of the base corpus")

    val r1 = BpeLifecycle.tick(spark, lcRoot, b1, 0L).get
    assert(!r1.retrained && r1.servedVersion === 1L)
    assert(BpeLifecycle.currentModel(spark, lcRoot).version === 1L,
      "an in-distribution batch must not retrain")
    // …but it IS recorded: the manifest now names it
    assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
      === Seq("base", "batch=0"))

    val r2 = BpeLifecycle.tick(spark, lcRoot, b2, 1L).get
    assert(r2.retrained && r2.servedVersion === 1L,
      "the drifted batch is judged by the OLD version, then retrains")
    val m2 = BpeLifecycle.currentModel(spark, lcRoot)
    assert(m2.version === 2L)
    // histogram-exact retrain: the lifecycle's summed batch histograms
    // train the SAME table as a one-shot train over the union corpus
    assert(m2.merges === TextStats.bpeLearnMerges(all),
      "retrain from batch histograms must equal the one-shot train")
    assert(m2.corpusDocs === all.count())
    // the drift margins that make the 10% threshold safe (measured
    // ≤2.7% same-dist vs ~35% shifted at every SF)
    val cpt0 = v1.baselineNcp.toDouble / v1.baselineNtok
    val cpt1 = r1.nCp.toDouble / r1.nTok
    val cpt2 = r2.nCp.toDouble / r2.nTok
    assert(cpt1 > cpt0 * 0.95, s"same-dist batch degraded too much: $cpt1 vs $cpt0")
    assert(cpt2 < cpt0 * 0.80, s"shifted batch degraded too little: $cpt2 vs $cpt0")
  }

  test("replay: an applied batch id is a no-op on model, manifest, and store") {
    val (_, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-rp") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    assert(BpeLifecycle.tick(spark, lcRoot, b1, 0L).nonEmpty)
    assert(BpeLifecycle.tick(spark, lcRoot, b2, 1L).nonEmpty)
    val manifest = BpeLifecycle.readManifest(spark, lcRoot)
    val m = BpeLifecycle.currentModel(spark, lcRoot)
    assert(BpeLifecycle.tick(spark, lcRoot, b1, 0L).isEmpty)
    assert(BpeLifecycle.tick(spark, lcRoot, b2, 1L).isEmpty)
    assert(BpeLifecycle.readManifest(spark, lcRoot) === manifest)
    val m2 = BpeLifecycle.currentModel(spark, lcRoot)
    assert(m2.version === m.version && m2.merges === m.merges)
  }

  test("a histogram dir without its manifest line is invisible to retrains") {
    val (_, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-torn") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    // a torn write: the dir landed (with _SUCCESS) but the writer
    // crashed before its manifest flip — it must not leak into the
    // corpus a later retrain trains on
    TextStats.bpeWordHistogram(b1)
      .coalesce(1).write.parquet(s"$lcRoot/hist/batch=99")
    val r = BpeLifecycle.tick(spark, lcRoot, b2, 0L).get
    assert(r.retrained)
    val m = BpeLifecycle.currentModel(spark, lcRoot)
    assert(m.merges === TextStats.bpeLearnMerges(base.unionByName(b2)),
      "the torn batch's words must not appear in the retrain corpus")
  }

  test("RTBF purge: exact subtraction, atomic revision flip, tainted-version sweep") {
    val (all, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-purge") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    BpeLifecycle.tick(spark, lcRoot, b1, 0L)
    BpeLifecycle.tick(spark, lcRoot, b2, 1L)
    assert(BpeLifecycle.currentModel(spark, lcRoot).version === 2L)
    // forget: every 7th doc of the base (lifecycle name "base" → batch
    // id −1) and every 5th doc of batch 0 — the tombstones carry the
    // docs AS INGESTED
    val tombs = base.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(lit(-1L).as("batch_id"), col("doc_id"), col("text"))
      .unionByName(b1.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select(lit(0L).as("batch_id"), col("doc_id"), col("text")))
    assert(tombs.count() > 0, "fixture must produce tombstones")
    val m3 = BpeLifecycle.purge(spark, lcRoot, tombs)
    assert(m3.version === 3L)
    // THE exactness law: the purged lifecycle's table equals a table
    // trained from scratch on a corpus that never held the docs
    val reduced = all.join(tombs.select(col("doc_id")), Seq("doc_id"),
      "left_anti")
    assert(m3.merges === TextStats.bpeLearnMerges(reduced),
      "histogram subtraction must be exact — purge ≡ never-ingested")
    assert(m3.corpusDocs === reduced.count())
    // tainted versions are swept: only v=3 remains readable
    intercept[IllegalArgumentException] {
      BpeArtifact.load(spark, BpeLifecycle.modelRoot(lcRoot), Some(1L))
    }
    intercept[IllegalArgumentException] {
      BpeArtifact.load(spark, BpeLifecycle.modelRoot(lcRoot), Some(2L))
    }
    assert(BpeArtifact.load(spark, BpeLifecycle.modelRoot(lcRoot)).version === 3L)
    // the manifest flipped to revision dirs atomically and the
    // superseded originals were swept (manifest-guarded)
    val names = BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
    assert(names === Seq("baser1", "batch=0r1", "batch=1"))
    assert(!Files.exists(Paths.get(s"$lcRoot/hist/base")),
      "superseded base histogram must be swept")
    assert(!Files.exists(Paths.get(s"$lcRoot/hist/batch=0")),
      "superseded batch histogram must be swept")
    assert(Files.exists(Paths.get(s"$lcRoot/hist/batch=1")),
      "an unaffected batch keeps its original dir")
    // a second purge on an already-revised batch bumps the revision
    val tombs2 = b1.filter(pmod(col("doc_id"), lit(5)) === 1)
      .select(lit(0L).as("batch_id"), col("doc_id"), col("text"))
    val m4 = BpeLifecycle.purge(spark, lcRoot, tombs2)
    assert(m4.version === 4L)
    assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
      === Seq("baser1", "batch=0r2", "batch=1"))
    val reduced2 = reduced.join(tombs2.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(m4.merges === TextStats.bpeLearnMerges(reduced2))
  }

  test("histogram compaction: one summed dir, same model, RTBF still addressable") {
    val (_, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-cp") + "/lc"
    val lcRef = tmpDir("bpelc-cpref") + "/lc"
    // reference lifecycle, no compaction
    BpeLifecycle.init(spark, lcRef, base)
    BpeLifecycle.tick(spark, lcRef, b1, 0L)
    BpeLifecycle.tick(spark, lcRef, b2, 1L)
    // compacting lifecycle: fold whenever ≥ 2 entries are committed
    spark.conf.set(graft.GraftConfig.BpeCompactAfterBatchesKey, "2")
    try {
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b1, 0L)
      BpeLifecycle.tick(spark, lcRoot, b2, 1L)
    } finally spark.conf.unset(graft.GraftConfig.BpeCompactAfterBatchesKey)
    // the store is bounded: ONE entry absorbing every batch
    val entries = BpeLifecycle.readManifest(spark, lcRoot)
    assert(entries.size === 1 && entries.head.name === "compact=2")
    assert(entries.head.absorbs === Seq(-1L, 0L, 1L))
    assert(!Files.exists(Paths.get(s"$lcRoot/hist/base")) &&
      !Files.exists(Paths.get(s"$lcRoot/hist/batch=0")),
      "folded dirs must be swept")
    // compaction is unobservable to the model (histogram additivity)
    val m = BpeLifecycle.currentModel(spark, lcRoot)
    val ref = BpeLifecycle.currentModel(spark, lcRef)
    assert(m.merges === ref.merges && m.corpusDocs === ref.corpusDocs)
    // RTBF after compaction: a request naming an ABSORBED batch still
    // lands — the purged model equals the reference lifecycle's purge
    val tombs = b1.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(lit(0L).as("batch_id"), col("doc_id"), col("text"))
    val mp = BpeLifecycle.purge(spark, lcRoot, tombs)
    val refp = BpeLifecycle.purge(spark, lcRef, tombs)
    assert(mp.merges === refp.merges && mp.corpusDocs === refp.corpusDocs)
    assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
      === Seq("compact=2r1"))
  }

  test("version retention knob: retrains reclaim old versions, serving survives") {
    val (_, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-keep") + "/lc"
    spark.conf.set(graft.GraftConfig.BpeKeepVersionsKey, "1")
    try {
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b1, 0L) // records, no retrain
      BpeLifecycle.tick(spark, lcRoot, b2, 1L) // retrains → v2, reclaims v1
      val m = BpeLifecycle.currentModel(spark, lcRoot)
      assert(m.version === 2L)
      intercept[IllegalArgumentException] {
        BpeArtifact.load(spark, BpeLifecycle.modelRoot(lcRoot), Some(1L))
      }
      // the fingerprint provenance survives retention by recomputation
      assert(m.tableFingerprint ===
        TextStats.bpeTableFingerprint(m.merges))
    } finally spark.conf.unset(graft.GraftConfig.BpeKeepVersionsKey)
  }

  test("purge with tombstones that don't match the store fails loudly, both directions") {
    // synthetic corpus with controlled word counts: the guards must
    // catch BOTH mismatch directions instead of silently succeeding
    val base = Seq((1L, "s", "alpha beta gamma delta"),
      (2L, "s", "alpha beta epsilon zeta"))
      .toDF("doc_id", "source", "text")
    val b0 = Seq((3L, "s", "eta theta iota kappa"),
      (4L, "s", "eta theta mu nu"))
      .toDF("doc_id", "source", "text")
    val lcRoot = tmpDir("bpelc-neg") + "/lc"
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "2")
    try {
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b0, 0L)
      // duplicate request rows are deduped, NOT double-subtracted (doc 3
      // listed twice would otherwise erase doc 4's eta/theta mass too)
      // — covered below by the well-formed dup request succeeding.
      // OVER-subtract: a tombstone whose text claims MORE occurrences
      // than the doc contributed ("eta" twice) — shared words keep the
      // result non-negative elsewhere, but iota goes negative
      val over = Seq((0L, 3L, "eta eta theta iota iota kappa"))
        .toDF("batch_id", "doc_id", "text")
      val exOver = intercept[IllegalArgumentException] {
        BpeLifecycle.purge(spark, lcRoot, over)
      }
      assert(exOver.getMessage.contains("over-subtracts"))
      // UNDER-subtract: a tombstone naming words the batch never held —
      // a left-join subtraction would silently "forget" nothing
      val foreign = Seq((0L, 3L, "omega psi"))
        .toDF("batch_id", "doc_id", "text")
      val exForeign = intercept[IllegalArgumentException] {
        BpeLifecycle.purge(spark, lcRoot, foreign)
      }
      assert(exForeign.getMessage.contains("never held"))
      // the well-formed request still works afterwards (the failed
      // purges flipped nothing: revision dirs land before the manifest),
      // and a duplicated row is deduped to one subtraction
      val ok = Seq((0L, 3L, "eta theta iota kappa"),
        (0L, 3L, "eta theta iota kappa"))
        .toDF("batch_id", "doc_id", "text")
      val m = BpeLifecycle.purge(spark, lcRoot, ok)
      val remaining = base.unionByName(
        Seq((4L, "s", "eta theta mu nu")).toDF("doc_id", "source", "text"))
      assert(m.merges === TextStats.bpeLearnMerges(remaining,
        TextStats.BpeTrainTopV, rounds = 2),
        "deduped purge must equal a from-scratch train without doc 3 only")
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }

  test("replayed tick after compaction/purge renamed its entry is corpus-inert") {
    // the corpus-commit replay guard goes by ABSORBED id, not dir name:
    // a replayed batch id whose entry was folded or revised must
    // neither re-list the batch (double-count) nor re-materialize its
    // histogram dir (post-RTBF that would resurrect forgotten words)
    val (_, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-rp2") + "/lc"
    spark.conf.set(graft.GraftConfig.BpeCompactAfterBatchesKey, "2")
    try {
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b1, 0L)
      BpeLifecycle.tick(spark, lcRoot, b2, 1L)
      assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
        === Seq("compact=2"))
      val m = BpeLifecycle.currentModel(spark, lcRoot)
      // simulate a lost applied-set line (tolerated by design there):
      // wipe it so the replayed tick reaches the corpus-commit guard
      val fs = new org.apache.hadoop.fs.Path(lcRoot)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(lcRoot,
        "_applied_batches"), false)
      val r = BpeLifecycle.tick(spark, lcRoot, b1, 0L)
      assert(r.nonEmpty, "with the applied line lost, the tick re-runs")
      assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
        === Seq("compact=2"),
        "replay must not re-list an absorbed batch (double-count)")
      assert(!Files.exists(Paths.get(s"$lcRoot/hist/batch=0")),
        "replay must not re-materialize the folded batch dir")
      val m2 = BpeLifecycle.currentModel(spark, lcRoot)
      assert(m2.version === m.version && m2.merges === m.merges,
        "replay of a committed batch must not move the model")
    } finally spark.conf.unset(graft.GraftConfig.BpeCompactAfterBatchesKey)
  }

  test("manifest rewrite crash window: the completed tmp file recovers the corpus") {
    // writeManifest is tmp-write → delete(dst) → rename; a crash between
    // the delete and the rename leaves only the (complete, closed) tmp.
    // Losing the manifest here must NOT silently shrink the corpus to
    // the next tick's single batch — readManifest falls back to the tmp.
    val (_, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-mf") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    BpeLifecycle.tick(spark, lcRoot, b1, 0L)
    val before = BpeLifecycle.readManifest(spark, lcRoot)
    val fs = new org.apache.hadoop.fs.Path(lcRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dst = new org.apache.hadoop.fs.Path(s"$lcRoot/hist/_GRAFT_BATCHES")
    val tmp = new org.apache.hadoop.fs.Path(s"$lcRoot/hist/_GRAFT_BATCHES.tmp")
    // simulate the crash: dst's content survives only as the tmp
    org.apache.hadoop.fs.FileUtil.copy(fs, dst, fs, tmp, false,
      spark.sessionState.newHadoopConf())
    fs.delete(dst, false)
    assert(BpeLifecycle.readManifest(spark, lcRoot) === before,
      "destination lost mid-rename: the tmp IS the manifest")
    // …and the read FINISHED the interrupted commit (tmp promoted to
    // dst) instead of leaving the tmp as the only copy — the next
    // writeManifest's create(tmp, overwrite) would truncate it, so a
    // second crash mid-tmp-write would lose the corpus (r16 ADVICE)
    assert(fs.exists(dst) && !fs.exists(tmp),
      "readManifest must promote the surviving tmp to the destination")
    // the next tick heals the store (rewrites dst) and keeps the corpus
    BpeLifecycle.tick(spark, lcRoot, b2, 1L)
    assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
      === Seq("base", "batch=0", "batch=1"))
    val m = BpeLifecycle.currentModel(spark, lcRoot)
    assert(m.corpusDocs === base.count() + b1.count() + b2.count(),
      "recovery must retrain on the FULL corpus, not the last batch")
  }

  test("drift threshold knob: spark.graft.bpe.lifecycleDriftPct tightens the gate") {
    val (_, base, b1, _) = fixture()
    val lcRoot = tmpDir("bpelc-knob") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    // the same-dist batch degrades ~2.7% at sf0.001 — under the 10%
    // default it records; under a 1% session knob it must retrain
    spark.conf.set(graft.GraftConfig.BpeDriftPctKey, "1")
    try {
      val r = BpeLifecycle.tick(spark, lcRoot, b1, 0L).get
      assert(r.retrained, "a 1% threshold must catch the 2.7% degradation")
      assert(BpeLifecycle.currentModel(spark, lcRoot).version === 2L)
    } finally spark.conf.unset(graft.GraftConfig.BpeDriftPctKey)
    // an explicit caller argument beats the knob (resolution order)
    val lcRoot2 = tmpDir("bpelc-knob2") + "/lc"
    BpeLifecycle.init(spark, lcRoot2, base)
    spark.conf.set(graft.GraftConfig.BpeDriftPctKey, "1")
    try {
      val r2 = BpeLifecycle.tick(spark, lcRoot2, b1, 0L,
        driftPct = Some(BpeLifecycle.DefaultDriftPct)).get
      assert(!r2.retrained, "explicit driftPct must override the session knob")
    } finally spark.conf.unset(graft.GraftConfig.BpeDriftPctKey)
  }

  test("st13 budget gate composes with the lifecycle: metering follows the retrain") {
    // the full production story: the LIFECYCLE trains and retrains the
    // model; the st13 ingestion budget gate meters every arrival with
    // whatever version the lifecycle currently serves — the gate's
    // model root IS the lifecycle's model store
    val (all, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-st13") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    val probe = b1.limit(50)
    val before = Streams.bpeBudgetRouteFromArtifact(
      probe, BpeLifecycle.modelRoot(lcRoot))
      .select("doc_id", "n_bpe").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val v1 = BpeLifecycle.currentModel(spark, lcRoot)
    assert(before === probe.select(col("doc_id"),
      graft.functions.Bpe.count(col("text"), v1.pairs).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap)
    // a drift retrain flips the served version; the gate re-prices with
    // the NEW table on its next planning — no re-wiring
    BpeLifecycle.tick(spark, lcRoot, b1, 0L)
    BpeLifecycle.tick(spark, lcRoot, b2, 1L)
    val v2 = BpeLifecycle.currentModel(spark, lcRoot)
    assert(v2.version === 2L)
    val after = Streams.bpeBudgetRouteFromArtifact(
      probe, BpeLifecycle.modelRoot(lcRoot))
      .select("doc_id", "n_bpe").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after === probe.select(col("doc_id"),
      graft.functions.Bpe.count(col("text"), v2.pairs).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap)
  }

  test("stream drive: foreachBatch ticks ≡ batch-form ticks; replay no-op") {
    val (all, base, b1, b2) = fixture()
    val lcRoot = tmpDir("bpelc-st") + "/lc"
    val src = tmpDir("bpelc-src")
    BpeLifecycle.init(spark, lcRoot, base)
    // two arrival-ordered batch files: same-dist first, drifted second
    val t0 = System.currentTimeMillis() - 3600000L
    b1.coalesce(1).write.mode("append").parquet(src)
    Files.list(Paths.get(src)).toArray.foreach { p0 =>
      Files.setLastModifiedTime(p0.asInstanceOf[java.nio.file.Path],
        java.nio.file.attribute.FileTime.fromMillis(t0))
    }
    b2.coalesce(1).write.mode("append").parquet(src)
    val ckpt1 = tmpDir("bpelc-ckpt") + "/c"
    val q = BpeLifecycle.runStream(spark, src, lcRoot, ckpt1,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    val m = BpeLifecycle.currentModel(spark, lcRoot)
    assert(m.version === 2L, "the drifted batch must have retrained")
    assert(m.merges === TextStats.bpeLearnMerges(all),
      "streamed ticks must train the same table as the batch form")
    // restart against the SAME checkpoint: same incarnation, nothing
    // new to process — a clean no-op
    val qSame = BpeLifecycle.runStream(spark, src, lcRoot, ckpt1,
      maxFilesPerTrigger = Some(1))
    qSame.awaitTermination(120000)
    assert(BpeLifecycle.currentModel(spark, lcRoot).version === 2L)
    // a FRESH checkpoint is a new incarnation whose ids restart at 0 —
    // the binding must fail loudly instead of letting the stale
    // applied set decide which of its batches are "already done"
    // (r16 ADVICE: colliding genuinely-new batches were silently
    // dropped from the corpus and the drift gate)
    val exBind = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val qf = BpeLifecycle.runStream(spark, src, lcRoot,
        tmpDir("bpelc-ckpt2") + "/c", maxFilesPerTrigger = Some(1))
      qf.awaitTermination(120000)
      throw new IllegalStateException("fresh-checkpoint stream must not run")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(exBind).exists(_.contains("rebindStream")),
      s"binding failure must name the recovery API: ${exBind.getMessage}")
    assert(BpeLifecycle.currentModel(spark, lcRoot).version === 2L,
      "a refused incarnation must not have moved the model")
    // the operator DECLARES the replay: rebind, then the full replay
    // through the fresh checkpoint no-ops through the guards
    BpeLifecycle.rebindStream(spark, lcRoot)
    val q2 = BpeLifecycle.runStream(spark, src, lcRoot,
      tmpDir("bpelc-ckpt3") + "/c", maxFilesPerTrigger = Some(1))
    q2.awaitTermination(120000)
    val m2 = BpeLifecycle.currentModel(spark, lcRoot)
    assert(m2.version === 2L && m2.merges === m.merges,
      "replayed stream must not retrain again")
    assert(BpeLifecycle.readManifest(spark, lcRoot).flatMap(_.absorbs)
      .sorted === Seq(-1L, 0L, 1L),
      "rebound replay must not re-list committed batches")
  }

  /** The controlled-count corpus of the negative test: doc 3 shares
    * eta/theta with doc 4 — exactly the shape where a double-applied
    * subtraction stays non-negative and silent.
    */
  private def purgeFixture(): (DataFrame, DataFrame, DataFrame) = (
    Seq((1L, "s", "alpha beta gamma delta"),
      (2L, "s", "alpha beta epsilon zeta"))
      .toDF("doc_id", "source", "text"),
    Seq((3L, "s", "eta theta iota kappa"),
      (4L, "s", "eta theta mu nu"))
      .toDF("doc_id", "source", "text"),
    Seq((0L, 3L, "eta theta iota kappa"))
      .toDF("batch_id", "doc_id", "text"))

  test("RTBF purge is crash-resumable at every step: replay reaches the uninterrupted end state") {
    val (base, b0, tombs) = purgeFixture()
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "2")
    try {
      // reference: the uninterrupted purge
      val lcRef = tmpDir("bpelc-cr-ref") + "/lc"
      BpeLifecycle.init(spark, lcRef, base)
      BpeLifecycle.tick(spark, lcRef, b0, 0L)
      val ref = BpeLifecycle.purge(spark, lcRef, tombs)
      val refNames = BpeLifecycle.readManifest(spark, lcRef).map(_.name)
      for (label <- Seq("pre-marker", "pre-flip", "post-flip",
        "post-retrain", "post-model-sweep", "post-hist-sweep")) {
        val lcRoot = tmpDir(s"bpelc-cr-$label") + "/lc"
        BpeLifecycle.init(spark, lcRoot, base)
        BpeLifecycle.tick(spark, lcRoot, b0, 0L)
        val boom = intercept[RuntimeException] {
          BpeLifecycle.purgeImpl(spark, lcRoot, tombs,
            l => if (l == label) throw new RuntimeException(s"crash at $l"))
        }
        assert(boom.getMessage === s"crash at $label")
        // the replayed purge completes — in the post-flip states this is
        // exactly where the pre-marker code either tripped its own
        // guards or silently double-subtracted (r16 ADVICE)
        val m = BpeLifecycle.purge(spark, lcRoot, tombs)
        assert(m.merges === ref.merges,
          s"$label: replay must converge to the uninterrupted table")
        assert(m.corpusDocs === ref.corpusDocs, label)
        assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
          === refNames, label)
        assert(BpeLifecycle.readPurgeMarker(spark, lcRoot).isEmpty,
          s"$label: marker must clear after the completed replay")
        for (v <- 1L until m.version)
          intercept[IllegalArgumentException] {
            BpeArtifact.load(spark, BpeLifecycle.modelRoot(lcRoot), Some(v))
          }
      }
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }

  test("a purge crashed BEFORE its manifest flip makes tick fail loudly until the purge is re-run") {
    // the r17 ADVICE window: marker written, flip not applied — the
    // erasure is NOT in the corpus, so a tick-side finalize would
    // force-retrain on the unerased words and silently discard the RTBF
    // request. The tick must refuse; only purge() carries the tombstones.
    val (base, b0, tombs) = purgeFixture()
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "2")
    try {
      val lcRoot = tmpDir("bpelc-preflip") + "/lc"
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b0, 0L)
      intercept[RuntimeException] {
        BpeLifecycle.purgeImpl(spark, lcRoot, tombs,
          l => if (l == "pre-flip") throw new RuntimeException("crash"))
      }
      assert(BpeLifecycle.readPurgeMarker(spark, lcRoot).nonEmpty)
      val b1 = Seq((9L, "s", "alpha beta gamma delta"))
        .toDF("doc_id", "source", "text")
      val exTick = intercept[IllegalStateException] {
        BpeLifecycle.tick(spark, lcRoot, b1, 1L, driftPct = Some(99))
      }
      assert(exTick.getMessage.contains("Re-run purge()"),
        s"tick must refuse the pre-flip window loudly: ${exTick.getMessage}")
      assert(BpeLifecycle.readPurgeMarker(spark, lcRoot).nonEmpty,
        "the refusing tick must leave the marker pending")
      // the purge re-run completes the request, after which ticks resume
      val m = BpeLifecycle.purge(spark, lcRoot, tombs)
      val remaining = base.unionByName(
        Seq((4L, "s", "eta theta mu nu")).toDF("doc_id", "source", "text"))
      assert(m.merges === TextStats.bpeLearnMerges(remaining,
        TextStats.BpeTrainTopV, rounds = 2),
        "the re-run purge must erase the tombstoned doc")
      assert(BpeLifecycle.tick(spark, lcRoot, b1, 1L, driftPct = Some(99))
        .nonEmpty, "ticks must resume once the purge completed")
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }

  test("an exact replay of the LAST COMPLETED purge is a provable no-op (the done-fp record)") {
    // pre-r18 this replay tripped the foreign-word guard ('already-erased
    // doc re-submitted') — the completed-request record makes it a no-op,
    // which the composed forget path needs when a crash lands between a
    // store's completion and the composed marker's progress write
    val (base, b0, tombs) = purgeFixture()
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "2")
    try {
      val lcRoot = tmpDir("bpelc-done") + "/lc"
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b0, 0L)
      val m1 = BpeLifecycle.purge(spark, lcRoot, tombs)
      val manifest1 = BpeLifecycle.readManifest(spark, lcRoot).map(_.name)
      val m2 = BpeLifecycle.purge(spark, lcRoot, tombs)
      assert(m2.version === m1.version && m2.merges === m1.merges,
        "the exact replay must not retrain or bump the version")
      assert(BpeLifecycle.readManifest(spark, lcRoot).map(_.name) === manifest1,
        "the exact replay must not touch the manifest")
      // a DIFFERENT (stale, mismatched) request must still fail loudly —
      // the no-op recognition is exact-fingerprint only
      val foreign = Seq((0L, 3L, "omega psi"))
        .toDF("batch_id", "doc_id", "text")
      intercept[IllegalArgumentException] {
        BpeLifecycle.purge(spark, lcRoot, foreign)
      }
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }

  test("a crashed purge is completed by the NEXT TICK when no replay arrives") {
    val (base, b0, tombs) = purgeFixture()
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "2")
    try {
      val lcRef = tmpDir("bpelc-tf-ref") + "/lc"
      BpeLifecycle.init(spark, lcRef, base)
      BpeLifecycle.tick(spark, lcRef, b0, 0L)
      val ref = BpeLifecycle.purge(spark, lcRef, tombs)

      val lcRoot = tmpDir("bpelc-tf") + "/lc"
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b0, 0L)
      intercept[RuntimeException] {
        BpeLifecycle.purgeImpl(spark, lcRoot, tombs,
          l => if (l == "post-flip") throw new RuntimeException("crash"))
      }
      // the model still serving is TAINTED (trained pre-purge) and the
      // marker is pending
      assert(BpeLifecycle.readPurgeMarker(spark, lcRoot).nonEmpty)
      // an ordinary tick finalizes the purge before doing its own work
      // (driftPct 99: the tick itself must not retrain, isolating the
      // finalize's forced retrain)
      val b1 = Seq((9L, "s", "alpha beta gamma delta"))
        .toDF("doc_id", "source", "text")
      val r = BpeLifecycle.tick(spark, lcRoot, b1, 1L, driftPct = Some(99))
      assert(r.nonEmpty)
      assert(BpeLifecycle.readPurgeMarker(spark, lcRoot).isEmpty,
        "tick must clear the pending purge marker")
      val m = BpeLifecycle.currentModel(spark, lcRoot)
      assert(m.merges === ref.merges,
        "tick-side finalize must retrain on the purged corpus")
      assert(r.get.servedVersion === m.version,
        "the tick's own metering must use the POST-purge model")
      for (v <- 1L until m.version)
        intercept[IllegalArgumentException] {
          BpeArtifact.load(spark, BpeLifecycle.modelRoot(lcRoot), Some(v))
        }
      // the new batch itself was committed normally after the finalize
      assert(BpeLifecycle.readManifest(spark, lcRoot)
        .flatMap(_.absorbs).contains(1L))
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }

  test("tick scans its micro-batch at most once (persist over the double scan)") {
    val (_, base, b1, _) = fixture()
    val lcRoot = tmpDir("bpelc-1scan") + "/lc"
    BpeLifecycle.init(spark, lcRoot, base)
    // the tick input gets its OWN parquet dir so its file scans are
    // attributable in the executed plans
    val src = tmpDir("bpelc-1scan-src")
    b1.write.mode("overwrite").parquet(src)
    val batch = spark.read.parquet(src)
    val srcScans = new java.util.concurrent.atomic.AtomicInteger(0)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // count FileSourceScan leaves on the src path; an InMemoryTableScan
    // leaf is NOT descended — a cached read is exactly not a file scan
    def fileScans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case s: QueryStageExec => fileScans(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        if (f.relation.location.rootPaths.exists(_.toString.contains(src))) 1 else 0
      case other => other.children.map(fileScans).sum
    }
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = { srcScans.addAndGet(fileScans(qe.executedPlan)); () }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val r = BpeLifecycle.tick(spark, lcRoot, batch, 0L)
      assert(r.nonEmpty)
      org.apache.spark.GraftSparkInternals
        .waitListenerBusEmpty(spark.sparkContext, 30000)
      assert(srcScans.get() <= 1,
        s"tick ran ${srcScans.get()} file scans of its micro-batch — " +
          "the count and the histogram write must share one scan")
      assert(batch.storageLevel ===
        org.apache.spark.storage.StorageLevel.NONE,
        "tick must unpersist the batch it pinned")
    } finally { spark.listenerManager.unregister(listener); () }
  }

  test("purge guard blames the right class when both mismatch classes exceed the sample cap") {
    // r18 ADVICE: the guard samples 5 bad rows; SIX over-subtracted
    // words would fill an unordered sample on their own, the foreign
    // require would pass, and the error would blame over-subtraction
    // while foreign words exist past the cut. The foreign-FIRST sample
    // ordering must surface the foreign class whenever it exists.
    val base = Seq((1L, "s", "alpha beta")).toDF("doc_id", "source", "text")
    val b0 = Seq((3L, "s", "p1 p2 p3 p4 p5 p6 p7 p8"))
      .toDF("doc_id", "source", "text")
    val lcRoot = tmpDir("bpelc-class") + "/lc"
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "2")
    try {
      BpeLifecycle.init(spark, lcRoot, base)
      BpeLifecycle.tick(spark, lcRoot, b0, 0L)
      val mixed = Seq(
        (0L, 3L, "p1 p1 p2 p2 p3 p3 p4 p4 p5 p5 p6 p6 omega"))
        .toDF("batch_id", "doc_id", "text")
      val ex = intercept[IllegalArgumentException] {
        BpeLifecycle.purge(spark, lcRoot, mixed)
      }
      assert(ex.getMessage.contains("never held") &&
        ex.getMessage.contains("omega"), ex.getMessage)
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }
}
