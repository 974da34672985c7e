package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The persisted BPE model store (r16 — the tokenizer's train/serve
  * split): round-trip fidelity, version semantics, and torn-write
  * invisibility. The round-trip test is the verdict's done-criterion —
  * artifact ≡ in-memory table TOKEN-FOR-TOKEN, not just merge-for-merge.
  */
class BpeArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("artifact round trip == in-memory table, token-for-token") {
    val docs = Tables.documents(spark, sf)
    val inMem = TextStats.bpeLearnMerges(docs)
    val root = tmpDir("bpe-model")
    val published = BpeArtifact.train(docs, root)
    // merge-for-merge: rank, pair, merged string, weighted count all survive
    assert(published.merges === inMem)
    val loaded = BpeArtifact.load(spark, root)
    assert(loaded === published)
    assert(loaded.topV === TextStats.BpeTrainTopV)
    assert(loaded.rounds === TextStats.BpeTrainRounds)
    assert(loaded.corpusDocs === docs.count())
    // token-for-token: the loaded pairs drive Bpe.tokens to the SAME
    // sequences as the in-memory pairs on every corpus doc
    val both = docs.select(
        graft.functions.Bpe.tokens(col("text"), inMem.map(m => (m._2, m._3))).as("a"),
        graft.functions.Bpe.tokens(col("text"), loaded.pairs).as("b"))
      .collect()
    both.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("table fingerprint: load-stable, moves with the table, blind to provenance") {
    val docs = Tables.documents(spark, sf)
    val root = tmpDir("bpe-tfp")
    val v1 = BpeArtifact.train(docs, root)
    // derived, so a disk round trip cannot drift it
    assert(BpeArtifact.load(spark, root).tableFingerprint === v1.tableFingerprint)
    assert(v1.tableFingerprint >= 0L, "hash60 convention: non-negative")
    // a different table (different rounds) → different fingerprint
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "8")
    try {
      val v2 = BpeArtifact.train(docs, root)
      assert(v2.tableFingerprint !== v1.tableFingerprint)
      // same table content ⇒ same fingerprint, regardless of provenance:
      // the first 8 merges of the 32-round table ARE the 8-round table
      // (merges apply in creation order), so the prefix-model equality
      // is visible through the fingerprint alone
      assert(v1.copy(merges = v1.merges.take(8)).tableFingerprint
        === v2.tableFingerprint)
    } finally spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
  }

  test("provenance fingerprint moves with the corpus, not its partitioning") {
    val docs = Tables.documents(spark, sf)
    val root1 = tmpDir("bpe-fp1")
    val root2 = tmpDir("bpe-fp2")
    val fp1 = BpeArtifact.train(docs, root1).corpusFingerprint
    val fp2 = BpeArtifact.train(docs.repartition(7), root2).corpusFingerprint
    assert(fp1 === fp2, "fingerprint must be partitioning-independent")
    val root3 = tmpDir("bpe-fp3")
    val fp3 = BpeArtifact.train(
      docs.withColumn("text", concat(col("text"), lit(" drift"))), root3)
      .corpusFingerprint
    assert(fp1 !== fp3, "a changed corpus must change the fingerprint")
  }

  test("retrain publishes a NEW version; old versions stay readable") {
    val docs = Tables.documents(spark, sf)
    val root = tmpDir("bpe-ver")
    val v1 = BpeArtifact.train(docs, root)
    assert(v1.version === 1L)
    // retrain under different knobs → different table, version bumps,
    // pointer follows, and v=1 remains loadable byte-for-byte
    spark.conf.set(graft.GraftConfig.BpeTrainTopVKey, "32")
    spark.conf.set(graft.GraftConfig.BpeTrainRoundsKey, "8")
    try {
      val v2 = BpeArtifact.train(docs, root)
      assert(v2.version === 2L && v2.topV === 32 && v2.rounds === 8)
      assert(v2.merges.size === 8)
      assert(BpeArtifact.currentVersion(spark, root) === Some(2L))
      assert(BpeArtifact.load(spark, root).version === 2L)
      val old = BpeArtifact.load(spark, root, Some(1L))
      assert(old === v1, "historical versions must stay readable unchanged")
    } finally {
      spark.conf.unset(graft.GraftConfig.BpeTrainTopVKey)
      spark.conf.unset(graft.GraftConfig.BpeTrainRoundsKey)
    }
  }

  test("torn writes are invisible; pointer loss falls back to newest committed") {
    val docs = Tables.documents(spark, sf)
    val root = tmpDir("bpe-torn")
    BpeArtifact.train(docs, root)
    val v2 = BpeArtifact.train(docs, root)
    assert(v2.version === 2L)
    // simulate a crashed publish: a v=3 dir with data but NO commit marker
    docs.limit(1).write.parquet(s"$root/v=3/merges")
    assert(BpeArtifact.currentVersion(spark, root) === Some(2L),
      "a marker-less version dir must be invisible")
    intercept[IllegalArgumentException] {
      BpeArtifact.load(spark, root, Some(3L))
    }
    // the NEXT publish must not collide with the torn dir's number
    val v4 = BpeArtifact.train(docs, root)
    assert(v4.version === 4L, "retry after a torn write takes a fresh number")
    // crash between pointer delete and rename: CURRENT missing entirely
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "CURRENT"), false)
    assert(BpeArtifact.currentVersion(spark, root) === Some(4L),
      "pointer loss must fall back to the newest committed version")
    assert(BpeArtifact.load(spark, root).version === 4L)
  }

  test("train sample containing oracle-unpackable characters fails loudly") {
    // '|' / '%' / '_' in a sampled word would break the DuckDB replay's
    // list_reduce packing as a silent hash mismatch; the trainer must
    // refuse at train time with the words named (r15 verdict #7)
    for (bad <- Seq("snake_case", "100%", "a|b")) {
      val docs = Seq((1L, s"plain words $bad plain")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        TextStats.bpeLearnMerges(docs, topV = 8, rounds = 1)
      }
      assert(e.getMessage.contains(bad), s"message must name the word: $bad")
    }
  }
}
