package graft.llm

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import graft.{SparkSpec, Tables}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tokens(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunking: windows cover every token, bounded at 32, overlap 8") {
    val docs = Seq(
      (1L, tokens(1)),   // 1 token  → 1 chunk
      (2L, tokens(32)),  // exactly one window
      (3L, tokens(33)),  // 1 token past the window → second chunk
      (4L, tokens(100))  // 100 tokens → k_max = floor(91/24) = 3 → 4 chunks
    ).toDF("doc_id", "text")
    val out = TextStats.chunk(docs)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    assert(out(1L).map(_._3) === Seq(1L))
    assert(out(2L).map(_._3) === Seq(32L))
    assert(out(3L).map(c => (c._2, c._3)) === Seq((0L, 32L), (1L, 9L)))
    assert(out(4L).map(_._2) === Seq(0L, 1L, 2L, 3L))
    assert(out(4L).map(_._3) === Seq(32L, 32L, 32L, 28L))

    // every chunk is ≤ 32 tokens and consecutive full chunks share 8 tokens
    val c4 = out(4L).map(_._4.split(" ").toSeq)
    assert(c4.forall(_.length <= 32))
    assert(c4(0).takeRight(8) === c4(1).take(8))
    // coverage: the union of chunk tokens is exactly the document
    assert(c4.flatten.distinct.sortBy(t => t.drop(1).toInt) ===
      (1 to 100).map(i => s"t$i"))
  }

  test("BPE chunking: window law over the token sequence, incl. the empty-doc edge") {
    // r16 (t45): same k-law as t11, but over LEARNED-BPE tokens. The
    // hand-built table merges a+b→ab and ab+c→abc, so 'abc'→1 token,
    // 'abd'→2 ('ab','d'), 'xy'→2 ('x','y') — chunk sizes are computed
    // over TOKENS, not words. The empty/whitespace-only edge is NOT in
    // any SF corpus (measured: 0 empty-trim docs at all three), so the
    // oracle's coalesce(ts, []) leg lives here: one chunk_id=0 row with
    // 0 tokens and empty chunk_text.
    val merges = Seq(("a", "b"), ("ab", "c"))
    val docs = Seq(
      (1L, "abc abd xy"),       // tokens: abc | ab d | x y → 5
      (2L, ""),                 // no tokens → one empty chunk
      (3L, "   \t  "),          // whitespace-only → one empty chunk
      (4L, ("abd " * 50).trim)  // 100 tokens → 4 chunks (t11's k-law)
    ).toDF("doc_id", "text")
    val out = TextStats.chunkBpe(docs, merges)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"), col("chunk_text"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out(1L) === Seq((1L, 0L, 5L, "abcabdxy")),
      "token-metered chunk with tokens concatenated")
    assert(out(2L) === Seq((2L, 0L, 0L, "")), "empty doc → one empty chunk")
    assert(out(3L) === Seq((3L, 0L, 0L, "")), "whitespace-only → one empty chunk")
    assert(out(4L).map(c => (c._2, c._3)) ===
      Seq((0L, 32L), (1L, 32L), (2L, 32L), (3L, 28L)))
    // stride law holds on the TOKEN stream: chunk k starts at token 24k
    val toks = (1 to 50).flatMap(_ => Seq("ab", "d"))
    assert(out(4L).head._4 === toks.take(32).mkString(""))
    assert(out(4L)(1)._4 === toks.slice(24, 56).mkString(""))
  }

  test("dsir: selection re-derives from JDK sha256 + plain Scala") {
    // independent of the engine's expression tree: hash with the JDK
    // digest, count with Scala maps, round with BigDecimal
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val corpus = Seq(
      (1L, "en", "alpha beta gamma beta alpha"),
      (2L, "en", "alpha beta delta epsilon"),
      (3L, "de", "zeta eta theta iota kappa"),
      (4L, "de", "alpha zeta zeta kappa nu"),
      (5L, "fr", "beta gamma zeta mu xi"),
      (6L, "en", "beta gamma alpha delta"),
      (7L, "zh", "omicron pi rho sigma tau"),
      (8L, "fr", "upsilon phi chi psi omega"))
    val out = TextStats.dsirSelect(corpus.toDF("doc_id", "lang", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))).toMap

    val m = TextStats.DsirBuckets
    val feats: Seq[(Long, String, Long)] = corpus.flatMap { case (id, lang, text) =>
      val ts = text.split("\\s+").toSeq
      val grams = ts ++ ts.sliding(2).map(_.mkString(" "))
      grams.map(g => (id, lang, h60(s"${TextStats.DsirSeed}|$g") % m))
    }
    val cr = feats.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = feats.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val r = feats.size.toLong
    val t = feats.count(_._2 == "en").toLong
    def lam(b: Long): Double =
      math.log((ct.getOrElse(b, 0L) + 1) * 1.0 / (t + m)) -
        math.log((cr(b) + 1) * 1.0 / (r + m))
    val scores = corpus.map { case (id, _, _) =>
      val fs = feats.filter(_._1 == id).map(_._3)
      id -> round6(fs.map(lam).sum / fs.size)
    }.toMap
    val ranked = corpus.map(_._1).sortBy(id => (-scores(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1).toLong }.toMap

    corpus.foreach { case (id, _, text) =>
      val ts = text.split("\\s+").length
      val (nFeat, score, rank, selected) = out(id)
      assert(nFeat === 2L * ts - 1, s"doc $id n_feat")
      assert(score === scores(id), s"doc $id score")
      assert(rank === ranked(id), s"doc $id rank")
      assert(selected === (4 * rank <= corpus.size), s"doc $id selected")
    }
    // DSIR direction: the en target slice scores above the corpus mean
    val enMean = corpus.filter(_._2 == "en").map(c => scores(c._1)).sum / 3
    val allMean = scores.values.sum / corpus.size
    assert(enMean > allMean, "target slice should be upweighted")
  }

  test("lexical diversity: plain-Scala windows agree; known corners exact") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = TextStats.MattrWindow
    val docs = Seq(
      (1L, (1 to 10).map(_ => "x").mkString(" ")),          // all same, short → ttr=mattr=0.1
      (2L, (1 to 10).map(i => s"t$i").mkString(" ")),       // all distinct, short → 1.0
      (3L, (1 to 60).map(i => s"t${i % 7}").mkString(" ")), // 7-cycle, windowed
      (4L, (1 to 25).map(i => s"t$i").mkString(" ")),       // exactly one window
      (5L, (1 to 80).map(i => if (i < 40) s"u$i" else "rep").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextStats.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    // independent recompute with Scala collections
    Seq(1L -> 10, 2L -> 10, 3L -> 60, 4L -> 25, 5L -> 80).foreach { case (id, n) =>
      val ts = docs.filter(col("doc_id") === id).head().getString(1).split(" ").toSeq
      val types = ts.distinct.size
      val (dsum, denom) =
        if (n >= w) ((0 to n - w).map(i => ts.slice(i, i + w).distinct.size.toLong).sum,
          (w.toLong * (n - w + 1)))
        else (types.toLong, n.toLong)
      val (gotN, gotTypes, gotTtr, gotMattr) = out(id)
      assert(gotN === n.toLong && gotTypes === types.toLong, s"doc $id counts")
      assert(gotTtr === round6(types * 1.0 / n), s"doc $id ttr")
      assert(gotMattr === round6(dsum * 1.0 / denom), s"doc $id mattr")
    }
    // corners: constant doc floors at 1/n; distinct doc is exactly 1.0;
    // every 25-window of a 7-cycle has exactly 7 types
    assert(out(1L)._3 === 0.1 && out(1L)._4 === 0.1)
    assert(out(2L)._3 === 1.0 && out(2L)._4 === 1.0)
    assert(out(3L)._4 === round6(7.0 / w))
    assert(out(4L)._4 === 1.0)
  }

  test("collocations: plain-Scala NPMI agrees; floor and top-k honored") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // "aa bb" is a strong collocation (6 co-occurrences), "cc dd" a weak
    // one (5, but cc/dd also appear apart), "ee ff" is below the floor (4)
    val docs = Seq(
      (1L, "aa bb x cc dd y aa bb z cc dd"),
      (2L, "aa bb p cc dd q aa bb r cc cc"),
      (3L, "aa bb s dd dd t ee ff u ee ff"),
      (4L, "aa bb v ee ff w ee ff cc dd")).toDF("doc_id", "text")
    val out = TextStats.collocations(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    // independent recompute
    val corpus = Seq(
      "aa bb x cc dd y aa bb z cc dd", "aa bb p cc dd q aa bb r cc cc",
      "aa bb s dd dd t ee ff u ee ff", "aa bb v ee ff w ee ff cc dd")
      .map(_.split(" ").toSeq)
    val bigs = corpus.flatMap(ts => ts.zip(ts.tail))
    val unis = corpus.flatten
    val bcnt = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ucnt = unis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nb, nu) = (bigs.size.toDouble, unis.size.toDouble)
    val expected = bcnt.filter(_._2 >= 5).map { case ((a, b), c2) =>
      val p = c2 / nb
      (a, b, c2, round6(math.log(p / ((ucnt(a) / nu) * (ucnt(b) / nu))) / -math.log(p)))
    }.toSeq.sortBy { case (a, b, _, npmi) => (-npmi, a, b) }
    assert(out.map(t => (t._1, t._2, t._3, t._4)).toSeq === expected)
    assert(out.map(_._5).toSeq === (1L to expected.size))
    assert(!out.exists(t => t._1 == "ee" && t._2 == "ff"), "below-floor pair kept")
    assert(out.head._1 === "aa" && out.head._2 === "bb", "strongest pair first")
  }

  test("bm25: plain-Scala scores agree; self-doc retrieved; top-k per query") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val texts = Seq(
      0L -> "spark shuffle join",
      1L -> "window agg sort merge",
      2L -> "scan filter spark spark",
      3L -> "spark shuffle join spark shuffle",
      4L -> "window sort agg",
      5L -> "scan scan filter noise tokens here",
      6L -> "unrelated words only nothing common")
    val out = TextStats.bm25(texts.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3),
        r.getLong(4)))).toMap

    // independent recompute
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val nDocs = texts.size
    val sTot = toks.values.map(_.size).sum
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.size).toMap
    val (k1, b) = (TextStats.Bm25K1, TextStats.Bm25B)
    val expected = for {
      qid <- 0L until TextStats.Bm25Queries.toLong
      (did, ts) <- toks
      hit = toks(qid).distinct.filter(ts.contains)
      if hit.nonEmpty
    } yield {
      val score = hit.map { t =>
        val tf = ts.count(_ == t)
        val df = dfm(t)
        math.log(1 + (nDocs - df + 0.5) / (df + 0.5)) * tf * (k1 + 1) /
          (tf + k1 * (1 - b + b * ts.size * nDocs * 1.0 / sTot))
      }.sum
      (qid, did) -> ((hit.size.toLong, round6(score)))
    }
    expected.foreach { case ((qid, did), (nh, sc)) =>
      val got = out.get((qid, did))
      assert(got.isDefined, s"pair ($qid,$did) missing")
      assert(got.get._1 === nh && got.get._2 === sc, s"pair ($qid,$did)")
    }
    assert(out.size === expected.size, "spurious or dropped pairs")
    // ranks are contiguous from 1 per query and rank-1 is the
    // independently computed argmax (rounded score, doc_id tiebreak)
    (0L until 3L).foreach { qid =>
      val mine = out.collect { case ((q, d), v) if q == qid => (d, v._3) }
      assert(mine.map(_._2).toSeq.sorted === (1L to mine.size))
      val want = expected.collect { case ((q, d), (_, sc)) if q == qid => (d, sc) }
        .minBy { case (d, sc) => (-sc, d) }._1
      assert(mine.find(_._2 == 1L).map(_._1).contains(want), s"query $qid rank-1")
    }
  }

  test("gopher rules: each rule trips independently on a targeted violation") {
    val stop = "the a of to in is that it for on with as and an"  // 14 stopwords
    val base = (1 to 4).map(i => s"w$i$stop").mkString(" ")       // 60 varied tokens
    val docs = Seq(
      // 60 tokens, mean len in range, stopwords present, no dominance
      (1L, ((1 to 46).map(i => s"word$i") ++ stop.split(" ")).mkString(" ")),
      (2L, (1 to 10).map(i => s"word$i").mkString(" ")),          // too short
      (3L, ((1 to 46).map(_ => "ab") ++ stop.split(" ")).mkString(" ")), // dominance: 'ab' 46/60
      (4L, ((1 to 46).map(i => s"word$i") ++ stop.split(" "))
        .map(_.toUpperCase).mkString(" ")),                       // no stopwords (case-sensitive)
      (5L, ((1 to 46).map(i => s"supercalifragilistic$i") ++ stop.split(" "))
        .mkString(" "))                                           // mean word length > 10
    ).toDF("doc_id", "text")
    val out = TextStats.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))).toMap
    assert(out(1L) === ((true, true, true, true, true)), s"clean doc: ${out(1L)}")
    assert(!out(2L)._1 && !out(2L)._5, "short doc must fail ok_ntok")
    assert(!out(3L)._4 && !out(3L)._5, "dominated doc must fail ok_dom")
    assert(!out(4L)._3 && !out(4L)._5, "stopword-free doc must fail ok_stop")
    assert(!out(5L)._2 && !out(5L)._5, "long-word doc must fail ok_wlen")
  }

  test("source mixture: weights sum to 1 and temperature flattens shares") {
    val out = TextStats.registry.find(_.name == "t12_source_mixture").get
      .run(spark, sf)
      .select(col("source"), col("n_tok"), col("token_share"), col("mixture_weight"))
      .as[(String, Long, Double, Double)].collect()
    assert(out.map(_._4).sum === 1.0 +- 1e-4, "mixture weights must sum to 1")
    assert(out.map(_._3).sum === 1.0 +- 1e-4, "token shares must sum to 1")
    // temperature 0.7 < 1 flattens: the largest source is down-weighted
    // relative to its share, the smallest is up-weighted
    val largest = out.maxBy(_._2)
    val smallest = out.minBy(_._2)
    assert(largest._4 < largest._3 || out.map(_._2).distinct.length == 1)
    assert(smallest._4 > smallest._3 || out.map(_._2).distinct.length == 1)
    // weight order preserves size order (x^0.7 is monotone)
    assert(out.sortBy(_._2).map(_._1) === out.sortBy(_._4).map(_._1))
  }

  test("unigram logprob: matches a driver-side computation of the corpus LM") {
    val out = TextStats.registry.find(_.name == "t13_unigram_logprob").get
      .run(spark, sf)
      .select(col("doc_id"), col("n_tok"), col("avg_logprob"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val counts = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = counts.values.sum.toDouble
    assert(out.keySet === toks.keySet)
    toks.foreach { case (id, ts) =>
      val expected = ts.map(t => math.log(counts(t) / n)).sum / ts.length
      assert(out(id)._1 === ts.length.toLong)
      assert(out(id)._2 === (math.rint(expected * 1e6) / 1e6) +- 2e-6,
        s"doc $id logprob mismatch")
    }
    assert(out.values.forall(_._2 < 0.0))
  }

  test("quality buckets: quintiles are balanced and keep rate rises with quality") {
    val q = TextStats.registry.find(_.name == "t16_quality_buckets").get
    val rows = q.run(spark, sf)
      .select("doc_id", "bucket", "keep_pct", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    val n = rows.length
    val byBucket = rows.groupBy(_._2)
    assert(byBucket.keySet === Set(0L, 1L, 2L, 3L, 4L), "all five quintiles populated")
    // exact percentile cuts: each quintile holds ~20% (ties can skew a bit)
    byBucket.values.foreach(b =>
      assert(math.abs(b.length - n / 5.0) / n < 0.05, s"unbalanced quintile: ${b.length}/$n"))
    // the declared rate is monotone in quality, and the realized keep
    // fraction tracks it (hash mod 100 is near-uniform)
    val rates = byBucket.view.mapValues(_.head._3).toMap
    assert(rates === Map(0L -> 20L, 1L -> 40L, 2L -> 60L, 3L -> 80L, 4L -> 100L))
    byBucket.foreach { case (bk, docs) =>
      val kept = docs.count(_._4).toDouble / docs.length
      assert(math.abs(kept - rates(bk) / 100.0) < 0.2,
        s"bucket $bk keep fraction $kept far from ${rates(bk)}%")
    }
    assert(byBucket(4L).forall(_._4), "top quintile keeps everything")
  }

  test("chunking: every chunk contributes at least one new token") {
    // 41 tokens: chunk 1 would start at 25 and cover 25..41 (17 tokens, 9
    // of them new); a doc of 32 + 8 = 40 tokens must NOT emit chunk 1
    // (tokens 25..40 are fully inside chunk 0's 1..32? no — 33..40 are
    // new, so it does emit). The no-new-token boundary is n_tok = 32:
    // chunk 1 (25..56 clamped) would add tokens only if n_tok >= 33.
    val docs = Seq((1L, tokens(32)), (2L, tokens(33))).toDF("doc_id", "text")
    val counts = TextStats.chunk(docs).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts(1L) === 1L)
    assert(counts(2L) === 2L)
  }

  test("source KL: hand-computed divergences, non-negativity, degenerate zero") {
    // srcA = "a a b" → P_A = {a: 2/3, b: 1/3}; srcB = "b b b" → P_B = {b: 1}
    // corpus Q = {a: 1/3, b: 2/3}
    // KL_A = 2/3·ln2 − 1/3·ln2 = ln2/3 ; KL_B = ln(3/2)
    val docs = Seq(("srcA", "a a b"), ("srcB", "b b b"))
      .toDF("source", "text")
    val out = TextStats.sourceKl(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out("srcA")._1 === 3L && out("srcB")._1 === 3L)
    assert(out("srcA")._2 === 1.0, "srcA covers both vocab tokens")
    assert(out("srcB")._2 === 0.5, "srcB covers half the vocab")
    assert(math.abs(out("srcA")._3 - math.log(2.0) / 3) < 1e-6)
    assert(math.abs(out("srcB")._3 - math.log(1.5)) < 1e-6)
    assert(out.values.forall(_._3 >= 0.0), "KL is non-negative")
    // a single-source corpus IS the corpus distribution → KL exactly 0
    val solo = TextStats.sourceKl(
      Seq(("only", "x y z x")).toDF("source", "text")).collect()
    assert(solo.length === 1 && solo(0).getDouble(3) === 0.0)
  }

  test("packed shards: consistent with t9 packs; fill ≤ 1; checksums/token mass conserve") {
    val docs = Tables.documents(spark, sf)
    val out = TextStats.packedShards(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6))))
      .toMap
    // re-derive from the t9 registry query: same packs, same routing
    val t9 = graft.SparkEntry.registry.find(_.name == "t9_sequence_packing").get
      .run(spark, sf).select("doc_id", "source", "n_tok", "pack_id")
      .as[(Long, String, Long, Long)].collect()
    val byShard = t9.groupBy(r => (r._2, ((r._4 % 4) + 4) % 4))
    assert(out.keySet === byShard.keySet)
    byShard.foreach { case (k, rows) =>
      val (nPacks, nDocs, nTok, fill, _) = out(k)
      assert(nPacks === rows.map(_._4).distinct.length, s"$k n_packs")
      assert(nDocs === rows.length.toLong, s"$k n_docs")
      assert(nTok === rows.map(_._3).sum, s"$k n_tok")
      assert(fill > 0.0 && fill <= 1.0 + 1e-9, s"$k fill_frac $fill")
    }
    // conservation: shard manifests partition the corpus exactly
    assert(out.values.map(_._2).sum === docs.count())
    // and the mod-2^63 checksum matters: shards with different content
    // must (overwhelmingly) differ
    assert(out.values.map(_._5).toSet.size > 1)
  }

  test("mixture weights: hand-computed √-tempered 2-source case + conservation laws") {
    // sources of 100 and 400 tokens: √-tempering gives weights
    // 10/30 and 20/30 — the small source is BOOSTED vs its natural
    // 0.2/0.8 share; epochs = weight·total/n
    val docs = Seq(
      ("small", ("tok " * 100).trim),
      ("big", ("tok " * 400).trim)
    ).toDF("source", "text")
    val out = TextStats.mixtureWeights(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("small")._1 === 100L && out("big")._1 === 400L)
    assert(out("small")._2 === 0.2 && out("big")._2 === 0.8)
    assert(math.abs(out("small")._3 - 1.0 / 3) < 1e-6)
    assert(math.abs(out("big")._3 - 2.0 / 3) < 1e-6)
    assert(math.abs(out("small")._4 - 500.0 / 3 / 100) < 1e-5)
    assert(math.abs(out("big")._4 - 2 * 500.0 / 3 / 400) < 1e-5)
    // conservation on the real corpus: weights sum to 1 and the epoch-
    // weighted token mass re-assembles the budget
    val real = TextStats.mixtureWeights(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(real.map(_._3).sum - 1.0) < 1e-4, "weights must sum to 1")
    val tot = real.map(_._1).sum.toDouble
    assert(math.abs(real.map(r => r._4 * r._1).sum - tot) < tot * 1e-4,
      "epoch-weighted token mass must equal the budget")
    // √-tempering compresses the spread: every source's weight sits
    // strictly between its natural share and the uniform share
    val uni = 1.0 / real.length
    real.foreach { case (_, nat, w, _) =>
      if (math.abs(nat - uni) > 1e-4)
        assert((w > math.min(nat, uni) - 1e-9) && (w < math.max(nat, uni) + 1e-9),
          s"tempered weight $w must lie between natural $nat and uniform $uni")
    }
  }
}
