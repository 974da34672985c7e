package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-6 batch operators: q65 sessionize,
  * q66 incremental agg, t17 bigram logprob, d14 semantic dedup. Each test
  * re-derives the operator's defining property from raw data or from the
  * operator's own output — independent of the DuckDB oracle path.
  */
class OperatorInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.registry.find(_.name == name).get.run(spark, sf)

  test("q65 sessionize: partition of events, non-negative spans, gap law") {
    val out = run("q65_sessionize").cache()
    try {
      // sessions PARTITION the event set: counts add up to the raw total
      val total = out.agg(sum(col("n_events"))).head.getLong(0)
      val raw = Tables.events(spark, sf).count()
      assert(total === raw, s"sessions cover $total of $raw events")
      // no negative durations
      assert(out.filter(col("duration_us") < 0).isEmpty)
      // gap law: consecutive sessions of one user are > 30 min apart
      // (end of previous to start of next), else they'd have merged
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
      val gaps = out
        .withColumn("prev_end", lag(col("start_us") + col("duration_us"), 1).over(w))
        .filter(col("prev_end").isNotNull)
        .filter(col("start_us") - col("prev_end") <= 1800000000L)
      assert(gaps.isEmpty, "adjacent sessions within the 30-min gap did not merge")
    } finally out.unpersist()
  }

  test("q66 incremental agg: algebraic merge equals full recompute") {
    val out = run("q66_incremental_agg")
    val full = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        round(sum(col("value")) / count(lit(1)), 6).as("avg_value"))
    assert(out.exceptAll(full).isEmpty && full.exceptAll(out).isEmpty,
      "merged base+delta rollup diverges from the full recompute")
  }

  test("t17 bigram logprob: one bigram per adjacent pair, probs are log-valid") {
    val out = run("t17_bigram_logprob").cache()
    try {
      // n_bigrams == n_tokens - 1, re-derived from the raw corpus
      val toks = Tables.documents(spark, sf)
        .select(col("doc_id"),
          (size(split(trim(col("text")), "\\s+")) - 1).as("want"))
      val joined = out.join(toks, Seq("doc_id"))
      assert(joined.filter(col("n_bigrams") =!= col("want")).isEmpty,
        "bigram count is not tokens-1 for some doc")
      // smoothed log-probs are strictly negative and finite
      assert(out.filter(col("avg_logprob") >= 0 || isnan(col("avg_logprob"))
        || col("avg_logprob").isNull).isEmpty)
    } finally out.unpersist()
  }

  test("d14 semantic dedup: verdicts equal brute-force within-cluster check") {
    val out = run("d14_semantic_dedup").cache()
    try {
      // re-derive losers by brute force from the operator's own cluster
      // assignment + raw embeddings (small at sf0.001)
      val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
      val assigned = out.select(col("vec_id"), col("cluster_id")).join(e, Seq("vec_id"))
      val a = assigned.select(col("cluster_id"), col("vec_id").as("vb"),
        col("embedding").as("ea"))
      val b = assigned.select(col("cluster_id"), col("vec_id").as("va"),
        col("embedding").as("eb"))
      val losers = a.join(b, Seq("cluster_id"))
        .filter(col("va") < col("vb"))
        .filter(round(graft.llm.Similarity.cosine(col("ea"), col("eb")), 6) >= 0.4)
        .select(col("vb")).distinct()
        .collect().map(_.getLong(0)).toSet
      val kept = out.filter(col("keep")).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
      val dropped = out.filter(!col("keep")).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
      assert(dropped === losers, "dropped set != brute-force similar-pair losers")
      assert((kept & losers).isEmpty)
      // the smallest vec_id of every cluster always survives
      val minPerCluster = out.groupBy(col("cluster_id"))
        .agg(min(col("vec_id")).as("m"))
        .collect().map(_.getLong(1)).toSet
      assert((minPerCluster & dropped).isEmpty, "a cluster's min vec_id was dropped")
    } finally out.unpersist()
  }

  test("q67 LOCF: full grid, observed cells exact, fill carries only forward") {
    val out = run("q67_locf_fill").cache()
    try {
      val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
      assert(out.count() === nUsers * 30, "grid is not users x 30 days")
      // observed rows carry their own value
      val obs = Tables.events(spark, sf)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum(col("value")), 6).as("want"))
      assert(out.filter(col("observed")).join(obs, Seq("user_id", "day"))
        .filter(col("v_filled") =!= col("want")).isEmpty,
        "an observed cell does not carry its own day total")
      // fill never precedes the first observation, never gaps after it
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bad = out
        .withColumn("seen", max(col("observed").cast("int")).over(w))
        .filter((col("seen") === 0 && col("v_filled").isNotNull) ||
          (col("seen") === 1 && col("v_filled").isNull))
      assert(bad.isEmpty, "LOCF filled before first observation or gapped after it")
    } finally out.unpersist()
  }

  test("d15 CDC chunks: tile each doc exactly; hashes match an independent digest") {
    val out = run("d15_cdc_chunks").cache()
    try {
      // chunks tile the text: lengths sum to doc length, starts begin at 1,
      // consecutive chunks abut (start == prev start + prev len)
      val lens = Tables.documents(spark, sf)
        .select(col("doc_id"), length(col("text")).cast("long").as("want"))
      val cover = out.groupBy(col("doc_id"))
        .agg(sum(col("len")).as("got"), min(col("start_pos")).as("first"))
        .join(lens, Seq("doc_id"))
      assert(cover.filter(col("got") =!= col("want") || col("first") =!= 1).isEmpty,
        "chunks do not tile some document")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("start_pos"))
      val abut = out
        .withColumn("prev_end", lag(col("start_pos") + col("len"), 1).over(w))
        .filter(col("prev_end").isNotNull && col("start_pos") =!= col("prev_end"))
      assert(abut.isEmpty, "adjacent chunks overlap or gap")
      // chunk hash = sha256 prefix of the substring, re-derived with the
      // JDK digest (independent of the Spark expression tree)
      val texts = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val md = java.security.MessageDigest.getInstance("SHA-256")
      out.orderBy(col("doc_id"), col("start_pos")).limit(200).collect().foreach { r =>
        val (id, s0, l0) = (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt)
        val sub = texts(id).substring(s0 - 1, s0 - 1 + l0)
        val hex = md.digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
        assert(hex === r.getString(3), s"chunk hash mismatch for doc $id @$s0")
      }
      // shared flag == "this chunk hash occurs more than once corpus-wide"
      val counts = out.groupBy(col("chash")).agg(count(lit(1)).as("c"))
      assert(out.join(counts, Seq("chash"))
        .filter(col("shared") =!= (col("c") > 1)).isEmpty,
        "shared flag diverges from the chash occurrence count")
      // a duplicated text produces an identical chunk-hash multiset
      // (sf0.001 may hold no exact dups — then the property is vacuous)
      val dupPairs = Tables.documents(spark, sf)
        .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(col("ids")).collect()
      dupPairs.headOption.foreach { row =>
        val pair = row.getSeq[Long](0).take(2)
        val h0 = out.filter(col("doc_id") === pair(0))
          .select(col("chash")).collect().map(_.getString(0)).sorted.toSeq
        val h1 = out.filter(col("doc_id") === pair(1))
          .select(col("chash")).collect().map(_.getString(0)).sorted.toSeq
        assert(h0 === h1, "identical docs chunked differently")
      }
    } finally out.unpersist()
  }

  test("q68 cumulative distinct: curve ends at the true distinct count, monotone") {
    val out = run("q68_cumulative_distinct").cache()
    try {
      val finals = out.groupBy(col("event_type"))
        .agg(max(col("cum_users")).as("got"), sum(col("new_users")).as("summed"))
      val truth = Tables.events(spark, sf)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("want"))
      assert(finals.join(truth, Seq("event_type"))
        .filter(col("got") =!= col("want") || col("summed") =!= col("want")).isEmpty,
        "growth curve does not end at the true distinct-user count")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val dips = out.withColumn("prev", lag(col("cum_users"), 1).over(w))
        .filter(col("prev").isNotNull && col("cum_users") < col("prev"))
      assert(dips.isEmpty, "cumulative curve dips")
    } finally out.unpersist()
  }

  test("t18 novelty: first doc fully novel, exact re-statement fully stale") {
    val out = run("t18_ngram_novelty").cache()
    try {
      assert(out.filter(col("novelty") < 0 || col("novelty") > 1).isEmpty)
      val first = out.orderBy(col("doc_id")).head
      assert(first.getDouble(2) === 1.0, "the first doc must be 100% novel")
      // any doc whose text equals an EARLIER doc's text scores novelty 0
      val dups = Tables.documents(spark, sf)
        .groupBy(col("text")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2).select(col("ids")).collect()
      dups.foreach { r =>
        val laters = r.getSeq[Long](0).sorted.drop(1)
        laters.foreach { id =>
          val nov = out.filter(col("doc_id") === id).head.getDouble(2)
          assert(nov === 0.0, s"doc $id restates an earlier doc but scores $nov")
        }
      }
    } finally out.unpersist()
  }

  test("m4 phash near-dup: hammings verified against a direct recompute") {
    val out = run("m4_phash_neardup").cache()
    try {
      assert(out.filter(col("hamming") > 3 || col("hamming") < 0).isEmpty)
      assert(out.filter(col("doc_id_a") >= col("doc_id_b")).isEmpty)
      // recompute signatures straight from the text bytes (independent of
      // the operator's mapPartitions seam): tile the bytes into the
      // 16×16 content-image pixels and take the 8×8 box-mean aHash —
      // the r13 real-decoder closed form (the retired byte-slot
      // algorithm lived here until m4 moved onto the decoded raster)
      val texts = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
      def sig(s: String): (Long, Long) = {
        val p = s.getBytes("UTF-8")
        val side = graft.llm.Multimodal.AHashSide
        def px(x: Int, y: Int): Long =
          if (p.length == 0) 0L else (p((y * side + x) % p.length) & 0xff).toLong
        val sums = new Array[Long](64)
        val cnts = new Array[Long](64)
        var tot = 0L
        for (j <- 0 until 8; i <- 0 until 8) {
          val k = j * 8 + i
          for (y <- j * side / 8 until (j + 1) * side / 8;
               x <- i * side / 8 until (i + 1) * side / 8) {
            sums(k) += px(x, y); cnts(k) += 1
          }
          tot += sums(k)
        }
        val npx = cnts.sum
        def half(off: Int) = (0 until 32).foldLeft(0L) { (acc, k) =>
          if (sums(off + k) * npx > tot * cnts(off + k)) acc | (1L << k) else acc
        }
        (half(0), half(32))
      }
      out.collect().foreach { r =>
        val (a, b, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val (la, ha) = sig(texts(a)); val (lb, hb) = sig(texts(b))
        val want = java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb)
        assert(h === want.toLong, s"pair ($a,$b) hamming $h != recomputed $want")
      }
    } finally out.unpersist()
  }

  test("q69 funnel: stages equal a driver-side sequential replay") {
    val got = run("q69_event_funnel")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent replay: per user, scan events in time order
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val win = 86400000000L
    val want = rows.groupBy(_._1).map { case (u, evs) =>
      val sorted = evs.sortBy(_._3)
      val t1 = sorted.collectFirst { case (_, "view", t) => t }
      val t2 = t1.flatMap(v => sorted.collectFirst {
        case (_, "click", t) if t > v && t <= v + win => t })
      val t3 = t2.flatMap(c => sorted.collectFirst {
        case (_, "purchase", t) if t > c && t <= c + win => t })
      u -> (if (t3.isDefined) 3L else if (t2.isDefined) 2L
            else if (t1.isDefined) 1L else 0L)
    }
    assert(got === want, "funnel stages diverge from the sequential replay")
  }

  test("q69 funnel: bounded aggregator survives a degenerate heavy user") {
    import spark.implicits._
    val win = 86400000000L
    val funnel = udaf(new graft.functions.FunnelAggregator(win, 1000))
    val base = 1700000000000000L
    // one bot user with 100k clicks (all in the view's window) must fold
    // in bounded state and still stage correctly; a plain-presence user
    // lands at stage 1
    val heavy = spark.range(100000).select(
      lit(1L).as("user_id"), lit("click").as("et"),
      (lit(base) + col("id") * 1000L + lit(1L)).as("us"))
    val rest = Seq((1L, "view", base), (1L, "purchase", base + 2000000L),
      (2L, "view", base), (2L, "other", base + 5L)).toDF("user_id", "et", "us")
    val got = heavy.unionByName(rest)
      .groupBy(col("user_id")).agg(funnel(col("us"), col("et")).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L))
    // the one undeterminable sketch configuration (more than cap clicks,
    // all before the first view) fails LOUDLY, never silently misstages
    val tiny = udaf(new graft.functions.FunnelAggregator(win, 10))
    val bad = spark.range(11).select(
      lit(3L).as("user_id"), lit("click").as("et"),
      (lit(base) - col("id") - 1).as("us"))
      .unionByName(Seq((3L, "view", base + 10L)).toDF("user_id", "et", "us"))
    val ex = intercept[Throwable] {
      bad.groupBy(col("user_id")).agg(tiny(col("us"), col("et")).as("stage")).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("funnel undetermined"), s"wrong failure: $msgs")
    // the real query keeps the single-scan single-shuffle shape
    val q = SparkEntry.registry.find(_.name == "q69_event_funnel").get
    val df = q.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(plan).length === 1,
      s"q69 no longer one scan:\n${plan.take(600)}")
    assert(" Exchange ".r.findAllIn(plan).length <= 1,
      s"q69 no longer one shuffle:\n${plan.take(600)}")
  }

  test("d16 containment: bounds and the containment >= jaccard law") {
    val cont = run("d16_containment")
    val jac = run("d5_ngram_jaccard")
    val joined = cont.join(jac, Seq("doc_id_a", "doc_id_b"))
    assert(joined.count() === cont.count(),
      "d16 and d5 disagree on the blocked pair set")
    // |∩|/min(|A|,|B|) ≥ |∩|/|A∪B| always; both in [0,1]
    assert(joined.filter(col("containment") < col("jaccard") - 1e-9).isEmpty,
      "containment fell below jaccard for some pair")
    assert(cont.filter(col("containment") < 0 || col("containment") > 1).isEmpty)
  }

  test("q71 mode: the reported value really is each user's most frequent") {
    val out = run("q71_mode_per_group")
    val counts = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
    val maxes = counts.groupBy(col("user_id")).agg(max(col("c")).as("cmax"))
    val checked = out.join(maxes, Seq("user_id"))
      .join(counts.withColumnRenamed("event_type", "mode_event"),
        Seq("user_id", "mode_event"))
    assert(checked.count() === out.count(), "a mode value the user never produced")
    assert(checked.filter(col("n") =!= col("cmax") || col("c") =!= col("n")).isEmpty,
      "mode count is not the user's max count")
  }

  test("d17 soft dedup: group mass sums to one, one canonical per group") {
    val out = run("d17_soft_dedup_weights").cache()
    try {
      val groups = out.groupBy(col("content_hash"))
        .agg(sum(col("weight")).as("mass"),
          sum(col("is_canonical").cast("long")).as("canon"),
          count(lit(1)).as("n"), max(col("n_copies")).as("nc"))
      // rounded weights still sum to 1 within rounding slack (n * 5e-7)
      assert(groups.filter(abs(col("mass") - 1.0) > col("n") * 5e-7).isEmpty,
        "a duplicate group's sampling mass drifted from 1.0")
      assert(groups.filter(col("canon") =!= 1).isEmpty,
        "a group has zero or multiple canonicals")
      assert(groups.filter(col("n") =!= col("nc")).isEmpty,
        "n_copies disagrees with the actual group size")
    } finally out.unpersist()
  }

  test("s8 hard negatives: label differs and no better negative exists") {
    val out = run("s8_hard_negatives").cache()
    try {
      val e = Tables.embeddings(spark, sf)
      val labels = e.select(col("vec_id"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      pairs.foreach { case (a, n, _) =>
        assert(labels(a) !== labels(n), s"hard negative $n shares anchor $a's label")
      }
      // no cross-label vector beats the reported (sim, vec_id) rank
      val a = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"),
          col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vid"), col("label").as("vl"),
        col("embedding").as("eb"))
      val best = a.join(b, col("ql") =!= col("vl"))
        .select(col("qid"), col("vid"),
          round(graft.llm.Similarity.cosine(col("ea"), col("eb")), 6).as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).view
        .mapValues(_.minBy(p => (-p._3, p._2))).toMap
      pairs.foreach { case (aid, nid, sim) =>
        val (_, wantId, wantSim) = best(aid)
        assert((nid, sim) === ((wantId, wantSim)),
          s"anchor $aid: reported ($nid, $sim), brute force says ($wantId, $wantSim)")
      }
    } finally out.unpersist()
  }

  test("d18 minhash calibration: estimates quantized to 1/32, d3 pairs covered") {
    val out = run("d18_minhash_estimate").cache()
    try {
      assert(out.filter(col("sig_est") < 0 || col("sig_est") > 1).isEmpty)
      // the signature estimate is matching-components/32 exactly
      assert(out.filter(abs(col("sig_est") * 32 - round(col("sig_est") * 32, 0)) > 1e-6)
        .isEmpty, "an estimate is not a multiple of 1/32")
      // d3's verified pairs are exactly this candidate set filtered at 0.5
      val d3 = run("d3_minhash_pairs").select(col("doc_id_a"), col("doc_id_b"))
      val covered = d3.join(out.filter(col("jaccard") >= 0.5)
        .select(col("doc_id_a"), col("doc_id_b")), Seq("doc_id_a", "doc_id_b"))
      assert(covered.count() === d3.count(),
        "a d3 pair is missing from the calibration set")
      assert(out.filter(col("jaccard") >= 0.5).count() === d3.count(),
        "the calibration set has >=0.5 pairs d3 does not")
    } finally out.unpersist()
  }

  test("q72 rolling DAU: explode form equals a direct range join") {
    val out = run("q72_rolling_dau")
    // the oracle-shaped range join, built independently in Spark
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("uday")).distinct()
    val days = ud.select(col("uday").as("day")).distinct()
    val want = days.join(ud,
        col("uday") <= col("day") &&
          col("uday") > col("day") - expr("INTERVAL 7 DAY"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau7"))
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty,
      "map-side day-explode diverges from the trailing-window range join")
  }

  test("t19 zipf: slope negative, fit matches a driver-side OLS") {
    val r = run("t19_zipf_fit").head
    val (n, slope, intercept, r2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(slope < 0, "frequency must fall with rank")
    assert(r2 >= 0 && r2 <= 1)
    // independent OLS over the same ranked points
    val counts = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(p => (-p._2, p._1)).take(1000)
    assert(n === counts.length.toLong)
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(slope - m) < 1e-4, s"slope $slope vs OLS $m")
    assert(math.abs(intercept - (sy - m * sx) / n) < 1e-4)
  }

  test("q73 pareto: the top-80 set is the minimal value-desc prefix") {
    val rows = run("q73_pareto_coverage")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3)))
      .sortBy(p => (-p._2, p._1))
    val total = rows.map(_._2).sum
    val flags = rows.map(_._3)
    // prefix property: once false, never true again
    assert(!flags.zip(flags.tail).exists { case (a, b) => !a && b },
      "in_top80 is not a prefix of the value-desc order")
    val k = flags.count(identity)
    val mass = rows.take(k).map(_._2).sum
    assert(mass / total >= 0.8 - 1e-9, "selected mass below 80%")
    if (k > 1)
      assert((mass - rows(k - 1)._2) / total < 0.8, "selection is not minimal")
  }

  test("d19 sorted neighborhood: full window coverage, 2n-3 pairs") {
    val out = run("d19_sorted_neighborhood").cache()
    try {
      val n = Tables.documents(spark, sf).count()
      assert(out.count() === 2 * n - 3, "rank-band pair count is not 2n-3")
      assert(out.filter(!col("window_dist").isin(1L, 2L)).isEmpty)
      assert(out.filter(col("jaccard") < 0 || col("jaccard") > 1).isEmpty)
      // every doc participates (interior docs twice per side)
      val participants = out.select(col("doc_id_a").as("d"))
        .unionByName(out.select(col("doc_id_b").as("d"))).distinct().count()
      assert(participants === n, "a document fell out of the neighborhood pass")
    } finally out.unpersist()
  }

  test("d20 multipass SNM: superset of single-pass, never loses a true pair") {
    val multi = run("d20_snm_multipass").cache()
    // d19 orients pairs by RANK (lower rank first), d20 by doc_id —
    // normalize before comparing
    val single = run("d19_sorted_neighborhood")
      .select(least(col("doc_id_a"), col("doc_id_b")).as("doc_id_a"),
        greatest(col("doc_id_a"), col("doc_id_b")).as("doc_id_b"), col("jaccard"))
    try {
      // pass 1 uses d19's exact ordering — its pairs must all reappear
      val missing = single.join(multi.select(col("doc_id_a"), col("doc_id_b")),
        Seq("doc_id_a", "doc_id_b"), "left_anti")
      assert(missing.isEmpty, "a single-pass pair vanished from the union")
      // found true pairs can only grow with passes
      val m = multi.filter(col("jaccard") >= 0.5).count()
      val s1 = single.filter(col("jaccard") >= 0.5).count()
      assert(m >= s1, s"multipass found $m true pairs, single pass $s1")
      assert(multi.filter(col("doc_id_a") >= col("doc_id_b")).isEmpty)
    } finally multi.unpersist()
  }

  test("q70 retention: rates are n_active/n_cohort, cohorts partition users") {
    val out = run("q70_retention_cohorts").cache()
    try {
      assert(out.filter(col("n_active") > col("n_cohort")).isEmpty)
      assert(out.filter(
        abs(col("rate") - round(col("n_active") / col("n_cohort"), 6)) > 1e-9).isEmpty)
      // each cohort size counted once per offset; cohort sizes sum to the
      // distinct-user total for every offset slice
      val total = Tables.events(spark, sf).select(col("user_id")).distinct().count()
      val perOff = out.groupBy(col("retention_day"))
        .agg(sum(col("n_cohort")).as("s")).collect()
      perOff.foreach(r => assert(r.getLong(1) === total,
        s"cohort sizes at offset ${r.getLong(0)} sum to ${r.getLong(1)}, not $total"))
    } finally out.unpersist()
  }

  test("t20 perplexity buckets: terciles balanced, scores strictly ordered by bucket") {
    val out = run("t20_perplexity_buckets").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val n = out.length
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // exact interpolated terciles: bucket sizes within rounding of n/3
    byBucket.foreach { case (b, xs) =>
      assert(math.abs(xs.length - n / 3.0) <= 2.0,
        s"bucket $b has ${xs.length} of $n docs — not a tercile")
    }
    // the partition is BY SCORE: every head doc scores at least every
    // middle doc, every middle at least every tail
    assert(byBucket("head").min >= byBucket("middle").max,
      "a middle doc outscores a head doc")
    assert(byBucket("middle").min >= byBucket("tail").max,
      "a tail doc outscores a middle doc")
    // scores are t17's (shared frame): spot-check equality per doc
    val t17 = run("t17_bigram_logprob").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { case (id, lp, _) =>
      assert(t17(id) === lp, s"t20 score diverges from t17 for doc $id")
    }
    graft.llm.Dedup.releaseSpills(spark)
  }

  test("s9 MMR: greedy structure — ranks, candidate membership, monotone scores") {
    val out = run("s9_mmr_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size === 8, s"expected 8 anchors, got ${byQ.keySet}")
    val e = graft.Tables.embeddings(spark, sf)
    val cand = graft.llm.Similarity
      .bruteTopK(e.filter(col("vec_id") < 8), e, graft.llm.Similarity.MmrN)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    byQ.foreach { case (qid, rows) =>
      // exactly k picks, ranks 1..k, all distinct, all from the top-n pool
      assert(rows.map(_._3).sorted.toSeq === (1L to graft.llm.Similarity.MmrK),
        s"anchor $qid ranks: ${rows.map(_._3).toSeq}")
      assert(rows.map(_._2).distinct.length === rows.length,
        s"anchor $qid repeated a pick")
      rows.foreach { case (_, vid, _, _, _) =>
        assert(cand(qid).contains(vid),
          s"anchor $qid picked $vid outside its top-${graft.llm.Similarity.MmrN} pool")
      }
      // the first pick is pure relevance; picks 2..k trade relevance for
      // diversity, so rank-1 relevance dominates and greedy objective
      // values never increase (the penalty set only grows)
      val first = rows.find(_._3 == 1L).get
      assert(rows.forall(_._4 <= first._4),
        s"anchor $qid rank-1 is not the relevance argmax")
      val scores = rows.sortBy(_._3).map(_._5)
      scores.sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"anchor $qid scores increase with rank: ${scores.toSeq}")
      }
    }
    graft.llm.Dedup.releaseSpills(spark)
  }

  test("s10 IVF curve: one row per nprobe, monotone, exact at full probe") {
    // the in-query raise_error gates enforce these during every Verify
    // run; this spec re-derives them independently from the output rows
    val rows = run("s10_ivf_recall_curve").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 8L), s"nprobe points: ${rows.map(_._1).toSeq}")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"recall fell from $a to $b")
      assert(b._3 >= a._3, s"scanned fraction fell from $a to $b")
    }
    assert(rows.last._2 === 1.0, "full probe is not exact")
    assert(rows.last._3 === 1.0, "full probe does not scan the whole corpus")
    assert(rows.head._3 < 0.5, "nprobe=1 should scan a minority of the corpus")
    graft.llm.Dedup.releaseSpills(spark)
  }

  test("t21 token budget: threshold law, cap semantics, independent membership") {
    val out = run("t21_token_budget_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.map(_._1).distinct.length === out.length, "one row per source")
    // full driver-side re-derivation: JDK SHA-256 (not the engine's
    // Sha256Chunks expression), plain Scala tokenization and math
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def ntok(t: String): Long = t.trim.split("\\s+").length.toLong
    def h60(sx: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val bySrc = docs.groupBy(_._2)
    val srcTok = bySrc.view.mapValues(_.map(d => ntok(d._3)).sum).toMap
    val tot = srcTok.values.sum
    def wOf(s: String) = if (Set("src0", "src1", "src2", "src3")(s)) 3L else 1L
    val sumW = bySrc.keys.toSeq.map(wOf).sum
    assert(out.map(_._1).sorted === bySrc.keys.toArray.sorted)
    out.foreach { case (srcName, before, w, thr, kd, kt) =>
      assert(w === wOf(srcName), s"$srcName weight")
      assert(before === srcTok(srcName), s"$srcName tokens_before")
      val expThr = math.min(1000000L,
        math.floor(500000.0 * tot * w / sumW / srcTok(srcName)).toLong)
      assert(thr === expThr, s"$srcName threshold")
      // membership is a pure function of doc_id — recompute the sample
      val kept = bySrc(srcName).filter(d => h60(d._1.toString) % 1000000L < thr)
      assert(kd === kept.length.toLong, s"$srcName kept_docs")
      assert(kt === kept.map(d => ntok(d._3)).sum, s"$srcName kept_tokens")
      // a source whose target exceeds its size is kept WHOLE
      if (thr == 1000000L) {
        assert(kd === bySrc(srcName).length.toLong, s"$srcName not kept whole")
        assert(kt === before, s"$srcName tokens not kept whole")
      }
    }
    // the boosted sources must hit the cap or sample above the uniform rate
    val uniform = out.filter(_._3 == 1L).map(_._4)
    out.filter(_._3 == 3L).foreach { case (srcName, _, _, thr, _, _) =>
      assert(uniform.forall(thr > _) || thr == 1000000L,
        s"boosted $srcName threshold $thr not above uniform thresholds")
    }
  }

  test("q74 MAD outliers: hand-computed median/MAD, robust to the outlier itself") {
    import spark.implicits._
    // group a: 1..9 plus one wild 100 → med 5.5, adev median (MAD) 2.5,
    // threshold 4.4478·2.5 = 11.1195 → ONLY the 100 flags (adev 94.5).
    // A mean/stddev z-score would have its cut dragged up by the same
    // point — the robustness this operator exists for.
    val a = (1 to 9).map(_.toDouble) :+ 100.0
    // group b: symmetric, no outlier
    val b = Seq(10.0, 20.0, 30.0)
    val ev = (a.map(("a", _)) ++ b.map(("b", _))).zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    val out = graft.operators.Functions.madOutliers(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(4), r.getBoolean(5)))
    val ga = out.filter(_._2 == "a")
    assert(ga.forall(_._4 === 11.1195), s"threshold: ${ga.map(_._4).toSeq.distinct}")
    assert(ga.filter(_._5).map(_._3).toSeq === Seq(100.0),
      "exactly the wild point flags")
    val gb = out.filter(_._2 == "b")
    assert(gb.forall(!_._5), "symmetric group has no outliers")
    assert(gb.forall(_._4 === 44.478), "MAD(b) = 10 → threshold 44.478")
  }

  test("q76 hash split: content-pure, boundary law, shuffle-free plan") {
    val out = run("q76_hash_split")
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // total coverage, bucket range, split↔bucket law
    assert(rows.length.toLong === Tables.documents(spark, sf).count())
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 100 })
    assert(rows.forall { case (_, b, s) =>
      s == (if (b < 80) "train" else if (b < 90) "val" else "test")
    })
    // content-purity: identical text ⇒ identical split, independent of
    // row order / partitioning (re-run over a repartitioned shuffle of
    // the same table must produce the identical assignment)
    val again = run("q76_hash_split").repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(again.sameElements(rows.sortBy(_._1)),
      "split assignment moved under repartitioning — not content-pure")
    // scan-side projection only: no exchange anywhere in the plan
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"q76 must be a shuffle-free scan projection:\n${plan.take(900)}")
  }

  test("q80 purge: written round-trip has zero tombstoned rows; manifests reconcile") {
    val docs = Tables.documents(spark, sf)
    val tomb = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    val nTomb = tomb.count()
    assert(nTomb > 0, "fixture must contain at least one tombstoned doc")

    // the ACTION writes a rewritten dataset; the written output (a fresh
    // read, not the in-memory frame) must carry zero tombstoned rows and
    // exactly n_before - n_tomb rows
    val outDir = java.nio.file.Files.createTempDirectory("purge").toString + "/docs"
    graft.operators.Functions.purgeTombstones(docs, tomb, "doc_id")
      .write.mode("overwrite").parquet(outDir)
    val rewritten = spark.read.parquet(outDir)
    assert(rewritten.count() === docs.count() - nTomb)
    assert(rewritten.join(tomb, Seq("doc_id"), "left_semi").count() === 0L,
      "post-purge audit must find zero remaining tombstoned rows")

    // the q80 proof artifact: every row audits clean and reconciles
    val proof = run("q80_forgotten_purge").collect()
    assert(proof.length === 5) // documents, embeddings, 3 splits
    proof.foreach { r =>
      val ds = r.getAs[String]("dataset") + "/" + r.getAs[String]("part")
      assert(r.getAs[Long]("tomb_remaining") === 0L, s"$ds tomb_remaining")
      assert(r.getAs[Boolean]("reconciles"), s"$ds checksum reconciliation")
      assert(r.getAs[Long]("n_before") ===
        r.getAs[Long]("n_purged") + r.getAs[Long]("n_after"), s"$ds counts")
    }
    // the docs row agrees with the independently-written rewrite
    val docRow = proof.find(_.getAs[String]("dataset") == "documents").get
    assert(docRow.getAs[Long]("n_after") === rewritten.count())
    assert(docRow.getAs[Long]("n_purged") === nTomb)
  }
}
