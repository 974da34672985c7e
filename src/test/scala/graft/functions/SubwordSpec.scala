package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = graft.llm.TextStats.SubwordVocab

  test("greedy longest-match: hand-computed token sequences") {
    val cases = Seq(
      // multi-piece splits through the fixture vocab
      ("customer", Seq("cust", "omer")),
      ("table", Seq("tab", "le")),
      ("value", Seq("val", "ue")),
      ("filter", Seq("filt", "er")),
      // longest match must beat the shorter prefix: "ord" over "or"
      ("order", Seq("ord", "er")),
      ("vector", Seq("vect", "or")),
      // full-word vocab hits stay single tokens
      ("stream", Seq("stream")),
      ("spark", Seq("spark")),
      // single-char fallback for out-of-vocab material ("d"/"u"/"p")
      ("dup", Seq("d", "u", "p")),
      // whitespace runs split words; per-word walks are independent
      ("order  customer", Seq("ord", "er", "cust", "omer")),
      // matches never cross a word boundary
      ("o r", Seq("o", "r")),
      ("", Seq.empty[String]))
    val got = cases.map(_._1).toDF("text")
      .select(col("text"), Subword.tokens(col("text"), vocab).as("ts"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) === want, s"tokens('$in')")
    }
  }

  test("SubwordTable rejects vocab entries with unpaired surrogates loudly") {
    // well-formed astral entries (surrogate PAIRS) are fine
    val emoji = new String(Character.toChars(0x1F600))
    new SubwordTable(Array("ab", emoji, s"x${emoji}y"))
    // a lone high or low surrogate half must fail at CONSTRUCTION, not
    // as silent invalid-UTF-8 tokens at match time
    for (bad <- Seq("\uD83D", "\uDE00", "a\uD83Db", "\uD83D\uD83D")) {
      val e = intercept[IllegalArgumentException] {
        new SubwordTable(Array("ok", bad))
      }
      assert(e.getMessage.contains("surrogate"), s"entry ${bad.length}")
    }
  }

  test("count agrees with tokens everywhere; codegen path matches interpreted") {
    val texts = Tables.documentsTexts
    val df = texts.toDF("text")
    val both = df.select(
        size(Subword.tokens(col("text"), vocab)).cast("long").as("viaTokens"),
        Subword.count(col("text"), vocab).as("viaCount"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  private object Tables {
    // a few corpus-shaped lines + adversarial spacing/unicode
    val documentsTexts: Seq[String] = Seq(
      "key agg row scan slow fast table value part hash",
      "batch window spark order data column agg join small line customer query",
      "  leading and trailing   spacing  ",
      "tabs\tand\nnewlines split too",
      "ünïcödé words fall back per char",
      "")
  }

  test("BPE trainer: hand-checked merges on a tiny corpus with a tie") {
    // corpus: "ab ab b a" repeated — pair counts: (a,b)=2 per doc from
    // the two 'ab' words; singles contribute no pairs. With freq
    // weighting over distinct words {ab:2, a:1, b:1}: only pair (a,b),
    // count 2. After merge 1 'ab' is a single symbol — pair space is
    // exhausted, so rounds=1 is the max; rank/merge/count all pinned.
    val docs = Seq((0L, "ab ab b a"), (1L, "ab b")).toDF("doc_id", "text")
    val m = graft.llm.TextStats.bpeLearnMerges(docs, topV = 64, rounds = 1)
    assert(m === Seq((0, "a", "b", "ab", 3L))) // 'ab' freq 3 across docs
    // exhaustion must fail loudly, not return a short table
    intercept[IllegalArgumentException] {
      graft.llm.TextStats.bpeLearnMerges(docs, topV = 64, rounds = 2)
    }
  }

  test("BPE apply: greedy-left single pass per rank, rank order respected") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    val got = Seq("abc", "ababc", "bbb", "cab", "")
      .toDF("text")
      .select(col("text"), Bpe.tokens(col("text"), merges).as("ts"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got("abc") === Seq("abc"))          // a+b then ab+c
    assert(got("ababc") === Seq("ab", "abc"))  // both (a,b) merge in ONE pass
    assert(got("bbb") === Seq("b", "b", "b"))  // no (a,b) adjacency
    assert(got("cab") === Seq("c", "ab"))      // rank 2 needs LEFT 'ab'
    assert(got("") === Seq.empty)
    // count agrees with tokens
    val cnt = Seq("ababc cab").toDF("text")
      .select(Bpe.count(col("text"), merges)).head().getLong(0)
    assert(cnt === 4L) // [ab, abc] + [c, ab]
  }

  test("property: both tokenizers preserve content — concat(tokens) == stripped text") {
    // neither greedy longest-match nor BPE merging may drop, invent, or
    // reorder a character: joining the tokens must reproduce the text
    // with whitespace removed. Seeded generator, no scalatestplus.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ Seq('ü', '0', '|'))).map(_.mkString))
    val text = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = (0 until 40).map(i => text.pureApply(Gen.Parameters.default, Seed(7L + i)))
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "b"))
    val rows = texts.toDF("text")
      .select(col("text"),
        concat_ws("", Subword.tokens(col("text"), vocab)).as("sw"),
        concat_ws("", Bpe.tokens(col("text"), merges)).as("bp"))
      .collect()
    rows.foreach { r =>
      val stripped = r.getString(0).replaceAll("\\s+", "")
      assert(r.getString(1) === stripped, s"subword dropped content on '${r.getString(0)}'")
      assert(r.getString(2) === stripped, s"bpe dropped content on '${r.getString(0)}'")
    }
  }

  test("BPE trainer on the real corpus: merges applied by the expression shrink counts") {
    val docs = graft.Tables.documents(spark, sf)
    val merges = graft.llm.TextStats.bpeLearnMerges(docs).map(m => (m._2, m._3))
    assert(merges.size === graft.llm.TextStats.BpeTrainRounds)
    val r = docs.select(
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("ws"),
        sum(length(regexp_replace(col("text"), "\\s+", "")).cast("long")).as("chars"),
        sum(graft.functions.Bpe.count(col("text"), merges)).as("bpe")).head()
    val (ws, chars, bpe) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // learned merges must land strictly between char-level and word-level
    assert(bpe < chars, s"bpe $bpe should compress below char count $chars")
    assert(bpe > ws, s"bpe $bpe must exceed whitespace count $ws")
  }
}
