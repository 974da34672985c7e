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
}
