package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

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
}
