package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The corpus vocabulary (31 tokens) is smaller than the sketch (64
  * counters), so `t22`'s production runs never decrement — these cases
  * drive the eviction and lossy-merge paths directly with a vocabulary
  * far larger than the sketch and check the published MG bounds.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("reduce path: undercount bounded, heavy items survive eviction") {
    val m = 8
    val agg = new MisraGries(m)
    // 50 heavy tokens of one item + 200 singletons (vocab 201 >> m)
    val stream = Seq.fill(50)("heavy") ++ (1 to 200).map(i => s"rare$i")
    val sk = stream.foldLeft(agg.zero)(agg.reduce)
    val n = stream.length
    val tc = trueCounts(stream)
    assert(sk.size <= m, s"sketch overflowed: ${sk.size} > $m")
    sk.foreach { case (t, c) =>
      assert(c <= tc(t), s"$t overcounted: $c > ${tc(t)}")
      assert(tc(t) - c <= n.toLong / (m + 1) + 1, s"$t undercount bound broken")
    }
    // frequency 50 > N/(m+1) = 250/9 ⇒ guaranteed present
    assert(sk.contains("heavy"), "guaranteed heavy item evicted")
  }

  test("merge path: bound survives lossy merges, order-insensitive") {
    val m = 8
    val agg = new MisraGries(m)
    val rnd = new scala.util.Random(42)
    // zipf-ish stream over 100 items: item i has weight ~ 1/(i+1)
    val stream = Seq.tabulate(5000) { _ =>
      val r = rnd.nextDouble()
      s"w${(1.0 / (r + 0.01)).toInt.min(99)}"
    }
    val tc = trueCounts(stream)
    val n = stream.length.toLong
    // partials over 7 uneven slices, merged in two different orders
    val slices = stream.grouped(800).toSeq
      .map(sl => sl.foldLeft(agg.zero)(agg.reduce))
    val mergedL = slices.reduceLeft(agg.merge)
    val mergedR = slices.reduceRight(agg.merge)
    for (merged <- Seq(mergedL, mergedR)) {
      assert(merged.size <= m)
      merged.foreach { case (t, c) =>
        assert(c <= tc(t), s"$t overcounted")
      }
      // every item with true count > N/(m+1) must be present
      tc.filter(_._2 > n / (m + 1)).keys.foreach { t =>
        assert(merged.contains(t), s"guaranteed item $t missing")
      }
    }
  }

  test("t24 equals the naive per-source top-3 on the corpus") {
    val out = graft.SparkEntry.registry.find(_.name == "t24_grouped_heavy_hitters")
      .get.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val naive = graft.Tables.documents(spark, sf)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((_, t, c), i) => (t, c, i + 1L) }.toSeq).toMap
    assert(out.map(_._1).distinct.length === naive.size, "one group per source")
    out.groupBy(_._1).foreach { case (src, rows) =>
      val got = rows.sortBy(_._4).map(r => (r._2, r._3, r._4)).toSeq
      assert(got === naive(src), s"source $src: $got vs ${naive(src)}")
    }
  }

  test("t22 equals the naive full-shuffle top-10 on the corpus") {
    val out = graft.SparkEntry.registry.find(_.name == "t22_heavy_hitters").get
      .run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._3)
    val naive = graft.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(10)
      .as[(String, Long)].collect()
    assert(out.map(t => (t._1, t._2)).toSeq === naive.toSeq)
    assert(out.map(_._3).toSeq === (1L to 10L))
  }
}
