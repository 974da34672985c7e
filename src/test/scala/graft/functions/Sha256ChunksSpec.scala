package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Sha256ChunksSpec extends SparkSpec {
  import spark.implicits._

  test("sha256_chunks is bit-identical to the conv(substring(sha2)) composition") {
    val rng = new scala.util.Random(99)
    val strings = (1 to 500).map(_ => rng.alphanumeric.take(rng.nextInt(40) + 1).mkString) ++
      Seq("", "a", "0|the quick brown fox", "7|", "unicode ≈ ünïcödé 你好")
    val df = strings.toDF("s")
    val viaBuiltins = df.select(
      (0 until 4).map(k =>
        conv(substring(sha2(col("s"), 256), 15 * k + 1, 15), 16, 10)
          .cast("long").as(s"b$k")): _*)
    val viaNative = df.select({
      val c = Sha256Chunks.sha256Chunks(col("s"), 4)
      (0 until 4).map(k => get(c, lit(k)).as(s"n$k"))
    }: _*)
    assert(viaNative.collect().map(_.toSeq).toSeq ===
      viaBuiltins.collect().map(_.toSeq).toSeq)
  }

  test("sha256_chunks survives whole-stage codegen and null input") {
    // range source → the projection can't be constant-folded to a
    // LocalTableScan, so the expression must actually generate code
    val df = spark.range(100)
      .select(when(col("id") % 10 === 0, lit(null))
        .otherwise(concat(lit("s"), col("id"))).as("s"))
    val out = df.select(get(Sha256Chunks.sha256Chunks(col("s"), 2), lit(0)).as("h"))
    val rows = out.collect()
    assert(rows.count(_.isNullAt(0)) === 10, "null in → null out")
    assert(rows.filter(!_.isNullAt(0)).map(_.getLong(0)).distinct.length === 90)
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span;
    // a codegen fallback would print a bare Project
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
  }
}
