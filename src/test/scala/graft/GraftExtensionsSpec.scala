package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions integration: injected SQL functions and the
  * SelfSimilarityFold optimizer rule (applied directly here — the shared
  * test session predates extension loading).
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("extensions class injects functions and rules without error") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)   // must not throw; wiring is typed
  }

  test("SelfSimilarityFold rewrites diagonal cosine to constants") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(0.0f, 0.0f)),     // zero vector → NaN preserved
      (3L, null.asInstanceOf[Array[Float]]),
      (4L, Array(Float.NaN, 1.0f)) // NaN component → NaN, not 1.0
    ).toDF("id", "e")
    val diag = df.select(col("id"),
      graft.functions.VectorExpressions.cosineF32(col("e"), col("e")).as("c"))
    val optimized = SelfSimilarityFold(diag.queryExecution.analyzed)
    // rule fired: no CosineSimF32 left in the plan
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[graft.functions.CosineSimF32])))
    // semantics preserved end-to-end (evaluate the rewritten plan)
    val out = org.apache.spark.sql.graftshim.Shim.ofRows(spark, optimized)
      .orderBy("id").collect()
    assert(out(0).getDouble(1) === 1.0)
    assert(out(1).getDouble(1).isNaN)
    assert(out(2).isNullAt(1))
    assert(out(3).getDouble(1).isNaN) // matches the unfolded NaN/NaN path
  }
}
