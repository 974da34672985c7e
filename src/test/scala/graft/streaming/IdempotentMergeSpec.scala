package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IdempotentMergeSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batch ids are no-ops; fresh ids apply") {
    val state0 = Seq(("101", 10)).toDF("inventory_id", "qty")
    def addOne(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("qty", col("qty") + 1)

    val s1 = IdempotentMerge(state0, batchId = 7L)(addOne)
    val s2 = IdempotentMerge(s1, batchId = 7L)(addOne)      // replay → no-op
    val s3 = IdempotentMerge(s2, batchId = 8L)(addOne)      // fresh → applies
    val s4 = IdempotentMerge(s3, batchId = 7L)(addOne)      // stale replay → no-op
    def qty(df: org.apache.spark.sql.DataFrame): Int =
      df.select("qty").as[Int].head()
    assert(qty(s1) === 11)
    assert(qty(s2) === 11, "replayed batch must not double-apply")
    assert(qty(s3) === 12)
    assert(qty(s4) === 12, "a stale batch id below the watermark must not re-apply")
    // bookkeeping is a scalar high-watermark, not a per-row id array
    val applied = s4.select(IdempotentMerge.BatchCol).as[Long].head()
    assert(applied === 8L)
  }
}
