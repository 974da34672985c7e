package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** S7 (SURVEY.md §2.1): the reference's console-log taps become
  * `df.observe()` metrics surfaced through a `QueryExecutionListener` —
  * zero-cost accumulator-based observability that scales with the job,
  * not with the data.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe() metrics reach a QueryExecutionListener") {
    val captured = new ConcurrentLinkedQueue[(String, Long, Double)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("ep1_metrics").foreach { row =>
          captured.add((funcName, row.getAs[Long]("n_rows"), row.getAs[Double]("total_qty")))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Tables.lineitem(spark, sf)
        .observe("ep1_metrics",
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("total_qty"))
        .filter(col("l_quantity") > 25)
      val kept = df.count()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 30e9.toLong
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!captured.isEmpty, "listener saw no observed metrics")
      val (_, nRows, totalQty) = captured.peek()
      // observe taps BEFORE the filter: full row count, full quantity sum
      assert(nRows === 6000L)
      assert(totalQty > 0.0)
      assert(kept < nRows)
    } finally spark.listenerManager.unregister(listener)
  }
}
