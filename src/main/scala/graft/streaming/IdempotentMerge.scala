package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once-style merge for `foreachBatch` sinks (SURVEY.md §2.9):
  * the reference double-applies on retries (no idempotency key); here each
  * micro-batch's effect is guarded by its batchId, so replays of an
  * already-applied batch are no-ops.
  *
  * State contract: the ledger carries a single `__max_applied_batch`
  * high-watermark column (LONG, same value on every row). Batch ids are
  * assigned monotonically per streaming query, so "batchId ≤ watermark"
  * is exactly "already applied" — O(1) bookkeeping per ledger row instead
  * of the O(rows × batches) growth of an applied-id array. (A production
  * sink would keep the watermark in a 1-row side table next to the
  * ledger; the column form keeps the test sinks self-contained while
  * preserving the same contract.)
  */
object IdempotentMerge {

  val BatchCol = "__max_applied_batch"

  /** Wrap a merge function so it only applies when `batchId` is above the
    * ledger's applied-batch high-watermark.
    */
  def apply(state: DataFrame, batchId: Long)(merge: DataFrame => DataFrame): DataFrame = {
    val tracked =
      if (state.columns.contains(BatchCol)) state
      else state.withColumn(BatchCol, lit(null).cast("long"))
    val already = tracked
      .select(max(col(BatchCol) >= batchId).as("seen"))
      .collect().headOption.exists(r => !r.isNullAt(0) && r.getBoolean(0))
    if (already) tracked
    else merge(tracked).withColumn(BatchCol, lit(batchId))
  }
}
