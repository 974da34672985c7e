package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once-style merge for `foreachBatch` sinks (SURVEY.md §2.9):
  * the reference double-applies on retries (no idempotency key); here each
  * micro-batch's effect is guarded by its batchId, so replays of an
  * already-applied batch are no-ops.
  *
  * State contract: the ledger carries a `__applied_batches` bookkeeping
  * column (array of batch ids, bounded in practice by checkpoint
  * retention; a production sink would keep it in a side table).
  */
object IdempotentMerge {

  val BatchCol = "__applied_batches"

  /** Wrap a merge function so it only applies when `batchId` hasn't been
    * applied to this ledger yet.
    */
  def apply(state: DataFrame, batchId: Long)(merge: DataFrame => DataFrame): DataFrame = {
    val tracked =
      if (state.columns.contains(BatchCol)) state
      else state.withColumn(BatchCol, array().cast("array<long>"))
    val already = tracked
      .select(max(array_contains(col(BatchCol), batchId)).as("seen"))
      .collect().headOption.exists(r => !r.isNullAt(0) && r.getBoolean(0))
    if (already) tracked
    else merge(tracked).withColumn(BatchCol, array_union(col(BatchCol), array(lit(batchId))))
  }
}
