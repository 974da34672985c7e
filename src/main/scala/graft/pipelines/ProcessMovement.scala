package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Envelope
import graft.core.Envelope.v

/** EP2 — manufacturing station movement (reference: routes/makeRouter.js:137-211).
  *
  * A bag's `Status` change decrements the counter column of the previous
  * station and increments the new one; `Complete` increments
  * `qty_completed` instead of a station column (`statusMap['Complete'] =
  * null`, makeRouter.js:175).
  *
  * Because the event carries `Previous_Status` (the transition is
  * self-describing — the reference's one genuinely good design idea,
  * SURVEY.md §2.9), each event reduces to a constant per-station delta
  * vector; deltas are commutative, so a batch `groupBy(inventory_id).sum`
  * is exactly equivalent to the reference's sequential read-modify-write —
  * and fixes its TOCTOU race by construction.
  *
  * Reference quirk reproduced faithfully: when both statuses map to the
  * SAME column (e.g. `Need Sewer Assigned` → `With Sewer`, both
  * `qty_sewer`), the reference's second `update[col] = cur + 1` overwrites
  * the first `update[col] = cur - 1` — net effect +1, not 0
  * (makeRouter.js:178-189). `deltas` encodes that overwrite.
  */
object ProcessMovement {

  /** Status → counter column (makeRouter.js:165-176). `Complete` maps to
    * no station column; unmapped statuses contribute nothing.
    */
  val statusMap: Map[String, String] = Map(
    "Office" -> "qty_office",
    "Warehouse" -> "qty_warehouse",
    "Art" -> "qty_art",
    "Cutting" -> "qty_embroidery",
    "Need Sewer Assigned" -> "qty_sewer",
    "Sewer Assigned" -> "qty_sewer",
    "Sewer Pickup" -> "qty_sewer",
    "With Sewer" -> "qty_sewer",
    "Embroidery" -> "qty_embroidery")

  final case class Result(
      inventory: DataFrame,   // counters with movement deltas applied
      deadLetter: DataFrame)  // events with a missing inventory key (P8 error path)

  private val statusToCol: Column = typedLit(statusMap)

  /** Unwrap process webhooks (parsed with Envelope.processWebhookSchema)
    * to flat transition rows.
    */
  def transitions(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      v(col("record.inventory_id")).as("inventory_id"),
      v(col("record.bag_model")).as("bag_model"),
      v(col("record.Status")).as("status"),
      v(col("record.Previous_Status")).as("previous_status"))

  /** Per-event station deltas (array of `(station, delta)` entries) for an
    * arbitrary status→column dictionary: J3 lookup ×2 + A2/A3 counter
    * updates, with the same-column-overwrite quirk. Parameterized so the
    * same counter state machine runs over any keyed transition stream.
    *
    * @param dict           status → counter column (typedLit map)
    * @param terminalStatus the status that increments [[terminalCol]]
    *                       instead of a station column ('Complete' in the
    *                       reference)
    */
  def deltaEntriesFor(dict: Column, prev: Column, curr: Column,
      terminalStatus: String, terminalCol: String): Column = {
    val prevCol = element_at(dict, prev)
    val currCol = element_at(dict, curr)
    filter(
      array(
        // prev decrement — suppressed when curr targets the same column
        // (the reference's update-object overwrite, makeRouter.js:180-189)
        when(prevCol.isNotNull && (currCol.isNull || prevCol =!= currCol),
          struct(prevCol.as("station"), lit(-1L).as("delta"))),
        when(currCol.isNotNull,
          struct(currCol.as("station"), lit(1L).as("delta"))),
        when(curr === terminalStatus,
          struct(lit(terminalCol).as("station"), lit(1L).as("delta")))),
      e => e.isNotNull)
  }

  /** The bag-manufacturing instance of [[deltaEntriesFor]]. */
  def deltaEntries: Column =
    deltaEntriesFor(statusToCol, col("previous_status"), col("status"),
      "Complete", "qty_completed")

  /** Apply a batch of movement events to a flat inventory snapshot. */
  def apply(events: DataFrame, inventory: DataFrame): Result = {
    val t = transitions(events)

    // P6: no-op transitions are silently skipped (makeRouter.js:149-152)
    val moving = t.filter(
      col("previous_status").isNotNull && col("previous_status") =!= col("status"))

    // P8: missing inventory key is an ERROR row, unlike P5's silent skip
    // (makeRouter.js:154-157)
    val deadLetter = moving.filter(col("inventory_id").isNull || col("inventory_id") === "")
    val valid = moving.filter(col("inventory_id").isNotNull && col("inventory_id") =!= "")

    // A2/A3: explode each event's delta vector, sum per (key, station) —
    // map-side partial aggregation collapses the +1/-1 stream before the
    // shuffle, so 100 TB of events reduce to |keys| × |stations| rows.
    val deltas = valid
      .select(col("inventory_id"), explode(deltaEntries).as("e"))
      .select(col("inventory_id"), col("e.station"), col("e.delta"))
      .groupBy(col("inventory_id"))
      .pivot("station", Envelope.counterCols)
      .agg(sum(col("delta")))
      .na.fill(0L, Envelope.counterCols)

    // Merge into the ledger: counter += delta for every station column.
    val d = deltas.columns.filter(_ != "inventory_id")
      .foldLeft(deltas) { (df, c) => df.withColumnRenamed(c, s"__d_$c") }
    // d is one row per touched inventory key — batch-derived, so no
    // broadcast hint (AQE converts while small; see OrderApproval).
    val merged = Envelope.counterCols
      .foldLeft(inventory.join(d, Seq("inventory_id"), "left")) { (df, c) =>
        df.withColumn(c, col(c) + coalesce(col(s"__d_$c"), lit(0L)))
      }
      .drop(d.columns.filter(_ != "inventory_id").toIndexedSeq: _*)

    Result(merged, deadLetter)
  }
}
