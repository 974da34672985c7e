package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe publish of a rewritten directory — shared by every durable
  * artifact that lives at a stable path and is maintained by
  * rewrite-and-swap (the st9 ledger, the q81 streaming manifest, the
  * st11 closure-label store).
  *
  * Delete-then-rename has a crash window where the primary path is
  * simply GONE (data stranded in the work dir, readers fail or silently
  * restart empty — the r9 ADVICE finding). [[swapIntoPlace]] instead
  * parks the live dir at `<dst>__old` before renaming the rewrite in:
  * no crash point loses data, and a crash between the two renames is
  * healed by [[recover]] on the next read. The two renames are still
  * not one atomic commit — object stores without rename semantics use
  * [[graft.streaming.ParquetLedger]]'s versioned-pointer flip instead.
  */
object DirSwap {

  def swapIntoPlace(fs: FileSystem, tmp: Path, dst: Path): Unit = {
    val old = new Path(dst.toString + "__old")
    fs.delete(old, true) // leftover from a crash after a completed swap
    // Hadoop rename reports several failure modes (missing parent, dst
    // exists, fs-specific refusals) by RETURNING false rather than
    // throwing. Ignoring that result here is how the primitive loses
    // data: if tmp→dst fails after dst was parked at __old, an
    // unconditional trailing delete(old) would destroy the only live
    // copy. Every rename is therefore checked; on tmp→dst failure the
    // parked dir is restored (best effort — if even that fails, __old
    // is left for [[recover]]) and the swap throws.
    val parked = fs.exists(dst)
    if (parked && !fs.rename(dst, old))
      throw new java.io.IOException(s"DirSwap: could not park $dst at $old")
    if (!fs.rename(tmp, dst)) {
      if (parked && !fs.rename(old, dst)) {
        throw new java.io.IOException(
          s"DirSwap: rename $tmp -> $dst failed AND restoring $old failed — " +
            s"live data is parked at $old; recover() will restore it")
      }
      throw new java.io.IOException(
        s"DirSwap: rename $tmp -> $dst failed; previous content restored")
    }
    fs.delete(old, true)
    ()
  }

  /** Heal a crash between [[swapIntoPlace]]'s two renames: primary
    * missing, parked `__old` present → restore it. (The interrupted
    * rewrite's tmp dir is stale garbage at that point; the next
    * rewrite's `overwrite` reclaims it.)
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val dst = new Path(dir)
    val old = new Path(dir + "__old")
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dst) && fs.exists(old)) { fs.rename(old, dst); () }
  }

  /** Heal every child-level swap under `parent` (the per-partition-dir
    * form used by the IVF index purge, where each `cell=k` directory is
    * swapped individually): for each `<name>__old` child, restore it when
    * the primary `<name>` is missing (crash between the two renames), and
    * delete it when the primary exists (crash after the publishing rename
    * but before the cleanup delete — the parked copy is superseded
    * garbage, and leaving it would break partition discovery: a
    * `cell=k__old` dir makes Spark infer the `cell` partition column as
    * string instead of int). One listStatus of the parent — bounded by
    * the partition count, not the data.
    */
  def recoverChildren(fs: FileSystem, parent: Path): Unit = {
    if (fs.exists(parent)) {
      fs.listStatus(parent).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.endsWith("__old")) {
          val primary = new Path(parent, name.stripSuffix("__old"))
          if (!fs.exists(primary)) fs.rename(st.getPath, primary)
          else fs.delete(st.getPath, true)
          ()
        }
      }
    }
  }
}
