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
    if (fs.exists(dst)) { fs.rename(dst, old); () }
    fs.rename(tmp, dst)
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
}
