package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable keyed-state ledger backed by versioned parquet — the
  * production shape of the `getState`/`setState` contract the streaming
  * entry points take (tests also use an in-memory swap). Each `set`
  * writes a fresh `v<N>` directory and then flips a tiny CURRENT pointer
  * file, so a reader never observes a half-written snapshot and a crash
  * mid-write leaves the previous version intact. Combined with a
  * checkpointed source and the [[IdempotentMerge]] watermark column —
  * which this ledger PERSISTS — merged state survives JVM restarts
  * exactly-once, and a re-delivered batch after a lost checkpoint is
  * still a no-op because the watermark rides in the parquet itself.
  *
  * The pointer flip is delete-then-rename (not atomic on every FS): a
  * crash in the window between the two leaves no CURRENT file. Each
  * version therefore also carries a `_GRAFT_COMMITTED` marker written
  * after its parquet job completes and before the pointer flip, and a
  * reader that finds no (valid) pointer recovers the highest marked
  * version instead of silently falling back to `initial` — so the crash
  * window can only ever surface the snapshot being committed or its
  * predecessor, never lose committed state.
  *
  * At cluster scale a transactional table format (Delta/Iceberg) owns
  * this commit protocol; this is the same idea with a pointer file, and
  * the delete+rename pointer flip assumes a single writer (true for a
  * streaming query's foreachBatch, which Spark serializes per query).
  */
class ParquetLedger(spark: SparkSession, dir: String, initial: DataFrame) {

  private val root = new Path(dir)
  private def fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def pointer = new Path(root, "CURRENT")
  private def versionDir(v: Int) = new Path(root, s"v$v")
  private def marker(v: Int) = new Path(versionDir(v), "_GRAFT_COMMITTED")

  /** Highest fully-committed version: the pointer when it exists and
    * names a version whose directory is present (marker NOT required on
    * this path — ledgers written before the marker existed stay
    * readable); otherwise a recovery scan over `v<N>` dirs for the
    * highest commit marker (covers a crash between the pointer delete
    * and rename, and a torn/corrupt pointer write).
    *
    * Two pointer-failure modes are distinguished: a pointer that
    * VANISHES between `exists` and `open` is a reader racing the
    * writer's delete→rename flip — the marker scan is the designed
    * recovery path. A pointer that is PRESENT but unreadable (torn
    * write / dangling version) on a ledger with version dirs but no
    * markers is a pre-marker ledger whose committed version can no
    * longer be determined — that reader fails loudly rather than
    * silently resetting committed state to `initial`.
    */
  private def currentVersion: Option[Int] = {
    var sawPointer = false
    val fromPointer =
      try {
        if (!fs.exists(pointer)) None
        else {
          sawPointer = true
          val in = fs.open(pointer)
          val txt = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
          Some(txt.toInt).filter(v => fs.exists(versionDir(v)))
        }
      } catch {
        case _: java.io.FileNotFoundException =>
          // vanished between exists and open: the writer's pointer flip
          // in flight — recover from the markers like a missing pointer
          sawPointer = false; None
        case _: NumberFormatException => None // torn/corrupt pointer write
      }
    fromPointer.orElse(recoverVersion).orElse {
      val existing = listVersions
      if (sawPointer && existing.nonEmpty)
        throw new IllegalStateException(
          s"ParquetLedger at $dir: CURRENT exists but is unreadable or names a missing " +
            s"version, no version carries a _GRAFT_COMMITTED marker, and version dirs " +
            s"exist (${existing.sorted.map("v" + _).mkString(", ")}) — a pre-marker " +
            "ledger with a torn pointer. Refusing to silently reset committed state to " +
            "`initial`; repair CURRENT to the committed version or remove the stale dirs.")
      None
    }
  }

  private def listVersions: Seq[Int] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }

  private def recoverVersion: Option[Int] =
    listVersions.filter(v => fs.exists(marker(v))).sorted.lastOption

  /** Latest committed snapshot, or the initial state before any commit. */
  def get(): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(versionDir(v).toString)
    case None    => initial
  }

  /** Commit a new snapshot: write `v<N+1>` fully, mark it committed,
    * then flip the pointer. `next` tops every EXISTING version dir
    * (marked or not), so a recovery that resolved an older version can
    * never clobber a newer — possibly uncommitted — directory.
    */
  def set(df: DataFrame): Unit = {
    val next = (currentVersion.toSeq ++ listVersions).foldLeft(-1)(_ max _) + 1
    df.write.mode("overwrite").parquet(versionDir(next).toString)
    fs.create(marker(next), true).close()
    val tmp = new Path(root, "CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(pointer, false)
    fs.rename(tmp, pointer)
    ()
  }
}
