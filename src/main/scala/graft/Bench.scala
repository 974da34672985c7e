package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization of all output
  * columns via a noop-format write (a bare `count()` would let Catalyst
  * prune the projection and under-measure). Prints ONE JSON line.
  *
  * Measurement protocol (adaptive since round 7 — the fixed
  * 1-warm+3-timed protocol stopped fitting the driver's wall budget at
  * 136 registered queries: 4 full passes ≈ 430 s of query time):
  *
  *   1. One COLD pass per query, timed. The cold time is the warm-up
  *      (Janino codegen, file listing) and the scheduling signal; it is
  *      never folded into the reported median.
  *   2. Queries whose cold run took ≥ 0.5 s get ONE timed rep (they are
  *      long enough that scheduler noise is a small fraction); queries
  *      under 0.5 s get TWO timed reps (capped by `SPARK_GRAFT_REPS`-1)
  *      and report the median — short queries are where a single noisy
  *      measurement can swing 2-3×.
  *   3. A global budget (`SPARK_GRAFT_BUDGET_SEC`, default 210 s of
  *      bench-phase wall) guards the artifact's existence: once elapsed
  *      exceeds it, remaining queries report their cold time directly
  *      (flagged `"cold_only":true` in the spread) instead of running
  *      extra reps. A degraded-but-parsed artifact beats an rc=124 one.
  *
  * Per-query spread carries min/max of the timed reps plus the cold
  * time, so a reader can still judge noise. Host-speed calibration
  * (fixed keys `calib_1t`/`calib_nt`/`n_threads`) lets totals be
  * normalized across rounds and hosts; the LCG loop is JIT-warmed once
  * untimed so the 1-thread number measures the host, not the compiler.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private val SlowThresh = 0.5 // cold secs above which 1 timed rep suffices

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxReps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BUDGET_SEC", "210").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup outside timing: session init, file listing.
    Tables.all.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }

    val benchT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchT0) / 1e9

    // cold: the first (codegen-charged) run; times: the timed reps.
    // A rep that THROWS is not a measurement: its elapsed time is
    // discarded (failure latency folded into a median would make a
    // broken query look like a timed one) and the error prints once.
    case class QRes(name: String, cold: Option[Double], times: Seq[Double],
                    attempted: Int, coldOnly: Boolean) {
      // Median of timed reps; a budget-degraded query falls back to its
      // cold time rather than reporting nothing.
      def measurement: Option[Double] =
        if (times.nonEmpty) Some(median(times)) else cold
    }

    val results = SparkEntry.registry.map { q =>
      var reported = false
      def runOnce(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          if (!reported) {
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            reported = true
          }
          None
        }
      }
      val cold = runOnce()
      val overBudget = elapsed > budgetSec
      val extraReps = cold match {
        case None => 1 // one retry distinguishes transient from broken
        case Some(_) if overBudget => 0
        case Some(c) if c >= SlowThresh => 1
        case Some(_) => (maxReps - 1).min(2).max(1)
      }
      // Reps run back-to-back per query so the spread reflects noise at
      // one point in time, not drift across the whole pass.
      val times = (1 to extraReps).flatMap(_ => runOnce())
      // each rep's spill-backed plans (t15/d8/d20) are consumed by the
      // noop write above — reclaim them outside the timed region so reps
      // don't accumulate one tokenized-corpus copy apiece
      graft.llm.Dedup.releaseSpills(spark)
      QRes(q.name, cold, times, extraReps, cold.isDefined && overBudget)
    }

    // Locale.ROOT: default-locale format would emit comma decimals on
    // e.g. de_DE JVMs and corrupt the JSON artifact
    def fmt(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { r =>
      "\"" + r.name + "\":" + r.measurement.fold("null")(fmt)
    }.mkString("{", ",", "}")
    val spread = results.map { r =>
      if (r.measurement.isEmpty) "\"" + r.name + "\":{\"failed\":true}"
      else {
        val body = new StringBuilder
        if (r.times.nonEmpty)
          body ++= "\"min\":" + fmt(r.times.min) + ",\"max\":" + fmt(r.times.max)
        r.cold.foreach { c =>
          if (body.nonEmpty) body ++= ","
          body ++= "\"cold\":" + fmt(c)
        }
        body ++= ",\"reps_used\":" + r.times.length
        if (r.coldOnly) body ++= ",\"cold_only\":true"
        if (r.times.length < r.attempted)
          body ++= ",\"failed_reps\":" + (r.attempted - r.times.length)
        "\"" + r.name + "\":{" + body + "}"
      }
    }.mkString("{", ",", "}")
    val failed = results.count(_.measurement.isEmpty)
    val degraded = results.count(_.coldOnly)
    val total = results.flatMap(_.measurement).sum
    val benchWall = elapsed
    // Host-speed calibration: a fixed single-thread LCG loop and the same
    // loop on every core. Round-4/5/6 adjudications kept re-litigating
    // "is this regression or a slow host" — these two denominators let a
    // reader NORMALIZE totals across rounds (calib_1t ≈ core speed;
    // calib_nt/calib_1t ≫ 1 ⇒ the box was oversubscribed during the run).
    def lcgLoop(): Double = {
      val t0 = System.nanoTime()
      var x = 12345L; var i = 0
      while (i < 200000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
      if (x == 42L) System.err.println("") // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    lcgLoop() // JIT warm-up: untimed, so calib_1t measures the host not the compiler
    val calib1 = lcgLoop()
    val nThreads = Runtime.getRuntime.availableProcessors()
    val calibN = {
      val t0 = System.nanoTime()
      val threads = (1 to nThreads).map(_ => new Thread(() => { lcgLoop(); () }))
      threads.foreach(_.start()); threads.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","protocol":"adaptive_r7","max_reps":$maxReps,"budget_sec":$budgetSec,"bench_wall_sec":${fmt(benchWall)},"failed":$failed,"cold_only":$degraded,"n_threads":$nThreads,"calib_1t":${fmt(calib1)},"calib_nt":${fmt(calibN)},"queries":$qs,"spread":$spread,"sf":"$sfDir"}"""
    println(line)
    // The driver's log capture keeps only a 2000-char stdout tail — far
    // smaller than a 162-query JSON line — so also persist the artifact
    // whole. SPARK_GRAFT_BENCH_OUT overrides the default path.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p, line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
