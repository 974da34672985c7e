package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TokenBatterySpec extends SparkSpec {
  import spark.implicits._

  private val sw = graft.llm.TextStats.enStopwords

  /** The exact higher-order-function composition token_battery replaced
    * (Streams.qualityCols pre-r21) — the equality oracle here.
    */
  private def viaBuiltins(df: org.apache.spark.sql.DataFrame) = {
    val swLit = typedLit(sw)
    val ts = split(trim(col("s")), "\\s+")
    df.select(
      size(ts).cast("long").as("n_tok"),
      aggregate(ts, lit(0L), (a, x) => a + length(x)).as("chars"),
      size(filter(ts, t => array_contains(swLit, t))).cast("long").as("stop"),
      array_max(transform(array_distinct(ts),
        t => size(filter(ts, x => x === t)))).cast("long").as("mx"))
  }

  private def viaNative(df: org.apache.spark.sql.DataFrame) = {
    val b = TokenBattery.battery(col("s"), sw)
    df.select(b.getField("n_tok").as("n_tok"), b.getField("chars").as("chars"),
      b.getField("stop").as("stop"), b.getField("mx").as("mx"))
  }

  test("token_battery is bit-identical to the HOF composition (random + adversarial)") {
    val rng = new scala.util.Random(1234)
    val wsChars = " \t\n\f\r"
    val words = Vector("the", "and", "of", "to", "a", "data", "spark", "engine",
      "x", "ünïcödé", "你好", "", "THE", "And")
    def randDoc(): String = {
      val n = rng.nextInt(40)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        if (rng.nextInt(4) == 0)
          sb.append(wsChars(rng.nextInt(wsChars.length)))
        sb.append(words(rng.nextInt(words.length)))
        sb.append(wsChars(rng.nextInt(wsChars.length)))
      }
      sb.toString
    }
    val docs = (1 to 400).map(_ => randDoc()) ++ Seq(
      "", " ", "\t", "  \t  ", "a", " a ", "\ta\t", "a b  c", "the the the",
      "x\f y\r", "word\n\nword", "你好 你好 world", "a\tb\ncd\fe\rf",
      "trailing tab\t", "\tleading tab", "only    spaces   here")
    val df = docs.toDF("s")
    assert(viaNative(df).collect().map(_.toSeq).toSeq ===
      viaBuiltins(df).collect().map(_.toSeq).toSeq)
  }

  test("token_battery: null in, null out; survives whole-stage codegen") {
    val df = spark.range(60)
      .select(when(col("id") % 5 === 0, lit(null))
        .otherwise(concat(lit("tok "), col("id"), lit(" the and"))).as("s"))
    val b = TokenBattery.battery(col("s"), sw)
    val out = df.select(b.getField("n_tok").as("n"), b.getField("stop").as("st"))
    val rows = out.collect()
    assert(rows.count(_.isNullAt(0)) === 12, "null in → null out")
    assert(rows.filter(!_.isNullAt(0)).forall(r => r.getLong(0) === 4L && r.getLong(1) === 2L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(400))
  }

  test("token_battery: route verdicts through qualityCols are unchanged shapes") {
    // spot-pin the reason chain on synthetic docs that hit each rule
    val docs = Seq(
      ("short doc", "ntok"),                                    // n < 50
      (("the " * 60).trim, "dom"),                              // one dominant token
      (Seq.tabulate(60)(i => s"word$i").mkString(" "), "stop"), // no stopwords
      (Seq.tabulate(60)(i => if (i % 3 == 0) "the" else s"verylongtoken$i" * 2)
        .mkString(" "), "wlen")                                 // avg word len > 10
    ).toDF("text", "expected")
    val (_, reason) = graft.streaming.Streams.qualityCols(col("text"))
    val got = docs.select(col("expected"), reason.as("got")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }
}
