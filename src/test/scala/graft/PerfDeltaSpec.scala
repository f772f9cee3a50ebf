package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The movement table Bench auto-regenerates must stay parseable and
  * honest: movers ranked by |Δ|, interference-suspect spreads visible,
  * sentinel/environment sections present, and the no-prior case
  * degrading to a cur-only summary instead of throwing.
  */
class PerfDeltaSpec extends AnyFunSuite {

  private def artifact(total: Double, qs: Map[String, Double],
      spread: Map[String, (Double, Double)] = Map.empty,
      stabilized: Seq[String] = Seq.empty,
      sentinel: Seq[Double] = Seq.empty,
      failed: Seq[String] = Seq.empty): String = {
    val q = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val sp = spread.map { case (k, (a, b)) => s""""$k":[$a,$b]""" }.mkString("{", ",", "}")
    val st = stabilized.map("\"" + _ + "\"").mkString("[", ",", "]")
    val se = sentinel.mkString("[", ",", "]")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$q,"spread":$sp,""" +
      s""""passes":3,"stabilized":$st,"failed":$fl,"sentinel":$se,""" +
      s""""jvm":{"flags":["-Xmx8g"],"max_heap_mb":8192,"version":"17"},""" +
      s""""hll_profile_max_err":0.001,"sf":"/tmp/sf"}"""
  }

  private def write(path: java.nio.file.Path, s: String): Unit =
    Files.write(path, s.getBytes(StandardCharsets.UTF_8))

  test("movers ranked by |delta|; spread ratio marks interference; new/removed listed") {
    val dir = Files.createTempDirectory("perfdelta")
    val prev = dir.resolve("prev.json"); val cur = dir.resolve("cur.json")
    val out = dir.resolve("PD.md")
    write(prev, artifact(10.0, Map("a" -> 1.0, "b" -> 2.0, "gone" -> 7.0)))
    write(cur, artifact(12.0,
      Map("a" -> 3.0, "b" -> 2.1, "new_q" -> 0.5),
      spread = Map("a" -> (2.8, 5.9), "b" -> (2.0, 2.2)),
      stabilized = Seq("a"), sentinel = Seq(0.2, 0.21, 0.19)))
    PerfDelta.write(prev.toString, cur.toString, out.toString, moverThreshold = 0.05)
    val md = Files.readString(out)
    // a (+2.00) ranks above b (+0.10); a carries its spread ratio and
    // the stabilized flag
    val ia = md.indexOf("| a | 1.00 | 3.00 | +2.00 |")
    val ib = md.indexOf("| b | 2.00 | 2.10 | +0.10 |")
    assert(ia >= 0 && ib >= 0 && ia < ib, md)
    assert(md.contains("2.80–5.90 (1.03) | yes"), md)
    assert(md.contains("new_q 0.50 s"), md)
    assert(md.contains("removed queries (1): gone"), md)
    assert(md.contains("cur sentinel passes (s): 0.20, 0.21, 0.19"), md)
    assert(md.contains("max heap 8192 MB"), md)
    // a's post-drop spread/median is 1.03 > 0.5 — it must be called out
    assert(md.contains("stabilized still > 0.5 spread/median after drop-max: a (1.03)"), md)
  }

  test("failed queries never rank as movers; 1-element spread entries don't crash") {
    val dir = Files.createTempDirectory("perfdelta3")
    val prev = dir.resolve("prev.json"); val cur = dir.resolve("cur.json")
    val out = dir.resolve("PD.md")
    // crash_q failed every cur pass (median 0.000) — without the filter
    // it would top the movers as a fake −7.0 s 'improvement'; old_fail
    // failed in PREV, so its cur number has no honest baseline either.
    // stab_q carries a malformed 1-element spread entry (hand-built /
    // older artifact) — the stabilized section must normalize, not
    // MatchError (r14 advice, both items).
    write(prev, artifact(10.0,
      Map("a" -> 1.0, "crash_q" -> 7.0, "old_fail" -> 0.0, "stab_q" -> 2.0),
      failed = Seq("old_fail")))
    write(cur, artifact(6.0,
      Map("a" -> 2.0, "crash_q" -> 0.0, "old_fail" -> 1.5, "stab_q" -> 2.0),
      spread = Map("stab_q" -> (1.0, 1.0)),
      stabilized = Seq("stab_q"), failed = Seq("crash_q")))
    val curFixed = Files.readString(cur).replace(""""stab_q":[1.0,1.0]""", """"stab_q":[1.0]""")
    write(cur, curFixed)
    PerfDelta.write(prev.toString, cur.toString, out.toString, moverThreshold = 0.05)
    val md = Files.readString(out)
    assert(md.contains("| a | 1.00 | 2.00 | +1.00 |"), md)
    assert(!md.contains("| crash_q |") && !md.contains("| old_fail |"), md)
    assert(md.contains("failed: [crash_q]"), md)
    assert(md.contains("stabilized (1): stab_q"), md)
  }

  test("sentinel stall flag needs an ABSOLUTE excursion, not ratio alone") {
    val dir = Files.createTempDirectory("perfdelta_sent")
    val prev = dir.resolve("prev.json"); val cur = dir.resolve("cur.json")
    // ratio 2.3 but max-min = 0.17 s: a steady run's ordinary jitter on
    // a ~0.15 s sentinel — must NOT flag (the r15 false positive)
    write(prev, artifact(10.0, Map("a" -> 1.0)))
    write(cur, artifact(10.0, Map("a" -> 1.0),
      sentinel = Seq(0.13, 0.30, 0.22)))
    val out1 = dir.resolve("steady.md")
    PerfDelta.write(prev.toString, cur.toString, out1.toString)
    assert(Files.readString(out1).contains("(ambient steady)"))
    // ratio 7.5 AND max-min = 1.1 s: a real stall — must flag
    write(cur, artifact(10.0, Map("a" -> 1.0),
      sentinel = Seq(0.17, 1.27, 0.2)))
    val out2 = dir.resolve("stall.md")
    PerfDelta.write(prev.toString, cur.toString, out2.toString)
    assert(Files.readString(out2).contains("interference-suspect"))
  }

  test("no prior artifact: cur-only summary, no throw") {
    val dir = Files.createTempDirectory("perfdelta2")
    val cur = dir.resolve("cur.json"); val out = dir.resolve("PD.md")
    write(cur, artifact(5.0, Map("a" -> 5.0)))
    PerfDelta.write(dir.resolve("missing.json").toString, cur.toString, out.toString)
    val md = Files.readString(out)
    assert(md.contains("no prior artifact found"), md)
    assert(md.contains("5.0 s / 1 queries"), md)
  }
}
