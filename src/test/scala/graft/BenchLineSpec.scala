package graft

import org.scalatest.funsuite.AnyFunSuite

/** Length contract of Bench's stdout headline line. The harness keeps
  * only a ~2000-char tail of stdout, so Bench shrinks the line first by
  * dropping trial arrays (nTrials → 0) and only then by dropping
  * headline queries off the tail — silently. This spec pins the floor:
  * the FULL pinned headline set at nTrials=0 must fit the 1800-char
  * budget with worst-case-width numbers, so a future query rename or
  * headline addition can't push real queries out of the driver's bench
  * artifact without failing a test. */
class BenchLineSpec extends AnyFunSuite {

  test("headline names are registered queries") {
    val missing = Bench.headline.filterNot(SparkEntry.registry.contains)
    assert(missing.isEmpty, s"headline names not in the registry: $missing")
  }

  test("calibration probes are registered queries and the host block rides the line") {
    val missing = Bench.calibration.filterNot(SparkEntry.registry.contains)
    assert(missing.isEmpty, s"calibration names not in the registry: $missing")
    // the host telemetry must survive into the stdout line verbatim — the
    // judge normalizes cross-round totals from the stdout tail alone
    val host = """{"load_start":31.50,"load_end":30.25,"mem_avail_gb":97.12,""" +
      """"calib":{"table_counts":0.120,"q1_pricing_summary":0.800,"source_dsv2_scrape":0.500},""" +
      """"calib_vs_file":1.25}"""
    val line = Bench.stdoutLine(Seq("a"), 0, 1.0, Map("a" -> 1.0),
      Map("a" -> Seq(1.0)), 1, "[]", "[]", "x", 0.0, "y", "z", host)
    assert(line.contains(s""""host":$host"""), line)
  }

  test("full headline line fits the stdout budget at the nTrials=0 floor") {
    // worst realistic widths: per-query seconds up to 9999.999 (a query
    // that slow would fail the bench on wall-clock long before the line
    // width matters), a couple of errored queries per SF, a /tmp artifact
    // path of the width main actually passes
    val worstByName = Bench.headline.map(_ -> 9999.999).toMap
    val worstTrials = Bench.headline.map(_ -> Seq.fill(5)(9999.99)).toMap
    val errs = Bench.headline.take(2).map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = Bench.stdoutLine(
      Bench.headline, nTrials = 0, total = 99999.99,
      byName = worstByName, trialsByName = worstTrials,
      nQueries = 999, errs = errs, errs2 = errs,
      sfDir = "/root/testdata/sf0.1", total2 = 99999.99,
      sfDir2 = "/root/testdata/sf0.01",
      outFile = "/tmp/graft_bench_artifact_r99.json",
      host = """{"load_start":9999.99,"load_end":9999.99,"mem_avail_gb":9999.99,""" +
        """"calib":{"table_counts":9999.999,"q1_pricing_summary":9999.999,"source_dsv2_scrape":9999.999},""" +
        """"calib_vs_file":9999.99,"total_calib_norm":9999999.99}""")
    assert(line.length <= 1800,
      s"headline line is ${line.length} chars at nTrials=0 — the shrink " +
        "loop would start dropping headline queries; trim the set or names")
  }

  test("calib_vs_file: median ratio vs the committed baseline; -1 when unusable") {
    // against the real committed file (keys must stay aligned with
    // Bench.calibration — a rename there must fail here)
    val base = Bench.calibration
    val doubled = base.map(_ -> 0.0) // all failed probes → -1
    assert(Bench.calibVsBaseline(doubled) == -1.0)
    assert(Bench.calibVsBaseline(Seq.empty) == -1.0)
    assert(Bench.calibVsBaseline(base.map(_ -> 1.0), "/nonexistent.json") == -1.0)
    // exact ×2 on every probe → median exactly 2.0
    val committed = """"([a-z0-9_]+)"\s*:\s*([0-9.]+)""".r
      .findAllMatchIn(java.nio.file.Files.readString(
        java.nio.file.Paths.get("tools/calib_baseline.json")))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    assert(base.forall(committed.contains),
      s"calibration probes missing from tools/calib_baseline.json: " +
        base.filterNot(committed.contains))
    val x2 = base.map(n => n -> committed(n) * 2.0)
    assert(math.abs(Bench.calibVsBaseline(x2) - 2.0) < 1e-9)
  }

  test("adaptive retries: >2x disagreement only, slowest-first, capped") {
    // agreement within 2x → no retry; single sample → no retry
    assert(Bench.adaptiveRetries(Map(
      "steady" -> Seq(1.0, 1.9), "single" -> Seq(5.0))).isEmpty)
    // the r14 shape: a 24 s outlier on a 2.8 s query fires a retry
    assert(Bench.adaptiveRetries(Map(
      "dedup_minhash" -> Seq(2.81, 23.99))) == Seq("dedup_minhash"))
    // slowest-first under the cap: the expensive disagreement wins
    val storm = (1 to 20).map(i => s"q$i" -> Seq(i.toDouble, i * 3.0)).toMap
    val picked = Bench.adaptiveRetries(storm, cap = 3)
    assert(picked == Seq("q20", "q19", "q18"), picked.toString)
  }

  test("trial arrays attach to the slowest queries first") {
    val byName = Map("fast" -> 1.0, "slow" -> 50.0, "mid" -> 10.0)
    val trials = byName.map { case (k, v) => k -> Seq(v, v) }
    val line = Bench.stdoutLine(Seq("fast", "slow", "mid"), nTrials = 1,
      total = 61.0, byName = byName, trialsByName = trials,
      nQueries = 3, errs = "[]", errs2 = "[]", sfDir = "x", total2 = 0.0,
      sfDir2 = "y", outFile = "z")
    assert(line.contains("\"slow\":[50.00,50.00]"),
      s"slowest query must carry its trial array: $line")
    assert(!line.contains("\"fast\":[") && !line.contains("\"mid\":["),
      s"only the slowest nTrials queries may carry trials: $line")
  }
}
