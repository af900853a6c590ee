package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the sf1 bench verdict machinery (Bench.scala), the part of
  * the artifact a judge adjudicates without re-running anything. Round 15
  * published two FALSE `regressed` stamps (d03, d05) because sustained
  * external contention inflates task time too; these tests pin the
  * round-16 contract:
  *
  *  - a planted regression on a QUIET machine still stamps `regressed`;
  *  - the same observation under measured external contention stamps
  *    `suspect_load`, never `regressed`;
  *  - the re-time trigger is band-relative, so sub-3 s banded entries
  *    (d30, band 1.0 s) get a second observation too;
  *  - headline selection considers SUCCESSFUL runs only, and an entry is
  *    a failure only when no run succeeded (round-16 ADVICE: a throwing
  *    retry must not discard a positive first measurement).
  */
class BenchSpec extends AnyFunSuite {

  private val cpus = 32
  // a real banded entry so the tests exercise the production map
  private val banded = "d03_dedup_minhash"
  private val (bandWall, bandTask) = Bench.sf1Bands(banded)

  test("in-band wall stamps in_band regardless of load") {
    val e = Bench.Sf1Entry(banded, bandWall, 0L, bandTask, Seq(bandWall), extCores = 30.0)
    assert(Bench.sf1Verdict(e, cpus) == "in_band")
  }

  test("wall out, task in band stamps load_inflated") {
    val e = Bench.Sf1Entry(banded, 3 * bandWall, 0L, bandTask, Seq(3 * bandWall), extCores = 0.0)
    assert(Bench.sf1Verdict(e, cpus) == "load_inflated")
  }

  test("planted regression on a quiet machine stamps regressed") {
    // both wall and task 2x the band, zero external CPU demand — the
    // unpersist-d03's-signature-frame scenario the verdict must catch
    val e = Bench.Sf1Entry(banded, 2 * bandWall, 0L, 2 * bandTask,
      Seq(2 * bandWall), extCores = 0.0)
    assert(Bench.sf1Verdict(e, cpus) == "regressed")
  }

  test("same observation under external contention stamps suspect_load") {
    // the round-15 false-alarm scenario: another tenant holding 20+ cores
    val e = Bench.Sf1Entry(banded, 2 * bandWall, 0L, 2 * bandTask,
      Seq(2 * bandWall), extCores = 20.0)
    assert(Bench.sf1Verdict(e, cpus) == "suspect_load")
  }

  test("unavailable contention signal keeps the strict stamp") {
    val e = Bench.Sf1Entry(banded, 2 * bandWall, 0L, 2 * bandTask,
      Seq(2 * bandWall), extCores = -1.0)
    assert(Bench.sf1Verdict(e, cpus) == "regressed")
  }

  test("failed entry stamps failed; unbanded stamps no_band") {
    val f = Bench.Sf1Entry(banded, -1.0, 0L, 0L, Seq(-1.0), extCores = 0.0)
    assert(Bench.sf1Verdict(f, cpus) == "failed")
    val u = Bench.Sf1Entry("zz_not_a_real_entry", 1.0, 0L, 1000L, Seq(1.0), 0.0)
    assert(Bench.sf1Verdict(u, cpus) == "no_band")
  }

  test("re-time trigger is band-relative, with 3 s absolute only for unbanded") {
    // d30's band is 1.0 s: a 1.8 s first wall (r15's load-inflated
    // observation) must now earn a second observation
    val (d30Wall, _) = Bench.sf1Bands("d30_minhash_error")
    assert(d30Wall == 1.0)
    assert(Bench.needsRetime("d30_minhash_error", 1.8))
    assert(!Bench.needsRetime("d30_minhash_error", 1.4))
    // a banded entry inside 1.5x its band never re-times, even over 3 s
    val (d05Wall, _) = Bench.sf1Bands("d05_ngram_jaccard")
    assert(!Bench.needsRetime("d05_ngram_jaccard", 1.4 * d05Wall))
    assert(Bench.needsRetime("d05_ngram_jaccard", 1.6 * d05Wall))
    // unbanded entries keep the absolute rule
    assert(Bench.needsRetime("zz_not_a_real_entry", 3.5))
    assert(!Bench.needsRetime("zz_not_a_real_entry", 2.5))
  }

  test("selectSf1 picks the best SUCCESSFUL run; a failed retry is not a failure") {
    val good = Bench.Sf1Run(5.0, 10L, 1000L, ok = true, extCores = 0.0)
    val badRetry = Bench.Sf1Run(0.3, 2L, 50L, ok = false, extCores = 0.0)
    val (e, allFailed) = Bench.selectSf1("x", Seq(good, badRetry))
    assert(!allFailed)
    assert(e.wall == 5.0)
    assert(e.walls == Seq(5.0)) // walls report successful runs only
    assert(e.taskMs == 1000L)
  }

  test("selectSf1 min among successes when both succeed") {
    val a = Bench.Sf1Run(5.0, 10L, 1000L, ok = true, extCores = 4.0)
    val b = Bench.Sf1Run(3.0, 8L, 800L, ok = true, extCores = 1.0)
    val (e, allFailed) = Bench.selectSf1("x", Seq(a, b))
    assert(!allFailed)
    assert(e.wall == 3.0 && e.taskMs == 800L && e.extCores == 1.0)
    assert(e.walls == Seq(5.0, 3.0))
  }

  test("selectSf1 reports failure only when no run succeeded") {
    val bad = Bench.Sf1Run(0.3, 2L, 50L, ok = false, extCores = 0.0)
    val (e, allFailed) = Bench.selectSf1("x", Seq(bad))
    assert(allFailed)
    assert(e.wall == -1.0 && e.walls == Seq(-1.0))
  }

  test("heavyCoverageGaps fires on a non-member heavier than 1.5x the slowest member") {
    val heavy = Seq("d22_keep_best", "d35_ivfpq_curve")
    val walls = Seq(
      "d22_keep_best" -> 2.5, "d35_ivfpq_curve" -> 4.0,
      "new_heavy_entry" -> 6.5, // > 4.0 * 1.5 — the silent miss the audit exists for
      "x13_dedup_closed_split" -> 2.4, // heavy-ish but under the margin
      "y06_stream_interval_outer" -> 11.5, // y-family: excluded by design
      "broken_entry" -> -1.0)
    assert(Bench.heavyCoverageGaps(walls, heavy) == Seq("new_heavy_entry"))
  }

  test("heavyCoverageGaps is quiet when every heavy entry is a member") {
    val heavy = Seq("a", "b")
    assert(Bench.heavyCoverageGaps(
      Seq("a" -> 3.0, "b" -> 2.0, "c" -> 4.4, "y01_x" -> 9.0), heavy).isEmpty)
    // no member measured (all failed) => nothing comparable, no gaps
    assert(Bench.heavyCoverageGaps(Seq("a" -> -1.0, "c" -> 9.0), heavy).isEmpty)
  }
}
