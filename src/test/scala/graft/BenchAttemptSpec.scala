package graft

import org.scalatest.funsuite.AnyFunSuite

/** The retry-until-clean selection laws (r16): which attempt the
  * harness keeps, and what "clean" means, pinned without running a
  * bench. The policy's contract: first clean attempt wins; with none
  * clean, minimum total; unchecked verdicts never count as clean-by-
  * silence for the CONTENDED flag, but a fully-unchecked attempt also
  * ends the loop (nothing to retry toward). */
class BenchAttemptSpec extends AnyFunSuite {

  private def a(results: Seq[(String, Double)], still: Boolean,
      rsChecked: Boolean, rs: Boolean, psChecked: Boolean,
      ps: Boolean): Bench.Attempt =
    Bench.Attempt(results, Nil, 0.1, 0.5, Seq(0.5), Seq(0.5),
      still, rsChecked, rs, psChecked, ps)

  private val r = Seq("q1" -> 1.0, "q2" -> 2.0, "qFail" -> -1.0)

  test("total excludes failed (-1) queries") {
    assert(a(r, false, true, false, true, false).total == 3.0)
  }

  test("clean = no backoff exhaustion, no run steal, no phase steal") {
    assert(a(r, false, true, false, true, false).clean)
    assert(!a(r, true, true, false, true, false).clean)   // backoff exhausted
    assert(!a(r, false, true, true, true, false).clean)   // run steal
    assert(!a(r, false, true, false, true, true).clean)   // phase steal
    // unchecked verdicts: the attempt reads clean (contended false) —
    // the JSON carries run_steal:null so a reader sees it was unchecked
    assert(a(r, false, false, false, false, false).clean)
  }

  test("selection: first clean attempt wins; else minimum total") {
    val flagged1 = a(Seq("q" -> 5.0), false, true, false, true, true)
    val clean = a(Seq("q" -> 9.0), false, true, false, true, false)
    val flagged2 = a(Seq("q" -> 3.0), false, true, false, true, true)
    val attempts = Seq(flagged1, clean, flagged2)
    // the policy in Bench.main: find(_.clean) getOrElse minBy(_.total)
    assert(attempts.find(_.clean).contains(clean),
      "a clean attempt beats a faster flagged one")
    val allFlagged = Seq(flagged1, flagged2)
    assert(allFlagged.find(_.clean).isEmpty &&
      allFlagged.minBy(_.total) == flagged2,
      "with no clean attempt the minimum total is kept")
  }
}
