package graft

import org.scalatest.funsuite.AnyFunSuite

/** The retry-until-clean selection laws (r16, tightened r17): which
  * attempt the harness keeps, and what "clean" means, pinned without
  * running a bench. The policy's contract: fewest FAILED queries
  * first (an attempt's `total` excludes failed queries, so a crashed
  * run reports a smaller total and must never win on it — r16 ADVICE
  * item 2); among equal failure counts, clean before contended; then
  * minimum total. Unchecked verdicts never count as clean-by-silence
  * for the CONTENDED flag, but a fully-unchecked attempt also ends
  * the loop (nothing to retry toward). */
class BenchAttemptSpec extends AnyFunSuite {

  private def a(results: Seq[(String, Double)], still: Boolean,
      rsChecked: Boolean, rs: Boolean, psChecked: Boolean,
      ps: Boolean, failed: Seq[String] = Nil): Bench.Attempt =
    Bench.Attempt(results, failed, 0.1, 0.5, Seq(0.5), Seq(0.5),
      still, rsChecked, rs, psChecked, ps)

  /** The exact selection expression Bench.main runs. */
  private def pick(attempts: Seq[Bench.Attempt]): Bench.Attempt =
    attempts.sortBy(x => (x.failed.size, if (x.clean) 0 else 1, x.total)).head

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

  test("selection: clean attempt beats a faster flagged one; with no " +
    "clean attempt the minimum total is kept") {
    val flagged1 = a(Seq("q" -> 5.0), false, true, false, true, true)
    val clean = a(Seq("q" -> 9.0), false, true, false, true, false)
    val flagged2 = a(Seq("q" -> 3.0), false, true, false, true, true)
    assert(pick(Seq(flagged1, clean, flagged2)) == clean,
      "a clean attempt beats a faster flagged one")
    assert(pick(Seq(flagged1, flagged2)) == flagged2,
      "with no clean attempt the minimum total is kept")
  }

  test("selection: fewest failures beats both clean and smaller total " +
    "(the crashed-query blind spot, r16 ADVICE)") {
    // one query crashed: total omits it, so this attempt LOOKS fastest
    // and is even verdict-clean — it must still lose to the complete run
    val crashedButClean =
      a(Seq("q1" -> 1.0, "q2" -> -1.0), false, true, false, true, false,
        failed = Seq("q2"))
    val completeFlagged =
      a(Seq("q1" -> 4.0, "q2" -> 4.0), false, true, false, true, true)
    assert(pick(Seq(crashedButClean, completeFlagged)) == completeFlagged,
      "a complete contended attempt beats a crashed clean one")
    // among equally-failed attempts the old laws still apply
    val crashed2 =
      a(Seq("q1" -> 9.0, "q2" -> -1.0), false, true, false, true, false,
        failed = Seq("q2"))
    assert(pick(Seq(crashedButClean, crashed2)) == crashedButClean,
      "equal failure sets fall back to clean-then-min-total")
  }

  test("selection: among several clean attempts the minimum total wins") {
    val clean9 = a(Seq("q" -> 9.0), false, true, false, true, false)
    val clean4 = a(Seq("q" -> 4.0), false, true, false, true, false)
    assert(pick(Seq(clean9, clean4)) == clean4)
  }
}
