package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench's contention verdict — the r9 failure mode was a driver
  * run that overlapped other load and filed uniform 1.3–5× phantom
  * "regressions"; the verdict must flag exactly that shape without
  * false-positiving on a quiet run's normal noise.
  */
class BenchContentionSpec extends AnyFunSuite with Matchers {

  test("quiet run: spreads near 1, stable sentinel → not contended") {
    val spreads = Seq.fill(60)(1.05) ++ Seq(1.3, 1.6) // two noisy queries
    Bench.contentionVerdict(1.1, spreads, reps = 3) shouldBe false
  }

  test("deliberately-loaded run flags itself: broad median inflation") {
    // the r9 shape: code-unchanged queries uniformly 1.3-1.5x slower —
    // under 3 reps that appears as median/min > 1.5 across the board
    val spreads = Seq.fill(40)(1.8) ++ Seq.fill(20)(1.2)
    Bench.contentionVerdict(1.0, spreads, reps = 3) shouldBe true
  }

  test("deliberately-loaded run flags itself: sentinel drift") {
    // load arriving mid-suite: per-query spreads may stay clean (each
    // query's three reps are equally slow) but the fixed probe drifts
    Bench.contentionVerdict(2.0, Seq.fill(60)(1.0), reps = 3) shouldBe true
  }

  test("2-rep runs never use spread (median includes warm-up residue)") {
    Bench.contentionVerdict(1.0, Seq.fill(60)(2.5), reps = 2) shouldBe false
    // ...but the sentinel still works at any rep count
    Bench.contentionVerdict(1.6, Seq.fill(60)(1.0), reps = 2) shouldBe true
  }

  test("median: odd and even counts") {
    Bench.median(Seq(3.0, 1.0, 2.0)) shouldBe 2.0
    Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) shouldBe 2.5
  }
}
