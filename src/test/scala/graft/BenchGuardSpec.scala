package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-case pins for the bench's stall guard ([[Bench.measureBlock]]) —
  * the discard/re-run policy BENCH_r06's 74.7 s stall-polluted record
  * motivated. Pure scripted sequences, no Spark.
  */
class BenchGuardSpec extends AnyFunSuite {

  private def scripted(runs: Double*): () => Double = {
    val it = runs.iterator
    () => it.next()
  }

  test("a mid-block stall run is discarded, re-run, and reported") {
    val (m, d) = Bench.measureBlock(5, 3, warm = Seq(3.0),
      scripted(2.0, 59.6, 2.1, 2.2, 1.9, 2.0))
    assert(m === Vector(2.0, 2.1, 2.2, 1.9, 2.0))
    assert(d === Vector(59.6))
  }

  test("fast blocks use the scaled 3 s floor: a sub-10 s stall run is discarded") {
    // BENCH_r07's escape: a 7 s run against a 1.3 s block min (5.4x) used
    // to survive under the fixed 10 s floor; with the scaled floor
    // (min < 2 s -> 3 s) it is discarded and re-run
    val (m, d) = Bench.measureBlock(3, 3, warm = Seq(1.4), scripted(1.3, 7.0, 1.35, 1.32))
    assert(m === Vector(1.3, 1.35, 1.32))
    assert(d === Vector(7.0))
  }

  test("the 3 s floor still protects sub-second queries' jitter from churn") {
    // 2.5 s is 12x the 0.2 s min but under the 3 s fast-block floor: kept
    val (m, d) = Bench.measureBlock(3, 3, warm = Seq(0.3), scripted(0.2, 2.5, 0.25))
    assert(m === Vector(0.2, 2.5, 0.25) && d.isEmpty)
  }

  test("slow blocks (min >= 2 s) keep the 10 s floor") {
    // 9 s is 3.5x a 2.6 s min — within 5x, and the 10 s floor holds: kept
    val (m, d) = Bench.measureBlock(3, 3, warm = Seq(2.8), scripted(2.6, 9.0, 2.7))
    assert(m === Vector(2.6, 9.0, 2.7) && d.isEmpty)
  }

  test("a genuinely slow query is never discarded (5x tracks its own floor)") {
    val (m, d) = Bench.measureBlock(3, 3, warm = Seq(40.0), scripted(35.0, 38.0, 36.0))
    assert(m === Vector(35.0, 38.0, 36.0) && d.isEmpty)
  }

  test("warmup-and-first-run both stalled: the floor reveal retro-evicts the first run too") {
    // the 80.0 was accepted under a stalled floor; the 2.0 drops
    // min-so-far, which retroactively evicts the 80.0 AND catches the
    // later 85.0 — both replaced within the re-run budget
    val (m, d) = Bench.measureBlock(3, 3, warm = Seq(90.0), scripted(80.0, 2.0, 85.0, 2.1, 1.9))
    assert(m === Vector(2.0, 2.1, 1.9))
    assert(d === Vector(80.0, 85.0))
  }

  test("BENCH_r10 q79 case: stalled FIRST measured run, floor revealed at run 2+") {
    // 19.2 survives its own acceptance (limit = 5 x 19.2); run 2's 3.5
    // reveals the block floor (limit = 17.5) and evicts it retroactively
    val (m, d) = Bench.measureBlock(5, 3, warm = Seq(20.0),
      scripted(19.2, 3.5, 3.6, 3.7, 3.4, 3.55))
    assert(m === Vector(3.5, 3.6, 3.7, 3.4, 3.55))
    assert(d === Vector(19.2))
  }

  test("retro-eviction respects the exhausted re-run budget") {
    // both 80.0 and 85.0 are accepted under the stalled floor; when
    // 2.0 reveals it, the budget of 1 evicts only the first — the
    // second stands and lands in the medians honestly
    val (m, d) = Bench.measureBlock(3, 1, warm = Seq(90.0), scripted(80.0, 85.0, 2.0, 2.1))
    assert(d === Vector(80.0))
    assert(m === Vector(85.0, 2.0, 2.1))
  }

  test("a stalled first measured run IS caught when the warmup revealed the floor") {
    val (m, d) = Bench.measureBlock(3, 3, warm = Seq(2.0), scripted(80.0, 2.1, 2.2, 1.9))
    assert(m === Vector(2.1, 2.2, 1.9))
    assert(d === Vector(80.0))
  }

  test("a stall outlasting the re-run budget lands in the medians instead of looping") {
    val (m, d) = Bench.measureBlock(4, 2, warm = Seq(1.0),
      scripted(50.0, 51.0, 52.0, 53.0, 54.0, 55.0))
    assert(d === Vector(50.0, 51.0)) // budget of 2 spent
    assert(m === Vector(52.0, 53.0, 54.0, 55.0)) // rest recorded honestly
  }

  test("maxReruns = 0 disables the guard entirely") {
    val (m, d) = Bench.measureBlock(2, 0, warm = Seq(1.0), scripted(99.0, 1.1))
    assert(m === Vector(99.0, 1.1) && d.isEmpty)
  }
}
