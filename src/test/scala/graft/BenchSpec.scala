package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's machine-readable contract: a throwing query must be
  * impossible to mistake for a speedup in the JSON (its fast failure time
  * must not appear as a measurement), while healthy runs keep the exact
  * pre-sentinel format the driver parses. */
class BenchSpec extends AnyFunSuite {
  private val ok1 = Bench.QueryResult("q_a", Seq(2.0, 1.0, 3.0), failed = false)
  private val ok2 = Bench.QueryResult("q_b", Seq(4.0), failed = false)
  private val bad = Bench.QueryResult("q_c", Seq(0.01), failed = true)

  test("healthy run: no failed key, total = sum of medians") {
    val json = Bench.render(Seq(ok1, ok2), reps = 1, sfDir = "/d")
    assert(!json.contains("failed"))
    assert(json.contains("\"q_a\":2.0") && json.contains("\"q_b\":4.0"))
    assert(json.contains("\"value\":6.0"))
  }

  test("failed query: sentinels for the query AND the total, listed under failed") {
    val json = Bench.render(Seq(ok1, bad), reps = 3, sfDir = "/d")
    assert(json.contains("\"q_c\":-1.0"), json)
    assert(json.contains("\"failed\":[\"q_c\"]"), json)
    // the headline total is poisoned too: a sum-of-survivors would read
    // as a speedup (the failed query's healthy seconds just vanish)
    assert(json.contains("\"value\":-1.0"), json)
    // the min map carries the sentinel too
    assert(json.contains("\"queries_min\":{\"q_a\":1.0,\"q_c\":-1.0}"), json)
  }

  test("median: odd and even sample counts") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
  }
}
