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

  test("BenchDiff.warmthFindings: flags base disagreements, worst first; agreement and missing queries stay silent") {
    val prevMin = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0)
    val curMin = Map("a" -> 1.6, "b" -> 1.1, "c" -> 3.0, "d" -> 1.0)
    val prevIso = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val curIso = Map("a" -> 0.9, "b" -> 1.05, "c" -> 1.0)
    // a: min 1.6x vs iso 0.9x (1.78x apart) — warmth; b: 1.1 vs 1.05 —
    // agreement; c: 3.0 vs 1.0 (3x apart) — worst, sorts first; d has
    // no isolated number — silent (absence of evidence flags nothing)
    val w = BenchDiff.warmthFindings(prevMin, curMin, prevIso, curIso)
    assert(w.map(_._1) === Seq("c", "a"))
    assert(w.head._2 === 3.0 && w.head._3 === 1.0)
    // a failed (-1) query never divides into a ratio
    val wf = BenchDiff.warmthFindings(Map("x" -> -1.0), Map("x" -> 2.0),
      Map("x" -> 1.0), Map("x" -> 1.0))
    assert(wf.isEmpty)
  }

  // ===== BenchDiff: the round-over-round per-query regression gate =====

  test("benchdiff: an intentional 2.5x regression is flagged; noise and floor are not") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 0.10, "q_d" -> 3.0)
    val cur = Map("q_a" -> 2.5,  // real regression: > 2x AND >= 0.5 s
      "q_b" -> 1.9,              // inside the 2x factor: not flagged
      "q_c" -> 0.30,             // 3x but under the 0.5 s floor: box noise
      "q_d" -> 2.9)              // faster: never flagged
    val r = BenchDiff.compare(prev, cur)
    assert(r.regressions.map(_.name) === Seq("q_a"))
    assert(r.gateFailed)
    assert(BenchDiff.compare(prev, prev).gateFailed === false)
  }

  test("benchdiff: failure sentinel, removal, and addition semantics") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_gone" -> 1.0)
    val cur = Map("q_a" -> 1.1, "q_b" -> -1.0, "q_new" -> 9.0)
    val r = BenchDiff.compare(prev, cur)
    assert(r.failures.map(_.name) === Seq("q_b")) // sentinel beats any floor
    assert(r.removed.map(_.name) === Seq("q_gone")) // silent coverage loss is loud
    assert(r.added.map(_.name) === Seq("q_new")) // reported, never gates
    assert(r.regressions.isEmpty) // q_new has no baseline to regress from
    assert(r.gateFailed)
    // a query failing in BOTH rounds is not re-flagged (nothing new), and
    // its recovery is not a regression even though -1 -> healthy "grew"
    val both = BenchDiff.compare(Map("q_x" -> -1.0), Map("q_x" -> -1.0))
    assert(!both.gateFailed)
    val rec = BenchDiff.compare(Map("q_x" -> -1.0), Map("q_x" -> 5.0))
    assert(!rec.gateFailed)
  }

  test("benchdiff: uniform 1.3x drift is box condition (no flag); a single-query 2.5x flags") {
    // 12 shared queries — enough for the median ratio to engage as a
    // load signal (MinDriftQueries)
    val prev = (1 to 12).map(i => s"q_$i" -> 1.0).toMap
    // the whole suite 1.3x slower on untouched code: the r12 drift band.
    // Without normalization q_1..q_12 would each sit at 1.3 < 2x (fine),
    // but ANY real query near the factor would tip — so pin the stronger
    // property: a 2.5x-raw query in a 1.3x-drift band normalizes to
    // ~1.9x and does NOT flag, while the same 2.5x in a flat band does.
    val drifted = prev.map { case (k, v) => k -> v * 1.3 }
    val rd = BenchDiff.compare(prev, drifted)
    assert(math.abs(rd.drift - 1.3) < 1e-9)
    assert(!rd.gateFailed && rd.regressions.isEmpty)
    // uniform drift band + one genuinely regressed query: the median is
    // still the band (11 of 12 at 1.3), the outlier faces the gate at
    // 2.5/1.3 ≈ 1.9x… which is the honest verdict — within 2x of the
    // band-adjusted baseline. Crank it to 3.5x raw: flags.
    val oneBad = drifted + ("q_1" -> 3.5)
    val rb = BenchDiff.compare(prev, oneBad)
    assert(rb.regressions.map(_.name) === Seq("q_1"))
    // flat band, single-query 2.5x: flags exactly that query
    val flatBad = prev + ("q_1" -> 2.5)
    val rf = BenchDiff.compare(prev, flatBad)
    assert(rf.drift === 1.0)
    assert(rf.regressions.map(_.name) === Seq("q_1"))
    // a tiny artifact cannot normalize its own regression away: 4
    // queries is under MinDriftQueries, drift stays 1
    val small = BenchDiff.compare(Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0,
      "d" -> 1.0), Map("a" -> 2.5, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0))
    assert(small.drift === 1.0 && small.regressions.map(_.name) === Seq("a"))
    // drift is clamped: a 3.5x "band" is not plausibly box condition, so
    // at most MaxDrift (1.5) is divided out and the residual 2.33x still
    // faces — and fails — the 2x gate
    val wild = BenchDiff.compare(prev, prev.map { case (k, v) => k -> v * 3.5 })
    assert(wild.drift === BenchDiff.MaxDrift)
    assert(wild.regressions.size === 12)
  }

  test("render: isolated artifacts carry the basis marker; default stays byte-identical") {
    val rs = Seq(Bench.QueryResult("q_a", Seq(1.5), failed = false))
    val plain = Bench.render(rs, 1, "sf", sentinel = Some((0.7, 0.8)))
    val iso = Bench.render(rs, 1, "sf", sentinel = Some((0.7, 0.8)),
      isolated = true)
    assert(!plain.contains("isolated"))
    assert(iso.contains("\"isolated\":true"))
    // marker sits inside the one-line JSON object, parseable as such
    assert(iso.startsWith("{") && iso.endsWith("}"))
  }

  test("benchdiff: sentinel caps normalization — uniform regression can't hide") {
    val prev = (1 to 12).map(i => s"q_$i" -> 1.0).toMap
    // everything uniformly 2.2x slower. Median alone would clamp to
    // MaxDrift (1.5) and normalize to 1.47x — passing. The sentinel
    // (engine-independent) says the box only drifted 1.05x: a genuine
    // uniform regression. Normalization is capped at 1.05, residual
    // ~2.1x faces and fails the gate on every query.
    val cur = prev.map { case (k, v) => k -> v * 2.2 }
    val r = BenchDiff.compare(prev, cur, sentinelRatio = Some(1.05))
    assert(math.abs(r.drift - 1.05) < 1e-9)
    assert(r.regressions.size === 12)
    // same uniform 1.3x band WITH a matching sentinel: true box drift,
    // normalized away exactly as before
    val drifted = prev.map { case (k, v) => k -> v * 1.3 }
    val ok = BenchDiff.compare(prev, drifted, sentinelRatio = Some(1.32))
    assert(math.abs(ok.drift - 1.3) < 1e-9 && !ok.gateFailed)
    // sentinel faster (cur box LESS loaded) while queries look flat:
    // drift clamps to the sentinel side of 1, never amplifies flags
    val fast = BenchDiff.compare(prev, prev, sentinelRatio = Some(0.8))
    assert(fast.drift === 1.0 && !fast.gateFailed)
    // artifact parse: sentinel fields surface as the first/last mean
    val art = BenchDiff.parseArtifact(
      """{"metric":"total","value":3.0,"unit":"sec","queries":{"a":3.0},""" +
        """"sentinel_first":0.70,"sentinel_last":0.74,"sf":"x"}""")
    assert(art.sentinel.exists(s => math.abs(s - 0.72) < 1e-9))
  }

  test("benchdiff flake-retry: cleared in isolation downgrades; reproduced stays fatal") {
    // 12 shared queries so drift engages as in the real gate
    val prev = (1 to 12).map(i => s"q_$i" -> 1.0).toMap
    val cur = prev ++ Map("q_1" -> 2.6, "q_2" -> 2.7) // two raw flags, flat band
    val r0 = BenchDiff.compare(prev, cur)
    assert(r0.regressions.map(_.name) === Seq("q_1", "q_2"))
    // q_1 retried clean (1.1 s — inside the gate): cleared to a flake.
    // q_2 reproduces its slow time in isolation: the flag stands, now
    // carrying the isolated time as evidence.
    val r = BenchDiff.applyRetry(r0, Map("q_1" -> 1.1, "q_2" -> 2.8))
    assert(r.flakes.map(_.name) === Seq("q_1"))
    assert(r.flakes.head.retried === 1.1)
    assert(r.regressions.map(_.name) === Seq("q_2"))
    assert(r.regressions.head.retried === 2.8)
    assert(r.gateFailed) // q_2 still fails the gate
    // both clear -> gate passes, both reported as flakes (loud, non-fatal)
    val rc = BenchDiff.applyRetry(r0, Map("q_1" -> 1.0, "q_2" -> 0.9))
    assert(!rc.gateFailed && rc.flakes.map(_.name) === Seq("q_1", "q_2"))
    // retried time under the minSec floor clears even if the ratio is big
    val prevTiny = prev + ("q_1" -> 0.1)
    val r1 = BenchDiff.compare(prevTiny, prevTiny + ("q_1" -> 0.9))
    assert(r1.regressions.map(_.name) === Seq("q_1"))
    assert(!BenchDiff.applyRetry(r1, Map("q_1" -> 0.3)).gateFailed)
    // a flagged query the retry map does not cover keeps its flag —
    // absence of evidence never clears a gate
    val rm = BenchDiff.applyRetry(r0, Map("q_1" -> 1.0))
    assert(rm.regressions.map(_.name) === Seq("q_2"))
    assert(rm.regressions.head.retried.isNaN && rm.gateFailed)
    // the retry re-applies the NORMALIZED gate: in a 1.3x drift band a
    // retried 2.5x raw (≈1.9x normalized) clears
    val drifted = prev.map { case (k, v) => k -> v * 1.3 } + ("q_1" -> 3.5)
    val rd0 = BenchDiff.compare(prev, drifted)
    assert(rd0.regressions.map(_.name) === Seq("q_1"))
    assert(!BenchDiff.applyRetry(rd0, Map("q_1" -> 2.5)).gateFailed)
  }

  test("sentinel: recorded when present, byte-identical format when absent") {
    val plain = Bench.render(Seq(ok1, ok2), reps = 1, sfDir = "/d")
    assert(!plain.contains("sentinel"))
    val withS = Bench.render(Seq(ok1, ok2), reps = 1, sfDir = "/d",
      sentinel = Some((1.25, 1.5)))
    assert(withS.contains("\"sentinel_first\":1.25"), withS)
    assert(withS.contains("\"sentinel_last\":1.5"), withS)
    // sentinel fields ride between the query maps and "sf" — the driver
    // greps "metric"/"value"/"queries", all untouched
    assert(withS.replace(""","sentinel_first":1.25,"sentinel_last":1.5""", "")
      === plain)
  }

  test("benchdiff: parses the render() artifact, prefers queries_min, survives log noise") {
    val art = Bench.render(Seq(ok1, ok2), reps = 3, sfDir = "/d")
    val parsed = BenchDiff.parseArtifact(
      "WARN some spark log line\n" + art + "\ntrailing noise")
    assert(parsed.median === Map("q_a" -> 2.0, "q_b" -> 4.0))
    assert(parsed.min === Some(Map("q_a" -> 1.0, "q_b" -> 4.0)))
    val oneRep = BenchDiff.parseArtifact(Bench.render(Seq(ok1), reps = 1, "/d"))
    assert(oneRep.min.isEmpty) // 1-rep artifacts fall back to medians
  }
}
