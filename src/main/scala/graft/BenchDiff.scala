package graft

import scala.util.Try

/** Round-over-round PER-QUERY regression gate over the committed
  * `BENCHFULL_r{N}.json` artifacts ([[Bench.render]]'s one-line
  * contract) — the audit the r10/r11 verdicts had to do by hand from
  * 2000-char log tails, turned into a non-zero-exit check.
  *
  * `compare` is pure: given the previous and current per-query seconds,
  * it flags
  *  - REGRESSIONS: `cur > factor × prev` (default 2×, the verdict's
  *    threshold) AND `cur ≥ minSec` (default 0.5 s — a 0.04 s → 0.09 s
  *    swing is box noise, not a plan change; the floor keeps the gate
  *    about real cost),
  *  - FAILURES: the -1.0 sentinel [[Bench.render]] emits for a thrown
  *    query (always flagged, regardless of floor),
  *  - REMOVED queries (present before, gone now — silent coverage loss
  *    must be loud), while newly-added queries are reported but never
  *    fail the gate.
  *
  * The main reads two artifact files, prefers the `queries_min` maps
  * (reps > 1's low-noise bound) when BOTH sides carry them — comparing
  * one side's 3-rep min against the other's 1-rep median would bias the
  * gate — prints one line per finding, and exits 1 on any regression /
  * failure / removal. Run:
  * `sbt "runMain graft.BenchDiff BENCHFULL_r11.json BENCHFULL_r12.json"`.
  */
object BenchDiff {

  final case class Finding(name: String, kind: String, prev: Double,
      cur: Double, retried: Double = Double.NaN) {
    def render: String = kind match {
      case "regression" if !retried.isNaN =>
        f"REGRESSION $name: $prev%.2f s -> $cur%.2f s (${cur / prev}%.1fx), " +
          f"REPRODUCED in isolation at $retried%.2f s"
      case "regression" =>
        f"REGRESSION $name: $prev%.2f s -> $cur%.2f s (${cur / prev}%.1fx)"
      case "flake" =>
        f"FLAKE      $name: flagged at $cur%.2f s but retried in isolation " +
          f"at $retried%.2f s (inside the gate vs prev $prev%.2f s) — cleared"
      case "failure" => f"FAILURE    $name: prev $prev%.2f s, now the -1 sentinel"
      case "removed" => f"REMOVED    $name: was $prev%.2f s, absent from current"
      case _         => f"NEW        $name: $cur%.2f s (no previous round)"
    }
  }

  final case class Report(regressions: Seq[Finding], failures: Seq[Finding],
      removed: Seq[Finding], added: Seq[Finding], drift: Double = 1.0,
      flakes: Seq[Finding] = Nil) {
    def gateFailed: Boolean =
      regressions.nonEmpty || failures.nonEmpty || removed.nonEmpty
    def all: Seq[Finding] = failures ++ regressions ++ flakes ++ removed ++ added
  }

  /** Drift normalization engages only with a population big enough for
    * the median ratio to be a LOAD signal rather than an echo of the
    * regressions themselves (a 4-query artifact with one real 2.5×
    * regression must not have that regression normalize itself away). */
  val MinDriftQueries = 8

  /** Widest session-drift band the gate will normalize away. The r12
    * artifacts carried a measured ~1.2× uniform band (same code, judged
    * reverted minutes later); past 1.5× a "drift" is no longer plausibly
    * box condition and the raw ratios should face the gate. */
  val MaxDrift = 1.5

  /** Median cur/prev ratio over the shared healthy queries — the
    * session's uniform load band. A busy box slows EVERY query by
    * roughly the same factor; a real regression moves one or a few. The
    * median over many queries reads the former and ignores the latter
    * (robust to <50% of queries regressing), so dividing it out lets
    * the per-query gate flag plan changes, not box condition.
    *
    * `sentinelRatio` — when both artifacts carry the [[Bench]] load
    * sentinel (a fixed engine-independent calibration query), its
    * cur/prev ratio is a MEASURED bound on true box drift. The
    * query-median alone cannot tell a uniform box slowdown from a
    * genuine uniform regression (a global config/codegen change slowing
    * every query ≤ MaxDrift×); the sentinel can, because no engine code
    * runs in it. So normalization is capped at the sentinel band: the
    * gate never divides out more slowdown than the box itself attests. */
  def driftOf(prev: Map[String, Double], cur: Map[String, Double],
      sentinelRatio: Option[Double] = None): Double = {
    val ratios = prev.keySet.intersect(cur.keySet).toSeq
      .filter(n => prev(n) > 0.0 && cur(n) > 0.0)
      .map(n => cur(n) / prev(n))
    if (ratios.size < MinDriftQueries) 1.0
    else {
      val m = math.min(MaxDrift, math.max(1.0 / MaxDrift, Bench.median(ratios)))
      sentinelRatio.filter(_ > 0.0) match {
        case Some(sr) => // clamp toward 1: |normalized band| ≤ |sentinel band|
          math.min(math.max(m, math.min(1.0, sr)), math.max(1.0, sr))
        case None => m
      }
    }
  }

  def compare(prev: Map[String, Double], cur: Map[String, Double],
      factor: Double = 2.0, minSec: Double = 0.5,
      sentinelRatio: Option[Double] = None): Report = {
    require(factor > 1.0, s"factor must exceed 1: $factor")
    val shared = prev.keySet.intersect(cur.keySet).toSeq.sorted
    val drift = driftOf(prev, cur, sentinelRatio)
    val failures = shared.collect {
      case n if cur(n) < 0.0 && prev(n) >= 0.0 =>
        Finding(n, "failure", prev(n), cur(n))
    }
    val regressions = shared.collect {
      // a query that was ALREADY failing (prev -1) can't regress further;
      // its recovery shows up as a healthy number, never a flag. The
      // factor gate tests the DRIFT-NORMALIZED ratio (uniform session
      // slowdown is box condition, not a plan change); the minSec floor
      // stays on the raw time — cost is cost.
      case n if prev(n) > 0.0 && cur(n) >= 0.0 &&
          cur(n) / drift > factor * prev(n) && cur(n) >= minSec =>
        Finding(n, "regression", prev(n), cur(n))
    }
    val removed = (prev.keySet -- cur.keySet).toSeq.sorted
      .map(n => Finding(n, "removed", prev(n), Double.NaN))
    val added = (cur.keySet -- prev.keySet).toSeq.sorted
      .map(n => Finding(n, "new", Double.NaN, cur(n)))
    Report(regressions, failures, removed, added, drift)
  }

  /** FLAKE-RETRY adjudication (pure half). The full-run artifact times
    * every query inside a 190-query session where a one-off GC pause,
    * page-cache eviction, or competing process can double one small
    * query (three r13 builder runs of identical code each flagged one
    * DIFFERENT query). `applyRetry` takes fresh isolated re-timings of
    * just the flagged queries and re-applies the SAME normalized gate
    * (`retried / drift > factor × prev && retried ≥ minSec`): a flag
    * that clears in isolation is downgraded to a reported-but-non-fatal
    * "flake"; a flag that REPRODUCES stays a gate failure, now with the
    * isolated time as evidence. A flagged query the retry map does not
    * cover keeps its flag — absence of evidence never clears a gate. */
  def applyRetry(report: Report, retriedMin: Map[String, Double],
      factor: Double = 2.0, minSec: Double = 0.5): Report = {
    val (stay, cleared) = report.regressions.partition { f =>
      retriedMin.get(f.name) match {
        case Some(t) => t / report.drift > factor * f.prev && t >= minSec
        case None    => true // not retried -> flag stands
      }
    }
    report.copy(
      regressions = stay.map(f => retriedMin.get(f.name)
        .map(t => f.copy(retried = t)).getOrElse(f)),
      flakes = report.flakes ++
        cleared.map(f => f.copy(kind = "flake", retried = retriedMin(f.name))))
  }

  /** Impure half: re-time each flagged query in isolation — one untimed
    * warmup rep (which also absorbs the maintained-artifact builds the
    * incremental queries memoize per session) then `reps` timed reps,
    * reporting the MIN (the low-noise bound; a flake needs only ONE
    * clean rep to prove the plan is fine, while a real regression is
    * slow every rep). */
  def retryInIsolation(names: Seq[String], sfDir: String, reps: Int):
      Map[String, Double] = {
    if (names.isEmpty) return Map.empty
    val spark = Sessions.local()
    try {
      names.flatMap { n =>
        SparkEntry.queries.get(n).map { fn =>
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warmup: codegen/JIT + memoized incremental setup
          n -> (1 to reps).map(_ => once()).min
        }
      }.toMap
    } finally spark.stop()
  }

  /** One parsed artifact: the per-query medians plus, for reps > 1
    * runs, the per-query minima, plus the load sentinel (mean of the
    * first/last calibration timings) when the artifact carries it. */
  final case class Artifact(median: Map[String, Double],
      min: Option[Map[String, Double]],
      sentinel: Option[Double] = None)

  /** Parse one [[Bench.render]] artifact. The file may carry trailing
    * log noise — the LAST line holding a `"metric"` object wins,
    * mirroring how the driver greps it. */
  def parseArtifact(text: String): Artifact = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val line = text.linesIterator.filter(_.contains("\"metric\""))
      .foldLeft(Option.empty[String])((_, l) => Some(l))
      .getOrElse(sys.error("no \"metric\" JSON line in artifact"))
    val json = JsonMethods.parse(line.dropWhile(_ != '{'))
    def queryMap(field: String): Option[Map[String, Double]] =
      (json \ field) match {
        case JObject(fields) => Some(fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
          case (k, JDecimal(v)) => k -> v.toDouble
        }.toMap)
        case _ => None
      }
    def num(field: String): Option[Double] = (json \ field) match {
      case JDouble(v) => Some(v)
      case JInt(v) => Some(v.toDouble)
      case JDecimal(v) => Some(v.toDouble)
      case _ => None
    }
    val sentinel = (num("sentinel_first"), num("sentinel_last")) match {
      case (Some(f), Some(l)) => Some((f + l) / 2.0)
      case (f, l) => f.orElse(l)
    }
    Artifact(
      queryMap("queries").getOrElse(sys.error("artifact has no queries map")),
      queryMap("queries_min"), sentinel)
  }

  /** WARMTH adjudication across bases (r16 verdict ask): a query whose
    * min-of-reps ratio and ISOLATED-artifact ratio disagree by more
    * than `band` is flagged informationally — the min-of-reps number
    * is carrying shared-session warmth (page cache / JIT / GC
    * history), not a plan change, when the isolated basis disagrees.
    * Returns (name, minBasisRatio, isolatedRatio) sorted by
    * disagreement, worst first. Reporting-only — never gates. */
  def warmthFindings(prevMin: Map[String, Double],
      curMin: Map[String, Double], prevIso: Map[String, Double],
      curIso: Map[String, Double], band: Double = 1.25):
      Seq[(String, Double, Double)] = {
    require(band >= 1.0, s"band must be >= 1: $band")
    val shared = prevMin.keySet & curMin.keySet & prevIso.keySet & curIso.keySet
    shared.toSeq
      .filter(n => Seq(prevMin(n), curMin(n), prevIso(n), curIso(n))
        .forall(_ > 0.0))
      .map { n =>
        (n, curMin(n) / prevMin(n), curIso(n) / prevIso(n))
      }
      .filter { case (_, rm, ri) => math.max(rm / ri, ri / rm) > band }
      .sortBy { case (_, rm, ri) => -math.max(rm / ri, ri / rm) }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 4,
      "usage: BenchDiff <prev.json> <cur.json> " +
        "[<prev_isolated.json> <cur_isolated.json>]")
    val factor = sys.env.get("SPARK_GRAFT_DIFF_FACTOR")
      .flatMap(v => Try(v.toDouble).toOption).getOrElse(2.0)
    def load(p: String) = parseArtifact(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8))
    val (a, b) = (load(args(0)), load(args(1)))
    val (prev, cur, basis) = (a.min, b.min) match {
      case (Some(pm), Some(cm)) => (pm, cm, "queries_min")
      case _ => (a.median, b.median, "queries")
    }
    // sentinel ratio = measured box drift; caps the median normalization
    // so a genuine UNIFORM regression can't hide inside the drift band
    val sentinelRatio = for (sp <- a.sentinel; sc <- b.sentinel) yield sc / sp
    val r0 = compare(prev, cur, factor, sentinelRatio = sentinelRatio)
    // SPARK_GRAFT_RETRY=0 disables the flake-retry (e.g. pure-artifact
    // audits on a box without the test data); default on — a gate that
    // can mechanically separate box noise from plan change should.
    val retryOn = sys.env.getOrElse("SPARK_GRAFT_RETRY", "1").trim != "0"
    val r = if (retryOn && r0.regressions.nonEmpty) {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val reps = sys.env.get("SPARK_GRAFT_RETRY_REPS")
        .flatMap(v => Try(v.trim.toInt).toOption).getOrElse(3)
      println(s"[benchdiff] retrying ${r0.regressions.size} flagged " +
        s"quer${if (r0.regressions.size == 1) "y" else "ies"} in isolation " +
        s"($reps reps, sf=$sfDir)")
      applyRetry(r0, retryInIsolation(r0.regressions.map(_.name), sfDir, reps),
        factor)
    } else r0
    println(f"[benchdiff] basis=$basis factor=${factor}x " +
      f"shared=${prev.keySet.intersect(cur.keySet).size} " +
      f"drift=${r.drift}%.3fx" +
      sentinelRatio.map(sr => f" (sentinel cap ${sr}%.3fx)").getOrElse("") +
      " " +
      f"regressions=${r.regressions.size} failures=${r.failures.size} " +
      f"removed=${r.removed.size} new=${r.added.size} " +
      f"flakes=${r.flakes.size}")
    r.all.foreach(f => println("[benchdiff] " + f.render))
    // optional isolated-artifact pair: report min-basis vs isolated
    // ratio disagreements (>1.25x) so a warmth swing reads as warmth
    // in ONE output instead of a hand-join of two artifacts —
    // informational, never a gate input
    if (args.length == 4) {
      val (ia, ib) = (load(args(2)), load(args(3)))
      val w = warmthFindings(prev, cur,
        ia.min.getOrElse(ia.median), ib.min.getOrElse(ib.median))
      if (w.isEmpty)
        println("[benchdiff] warmth: all shared queries agree across " +
          "bases (<=1.25x)")
      w.foreach { case (n, rm, ri) =>
        println(f"[benchdiff] WARMTH     $n: min-basis ${rm}%.2fx vs " +
          f"isolated ${ri}%.2fx — bases disagree; trust the isolated " +
          "number for plan-change questions")
      }
    }
    if (r.gateFailed) sys.exit(1)
  }
}
