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
      cur: Double) {
    def render: String = kind match {
      case "regression" =>
        f"REGRESSION $name: $prev%.2f s -> $cur%.2f s (${cur / prev}%.1fx)"
      case "failure" => f"FAILURE    $name: prev $prev%.2f s, now the -1 sentinel"
      case "removed" => f"REMOVED    $name: was $prev%.2f s, absent from current"
      case _         => f"NEW        $name: $cur%.2f s (no previous round)"
    }
  }

  final case class Report(regressions: Seq[Finding], failures: Seq[Finding],
      removed: Seq[Finding], added: Seq[Finding]) {
    def gateFailed: Boolean =
      regressions.nonEmpty || failures.nonEmpty || removed.nonEmpty
    def all: Seq[Finding] = failures ++ regressions ++ removed ++ added
  }

  def compare(prev: Map[String, Double], cur: Map[String, Double],
      factor: Double = 2.0, minSec: Double = 0.5): Report = {
    require(factor > 1.0, s"factor must exceed 1: $factor")
    val shared = prev.keySet.intersect(cur.keySet).toSeq.sorted
    val failures = shared.collect {
      case n if cur(n) < 0.0 && prev(n) >= 0.0 =>
        Finding(n, "failure", prev(n), cur(n))
    }
    val regressions = shared.collect {
      // a query that was ALREADY failing (prev -1) can't regress further;
      // its recovery shows up as a healthy number, never a flag
      case n if prev(n) > 0.0 && cur(n) >= 0.0 &&
          cur(n) > factor * prev(n) && cur(n) >= minSec =>
        Finding(n, "regression", prev(n), cur(n))
    }
    val removed = (prev.keySet -- cur.keySet).toSeq.sorted
      .map(n => Finding(n, "removed", prev(n), Double.NaN))
    val added = (cur.keySet -- prev.keySet).toSeq.sorted
      .map(n => Finding(n, "new", Double.NaN, cur(n)))
    Report(regressions, failures, removed, added)
  }

  /** One parsed artifact: the per-query medians plus, for reps > 1
    * runs, the per-query minima. */
  final case class Artifact(median: Map[String, Double],
      min: Option[Map[String, Double]])

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
    Artifact(
      queryMap("queries").getOrElse(sys.error("artifact has no queries map")),
      queryMap("queries_min"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchDiff <prev.json> <cur.json>")
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
    val r = compare(prev, cur, factor)
    println(s"[benchdiff] basis=$basis factor=${factor}x " +
      s"shared=${prev.keySet.intersect(cur.keySet).size} " +
      s"regressions=${r.regressions.size} failures=${r.failures.size} " +
      s"removed=${r.removed.size} new=${r.added.size}")
    r.all.foreach(f => println("[benchdiff] " + f.render))
    if (r.gateFailed) sys.exit(1)
  }
}
