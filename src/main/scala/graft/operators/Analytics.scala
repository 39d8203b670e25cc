package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline analytics (SURVEY §2.4 A1-A3, §2.3 J3, §2.6 O1-O7;
  * breakdown.py, index.py, get_submissions.py/get_comments.py bounds). */
object Analytics {

  /** A1 — breakdown.py:8-42: per-key counts of submissions and comments
    * with zero-fill, plus total.
    *
    * Plan shape: two partial-aggregated counts unioned then re-aggregated —
    * map-side combine collapses each side to |keys| rows before the single
    * shuffle, which at 100 TB beats a full-outer join of two aggregates
    * (one exchange instead of three).
    */
  def breakdown(submissions: DataFrame, comments: DataFrame, key: String): DataFrame = {
    val subs = submissions.select(col(key).as("name"))
      .groupBy("name").agg(count(lit(1)).as("n_submissions"),
        lit(0L).as("n_comments"))
    val coms = comments.select(col(key).as("name"))
      .groupBy("name").agg(lit(0L).as("n_submissions"),
        count(lit(1)).as("n_comments"))
    subs.unionByName(coms)
      .groupBy("name")
      .agg(sum("n_submissions").as("n_submissions"),
        sum("n_comments").as("n_comments"))
      .withColumn("total", col("n_submissions") + col("n_comments"))
  }

  /** O7 — breakdown.py:55-82 output orderings. */
  def breakdownSorted(b: DataFrame, by: String): DataFrame = by match {
    case "name"        => b.orderBy(lower(col("name")).asc, col("name").asc)
    case "submissions" => b.orderBy(col("n_submissions").desc, lower(col("name")).asc, col("name").asc)
    case "comments"    => b.orderBy(col("n_comments").desc, lower(col("name")).asc, col("name").asc)
    case "total"       => b.orderBy(col("total").desc, lower(col("name")).asc, col("name").asc)
    case other => throw new IllegalArgumentException(
      s"unknown breakdown sort '$other' (valid: name, submissions, comments, total)")
  }

  /** O1-O5 sort keys for the index listings (index.py:70-92); idstr
    * tiebreak appended by callers keeps listings deterministic
    * (SURVEY §7.4.4). */
  private def indexSortKeys(sort: String): Seq[Column] = sort match {
    case "date"   => Seq(col("created").asc)
    case "title"  => Seq(col("title").asc)
    case "score"  => Seq(col("score").desc)
    case "author" => Seq(col("author").asc)
    case "sub"    => Seq(col("subreddit").asc)
    // O5: flaired rows first, each group time-ordered (index.py:91-92)
    case "flair"  => Seq(col("flair_text").isNull.asc, col("created").asc)
    case other => throw new IllegalArgumentException(
      s"unknown index sort '$other' (valid: date, title, score, author, sub, flair)")
  }

  /** P2 + O1-O5 — index.py:43-109: score-threshold filter + one of the
    * index sort orders. Global sort = range-partitioned exchange; the
    * filter is pushed to the parquet scan. */
  def indexListing(table: DataFrame, threshold: Long, sort: String): DataFrame =
    table.filter(col("score") >= threshold)
      .orderBy(indexSortKeys(sort) :+ col("idstr").asc: _*)

  /** [[indexListing]] with the listing position MATERIALIZED as a column
    * (`pos`, 1-based) — the form whose ordering is value-checkable by an
    * order-insensitive comparer.
    *
    * Scale shape: a global `Window.orderBy` would serialize the whole
    * listing through ONE task. Instead the global rank is assembled from a
    * range exchange + per-partition offsets:
    *
    *   1. range-repartition + sort on the listing keys — the same exchange
    *      a global ORDER BY plans, every partition holds a contiguous key
    *      range;
    *   2. per-partition row counts (one tiny aggregate: one row per
    *      partition) → cumulative offsets via a window over those few
    *      rows (the only unpartitioned window left sees |partitions| rows,
    *      not the data);
    *   3. broadcast the offsets back; pos = offset + local row_number
    *      (windowed BY partition id — parallel).
    *
    * Both references to the ranged frame hang off the same Exchange node,
    * which Spark reuses (ReuseExchange), so the range shuffle runs once and
    * the partition ids the offsets were computed from are the ones the
    * final rank sees. The sort keys always end with the unique `idstr`
    * tiebreak, so the ordering (and therefore `pos`) is total and
    * deterministic regardless of partitioning. */
  def indexListingRanked(table: DataFrame, threshold: Long, sort: String): DataFrame = {
    val keys = indexSortKeys(sort) :+ col("idstr").asc
    val shuffled = table.filter(col("score") >= threshold)
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("_pid", spark_partition_id())
    // Correctness requires offsets and ranks to see the SAME partition-id
    // assignment. With exchange reuse on, both consumers hang off one
    // Exchange node (asserted by the plan-shape spec); with it off, each
    // consumer would re-execute the range exchange and RangePartitioner
    // would resample boundaries independently — so share one physical
    // materialization instead of relying on plan-level dedup.
    val reuseOn = table.sparkSession.conf
      .get("spark.sql.exchange.reuse", "true").toBoolean
    val ranged = if (reuseOn) shuffled else shuffled.localCheckpoint()
    val offsets = ranged.groupBy("_pid")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum("_cnt").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    ranged.join(broadcast(offsets), "_pid")
      .withColumn("pos", (col("_off") +
        row_number().over(Window.partitionBy("_pid").orderBy(keys: _*)))
        .cast("int"))
      .drop("_pid", "_off")
  }

  /** A3 — incremental lower bound: max(created) − 1 overlap re-fetch
    * (get_submissions.py:52-61). TakeOrderedAndProject-free: plain max. */
  def incrementalBound(table: DataFrame): DataFrame =
    table.agg((max("created") - 1).as("lower_bound"))

  /** 2D skyline (Pareto frontier): rows not dominated under (minimize
    * `xMin`, maximize `yMax`). b dominates a iff xb ≤ xa ∧ yb ≥ ya with
    * at least one strict; ties (identical points) are all kept.
    *
    * Device: sort by x and compare each row's y against the running max
    * of y over the strictly-cheaper prefix (dominated iff maxPrefix ≥ y,
    * or > y including equal-x rows) — O(n log n), never the all-pairs
    * join the naive definition implies. Scale shape: a bucketed local
    * pass first (x-range buckets; within-bucket domination is a sound
    * pre-filter because domination is x-monotone), so the exact global
    * window runs over the frontier-sized survivor set, not the corpus.
    */
  def skyline2d(df: DataFrame, key: String, xMin: Column, yMax: Column,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0)
    val pts = df.select(col(key), xMin.cast("long").as("x"),
      yMax.cast("long").as("y"))
    val bounds = pts.agg(min("x").as("x0"), max("x").as("x1"))
    val bucketed = pts.crossJoin(broadcast(bounds))
      .withColumn("_b",
        ((col("x") - col("x0")) * buckets / (col("x1") - col("x0") + 1))
          .cast("long"))
      .drop("x0", "x1")
    def undominated(d: DataFrame, part: Seq[String]): DataFrame = {
      val base = if (part.isEmpty) Window.orderBy("x")
        else Window.partitionBy(part.map(col): _*).orderBy("x")
      val mLt = max("y").over(base.rangeBetween(Window.unboundedPreceding, -1))
      val mLe = max("y").over(
        base.rangeBetween(Window.unboundedPreceding, Window.currentRow))
      d.withColumn("_mlt", coalesce(mLt, lit(Long.MinValue)))
        .withColumn("_mle", mLe)
        .filter(!(col("_mlt") >= col("y") || col("_mle") > col("y")))
        .drop("_mlt", "_mle")
    }
    undominated(undominated(bucketed, Seq("_b")).drop("_b"), Seq.empty)
  }

  /** Spearman rank correlation per group, EXACT integer arithmetic:
    * ρ = 1 − 6·Σd²/(n·(n²−1)) over first-rank (row_number with a
    * deterministic id tiebreak — documented tie semantics; the
    * tie-averaged variant needs fractional ranks). Emitted in basis
    * points via integer division: ρ_bp = 10000 − (60000·Σd²) div
    * (n(n²−1)) — no floats anywhere, so the statistic replays exactly.
    *
    * Scale: one shuffle on the group key; both rank windows share the
    * group partitioning; Σd² is a group-bounded aggregate. The n³ term
    * bounds group size at ~2·10⁶ rows for BIGINT (Σd² < n³); larger
    * groups need DECIMAL(38) accumulation — documented, not silently
    * wrong (the integer product would overflow loudly under ANSI mode).
    */
  def spearman(df: DataFrame, group: String, id: String, x: String,
      y: String): DataFrame = {
    val base = df.select(col(group).as("g"), col(id).as("k"),
      col(x).cast("long").as("x"), col(y).cast("long").as("y"))
    val wx = Window.partitionBy("g").orderBy(col("x"), col("k"))
    val wy = Window.partitionBy("g").orderBy(col("y"), col("k"))
    base
      .withColumn("rx", row_number().over(wx).cast("long"))
      .withColumn("ry", row_number().over(wy).cast("long"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum((col("rx") - col("ry")) * (col("rx") - col("ry"))).as("d2"))
      .filter(col("n") >= 2)
      // 60000·Σd² can reach ~5·10²⁰ at 10⁵-row groups — past BIGINT —
      // so the one big product runs in DECIMAL(38,0) (the oracle
      // mirrors with HUGEINT); `div` on decimals is exact integral
      // division in both engines, and both operands are positive so
      // floor == trunc
      .select(col("g").as(group), col("n"),
        expr("cast(10000 - (60000 * cast(d2 as decimal(38,0)))" +
          " div (n * (n * n - 1)) as bigint)").as("rho_bp"))
  }

  /** Per-row percentile rank (basis points) of an integer value within
    * its group — floor(10⁴ · |{rows with v' ≤ v}| / n) — WITHOUT a
    * corpus sort: the cumulative count comes from the domain-bounded
    * (group, value) histogram, broadcast back onto the corpus, so the
    * corpus contributes one map-side-combined aggregate and one map-only
    * join (same family as selectTopPctByScore, serving the rank itself
    * instead of a threshold). A `cume_dist` window would serialize each
    * group through one task.
    */
  def percentileRank(df: DataFrame, group: String, id: String,
      value: String): DataFrame = {
    val vals = df.select(col(group).as("g"), col(id).as("k"),
      col(value).cast("long").as("v"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = vals.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
      .select(col("g"), col("v"), expr("(cum * 10000) div n").as("pct_bp"))
    vals.join(broadcast(hist), Seq("g", "v"))
      .select(col("g").as(group), col("k").as(id), col("v").as(value),
        col("pct_bp"))
  }

  /** Robust outlier detection: rows with |value − median(group)| >
    * k·MAD(group), exact integer arithmetic throughout (median and MAD
    * from histogram-cumulative rank devices — no squared sums, no
    * floats, robust on heavy-tailed values where mean/σ saturates).
    *
    * Scale shape: the corpus is touched exactly TWICE — once to build
    * the (group, value) histogram, once to emit the flagged rows. The
    * absolute-deviation histogram is DERIVED from the value histogram
    * (re-keyed by |v − med| and re-summed), so the MAD pass runs over
    * the domain-bounded histogram, never the corpus; the per-group
    * (median, MAD) thresholds broadcast into the final filter.
    * Median/MAD rank semantics: min value with cum ≥ ceil(n/2) — the
    * [[TextAnalysis.histogramQuantiles]] contract at 5000 bp.
    */
  def madOutliers(df: DataFrame, group: String, id: String, value: String,
      k: Int = 3): DataFrame = {
    require(k >= 1)
    val vals = df.select(col(group).as("g"), col(id).as("k"),
      col(value).cast("long").as("v"))
    val hist = vals.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    def rankMin(h: DataFrame, out: String): DataFrame = {
      val w = Window.partitionBy("g").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("cum", sum("c").over(w))
        .withColumn("n", sum("c").over(Window.partitionBy("g")))
        // integer ceil(n/2) — Spark's `/` on longs is DOUBLE division
        .filter(col("cum") >= expr("(n + 1) div 2"))
        .groupBy("g").agg(min("v").as(out))
    }
    val med = rankMin(hist, "med")
    val absHist = hist.join(broadcast(med), "g")
      .select(col("g"), abs(col("v") - col("med")).as("v"), col("c"))
      .groupBy("g", "v").agg(sum("c").as("c"))
    val mad = rankMin(absHist, "mad")
    vals
      .join(broadcast(med.join(mad, "g")), "g")
      .filter(abs(col("v") - col("med")) > col("mad") * k)
      .select(col("g").as(group), col("k").as(id), col("v").as(value),
        col("med"), col("mad"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) — the privacy gate a curation pipeline runs before
    * releasing a table: every quasi-identifier equivalence class with
    * its size, the distinct-count of the sensitive attribute inside it,
    * and the meets-k / meets-l verdicts. A class failing k is
    * re-identifiable by QI join; a class failing l leaks the sensitive
    * value even when k holds (the homogeneity attack).
    *
    * ONE grouped pass over (QIs, sensitive) then a class-bounded
    * rollup — at 100 TB the single corpus exchange is keyed on the QI
    * tuple and map-side combine collapses duplicates first. */
  def kAnonymity(df: DataFrame, qis: Seq[String], sensitive: Column,
      k: Long, l: Long): DataFrame = {
    require(qis.nonEmpty && k >= 1 && l >= 1)
    val cells = df
      .groupBy((qis.map(col) :+ sensitive.as("_s")): _*)
      .agg(count(lit(1)).as("_n"))
    cells
      .groupBy(qis.map(col): _*)
      .agg(sum("_n").as("class_n"), count(lit(1)).as("l_distinct"))
      .select((qis.map(col) ++ Seq(col("class_n"), col("l_distinct"),
        (col("class_n") >= k).as("meets_k"),
        (col("l_distinct") >= l).as("meets_l"))): _*)
  }

  /** Benford first-significant-digit audit — the classic fraud /
    * data-fabrication screen over a positive numeric column. Works on
    * EXACT integer units (cents): the first digit falls out of ≤
    * `maxDigits` unrolled integer halvings-by-ten (never a
    * `log10`-double, whose boundary rounding is engine-dependent), and
    * expected Benford mass arrives pre-quantized as basis-point
    * literals (`expectedBp`, the shared-definition device — one Scala
    * source feeds both engines). Output per digit 1-9: count, observed
    * bp, expected bp, absolute deviation bp.
    * ONE map-side-combined 9-group aggregate. */
  def benford(df: DataFrame, valueCents: Column, maxDigits: Int = 12): DataFrame =
    benfordFromDigit(df, benfordFirstDigit(valueCents, maxDigits))

  /** Power-of-ten thresholds 10^(maxDigits−1) … 10, descending — ONE
    * definition feeding both engines' branch chains. */
  def benfordThresholds(maxDigits: Int): Seq[Long] =
    (1 until maxDigits).reverse.map(k => math.pow(10, k.toDouble).toLong)

  /** First significant digit of a positive long: find the value's
    * power-of-ten magnitude with a LINEAR threshold chain (a repeated
    * divide-by-ten fold duplicates its subtree 4× per step —
    * exponential expression blowup; the chain references the input once
    * per branch), then one division. The double quotient is in [1, 10)
    * with both operands exact below 2⁵³, so truncation is exact integer
    * division — identical to the oracle's `//`. */
  def benfordFirstDigit(valueCents: Column, maxDigits: Int): Column = {
    val c = valueCents.cast("long")
    val ts = benfordThresholds(maxDigits)
    val p = ts.tail.foldLeft(when(c >= ts.head, lit(ts.head))) {
      case (w, t) => w.when(c >= t, lit(t))
    }.otherwise(lit(1L))
    (c / p).cast("long")
  }

  /** Differentially-private histogram release (the Laplace mechanism,
    * Dwork et al. 2006): per-key counts plus Laplace(b) noise with
    * b·1000 = `bMilli` (ε = 1000/bMilli for sensitivity-1 counts),
    * released at milli resolution.
    *
    * The noise is DETERMINISTIC here — u = (h + 0.5)/2³² over the
    * md5-prefix of (salt:key), the engine's exact-dyadic uniform (the
    * DSIR Gumbel device), pushed through the Laplace inverse CDF
    *   noise_milli = floor(−sign(p) · bMilli · ln(1 − 2|p|)),
    * one ln, one floor — so the released values hash-gate. That is the
    * TEST contract: a production release must draw real entropy through
    * the same shape (the salt parameter is the injection point), and
    * must emit ONLY released_milli (the raw n rides along here for the
    * gate's benefit). Map-only over the |keys|-bounded count table. */
  def dpNoisyCounts(df: DataFrame, key: String, bMilli: Long,
      salt: String = "dp"): DataFrame = {
    require(bMilli > 0)
    val counted = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val h = conv(substring(md5(concat(lit(salt + ":"), col(key))), 1, 8),
      16, 10).cast("long")
    val u2 = (h.cast("double") * 2.0 + 1.0) / 4294967296.0 // exact dyadic 2u
    val arg = when(h >= 2147483648L, lit(2.0) - u2).otherwise(u2)
    val sgn = when(h >= 2147483648L, lit(1L)).otherwise(lit(-1L))
    counted.select(col(key), col("n"),
        floor(lit(-bMilli.toDouble) * sgn * log(arg)).cast("long")
          .as("noise_milli"))
      .withColumn("released_milli", col("n") * 1000L + col("noise_milli"))
  }

  /** Benford's expected first-digit mass, floor-quantized to basis
    * points: floor(log10(1 + 1/d) · 10⁴) — evaluated ONCE here and
    * injected as integer literals into both engines' queries. */
  val benfordExpectedBp: IndexedSeq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong)

  private def benfordFromDigit(df: DataFrame, digit: Column): DataFrame = {
    val expect = benfordExpectedBp.zipWithIndex
      .foldLeft(lit(0L)) { case (e, (bp, i)) =>
        when(col("digit") === (i + 1).toLong, lit(bp)).otherwise(e) }
    val counted = df.select(digit.as("digit"))
      .filter(col("digit") >= 1L && col("digit") <= 9L)
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counted.agg(sum("n").as("nt"))
    counted.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("(n * 10000) div nt").as("obs_bp"), expect.as("exp_bp"))
      .withColumn("dev_bp", abs(col("obs_bp") - col("exp_bp")))
  }

  /** J3 — get_comments.py:47-55: newest comment whose submission has NOT
    * been augmented (NOT EXISTS anti-join). */
  def latestUnaugmented(comments: DataFrame, submissions: DataFrame): DataFrame =
    comments.join(
        submissions.filter(col("augmented_at").isNotNull).select(col("idstr").as("submission")),
        Seq("submission"), "left_anti")
      .orderBy(col("created").desc, col("idstr").desc)
      .limit(1)
}
