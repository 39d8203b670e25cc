package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency/cardinality sketches, the streaming-aggregation
  * workhorses at 100 TB: a Count-Min sketch (Cormode & Muthukrishnan
  * 2005) for heavy-hitter frequency estimation and a HyperLogLog
  * (Flajolet et al. 2007) for distinct counting.
  *
  * Both are built on the engine's portable md5-prefix hash device, so
  * the SKETCH CONTENTS — not just some summary — replay relationally
  * in the oracle: every register/counter is a deterministic function of
  * the input multiset, independent of partitioning, ordering, or
  * engine. That is also precisely the property that makes them
  * mergeable (map-side partial aggregation is exact): CMS counters add,
  * HLL registers max.
  *
  * Scale shape: the corpus is touched once (token/n-gram projection,
  * map-side combined); everything downstream is sketch-sized (d·w
  * counters / m registers per group) or vocabulary-bounded. Estimates
  * join against the BROADCAST sketch. Spark's own approx_count_distinct
  * is the non-replayable cousin; these exist where the approximation
  * itself must be auditable.
  */
object Sketches {

  /** lower + split on non-alphanumeric, empties dropped — the corpus
    * tokenization convention (mirrors `string_split_regex` oracles). */
  private def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Count-Min heavy hitters over the corpus token stream.
    *
    * Sketch: `depth` independent rows of `16^widthHex` counters; row
    * j's hash of token t is the first `widthHex` hex chars of
    * md5(j:t). The point estimate of a token is the MIN over rows of
    * its counter — ≥ the true count always (one-sided error), within
    * ε·N with probability 1−δ for w = e/ε, d = ln(1/δ).
    *
    * Build composes from the exact token-count aggregate (one
    * map-side-combined exchange, the q_vocab shape); by counter
    * additivity the sketch is identical to one built row-at-a-time,
    * which is how a streaming deployment would maintain it. The exact
    * counts ride along into the output so the sketch's one-sided error
    * is visible (`err = est − exact ≥ 0`).
    *
    * Returns tokens with est ≥ minEst: (tok, est, exact, err).
    */
  def cmsHeavyHitters(df: DataFrame, textCol: String, depth: Int,
                      widthHex: Int, minEst: Long): DataFrame = {
    require(depth > 0 && widthHex > 0 && widthHex <= 8)
    val counts = tokenCounts(df, textCol)
    val coords = cmsCoords(counts, depth, widthHex)
    val sketch = coords.groupBy("j", "b").agg(sum("exact").as("total"))
    cmsServe(counts, sketch, depth, widthHex, minEst)
  }

  /** Corpus token counts (tok, exact) — the map-side-combined pass both
    * sketch families build from. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(toks(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("exact"))

  /** vocab × depth counter coordinates: row j's bucket for token t is
    * the first widthHex hex chars of md5(j:t). */
  private def cmsCoords(counts: DataFrame, depth: Int, widthHex: Int): DataFrame =
    counts.select(col("tok"), col("exact"),
      explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("b",
        substring(md5(concat(col("j").cast("string"), lit(":"), col("tok"))),
          1, widthHex))

  /** [[cmsHeavyHitters]]' estimate+audit core over PREBUILT state —
    * (tok, exact) counts and (j, b, total) counters — so heavy hitters
    * can serve from a MAINTAINED sketch ([[graft.streaming.StreamSketch]])
    * exactly as the other serving cores do from their tables. */
  def cmsServe(counts: DataFrame, sketch: DataFrame, depth: Int,
               widthHex: Int, minEst: Long): DataFrame = {
    val coords = cmsCoords(counts, depth, widthHex)
    val est = coords.join(broadcast(sketch), Seq("j", "b"))
      .groupBy("tok").agg(min("total").as("est"))
    counts.join(est, Seq("tok"))
      .filter(col("est") >= minEst)
      .select(col("tok"), col("est"), col("exact"),
        (col("est") - col("exact")).as("err"))
  }

  /** Deterministic BLOOM FILTER — the membership sketch completing the
    * family (CMS frequency, HLL cardinality, Bloom membership), and the
    * classic semi-join reduction device: build a bitmap from the small
    * side's keys, pre-filter the big side BEFORE its shuffle — only
    * false positives (a tunable few %) survive to the exact join.
    *
    * md5-salted positions (pos_j = int(md5(j:key)[0:8]) mod mBits) make
    * the bitmap — and therefore every membership verdict INCLUDING the
    * false positives — a deterministic function of the build keyset, so
    * the sketch behavior itself hash-gates (the CMS argument applied to
    * membership). No false negatives ever, by construction.
    *
    * [[bloomBits]] collects the build side's distinct positions — a
    * driver action bounded by min(k·n, mBits) ints, i.e. by the FILTER
    * CAPACITY, never the probe side (the codebook-collect contract).
    * [[bloomMightContain]] tests all k bits against the bitmap riding
    * the plan as ONE array literal (codegen reference object). */
  def bloomBits(build: DataFrame, key: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0 && k >= 1)
    val pos = build.select(col(key).cast("string").as("s"))
      .distinct()
      .select(explode(sequence(lit(0), lit(k - 1))).as("j"), col("s"))
      .select((conv(substring(md5(concat(col("j").cast("string"), lit(":"),
        col("s"))), 1, 8), 16, 10).cast("long") % mBits).cast("int").as("p"))
      .distinct().collect().map(_.getInt(0))
    val bits = new Array[Long](mBits / 64)
    pos.foreach(p => bits(p >> 6) |= (1L << (p & 63)))
    bits
  }

  /** Membership predicate over [[bloomBits]]' bitmap: true iff every
    * salted position's bit is set. The caller must add the bitmap as a
    * column named `bitsCol` (typedLit — one literal) and may then drop
    * it; the per-j position columns are internal. */
  def bloomMightContain(df: DataFrame, key: String, bitsCol: String,
      mBits: Int, k: Int): DataFrame = {
    var out = df
    (0 until k).foreach { j =>
      out = out.withColumn(s"_bp$j",
        (conv(substring(md5(concat(lit(j.toString), lit(":"),
          col(key).cast("string"))), 1, 8), 16, 10).cast("long") % mBits)
          .cast("int"))
    }
    val pass = (0 until k).map(j =>
      expr(s"(shiftright(element_at($bitsCol, cast(_bp$j div 64 as int) + 1), " +
        s"cast(_bp$j % 64 as int)) & cast(1 as bigint)) = cast(1 as bigint)"))
      .reduce(_ && _)
    out.withColumn("bloom_pass", pass)
      .drop((0 until k).map(j => s"_bp$j"): _*)
  }

  /** HyperLogLog distinct-count estimate of token BIGRAMS per group.
    *
    * m = 64 registers. For each bigram: register = int(first 2 md5 hex
    * chars) mod 64; rank = leading-zeros+1 of the next 8 hex chars as a
    * 32-bit int (33 if zero); register keeps the max rank. Estimate =
    * α₆₄·m²/Σ2^(−M_r) with empty registers contributing 2⁰ — the raw
    * HLL estimator. The small-range linear-counting correction is
    * deliberately NOT applied: callers use this where n ≫ 2.5m (the
    * estimator's intended regime), and omitting it keeps the whole
    * computation ln-free — every 2^(−M) is an exact dyadic double, the
    * register sum is order-independent-exact, and the single α·m²/S
    * division is the only rounding step. The approximation itself is
    * therefore hash-gateable.
    *
    * Returns per group: (group, est_x100, exact, err_bp) where
    * err_bp = floor(|est−exact|·10⁴/exact) — the audit column.
    */
  def hllDistinctBigrams(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    val bigrams = bigramsOf(df, groupCol, textCol)
    val estimates = hllEstimate(hllRegisters(bigrams))
    val exact = bigrams.groupBy("g")
      .agg(countDistinct("bg").as("exact"))
    estimates.join(exact, Seq("g"))
      .select(col("g").as(groupCol), col("est_x100"), col("exact"),
        floor(abs(col("est_x100") / 100.0 - col("exact")) * 10000 / col("exact"))
          .cast("long").as("err_bp"))
  }

  /** (g, bg) token-bigram rows per group — the HLL input projection. */
  def bigramsOf(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val w = toks(col(textCol))
    df.select(col(groupCol).as("g"), w.as("w"))
      // native positional bigrams — same rows as the old slice+zip_with
      // HOF without its two array copies and per-gram lambda evals
      .select(col("g"),
        explode(graft.functions.wordNgrams(col("w"), 2)).as("bg"))
  }

  /** (g, r, mr) HLL registers over (g, bg) rows: register = first 2 md5
    * hex chars mod 64, rank = leading-zeros+1 of the next 32 bits (33 if
    * zero), max per register. Registers MAX-MERGE — partial register
    * vectors from any split of the data combine exactly, which is what
    * makes the maintained-sketch path ([[graft.streaming.StreamSketch]])
    * drift-free. */
  def hllRegisters(bigrams: DataFrame): DataFrame =
    bigrams
      .withColumn("h", md5(col("bg")))
      .withColumn("r",
        (conv(substring(col("h"), 1, 2), 16, 10).cast("long") % 64).cast("int"))
      .withColumn("v", conv(substring(col("h"), 3, 8), 16, 10).cast("long"))
      .withColumn("rank",
        when(col("v") === 0, lit(33))
          .otherwise(lit(33) - length(bin(col("v")))).cast("int"))
      .groupBy("g", "r").agg(max("rank").as("mr"))

  /** (g, est_x100) raw-HLL estimates over (g, r, mr) registers.
    * 2^(−M) via an integer shift, not pow(): every term is an exact
    * dyadic double, so the register sum is the same in any order and
    * in any engine (the oracle replays 1.0/(1::BIGINT << mr)). */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val m = 64
    val alpha = 0.709 // the published α for m = 64 (Flajolet et al.)
    regs.groupBy("g").agg(
      (sum(expr("1.0 / cast(shiftleft(cast(1 as bigint), mr) as double)"))
        + (lit(m) - count(lit(1)))).as("s"))
      .select(col("g"),
        floor(lit(alpha) * lit(m.toDouble * m) / col("s") * 100).cast("long")
          .as("est_x100"))
  }
}
