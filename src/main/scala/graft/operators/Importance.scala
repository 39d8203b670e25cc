package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", arXiv:2302.03169): score
  * every document of a raw pool by how target-domain-like its hashed
  * n-gram distribution is — `log p_target(doc) − log p_raw(doc)` under
  * add-one-smoothed bag-of-hashed-ngram unigram models — the standard
  * cheap device for selecting in-domain pretraining data without
  * training a classifier. Selection downstream is a threshold/top-k on
  * the emitted weight (the paper's top-k variant); this operator owns
  * the scoring table.
  *
  * ==Determinism / oracle parity==
  * Features hash through the portable md5-prefix device (4 hex chars =
  * 65536 buckets — `hashSplit`'s rule), so bucket ids are byte-identical
  * in any engine. Per DISTINCT bucket the log-ratio is floored to basis
  * points ONCE, then weighted by integer counts and summed — associative
  * integers, aggregation order can't perturb a score (the
  * [[TextAnalysis.unigramSurprisal]] device). The only transcendental is
  * `ln` on ≤ B distinct exact-integer ratios, mirrored literally in SQL.
  *
  * ==Scale shape==
  * One corpus pass builds the (doc, bucket, count) feature table
  * (materialized once — it feeds both the model aggregation and the
  * scoring join; exchange bounded by distinct (doc, bucket) pairs). The
  * model is ≤ B = 65536 rows — broadcast by construction — and both
  * totals are a 1-row broadcast, so scoring is a map-side join plus one
  * per-doc aggregation. The corpus text never shuffles. Long products
  * `(cnt+1)·(total+B)` stay exact through ~2^53 into the double divide
  * (≈9e15 features — beyond it, pre-divide each side by its total
  * before the ratio at a 1-ulp mirror risk).
  */
object Importance {

  /** Hashed feature space: 4 hex chars of md5 → 65536 buckets. */
  val B = 65536L

  /** (doc, is_t, b, c): hashed-n-gram bucket counts per document, with
    * the target-membership flag carried through (constant per doc).
    * Features = word unigrams + adjacent-pair bigrams over THE
    * tokenization contract; bigrams come from the native positional
    * n-gram pass (same rows as the old slice+zip_with HOF) — no
    * explode-then-window, one projection. */
  def featureCounts(df: DataFrame, id: String, text: String,
      isTarget: Column): DataFrame = {
    val toks = filter(TextAnalysis.tokenize(col(text)), t => length(t) > 0)
    val bigrams = graft.functions.wordNgrams(col("_w"), 2)
    df.select(col(id).as("doc"), isTarget.as("is_t"), toks.as("_w"))
      .select(col("doc"), col("is_t"),
        explode(concat(col("_w"), bigrams)).as("f"))
      .select(col("doc"), col("is_t"), substring(md5(col("f")), 1, 4).as("b"))
      .groupBy("doc", "is_t", "b").agg(count(lit(1)).as("c"))
  }

  /** Importance weights over the pool: (doc, n_feats, weight_bp).
    * `isTarget` marks the in-domain seed rows of `df` (the pool IS the
    * raw model, target included — every scored bucket therefore exists
    * in the raw counts). Feature-less docs are absent (nothing to
    * score), the [[TextAnalysis.unigramSurprisal]] contract. */
  def dsirWeights(df: DataFrame, id: String, text: String,
      isTarget: Column): DataFrame = {
    val fc = featureCounts(df, id, text, isTarget).localCheckpoint(false)
    val model = fc.groupBy("b").agg(
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("tcnt"),
      sum(col("c")).as("rcnt"))
    // totals straight off the checkpoint, NOT via a second model pass —
    // column pruning makes the two model subtrees differ, ReuseExchange
    // misses, and the bucket agg would run twice (the postings lesson)
    val tot = fc.agg(
      sum(when(col("is_t"), col("c")).otherwise(0L)).as("t"),
      sum(col("c")).as("r"))
    // mirrored literally in the DuckDB oracle
    val wBp = floor(log(
      ((col("tcnt") + 1) * (col("r") + B)).cast("double") /
        ((col("rcnt") + 1) * (col("t") + B)).cast("double")) * 10000)
      .cast("long")
    val weights = model.crossJoin(broadcast(tot))
      .select(col("b"), wBp.as("w_bp"))
    fc.join(broadcast(weights), "b")
      .groupBy("doc").agg(
        sum(col("c")).as("n_feats"),
        sum(col("c") * col("w_bp")).as("weight_bp"))
  }

  /** [[dsirWeights]]' scoring core against an EXPLICIT (b, tcnt, rcnt)
    * model table — the serving entry point for the stream-maintained
    * model ([[graft.streaming.StreamModel]]). Totals derive from the
    * model instead of the feature table (its sums ARE the feature sums
    * — exact integers, so the two paths hash-agree); the same smoothing
    * and bp-quantization algebra. */
  def dsirWeightsFromModel(fc: DataFrame, model: DataFrame): DataFrame = {
    val tot = model.agg(sum("tcnt").as("t"), sum("rcnt").as("r"))
    val wBp = floor(log(
      ((col("tcnt") + 1) * (col("r") + B)).cast("double") /
        ((col("rcnt") + 1) * (col("t") + B)).cast("double")) * 10000)
      .cast("long")
    val weights = model.crossJoin(broadcast(tot))
      .select(col("b"), wBp.as("w_bp"))
    fc.join(broadcast(weights), "b")
      .groupBy("doc").agg(
        sum(col("c")).as("n_feats"),
        sum(col("c") * col("w_bp")).as("weight_bp"))
  }

  /** Deterministic Gumbel-top-k importance RESAMPLE — the paper's
    * sampling step: draw k docs without replacement with probability
    * ∝ exp(weight) by ranking `weight + Gumbel(doc)` and keeping the
    * top k (the Gumbel-max trick; keys are independent per doc, so the
    * argtop distributes).
    *
    * The noise is pseudo-random but ENGINE-NEUTRAL: u = (h + 0.5)/2^32
    * over the first 8 md5 hex chars of the doc id — h is an exact
    * integer in both engines and the divisor is a power of two, so u is
    * the SAME double everywhere; −ln(−ln u) then floors to basis points
    * (the standard quantization) and adds to the integer weight. Ties
    * are impossible at distinct doc ids (the id breaks them).
    *
    * Scale shape: one map-only projection over the weights table, then
    * TakeOrdered(k) — never a global sort. */
  def dsirSample(weights: DataFrame, docCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = conv(substring(md5(col(docCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    // mirrored literally in the DuckDB oracle (h via a strpos polynomial
    // there — same exact integer, so the doubles agree bit-for-bit)
    val u = (h.cast("double") + 0.5) / 4294967296.0
    val gumbelBp = floor(-log(-log(u)) * 10000).cast("long")
    weights.select(col(docCol), col("weight_bp"),
        (col("weight_bp") + gumbelBp).as("key_bp"))
      .orderBy(col("key_bp").desc, col(docCol).asc)
      .limit(k)
  }
}
