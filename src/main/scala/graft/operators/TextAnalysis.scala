package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID, fingerprinting. Pure per-row projections (no
  * shuffle, fully codegen'd): at 100 TB these fuse into the document scan.
  * Ratios are emitted in basis points (BIGINT) for oracle-exact compare.
  */
object TextAnalysis {

  private def ws(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0L).otherwise(size(ws(c)).cast("long"))

  /** BPE-ish subword count: alpha runs, digit runs, punctuation singletons.
    * A cheap stand-in for a real tokenizer with the same plan shape. */
  def subwordCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")

  /** Quality heuristics (length/punct/stopword ratios), all integer bp. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this")

  def stopwordRatioBp(c: Column): Column = {
    val toks = ws(lower(c))
    val stops = filter(toks, t => t.isin(stopwords.map(lit(_)): _*))
    when(size(toks) === 0, 0L)
      .otherwise(floor(size(stops) * 10000.0 / size(toks)).cast("long"))
  }

  def punctRatioBp(c: Column): Column =
    when(length(c) === 0, 0L)
      .otherwise(floor(regexp_count(c, lit("[.,;:!?]")) * 10000.0 / length(c)).cast("long"))

  def meanWordLenBp(c: Column): Column = {
    val toks = ws(c)
    when(size(toks) === 0, 0L)
      .otherwise(floor(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)) * 10000.0 / size(toks))
        .cast("long"))
  }

  /** Composite quality score in bp: rewards stopword presence (natural
    * prose) and sane word length, penalizes punctuation soup. Weights are
    * arbitrary but fixed — the contract is determinism, not linguistics. */
  def qualityScoreBp(c: Column): Column =
    greatest(lit(0L), least(lit(10000L),
      lit(5000L)
        + floor(stopwordRatioBp(c) / 2.0)
        - floor(abs(meanWordLenBp(c) - lit(50000L)) / 20.0)
        - punctRatioBp(c)))

  /** n-gram-heuristic language ID: score = stopword hits per language,
    * argmax with fixed tiebreak order. */
  val langStops: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def langScores(c: Column): Seq[(String, Column)] = {
    val toks = ws(lower(c))
    langStops.toSeq.sortBy(_._1).map { case (lang, stops) =>
      lang -> size(filter(toks, t => t.isin(stops.map(lit(_)): _*))).cast("long")
    }
  }

  /** Predicted language: highest stopword-hit count; ties → 'und' unless a
    * single language leads. Unknown (all zero) → 'und'. */
  def langId(c: Column): Column = {
    val scores = langScores(c)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val winners = scores.map { case (l, s) =>
      when(s === best && best > 0, lit(l)) }
    val nWinners = scores.map { case (_, s) =>
      when(s === best && best > 0, 1).otherwise(0) }.reduce(_ + _)
    when(nWinners === 1, coalesce(winners: _*)).otherwise(lit("und"))
  }

  /** Character trigrams of lowercased text as an array — the langid
    * feature unit (Cavnar & Trenkle n-gram profiles / the CCNet-shape
    * classifier's char n-grams). One native codegen'd pass
    * ([[graft.functions.CharTrigrams]]) over the UTF-8 bytes: code-point
    * offsets once, a zero-copy slice per trigram, empty array under 3
    * code points — the same output as the earlier split("")-array HOF
    * (both iterate code points) without its per-trigram interpreted
    * lambda evals. */
  def charTrigrams(c: Column): Column =
    graft.functions.charTrigrams(lower(c))

  /** Train integer char-trigram language profiles from a labeled corpus
    * — the model half of the CCNet-shape FIRST filter every multilingual
    * crawl pipeline applies before any quality/dedup stage: per
    * language, the top-`k` trigrams by (count DESC, gram ASC) with
    * rank-based integer weights (rank 1 → k, rank k → 1; the Cavnar &
    * Trenkle rank-profile device made integer-deterministic). Output:
    * (lang, gram, w) — k·|languages| rows, a codebook-sized broadcast
    * artifact.
    *
    * Scale: one shuffle on (lang, gram) for the counts; the rank window
    * partitions by language over ≤ |grams(lang)| rows. Training reads
    * the corpus once. */
  /** (key, gram) rows of a frame — the hot-path trigram explode, fed by
    * the native [[charTrigrams]] pass. */
  private def gramRows(df: DataFrame, key: Column, text: String): DataFrame =
    df.select(key.as("_k"),
      explode(graft.functions.charTrigrams(lower(col(text)))).as("gram"))

  def trigramProfiles(train: DataFrame, lang: String, text: String,
      k: Int = 64): DataFrame =
    trigramProfilesFromCounts(
      gramRows(train, col(lang), text).withColumnRenamed("_k", "lang")
        .groupBy("lang", "gram").agg(count(lit(1)).as("c")), k)

  /** The rank-profile derivation over an ALREADY-aggregated
    * (lang, gram, c) count relation — shared by the batch trainer above
    * and the stream-maintained counter table
    * ([[graft.streaming.StreamLangid]]), so the two routes cannot
    * drift: counts are additive integers, so the maintained table's
    * counts equal the batch counts exactly and the profiles follow. */
  def trigramProfilesFromCounts(counts: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("gram").asc)))
      .filter(col("rn") <= k)
      .select(col("lang"), col("gram"), (lit(k + 1) - col("rn")).cast("long").as("w"))
  }

  /** Classify documents against trained [[trigramProfiles]]: score(doc,
    * lang) = Σ over the doc's trigram OCCURRENCES of the profile weight
    * (≡ Σ count·w), argmax by (score DESC, lang ASC); docs whose text
    * hits no profile gram classify 'und' with score 0. Output:
    * (id, lang_pred, score) — integer-deterministic end to end.
    *
    * Scale shape: the profiles broadcast (k·L rows), the exploded
    * trigrams join them map-side, and ONE exchange on (doc, lang)
    * aggregates the scores; the per-doc argmax is a co-partitioned
    * min_by fold, never a global window. */
  def langidByProfiles(docs: DataFrame, id: String, text: String,
      profiles: DataFrame): DataFrame = {
    val scored = gramRows(docs, col(id), text).withColumnRenamed("_k", "_doc")
      .join(broadcast(profiles.localCheckpoint(false)), Seq("gram"))
      .groupBy(col("_doc"), col("lang"))
      .agg(sum("w").as("score"))
      .groupBy("_doc")
      // min over (-score, lang) ≡ argmax score with lang-ASC tiebreak
      .agg(min_by(struct(col("lang"), col("score")),
        struct((-col("score")).as("ns"), col("lang"))).as("_b"))
      .select(col("_doc"), col("_b.lang").as("lang_pred"),
        col("_b.score").as("score"))
    docs.select(col(id).as("_doc"))
      .join(scored, Seq("_doc"), "left")
      .select(col("_doc").as(id),
        coalesce(col("lang_pred"), lit("und")).as("lang_pred"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Document fingerprint: md5 of the normalized text (stable, portable,
    * collision-safe at corpus scale); bucket = top 16 bits for sharding. */
  def fingerprint(c: Column): Column = md5(Dedup.normText(c))
  def fingerprintBucket(c: Column): Column =
    conv(substring(fingerprint(c), 1, 4), 16, 10).cast("long")

  /** PII-style scrubbing: emails, bare URLs, and long digit runs replaced
    * with typed placeholder tokens (the standard pre-training hygiene
    * pass). Pure projection — fuses into the scan; `redactionCount`
    * reports how many replacements a row received (for filtering or
    * audit). Patterns are deliberately simple and FIXED — determinism and
    * oracle-portability over recall. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val longDigitsRe = "[0-9]{7,}"

  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      longDigitsRe, "<NUM>")

  def redactionCount(c: Column): Column =
    (regexp_count(c, lit(urlRe)) +
      regexp_count(regexp_replace(c, urlRe, "<URL>"), lit(emailRe)) +
      regexp_count(regexp_replace(regexp_replace(c, urlRe, "<URL>"), emailRe, "<EMAIL>"),
        lit(longDigitsRe))).cast("long")

  /** Fixed-window token chunking with overlap (training-sequence packing):
    * each document's token array splits into windows of `window` tokens
    * advancing by `stride` (< window ⇒ overlap), emitting
    * (doc, chunk_idx, chunk_text, n_tokens). The final partial window is
    * kept iff it adds new tokens. Row-local (`transform` over a
    * materialized token array + inline-generator explode — the
    * Dedup.shingleSet rules); no shuffle. */
  def chunk(df: DataFrame, id: String, text: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window)
    val toks = col("_t")
    val nChunks = // ceil((L - window) / stride) + 1, min 1
      greatest(lit(1L), (ceil((size(toks) - window) / lit(stride.toDouble))) + 1)
    df.select(col(id).as("doc"), ws(col(text)).as("_t"))
      .filter(size(toks) > 0)
      .select(col("doc"),
        posexplode(transform(sequence(lit(0L), nChunks - 1),
          i => concat_ws(" ",
            slice(toks, (i * stride + 1).cast("int"), lit(window))))))
      .select(col("doc"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        when(length(col("col")) === 0, 0L)
          .otherwise(size(split(col("col"), " ")).cast("long")).as("n_tokens"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken's local document
    * fingerprinting): hash every k-gram, slide a window of w hashes, keep
    * each window's minimum — the selected set is a position-independent
    * ~2/(w+1) sample with the GUARANTEE that any shared run of at least
    * w+k-1 tokens between two documents yields at least one shared
    * fingerprint. Selection is ONE native codegen'd pass per row
    * ([[graft.functions.WinnowFingerprints]]); the only shuffle is
    * whatever the caller does with the (doc, fp) rows. Docs shorter than
    * k+w-1 tokens fall back to their global minimum k-gram hash (still
    * one fingerprint); docs under k tokens yield none. */
  def winnowFingerprints(df: DataFrame, id: String, text: String,
      k: Int = 3, w: Int = 4): DataFrame =
    df.select(col(id).as("doc"), ws(Dedup.normText(col(text))).as("_t"))
      .select(col("doc"), explode(graft.functions.column(
        graft.functions.WinnowFingerprints(
          graft.functions.expression(col("_t")), k, w))).as("fp"))

  /** Winnowing near-dup candidates: pairs sharing ≥ minShared selected
    * fingerprints (grouped inverted-index blocking, like the other dedup
    * operators — one shuffle, pairs emitted in-task). */
  def winnowPairs(df: DataFrame, id: String, text: String,
      k: Int = 3, w: Int = 4, minShared: Long = 2,
      freqCap: Long = 1000000L): DataFrame =
    Dedup.groupPairs(
        winnowFingerprints(df, id, text, k, w).select(col("fp"), col("doc")),
        Seq("fp"), col("doc"),
        (x, y) => when(x < y, struct(x.as("i"), y.as("j"))), freqCap,
        device = "winnowPairs")
      .select(col("_p.i").as("i"), col("_p.j").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= minShared)

  /** EXACT duplicated-SPAN detection — the Lee et al. 2022 "exact
    * substring deduplication" operator (Deduplicating Training Data Makes
    * Language Models Better; their suffix-array tool dedups verbatim
    * ≥50-token substrings), re-expressed relationally: a position belongs
    * to a duplicated span iff its length-`L` token gram occurs at least
    * `minCount` times corpus-wide; maximal runs of such positions merge
    * into spans of ≥ L tokens. This is the standard blocked
    * over-approximation of the suffix-array semantics — every truly
    * duplicated substring of ≥ L tokens is covered (all its L-grams
    * repeat), and a span may additionally stitch adjacent repeats that
    * originate from different sources; downstream policy (cut / drop /
    * audit) consumes the spans either way.
    *
    * Scale shape: gram hashes are ONE codegen'd pass per row
    * ([[graft.functions.GramHashes]], 60-bit md5 prefix — SQL-oracle
    * portable like the winnowing family); the corpus-wide count is a
    * map-side-combined aggregation bounded by |distinct grams|; the
    * mark join keys on the 8-byte hash; span merge is a per-doc window
    * ([[coveredSpans]]: lag + cumulative sum — ONE window pass). Nothing
    * is quadratic and no stage carries document text. The gram pass feeds
    * two consumers (count + mark) and is deliberately RECOMPUTED, not
    * materialized: it is map-only with column pruning (the count branch
    * reads only `h`), while materializing would stage |corpus tokens|
    * rows — the opposite trade from the postings checkpoint, whose
    * consumers sit behind exchanges.
    *
    * Output: (doc, span_start, span_len) — token offsets, 0-based. */
  def duplicatedSpans(df: DataFrame, id: String, text: String,
      L: Int = 8, minCount: Long = 2): DataFrame = {
    require(L >= 1 && minCount >= 2)
    val g = df
      .select(col(id).as("doc"),
        graft.functions.gramHashes(ws(Dedup.normText(col(text))), L).as("_g"))
      .select(col("doc"), posexplode(col("_g")).as(Seq("pos", "h")))
    val dup = g.groupBy("h").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount).select("h")
    coveredSpans(g.join(dup, "h"), L)
  }

  /** Shared span-merge core: marked gram positions (doc, pos) → MAXIMAL
    * DISJOINT spans of covered token positions (a token is covered iff
    * some marked gram starting in [pos−L+1, pos] reaches it). Two marked
    * positions belong to one span iff their gap ≤ L — gap < L means the
    * L-extended intervals OVERLAP, gap = L means they touch and the
    * covered tokens are contiguous; either way the union is one run, so
    * the merged spans are disjoint AND non-adjacent by construction (the
    * guarantee [[removeDuplicatedSpans]] and the scrub oracle's one-row-
    * per-covering-span LEFT JOIN rely on: no token has two covering
    * spans). The naive pos − row_number run-grouping only merged gap = 1
    * and emitted OVERLAPPING spans for 1 < gap < L.
    *
    * ONE hash exchange per doc: the cumsum reads the lag's output, so
    * Spark plans two stacked WindowExec operators, but both sit on the
    * same (doc, pos) sort over the same exchange — the shuffled volume
    * is span rows, bounded by marked positions, never corpus bytes. */
  private def coveredSpans(marked: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc").orderBy("pos")
    marked
      .withColumn("_new",
        when(col("pos") - lag("pos", 1).over(w) <= L, 0).otherwise(1))
      .withColumn("_grp", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc", "_grp")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") - min("pos") + L).cast("long").as("span_len"))
      .select("doc", "span_start", "span_len")
  }

  /** SPAN-LEVEL decontamination: maximal corpus-doc token runs whose
    * every L-gram also occurs in the BENCHMARK — the surgical complement
    * of [[contamination]] (which flags docs) and [[fuzzyContamination]]
    * (which scores pairs): instead of dropping a lightly-contaminated
    * document, downstream cuts just the overlapping span. Same blocked
    * semantics and [[coveredSpans]] merge device as [[duplicatedSpans]];
    * the gram "dup set" here is the benchmark's distinct gram-hash set,
    * which is eval-set-sized and BROADCAST — the corpus never shuffles
    * for marking, and the only exchange is the per-doc span window.
    * Output: (doc, span_start, span_len), token offsets 0-based. */
  def contaminatedSpans(docs: DataFrame, bench: DataFrame, id: String,
      text: String, L: Int = 8): DataFrame = {
    require(L >= 1)
    def grams(df: DataFrame): DataFrame = df
      .select(col(id).as("doc"),
        graft.functions.gramHashes(ws(Dedup.normText(col(text))), L).as("_g"))
      .select(col("doc"), posexplode(col("_g")).as(Seq("pos", "h")))
    val benchGrams = grams(bench).select("h").distinct()
    coveredSpans(grams(docs).join(broadcast(benchGrams), "h"), L)
  }

  /** APPLY [[duplicatedSpans]]: reconstruct each document's (normalized)
    * text with every duplicated span's tokens removed — the enforcement
    * half of substring dedup (drop-all-occurrences policy; Lee et al.
    * report the keep-one choice barely matters). Spans are disjoint and
    * non-adjacent BY CONSTRUCTION ([[coveredSpans]]' interval merge — no
    * token has two covering spans), so removal is a row-local indexed
    * `filter` over the token array against the doc's (few) collected
    * spans — the only additions to [[duplicatedSpans]]'s plan are the
    * span collect_list agg and one join back to the corpus. Docs with no
    * spans pass through unchanged (left join). Output:
    * (doc, clean_text, n_removed). */
  def removeDuplicatedSpans(df: DataFrame, id: String, text: String,
      L: Int = 8, minCount: Long = 2): DataFrame = {
    val spans = duplicatedSpans(df, id, text, L, minCount)
      .groupBy("doc")
      .agg(collect_list(struct(col("span_start"), col("span_len"))).as("_spans"))
    val inSpan = (i: Column) => exists(col("_spans"), s =>
      i >= s.getField("span_start") &&
        i < s.getField("span_start") + s.getField("span_len"))
    df.select(col(id).as("doc"), ws(Dedup.normText(col(text))).as("_t"))
      .join(spans, Seq("doc"), "left")
      .withColumn("_kept",
        when(col("_spans").isNull, col("_t"))
          .otherwise(filter(col("_t"), (tok, i) => !inSpan(i.cast("long")))))
      .select(col("doc"),
        concat_ws(" ", col("_kept")).as("clean_text"),
        (size(col("_t")) - size(col("_kept"))).cast("long").as("n_removed"))
  }

  /** [[removeDuplicatedSpans]]' POSITIONAL form — the fallback SCALE.md
    * names for pathological span counts, where the row-local form's
    * collected `_spans` array (per-row memory) and O(|tokens| × |spans|)
    * indexed filter stop being safe.
    *
    * Device: each span EXPLODES into its covered positions — spans are
    * disjoint by [[coveredSpans]]' construction, so the removal set is
    * bounded by |covered tokens| ≤ |doc tokens|, never |tokens|·|spans| —
    * and tokens drop by a (doc, pos) anti-join; survivors reassemble via
    * sort_array(collect_list). Every exchange is |tokens|-bounded, no
    * per-row arrays beyond one doc's SURVIVING tokens (the same row the
    * output carries). Output and semantics identical to
    * [[removeDuplicatedSpans]] (spec-asserted, including the hostile
    * 2000-span corpus); costs one more exchange than the row-local form —
    * the trade that buys unbounded span counts. */
  def removeDuplicatedSpansPositional(df: DataFrame, id: String, text: String,
      L: Int = 8, minCount: Long = 2): DataFrame = {
    val rm = duplicatedSpans(df, id, text, L, minCount)
      .select(col("doc"), explode(sequence(col("span_start"),
        col("span_start") + col("span_len") - 1)).as("pos"))
    df.select(col(id).as("doc"), posexplode(ws(Dedup.normText(col(text))))
        .as(Seq("pos", "tok")))
      .join(rm, Seq("doc", "pos"), "left_anti")
      .groupBy("doc")
      .agg(sort_array(collect_list(struct(col("pos"), col("tok")))).as("_kept"),
        count(lit(1)).as("_nkept"))
      .join(df.select(col(id).as("doc"),
        size(ws(Dedup.normText(col(text)))).cast("long").as("_ntok")), Seq("doc"), "right")
      .select(col("doc"),
        concat_ws(" ", transform(coalesce(col("_kept"),
          array().cast("array<struct<pos:int,tok:string>>")),
          s => s.getField("tok"))).as("clean_text"),
        (col("_ntok") - coalesce(col("_nkept"), lit(0L))).as("n_removed"))
  }

  /** SPAN-LEVEL evaluation of [[duplicatedSpans]]' blocked
    * over-approximation — the q_dedup_eval confusion device applied to
    * spans: the blocked form reports maximal runs of corpus-repeated
    * L-grams, and a run may STITCH adjacent repeats from different
    * sources into one span whose full text never occurs twice anywhere
    * (Lee et al.'s suffix-array semantics would report only truly
    * duplicated substrings). This measures that gap exactly: a reported
    * span VERIFIES iff its full (normalized) token run occurs ≥ 2 times
    * corpus-wide; precision = verified / reported. TOKEN-position
    * coverage has no gap by construction (every covered position lies
    * under a repeated L-gram, itself a duplicated substring of length L
    * — so scrubbing is unaffected); the span LIST is what consumers of
    * provenance/reporting read, and that is where the approximation
    * lives.
    *
    * Occurrence counting: token arrays render with DOUBLE-space
    * separators and single-space padding, and occurrences count by
    * literal replace — the double separator makes adjacent matches
    * non-overlapping by construction, so the replace count is the exact
    * contiguous-run count (token-position-overlapping self-repeats
    * still count once per disjoint occurrence — the replace contract,
    * identical in both engines).
    *
    * Scale: like q_dedup_eval this is the AUDIT route, not a per-query
    * path — the span list (audit-sized) broadcasts, the corpus streams
    * once through the contains pass; at 100 TB restrict the corpus side
    * to a deterministic sample universe first (the sampledPairEval
    * device).
    *
    * Output: ONE row (n_spans, n_verified, precision_bp). */
  def duplicatedSpansEval(df: DataFrame, id: String, text: String,
      L: Int = 8, minCount: Long = 2): DataFrame = {
    val nw = df.select(col(id).as("doc"), ws(Dedup.normText(col(text))).as("wd"))
      .localCheckpoint(false)
    val spans = duplicatedSpans(df, id, text, L, minCount)
    val needles = spans.join(nw, "doc")
      .select(col("doc"), col("span_start"),
        concat(lit(" "),
          array_join(slice(col("wd"), col("span_start").cast("int") + 1,
            col("span_len").cast("int")), "  "),
          lit(" ")).as("needle"))
    val hay = nw.select(
      concat(lit(" "), array_join(col("wd"), "  "), lit(" ")).as("hay"))
    val occ = hay.join(broadcast(needles))
      .select(col("doc"), col("span_start"), col("needle"),
        ((length(col("hay")) - length(replace(col("hay"), col("needle")))) /
          length(col("needle"))).as("c"))
      .groupBy("doc", "span_start")
      .agg(sum("c").cast("long").as("occ"))
    occ.agg(count(lit(1)).as("n_spans"),
        // count, not sum: over ZERO rows sum is NULL while the oracle's
        // `count(*) FILTER` is 0 — count matches on the empty edge
        count(when(col("occ") >= 2L, lit(1))).as("n_verified"))
      .select(col("n_spans"), col("n_verified"),
        // zero guard: a corpus with no reported spans has no defined
        // precision — NULL on both engines (the unguarded div diverges:
        // Spark NULL vs DuckDB's `// 0` error path)
        when(col("n_spans") > 0L,
          expr("n_verified * 10000 div n_spans")).as("precision_bp"))
  }

  /** One-pass document profile.
    *
    * The token arrays are materialized ONCE into their own projection and
    * every metric reads the attributes: the naive form re-splits the text
    * per metric (≈8 splits/row), and interpreted HOF predicates
    * (stopword/language filters) get no cross-expression CSE — the same
    * hot-path rule as Dedup.shingleSet. */
  def profile(df: DataFrame, id: String, text: String): DataFrame = {
    val x = col("_x"); val toks = col("_toks"); val ltoks = col("_ltoks")
    def ratioBp(num: Column, den: Column): Column =
      when(den === 0, 0L).otherwise(floor(num * 10000.0 / den).cast("long"))
    val scores = langStops.toSeq.sortBy(_._1).map { case (lang, stops) =>
      lang -> size(filter(ltoks, t => t.isin(stops.map(lit(_)): _*))).cast("long")
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val winners = scores.map { case (l, s) => when(s === best && best > 0, lit(l)) }
    val nWinners = scores.map { case (_, s) =>
      when(s === best && best > 0, 1).otherwise(0) }.reduce(_ + _)
    val nTokens = when(length(trim(x)) === 0, 0L).otherwise(size(toks).cast("long"))
    val meanWl = ratioBp(aggregate(toks, lit(0L), (acc, t) => acc + length(t)), size(toks))
    val punct = ratioBp(regexp_count(x, lit("[.,;:!?]")), length(x))
    val stopr = ratioBp(size(filter(ltoks, t => t.isin(stopwords.map(lit(_)): _*))),
      size(ltoks))
    df.select(col(id), col(text).as("_x"))
      .select(col(id), x, ws(x).as("_toks"), ws(lower(x)).as("_ltoks"))
      .select(
        col(id),
        nTokens.as("n_tokens"),
        regexp_count(lower(x), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
          .as("n_subwords"),
        length(x).cast("long").as("n_chars"),
        meanWl.as("mean_word_len_bp"),
        punct.as("punct_ratio_bp"),
        stopr.as("stopword_ratio_bp"),
        greatest(lit(0L), least(lit(10000L),
          lit(5000L)
            + floor(stopr / 2.0)
            - floor(abs(meanWl - lit(50000L)) / 20.0)
            - punct)).as("quality_bp"),
        when(nWinners === 1, coalesce(winners: _*)).otherwise(lit("und"))
          .as("lang_pred"),
        md5(Dedup.normText(x)).as("fingerprint"),
        conv(substring(md5(Dedup.normText(x)), 1, 4), 16, 10).cast("long")
          .as("fp_bucket"))
  }

  /** Deterministic train/val/test assignment by KEY hash — the standard
    * reproducible-split primitive for a training corpus: stable across
    * runs, clusters, and corpus growth (a doc's split never changes when
    * other docs arrive), and independent of row order. Map-only.
    *
    * The first 4 hex chars of md5(key) give 65536 uniform buckets; the
    * percentage cutoffs compare LEXICOGRAPHICALLY, which equals numeric
    * order on lowercase hex — so the same literals work in any engine
    * (the DuckDB oracle uses identical string compares). */
  def hashSplit(df: DataFrame, key: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    // A 100% cutoff would format as the 5-char "10000", which sorts BEFORE
    // "ffff" lexicographically — use "g" (> any hex char) as +infinity.
    def cut(pct: Int): String = {
      val c = 65536 * pct / 100
      if (c >= 65536) "g" else f"$c%04x"
    }
    val h = substring(md5(col(key).cast("string")), 1, 4)
    df.withColumn("split",
      when(h < cut(trainPct), "train")
        .when(h < cut(trainPct + valPct), "val")
        .otherwise("test"))
  }

  /** Corpus vocabulary: the `k` most frequent tokens (lowercased runs of
    * [a-z0-9]) with 1-based rank materialized. One map-side-combined
    * aggregation exchanges |vocab| partial counts, then TakeOrdered picks
    * the top k — the only unpartitioned window runs over those k rows,
    * never the corpus. */
  def topTokens(df: DataFrame, text: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = df
      .select(explode(tokenize(col(text))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
    top.withColumn("pos",
      row_number().over(Window.orderBy(col("n").desc, col("token").asc)).cast("int"))
      .select("pos", "token", "n")
  }

  /** Gopher-style repetition signals per document: the share of the most
    * frequent token and the distinct-token ratio, in basis points — the
    * classic "drop boilerplate / keyboard-mash" quality filters. Docs
    * with no tokens are absent (nothing to measure). Two map-side-combined
    * aggregations: (doc, token) then doc — exchange volume is bounded by
    * distinct (doc, token) pairs, not corpus bytes. */
  def repetition(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("doc"),
        explode(tokenize(col(text))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc", "token").agg(count(lit(1)).as("c"))
      .groupBy("doc").agg(
        max("c").as("_m"), sum("c").as("_n"), count(lit(1)).as("_d"))
      .select(col("doc"),
        floor(col("_m") * 10000.0 / col("_n")).cast("long").as("top_token_share_bp"),
        floor(col("_d") * 10000.0 / col("_n")).cast("long").as("distinct_ratio_bp"))

  /** Deterministic per-stratum sampling — the data-mixing primitive: take
    * `ratesPct(stratum)`% of each stratum (e.g. per-source mixture
    * weights), by the same md5-bucket rule as [[hashSplit]], so the
    * sample is reproducible, order-independent, stable under corpus
    * growth, and CONSISTENT with hashSplit splits (a doc's bucket is a
    * function of its key alone). Strata not in the map keep `defaultPct`.
    * Map-only: the rate lookup folds into one CASE expression. */
  def stratifiedSample(df: DataFrame, key: String, strata: String,
      ratesPct: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100))
    def cut(p: Int): String = {
      val c = 65536 * p / 100
      if (c >= 65536) "g" else f"$c%04x"
    }
    val h = substring(md5(col(key).cast("string")), 1, 4)
    val cutCol = ratesPct.toSeq.sortBy(_._1).foldLeft(lit(cut(defaultPct))) {
      case (acc, (s, p)) => when(col(strata) === s, cut(p)).otherwise(acc)
    }
    df.filter(h < cutCol)
  }

  /** Exact global top-`keepPct`% selection by a BOUNDED-DOMAIN integer
    * score (basis points, 0..10000 — quality_bp, any *_bp column)
    * WITHOUT a global sort: a map-side-combined histogram (≤ |domain|
    * rows) → cumulative-from-top over the tiny histogram → threshold T =
    * the target-th largest score → broadcast 1-row join → `score ≥ T`
    * filter. The corpus is scanned twice (histogram + filter) and never
    * shuffled or globally ordered — a `percent_rank` window over the
    * corpus would serialize 100 TB through one task; this shape
    * exchanges ≤ |domain| partial counts and the single-partition window
    * runs over the HISTOGRAM, bounded by the score domain, not the
    * corpus. Ties AT the threshold all survive (keep-ties policy: output
    * ≥ target rows, minimal score cut, reproducible under re-runs).
    *
    * target = ceil(n·keepPct/100) = (n·keepPct + 99) div 100, computed
    * via a double floor — exact while n·keepPct + 99 < 2⁵³ (n < 9·10¹³
    * at keepPct=100, comfortably past any corpus row count). */
  /** Exact token-budget sampling: keep documents in the deterministic
    * md5-rank order (key asc, id asc) while the running token total
    * stays ≤ `budget` — "give me exactly this many training tokens" as
    * an operator. The kept set is a PREFIX of the order (counts are
    * non-negative), so the rule is engine-neutral and replayable.
    *
    * ==Scale shape==
    * A corpus-wide prefix sum would serialize 100 TB through one
    * window task. Instead, two bounded passes over a checkpointed
    * (doc, key, n_tok) projection:
    *  1. 65536-bucket token histogram (one exchange, ≤ 65536 rows),
    *     cumulative window over the HISTOGRAM → the single crossing
    *     bucket `kc` and the token total `base` before it, broadcast.
    *  2. docs in buckets < kc pass with no further work; ONLY the
    *     crossing bucket's ~corpus/65536 rows flow through a doc-level
    *     cumulative window (partitioned on the bucket key); buckets
    *     > kc drop in the scan.
    * Every exchange is histogram- or single-bucket-sized; the corpus
    * text never shuffles. Output: (doc, n_tok) of the kept prefix. */
  def tokenBudgetSample(df: DataFrame, id: String, text: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val keyed = df.select(col(id).as("doc"),
        substring(md5(col(id).cast("string")), 1, 4).as("k"),
        size(filter(tokenize(col(text)), t => length(t) > 0))
          .cast("long").as("n_tok"))
      .localCheckpoint(false)
    val hist = keyed.groupBy("k").agg(sum("n_tok").as("s"))
    val wh = Window.orderBy(col("k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cumS", sum(col("s")).over(wh))
    // crossing bucket = first whose cumulative total exceeds the budget
    // (null → everything fits); base = the exact total before it (the
    // largest cumulative ≤ budget — monotonicity makes max() correct)
    val cross = cum.agg(
      min(when(col("_cumS") > budget, col("k"))).as("_kc"),
      coalesce(max(when(col("_cumS") <= budget, col("_cumS"))), lit(0L))
        .as("_base"))
    val tagged = keyed.crossJoin(broadcast(cross))
    val below = tagged.filter(col("_kc").isNull || col("k") < col("_kc"))
      .select(col("doc"), col("n_tok"))
    val wb = Window.partitionBy("k").orderBy(col("doc").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inCrossing = tagged.filter(col("k") === col("_kc"))
      .withColumn("_cumIn", sum(col("n_tok")).over(wb))
      .filter(col("_base") + col("_cumIn") <= budget)
      .select(col("doc"), col("n_tok"))
    below.unionByName(inCrossing)
  }

  /** CCNet-style score tertiles: label each row head/middle/tail by its
    * integer score's position in the corpus distribution (head = lowest
    * third — for perplexity-like scores, the most "ordinary" text). Both
    * cutpoints come from ONE histogram pass — the
    * [[selectTopPctByScore]] device: cumulative window over ≤ |score
    * domain| histogram rows, never the corpus; thresholds broadcast
    * back. Ties at a cutpoint take the LOWER bucket (deterministic and
    * engine-neutral; a run of equal scores never splits). Cut targets
    * are ceil(n/3) and ceil(2n/3) in exact integer arithmetic
    * (`div` ↔ `//`). */
  def scoreTertiles(df: DataFrame, score: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Guard.domainBounded(
      df.groupBy(col(score).as("_s")).agg(count(lit(1)).as("_c")),
      "scoreTertiles")
    val w = Window.orderBy(col("_s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = hist.agg(sum("_c").as("_n"))
    val thr = hist.withColumn("_cum", sum(col("_c")).over(w))
      .crossJoin(broadcast(total))
      .agg(
        min(when(col("_cum") >= expr("(_n + 2) div 3"), col("_s"))).as("_t1"),
        min(when(col("_cum") >= expr("(2 * _n + 2) div 3"), col("_s"))).as("_t2"))
    df.crossJoin(broadcast(thr))
      .withColumn("bucket",
        when(col(score) <= col("_t1"), "head")
          .when(col(score) <= col("_t2"), "middle")
          .otherwise("tail"))
      .drop("_t1", "_t2")
  }

  def selectTopPctByScore(df: DataFrame, score: String, keepPct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepPct >= 1 && keepPct <= 100, s"keepPct must be 1..100, got $keepPct")
    val hist = Guard.domainBounded(
      df.groupBy(col(score).as("_s")).agg(count(lit(1)).as("_c")),
      "selectTopPctByScore")
    val w = Window.orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = hist.agg(sum("_c").as("_n"))
    val thr = hist.withColumn("_cum", sum(col("_c")).over(w))
      .crossJoin(broadcast(total))
      .filter(col("_cum") >=
        floor((col("_n") * keepPct + lit(99)) / 100.0).cast("long"))
      .agg(max(col("_s")).as("_thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(score) >= col("_thr"))
      .drop("_thr")
  }

  /** Benchmark decontamination: training docs sharing at least one word
    * n-gram with a benchmark/eval set, with the count of DISTINCT
    * contaminated shingles per doc — the standard pre-training hygiene
    * filter (drop or audit the flagged docs).
    *
    * Scale shape: with `broadcastBench = true` (default) the BENCHMARK's
    * shingle set is broadcast — benchmarks are small by nature (eval
    * sets, not corpora) — so the 100 TB corpus side streams through a
    * broadcast semi-ish join in its own scan stage and the only exchange
    * is the (doc, count) partial aggregation. Pass `false` when the
    * "benchmark" side is itself corpus-sized (e.g. a split-leakage audit
    * marking train against the TEST SPLIT — a corpus fraction, not an
    * eval set): the join then shuffles both sides on the shingle hash —
    * exchanges bounded by shingle rows — instead of forcing a
    * corpus-fraction distinct-shingle set through the broadcast/driver
    * limits. Shingling is the same one-pass native kernel as the dedup
    * family. */
  def contamination(docs: DataFrame, bench: DataFrame,
      id: String, text: String, n: Int,
      broadcastBench: Boolean = true): DataFrame = {
    val bs = Dedup.shingles(bench, id, text, n).select("s").distinct()
    Dedup.shingles(docs, id, text, n)
      .join(if (broadcastBench) broadcast(bs) else bs, "s")
      .groupBy("doc").agg(count(lit(1)).as("n_hits"))
  }

  /** FUZZY decontamination: corpus docs whose shingle-set Jaccard against
    * ANY benchmark doc clears `thresholdBp`, with the pair and its
    * similarity for audit — catches paraphrase-level contamination that
    * the exact shared-shingle filter ([[contamination]]) only tallies.
    * EXACTLY computed (no LSH): eval sets are small, so the benchmark's
    * shingle rows BROADCAST; candidate (doc, bench_doc) pairs come from
    * the broadcast shingle join and the single exchange is their count
    * aggregation — bounded by shared-shingle pairs, never
    * |corpus| × |bench|. Jaccard in basis points with the same integer
    * floor contract as [[Dedup.jaccardPairs]].
    *
    * `freqCap` is the same skew shed as the Jaccard dedup family: a
    * boilerplate shingle present in ~every corpus doc AND in one bench
    * doc would otherwise push ~|corpus| rows through the pair exchange
    * on that shingle alone. Shingles whose CORPUS frequency exceeds the
    * cap are dropped from candidate generation (set sizes in the
    * denominator stay full); a contaminated pair whose shared shingles
    * are ALL hot is missed — for decontamination prefer a generous cap
    * and audit the shed set, since hot shingles are by definition
    * boilerplate, not benchmark-specific content.
    * Output: (doc, bench_doc, jac_bp), threshold-filtered. */
  def fuzzyContamination(docs: DataFrame, bench: DataFrame, id: String,
      text: String, n: Int, thresholdBp: Long,
      freqCap: Long = 1000000L): DataFrame = {
    val d0 = Dedup.shingleRows(docs, id, text, n)
    // hot set = pathological keys only → tiny → broadcast anti-join;
    // the count exchange is |distinct shingle|-sized with map-side combine
    val hot = d0.groupBy("s").agg(count(lit(1)).as("_f"))
      // runtime shed visibility (no silent caps): hot-key and shed-row
      // counts ride the count pass via observe()
      .observe(Guard.shedMetricName("fuzzyContamination"),
        sum(when(col("_f") > freqCap, 1L).otherwise(0L)).as("shed_groups"),
        sum(when(col("_f") > freqCap, col("_f")).otherwise(0L))
          .as("shed_members"))
      .filter(col("_f") > freqCap).select("s")
    val d = d0.join(broadcast(hot), Seq("s"), "left_anti")
    val b = Dedup.shingleRows(bench, id, text, n)
      .select(col("doc").as("bench_doc"), col("nsh").as("_bnsh"), col("s"))
    d.join(broadcast(b), "s")
      .groupBy("doc", "bench_doc")
      .agg(count(lit(1)).as("_c"), max("nsh").as("_n"), max("_bnsh").as("_bn"))
      .withColumn("jac_bp",
        floor(col("_c") * 10000.0 / (col("_n") + col("_bn") - col("_c"))).cast("long"))
      .filter(col("jac_bp") >= thresholdBp)
      .select("doc", "bench_doc", "jac_bp")
  }

  /** Sequence PACKING: assign token-counted items to fixed-capacity
    * context-window bins — the standard pretraining data-prep step after
    * chunking (concatenate documents into full training sequences).
    *
    * Semantics: STREAMING FILL in deterministic (shard, id) order — item
    * bin = ⌊tokens-before-it ÷ capacity⌋, so bins are contiguous runs and
    * an item can straddle a boundary (its bin holds the overhang; real
    * packers either split there or pad — both downstream choices this
    * assignment feeds). NOT reordering bin-packing: reordering destroys
    * the doc-order locality curricula rely on, and optimal packing is
    * NP-hard for no training benefit.
    *
    * Scale shape: packing is inherently sequential, so it runs per SHARD
    * (`idCol % nShards`) — one hash exchange + per-shard window cumsum,
    * each shard an independent stream; cross-shard packing has no
    * training meaning. NUMERIC ids shard by modulo — reproducible in ANY
    * engine, including the SQL oracle. Non-numeric ids shard by
    * `pmod(xxhash64(id), n)` (deterministic, but engine-specific —
    * `pmod(string, n)` would cast every id to null and silently collapse
    * the "independent parallel shards" contract into ONE sequential
    * stream on shard NULL). Output: (id, shard, bin, n_tokens). */
  def packSequences(df: DataFrame, id: String, tokens: Column,
      capacity: Long, nShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = df.schema(id).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        pmod(col(id), lit(nShards.toLong))
      case _ => pmod(xxhash64(col(id)), lit(nShards.toLong))
    }
    val w = Window.partitionBy("shard").orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(id), shard.as("shard"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("bin",
        ((sum(col("n_tokens")).over(w) - col("n_tokens")) / capacity)
          .cast("long"))
      .select(col(id), col("shard"), col("bin"), col("n_tokens"))
  }

  /** THE tokenization contract: lowercased maximal `[a-z0-9]+` runs.
    * Load-bearing for oracle parity — every lexical operator and every
    * DuckDB oracle (`string_split_regex(lower(text), '[^a-z0-9]+')`)
    * assumes exactly this split; keep the regex in this ONE place. */
  private[operators] def tokenize(c: Column): Column =
    split(lower(c), "[^a-z0-9]+")

  /** Shared postings pass: (doc, tok, tf) over [[tokenize]], lazily
    * materialized — the postings subtree feeds several consumers in every
    * caller and Catalyst's ReuseExchange misses the branches whose
    * pushed-down null filters differ, which re-reads the corpus once per
    * consumer (measured on q_bm25: 3 full scans). One materialization is
    * the build-the-index-once trade; postings are O(distinct (doc,
    * term)), smaller than the corpus they index.
    *
    * ==Materialization mode (`spark.graft.postings.materialization`)==
    *  - `"local"` (default): lazy `localCheckpoint` — fastest on a
    *    healthy cluster (no lineage re-derivation, executor-local
    *    blocks), but the blocks are NON-REPLICATED AND LINEAGE-FREE: an
    *    executor loss fails the query instead of recomputing. Right for
    *    interactive/local work.
    *  - `"persist"`: lineage-backed `persist(DISK_ONLY)` — an executor
    *    loss recomputes the lost partitions from lineage; the mode for
    *    long jobs on large clusters (set it next to the 100 TB configs,
    *    see SCALE.md).
    * EITHER mode pins storage for the session (nothing here unpersists —
    * each operator call materializes its own postings): persisted blocks
    * are LRU-evictable and clearable (`spark.catalog.clearCache()`);
    * localCheckpoint blocks live until the session ends. A long-lived
    * driver looping lexical queries should prefer `"persist"` and clear
    * the cache between batches. */
  private[operators] def postings(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val tf = termFrequencies(df, idCol, text)
    df.sparkSession.conf.get("spark.graft.postings.materialization", "local") match {
      case "local"   => tf.localCheckpoint(false)
      case "persist" => tf.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      case other => throw new IllegalArgumentException(
        "spark.graft.postings.materialization must be 'local' or 'persist', " +
          s"got '$other'")
    }
  }

  /** The raw (doc, tok, tf) term-frequency rows over [[tokenize]], with
    * NO materialization — the single-consumer form of [[postings]], and
    * the per-micro-batch unit of the incrementally-maintained index
    * ([[graft.streaming.StreamIndex]] merges these per batch). */
  def termFrequencies(df: DataFrame, idCol: Column, text: Column): DataFrame =
    df.select(idCol.as("doc"), explode(tokenize(text)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc", "tok").agg(count(lit(1)).as("tf"))

  /** Unigram language-model surprisal per document — the self-trained
    * baseline of the KenLM-style perplexity quality filter standard in
    * pretraining pipelines (CCNet/Gopher both filter on LM score): score
    * docs by how ordinary their token distribution is; extreme surprisal
    * in either direction flags boilerplate and keyboard-mash. The model
    * IS the corpus: P(t) = cnt(t)/T over its own unigram counts, so the
    * operator needs no external artifact.
    *
    * Determinism: per-occurrence surprisal ln(T/cnt(t)) is floored to
    * basis points once per DISTINCT token, weighted by tf, and summed as
    * integers — associative, so aggregation order can't perturb a score
    * (same device as [[Search.bm25TopK]]); the only transcendental is ln
    * on vocab-many distinct inputs.
    *
    * Scale shape: (doc, tok) tf aggregation, vocab-sized count
    * aggregation, then tf ⋈ counts on tok — every exchange is bounded by
    * distinct (doc, tok) pairs or |vocab|, never corpus bytes; the 1-row
    * total broadcasts. Token-less docs are absent (nothing to score).
    * Output: (doc, n_tokens, total_surprisal_bp, mean_surprisal_bp). */
  def unigramSurprisal(df: DataFrame, id: String, text: String): DataFrame =
    unigramSurprisalFromPostings(postings(df, col(id), col(text)))

  /** [[unigramSurprisal]]'s scoring core over a PREBUILT (doc, tok, tf)
    * postings frame — the serving entry point for maintained indexes
    * ([[graft.streaming.StreamIndex.postings]]), mirroring
    * [[Search.bm25TopKFromPostings]]. */
  def unigramSurprisalFromPostings(tf: DataFrame): DataFrame = {
    val cnt = tf.groupBy("tok").agg(sum("tf").as("cnt"))
    val tot = cnt.agg(sum("cnt").as("t"))
    // expression shape mirrored literally in the DuckDB oracle
    val surpBp = floor(log(col("t").cast("double") / col("cnt")) * 10000)
    tf.join(cnt, "tok")
      .crossJoin(broadcast(tot))
      .groupBy("doc").agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * surpBp).as("total_surprisal_bp"))
      .select(col("doc"), col("n_tokens"), col("total_surprisal_bp"),
        floor(col("total_surprisal_bp").cast("double") / col("n_tokens"))
          .cast("long").as("mean_surprisal_bp"))
  }

  /** Per-GROUP unigram-LM surprisal — the CCNet shape: ONE language
    * model per shard (token counts keyed by (group, tok), totals by
    * group), trained and scored in a single declarative plan instead
    * of a per-shard driver loop. Same integer-bp determinism device as
    * [[unigramSurprisal]] (per-distinct-(group, tok) floor, tf-weighted
    * integer sums). Exchanges are bounded by distinct (group, doc, tok)
    * and per-group vocab — never corpus bytes; the per-group totals
    * broadcast (|groups| rows). Output: (group, doc, n_tokens,
    * total_surprisal_bp, mean_surprisal_bp); token-less docs absent
    * (the family contract). */
  def unigramSurprisalBy(df: DataFrame, id: String, text: String,
      group: String): DataFrame = {
    val tf = groupedPostings(df, id, text, group)
    unigramSurprisalByCore(tf,
      tf.groupBy("_g", "tok").agg(sum("tf").as("cnt")), group)
  }

  /** [[unigramSurprisalBy]] scoring against an ALREADY-aggregated
    * per-group (group, tok, cnt) count model — the serving entry for
    * maintained models (e.g. the CCNet pipeline's stream-maintained
    * per-language LM, [[graft.streaming.StreamNb]]'s count table):
    * shared scoring core with the batch trainer, so maintained ≡ batch
    * holds structurally once the counts agree. Docs whose tokens miss
    * the model contribute no surprisal for those tokens (the self-
    * scoring contract assumes the model covers the corpus — true when
    * the model was maintained over exactly this corpus). */
  def unigramSurprisalByFromCounts(df: DataFrame, id: String,
      text: String, group: String, counts: DataFrame): DataFrame =
    unigramSurprisalByCore(groupedPostings(df, id, text, group),
      counts.select(col(group).as("_g"), col("tok"), col("cnt")), group)

  /** Shared (group, doc, tok, tf) postings pass of the per-group LM. */
  private def groupedPostings(df: DataFrame, id: String, text: String,
      group: String): DataFrame =
    df.select(col(group).as("_g"), col(id).as("doc"),
        explode(tokenize(col(text))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("_g", "doc", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)  // feeds counts, totals, and the scoring join

  private def unigramSurprisalByCore(tf: DataFrame, cnt: DataFrame,
      group: String): DataFrame = {
    val tot = cnt.groupBy("_g").agg(sum("cnt").as("t"))
    // mirrored literally in the DuckDB oracle
    val surpBp = floor(log(col("t").cast("double") / col("cnt")) * 10000)
    tf.join(cnt, Seq("_g", "tok")).join(broadcast(tot), Seq("_g"))
      .groupBy("_g", "doc").agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * surpBp).as("total_surprisal_bp"))
      .select(col("_g").as(group), col("doc"), col("n_tokens"),
        col("total_surprisal_bp"),
        floor(col("total_surprisal_bp").cast("double") / col("n_tokens"))
          .cast("long").as("mean_surprisal_bp"))
  }

  /** Per-group TERTILE split of a bounded integer score — CCNet's
    * head/middle/tail perplexity buckets per language, via the
    * histogram-cumulative device: one (group, value) count aggregate,
    * a cumulative window over the HISTOGRAM (≤ |distinct values| rows
    * per group — domain-bounded, never the corpus), integer boundary
    * rules t1/t2 = the smallest values whose cumulative count reaches
    * ⌈n/3⌉ / ⌈2n/3⌉ (compared multiplicatively — `cum·3 ≥ n` — so no
    * division enters either engine), broadcast back as a |groups|-row
    * join. Ties AT a boundary share its side (value-deterministic;
    * head = LOWEST values). Output: the input plus `tertile`. */
  def tertilesBy(df: DataFrame, group: String, value: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = df.localCheckpoint(false)  // histogram + the assignment join
    val hist = d.groupBy(col(group).as("_g"), col(value).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val cum = hist.withColumn("_cum",
      sum("_c").over(Window.partitionBy("_g").orderBy("_v")))
    val nt = hist.groupBy("_g").agg(sum("_c").as("_n"))
    val bounds = cum.join(nt, Seq("_g"))
      .groupBy("_g")
      .agg(min(when(col("_cum") * 3 >= col("_n"), col("_v"))).as("_t1"),
        min(when(col("_cum") * 3 >= col("_n") * 2, col("_v"))).as("_t2"))
    d.join(broadcast(bounds), col(group) === col("_g"), "left")
      .withColumn("tertile",
        when(col(value) <= col("_t1"), "head")
          .when(col(value) <= col("_t2"), "middle")
          .otherwise("tail"))
      .drop("_g", "_t1", "_t2")
  }

  /** Bigram-LM surprisal per document — one Markov order above
    * [[unigramSurprisal]], the next rung toward the KenLM-style
    * perplexity filters of CCNet/Gopher: every token is an event
    * conditioned on its predecessor (the first on a `<s>` sentinel —
    * which cannot collide with real tokens, the tokenizer only emits
    * `[a-z0-9]+`), scored by the add-one-smoothed corpus bigram model
    * P(t|p) = (c2(p,t)+1)/(c1(p)+V). The model IS the corpus, as in the
    * unigram form.
    *
    * Determinism: per-event surprisal ln((c1+V)/(c2+1)) floors to basis
    * points once per DISTINCT (p, t) pair, weighted by the doc's event
    * count, summed as integers — associative, engine-neutral.
    *
    * Scale shape: the (doc, p, t) event counts are checkpoint-
    * materialized ONCE (they feed c2, c1, V and the scoring join — four
    * consumers); every exchange is bounded by distinct doc-bigrams or
    * the model tables (distinct corpus bigrams / |vocab|+1 contexts —
    * model-sized, never corpus bytes); the 1-row V broadcasts. Output:
    * (doc, n_tokens, total_surprisal_bp, mean_surprisal_bp); token-less
    * docs are absent (the family contract). */
  def bigramSurprisal(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(tokenize(col(text)), t => length(t) > 0)
    val withT = df.select(col(id).as("doc"), toks.as("_t"))
      .filter(size(col("_t")) > 0)
    // (p, t) events as native positional bigrams over the <s>-padded
    // token array (guide §4.1: codegen'd one-pass expression instead of
    // the interpreted slice+zip_with struct lambda): "<s> t1", "t1 t2",
    // … — identical pairs, since tokens are space-free ([a-z0-9]+) the
    // gram string ↔ (p, t) split is a bijection; the split happens once
    // per DISTINCT (doc, gram), before the checkpoint.
    val tf2 = withT
      .select(col("doc"), explode(graft.functions.wordNgrams(
        concat(array(lit("<s>")), col("_t")), 2)).as("_g"))
      .groupBy("doc", "_g").agg(count(lit(1)).as("tf"))
      .select(col("doc"), substring_index(col("_g"), " ", 1).as("p"),
        substring_index(col("_g"), " ", -1).as("t"), col("tf"))
      .localCheckpoint(false)
    val c2 = tf2.groupBy("p", "t").agg(sum("tf").as("c2"))
    val c1 = tf2.groupBy("p").agg(sum("tf").as("c1"))
    val v = tf2.agg(count_distinct(col("t")).as("v"))
    // mirrored literally in the DuckDB oracle
    val surpBp = floor(log((col("c1") + col("v")).cast("double") /
      (col("c2") + 1).cast("double")) * 10000)
    tf2.join(c2, Seq("p", "t")).join(c1, Seq("p"))
      .crossJoin(broadcast(v))
      .groupBy("doc").agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * surpBp).as("total_surprisal_bp"))
      .select(col("doc"), col("n_tokens"), col("total_surprisal_bp"),
        floor(col("total_surprisal_bp").cast("double") / col("n_tokens"))
          .cast("long").as("mean_surprisal_bp"))
  }

  /** Corpus comparison by log-odds ratio with an informative Dirichlet
    * prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words"): which
    * terms distinguish partition A from partition B, with the prior
    * (α_w = α₀·t_w/T, t_w = whole-corpus count) shrinking rare-term
    * noise — the method raw PMI/tf-idf deltas get wrong.
    *
    *   δ_w = ln((y_Aw+α_w)/(n_A+α₀−y_Aw−α_w))
    *       − ln((y_Bw+α_w)/(n_B+α₀−y_Bw−α_w))
    *
    * Determinism: α_w is rational; clearing its T denominator makes
    * every ln argument a ratio of EXACT integers (y·T + α₀·t_w etc.),
    * so both engines evaluate ln on identical doubles and the bp-floored
    * δ ranks identically. Output: top-k A-side and top-k B-side terms.
    *
    * Scale shape: one corpus token-count pass; per-partition counts and
    * totals derive from it (|vocab|-bounded); scalars broadcast.
    */
  def logOddsTerms(df: DataFrame, id: String, text: String, partA: Column,
      alpha0: Long = 1000L, minCount: Long = 5L, k: Int = 15): DataFrame = {
    val toks = filter(tokenize(col(text)), t => length(t) > 0)
    val counts = df.select(partA.as("in_a"), explode(toks).as("tok"))
      .groupBy("tok").agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("ya"),
        count(lit(1)).as("tw"))
      .withColumn("yb", col("tw") - col("ya"))
      .localCheckpoint(false)
    val totals = counts.agg(sum("ya").as("na"), sum("tw").as("t"))
      .withColumn("nb", col("t") - col("na"))
    // exact-integer ln arguments: x + α₀·t_w/T scaled by T
    def lnRatio(y: Column, n: Column): Column =
      log((y * col("t") + lit(alpha0) * col("tw")).cast("double") /
        ((n + lit(alpha0) - y) * col("t") - lit(alpha0) * col("tw"))
          .cast("double"))
    val deltaBp = floor((lnRatio(col("ya"), col("na")) -
      lnRatio(col("yb"), col("nb"))) * 10000).cast("long")
    val scored = counts.filter(col("tw") >= minCount)
      .crossJoin(broadcast(totals))
      .select(col("tok"), col("ya"), col("yb"), deltaBp.as("delta_bp"))
      .localCheckpoint(false)
    scored.orderBy(desc("delta_bp"), col("tok")).limit(k)
      .withColumn("side", lit("a"))
      .unionByName(
        scored.orderBy(col("delta_bp").asc, col("tok")).limit(k)
          .withColumn("side", lit("b")))
  }

  /** Collocation extraction: top-k adjacent-token pairs by pointwise
    * mutual information (Church & Hanks 1990), support-floored —
    * PMI = ln(c(a,b)·n / (c(a·)·c(·b))) over slot marginals, floored to
    * basis points once per distinct pair (the engine's ln-bp device), so
    * the ranking is engine-independent. The support floor is what makes
    * PMI usable (bare PMI promotes hapax pairs).
    *
    * Scale shape: ONE corpus explode into pair counts (map-side
    * combine); both marginals DERIVE from the pair-count table (grouped
    * re-aggregations, |vocab|-bounded outputs), never a second corpus
    * pass; n is a 1-row broadcast and the top-k is a TakeOrdered.
    */
  def collocations(df: DataFrame, id: String, text: String,
      minCount: Long = 5L, k: Int = 30): DataFrame = {
    val toks = filter(tokenize(col(text)), t => length(t) > 0)
    // adjacent pairs as native positional bigrams (guide §4.1 — the
    // slice×2+zip_with struct lambda was interpreted per element); the
    // "a b" gram ↔ (a, b) split is exact over space-free tokens and
    // runs once per DISTINCT pair, after the count aggregate
    val pairs = df.select(col(id).as("doc"), toks.as("_t"))
      .filter(size(col("_t")) > 1)
      .select(explode(graft.functions.wordNgrams(col("_t"), 2)).as("_g"))
      .groupBy("_g").agg(count(lit(1)).as("c_ab"))
      .select(substring_index(col("_g"), " ", 1).as("a"),
        substring_index(col("_g"), " ", -1).as("b"), col("c_ab"))
      .localCheckpoint(false)
    val ca = pairs.groupBy("a").agg(sum("c_ab").as("c_a"))
    val cb = pairs.groupBy("b").agg(sum("c_ab").as("c_b"))
    val n = pairs.agg(sum("c_ab").as("n"))
    // mirrored literally in the DuckDB oracle (fixed association order)
    val pmiBp = floor(log((col("c_ab") * col("n")).cast("double") /
      (col("c_a") * col("c_b")).cast("double")) * 10000).cast("long")
    pairs.filter(col("c_ab") >= minCount)
      .join(ca, Seq("a")).join(cb, Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"), pmiBp.as("pmi_bp"))
      .orderBy(desc("pmi_bp"), col("a"), col("b"))
      .limit(k)
  }

  /** EXACT distributed quantiles over a bounded-domain integer column,
    * per group — the histogram-threshold device ([[selectTopPctByScore]],
    * [[scoreTertiles]]) generalized to an arbitrary quantile vector:
    * group the corpus ONCE into (group, value) counts, cumulative-sum
    * over the ≤ |group|·|domain| histogram (never the corpus), and each
    * requested quantile q reads off the smallest value whose cumulative
    * count reaches ceil(q·n/10⁴) (the lower-rank / type-1 definition —
    * always an actual data value, integer-exact in any engine).
    *
    * This is what approxQuantile refuses to be: exact, deterministic,
    * and oracle-replayable — affordable whenever the value domain is
    * bounded (lengths, counts, scores in bp), which is every quality
    * column this engine emits. Output: (group, q_bp, value).
    */
  def histogramQuantiles(df: DataFrame, group: String, value: String,
      qsBp: Seq[Long]): DataFrame =
    histogramQuantilesFromHist(
      df.select(col(group).as("g"), col(value).cast("long").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("c")),
      qsBp)
      .withColumnRenamed("g", group)

  /** [[histogramQuantiles]]' rank core over a PREBUILT (g, v, c)
    * histogram — serves exact quantiles straight from a maintained
    * histogram table ([[graft.streaming.StreamSketch.histView]]) with
    * zero corpus passes at query time. */
  def histogramQuantilesFromHist(hist: DataFrame, qsBp: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qsBp.nonEmpty && qsBp.forall(q => q > 0 && q <= 10000),
      s"quantiles must be in (0, 10000] bp: $qsBp")
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-group windows, but one hot group degrades to the single-task
    // frame the guard exists for — bound the whole histogram
    val cum = Guard.domainBounded(hist, "histogramQuantiles")
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val qdf = hist.sparkSession.range(1)
      .select(explode(typedLit(qsBp)).as("q_bp"))
    // integer ceil((q·n)/10⁴) — no floating point anywhere
    cum.crossJoin(broadcast(qdf))
      .filter(col("cum") >= expr("(q_bp * n + 9999) div 10000"))
      .groupBy("g", "q_bp").agg(min("v").as("value"))
      .select(col("g"), col("q_bp"), col("value"))
  }

  /** Token-budget MIXTURE PLANNING (waterfilling): given per-source token
    * inventories, target mixture weights, and a total token budget,
    * compute the achievable allocation — proportional to the weights
    * until a source runs out of tokens ("caps"), with the freed budget
    * re-flowing to the uncapped sources. The planning step every
    * pre-training mix runs before sampling (Pile/Dolma-style epoching
    * decisions: which sources repeat, which are undersampled).
    *
    * Waterfilling: sort sources by r_i = avail_i / w_i ascending; a
    * source is capped iff r_i < λ*, where λ* solves
    * Σ min(λ·w_i, avail_i) = budget. Relationally: for each row m (in
    * ratio order) compute λ_{m−1} = (budget − prefixAvail) /
    * suffixWeight over the EXCLUSIVE prefix; the first row with
    * r_m ≥ λ_{m−1} marks the cap boundary (everything before it caps).
    * No row satisfying it = the budget exceeds the whole inventory —
    * every source caps at its inventory.
    *
    * All windows run over the |sources|-row inventory table, never a
    * corpus: at 100 TB the corpus contributes exactly ONE
    * map-side-combinable token-count aggregate. λ is the only double
    * (fixed association, exact-long operands), so the plan replays
    * relationally and hash-gates.
    *
    * Sources with no weight entry (or non-positive inventory) are
    * excluded from the plan. Output per source: (src, avail, wt, alloc,
    * capped, epochs_bp = floor(alloc·10⁴/avail)) — epochs_bp > 10000
    * never occurs (alloc ≤ avail by construction; REPEATING a source
    * is a caller policy on top of the capped rows, not the planner's).
    */
  def mixturePlan(inventory: DataFrame, src: String, avail: String,
      weights: Map[String, Long], budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget must be >= 0: $budget")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val base = inventory
      .select(col(src).as("src"), col(avail).cast("long").as("avail"))
      .withColumn("wt", element_at(typedLit(weights), col("src")))
      .filter(col("wt").isNotNull && col("avail") > 0)
      .withColumn("r", col("avail").cast("double") / col("wt"))
    val guarded = Guard.domainBounded(base, "mixturePlan", maxRows = 100000L)
    val ord = Window.orderBy(col("r"), col("src"))
    val excl = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = guarded
      .withColumn("m", row_number().over(ord))
      .withColumn("pT", coalesce(sum("avail").over(excl), lit(0L)))
      .withColumn("cW", coalesce(sum("wt").over(excl), lit(0L)))
      .withColumn("totW", sum("wt").over(all))
      .withColumn("lam",
        (lit(budget) - col("pT")).cast("double") / (col("totW") - col("cW")))
    val boundary = ranked.filter(col("r") >= col("lam"))
      .agg(min_by(struct(col("m"), col("lam")), col("m")).as("b"))
      .select((col("b.m") - 1).as("kStar"), col("b.lam").as("lamStar"))
    ranked.crossJoin(broadcast(boundary))
      .select(col("src"), col("avail"), col("wt"),
        when(col("kStar").isNull || col("m") <= col("kStar"), col("avail"))
          .otherwise(floor(col("lamStar") * col("wt")).cast("long")).as("alloc"),
        (col("kStar").isNull || col("m") <= col("kStar")).as("capped"))
      .withColumn("epochs_bp",
        floor(col("alloc") * 10000.0 / col("avail")).cast("long"))
  }

  /** Interpolated Kneser–Ney bigram surprisal — the smoothing KenLM
    * actually ships (Kneser & Ney 1995; Chen & Goodman 1999's
    * interpolated form), one rung above [[bigramSurprisal]]'s add-one:
    *
    *   P(t|p) = max(c(p,t) − D, 0)/c(p) + D·N1+(p·)/c(p) · N1+(·t)/B
    *
    * with fixed discount D = 0.75, continuation counts N1+(·t) =
    * |{p : c(p,t) > 0}|, fan-out N1+(p·) = |{t : c(p,t) > 0}|, and
    * B = total bigram types. The continuation distribution — "how many
    * contexts does t complete" rather than "how often does t occur" —
    * is THE Kneser-Ney idea. First tokens condition on `<s>`, as in
    * [[bigramSurprisal]].
    *
    * Self-scoring regime (model trained on the corpus being scored)
    * guarantees every scored bigram has c(p,t) ≥ 1, so every factor is
    * positive and no unseen-event smoothing is needed — which keeps
    * the probability a fixed-association composition of integer-count
    * ratios, ln-floored to bp once per distinct (p, t): the engine's
    * oracle-portable LM device.
    *
    * Scale shape, identical to [[bigramSurprisal]]: the (doc, p, t, tf)
    * event table is checkpoint-materialized once; every downstream
    * exchange is bounded by bigram types or doc-bigram events, never
    * corpus text; the two scalar/vocab-bounded model tables broadcast.
    * Output: (doc, n_tokens, total_surprisal_bp, mean_surprisal_bp).
    */
  def knBigramSurprisal(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(tokenize(col(text)), t => length(t) > 0)
    val withT = df.select(col(id).as("doc"), toks.as("_t"))
      .filter(size(col("_t")) > 0)
    // same native <s>-padded bigram device as [[bigramSurprisal]]
    val tf2 = withT
      .select(col("doc"), explode(graft.functions.wordNgrams(
        concat(array(lit("<s>")), col("_t")), 2)).as("_g"))
      .groupBy("doc", "_g").agg(count(lit(1)).as("tf"))
      .select(col("doc"), substring_index(col("_g"), " ", 1).as("p"),
        substring_index(col("_g"), " ", -1).as("t"), col("tf"))
      .localCheckpoint(false)
    val c2 = tf2.groupBy("p", "t").agg(sum("tf").as("c2"))
    val ctx = c2.groupBy("p").agg(sum("c2").as("c1"), count(lit(1)).as("n1f"))
    val cont = c2.groupBy("t").agg(count(lit(1)).as("n1b"))
    val bt = c2.agg(count(lit(1)).as("bt"))
    // mirrored literally in the DuckDB oracle (fixed association order)
    val pKn = (col("c2") - lit(0.75)) / col("c1") +
      lit(0.75) * col("n1f") / col("c1") *
        (col("n1b").cast("double") / col("bt"))
    val surpBp = floor(-log(pKn) * 10000)
    tf2.join(c2, Seq("p", "t")).join(broadcast(ctx), Seq("p"))
      .join(broadcast(cont), Seq("t"))
      .crossJoin(broadcast(bt))
      .groupBy("doc").agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * surpBp).as("total_surprisal_bp"))
      .select(col("doc"), col("n_tokens"), col("total_surprisal_bp"),
        floor(col("total_surprisal_bp").cast("double") / col("n_tokens"))
          .cast("long").as("mean_surprisal_bp"))
  }

  /** Interpolated Kneser–Ney TRIGRAM surprisal — the KenLM rung above
    * [[knBigramSurprisal]] (order 3 of the same Chen & Goodman 1999
    * interpolated recursion):
    *
    *   P(t|p₂p₁) = (c₃−D)/c(p₂p₁) + D·N1+(p₂p₁·)/c(p₂p₁) · P₂(t|p₁)
    *   P₂(t|p₁)  = (c'₂−D)/c'(p₁)  + D·N1+(p₁·)/c'(p₁)   · N1+(·t)/T₂
    *
    * where the LOWER order runs on CONTINUATION counts — c'₂(p₁,t) =
    * |{p₂ : c₃(p₂,p₁,t)>0}|, c'(p₁) = ΣN, T₂ = total (p₁,t) types —
    * the Kneser-Ney idea applied recursively. D = 0.75 fixed. Contexts
    * pad with `<s> <s>`. Self-scoring keeps every factor positive (all
    * scored trigrams have c₃ ≥ 1), so the probability is a fixed-
    * association composition of integer-count ratios, ln-floored to bp
    * once per distinct (p₂,p₁,t) — the engine's oracle-portable LM
    * device, one order deeper.
    *
    * Scale shape: the (doc,p₂,p₁,t,tf) event table materializes once;
    * trigram-keyed model joins shuffle on their own keys (trigram/
    * bigram-type-bounded, never corpus text); only the |vocab|-bounded
    * tables (ctx2, cont1) and the two scalars broadcast.
    */
  def knTrigramSurprisal(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(tokenize(col(text)), t => length(t) > 0)
    val withT = df.select(col(id).as("doc"), toks.as("_t"))
      .filter(size(col("_t")) > 0)
    // (p2, p1, t) events as native positional trigrams over the
    // "<s> <s>"-padded token array (the [[bigramSurprisal]] device, one
    // order deeper): n grams for an n-token doc, one ending at each
    // token — exactly the old double-zip_with triples, with the gram
    // string ↔ (p2, p1, t) split a bijection over space-free tokens,
    // applied once per DISTINCT (doc, gram) before the checkpoint
    val tf3 = withT
      .select(col("doc"), explode(graft.functions.wordNgrams(
        concat(array(lit("<s>"), lit("<s>")), col("_t")), 3)).as("_g"))
      .groupBy("doc", "_g").agg(count(lit(1)).as("tf"))
      .select(col("doc"),
        substring_index(col("_g"), " ", 1).as("p2"),
        substring_index(substring_index(col("_g"), " ", 2), " ", -1).as("p1"),
        substring_index(col("_g"), " ", -1).as("t"), col("tf"))
      .localCheckpoint(false)
    val c3 = tf3.groupBy("p2", "p1", "t").agg(sum("tf").as("c3"))
      .localCheckpoint(false)
    val ctx3 = c3.groupBy("p2", "p1")
      .agg(sum("c3").as("c12"), count(lit(1)).as("n3f"))
    val cont2 = c3.groupBy("p1", "t").agg(count(lit(1)).as("n2c"))
      .localCheckpoint(false)
    val ctx2 = cont2.groupBy("p1")
      .agg(sum("n2c").as("cp1"), count(lit(1)).as("n2f"))
    val cont1 = cont2.groupBy("t").agg(count(lit(1)).as("n1b"))
    val t2 = cont2.agg(count(lit(1)).as("t2"))
    // mirrored literally in the DuckDB oracle (fixed association order)
    val pKn2 = (col("n2c") - lit(0.75)) / col("cp1") +
      lit(0.75) * col("n2f") / col("cp1") *
        (col("n1b").cast("double") / col("t2"))
    val pKn = (col("c3") - lit(0.75)) / col("c12") +
      lit(0.75) * col("n3f") / col("c12") * pKn2
    val surpBp = floor(-log(pKn) * 10000)
    tf3.join(c3, Seq("p2", "p1", "t")).join(ctx3, Seq("p2", "p1"))
      .join(cont2, Seq("p1", "t"))
      .join(broadcast(ctx2), Seq("p1"))
      .join(broadcast(cont1), Seq("t"))
      .crossJoin(broadcast(t2))
      .groupBy("doc").agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * surpBp).as("total_surprisal_bp"))
      .select(col("doc"), col("n_tokens"), col("total_surprisal_bp"),
        floor(col("total_surprisal_bp").cast("double") / col("n_tokens"))
          .cast("long").as("mean_surprisal_bp"))
  }

  /** Per-document keyword extraction: the top-k tokens by tf·idf
    * (idf = ln(N/df), N = docs with ≥1 token) — the classic summarize/
    * tag/route primitive (and the feature extractor behind lexical
    * clustering). Same determinism device as [[unigramSurprisal]]: idf
    * floors to basis points once per distinct token, weights by tf, so
    * scores are integers and the per-doc rank (score desc, token asc) is
    * total and engine-independent.
    *
    * Scale shape: exchanges bounded by distinct (doc, token) pairs and
    * |vocab| (the postings pass is checkpoint-materialized once, feeding
    * df counts, the N scalar, and the scoring join); the top-k window
    * partitions by doc — millions of small partitions, never a global
    * sort. Output: (doc, rank, token, score_bp). */
  def keywords(df: DataFrame, id: String, text: String, k: Int = 3): DataFrame =
    keywordsFromPostings(postings(df, col(id), col(text)), k)

  /** [[keywords]]' scoring core over a PREBUILT (doc, tok, tf) postings
    * frame — serves tf·idf keywords straight from a maintained index
    * (same contract as [[unigramSurprisalFromPostings]]). */
  def keywordsFromPostings(tf: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val ndocs = tf.agg(count_distinct(col("doc")).as("n"))
    // mirrored literally in the DuckDB oracle
    val idfBp = floor(log(col("n").cast("double") / col("df")) * 10000)
    tf.join(dfc, "tok")
      .crossJoin(broadcast(ndocs))
      .select(col("doc"), col("tok").as("token"),
        (col("tf") * idfBp).as("score_bp"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc")
          .orderBy(col("score_bp").desc, col("token").asc)).cast("int"))
      .filter(col("rank") <= k)
      .select(col("doc"), col("rank"), col("token"), col("score_bp"))
  }

  /** Rule-based document quality VERDICTS (Gopher-style, Rae et al. 2021
    * §A1.1 — the published web-corpus filter family): per-rule booleans
    * plus the conjunctive `keep`, so a pipeline can both filter and audit
    * WHY documents were dropped (rule ablation), which a single composite
    * score ([[profile]]'s `quality_bp`) cannot. Map-only projection, all
    * thresholds in integer basis points for oracle-exact compare.
    *
    * Rules (thresholds are the published defaults, scaled to this corpus
    * family where the paper's are web-specific):
    *  - `r_word_count`: 10 ≤ words ≤ 100 000 (paper: 50; synthetic docs
    *    are short, the BOUND SHAPE is what matters)
    *  - `r_mean_word_len`: mean word length in [3, 10] chars
    *  - `r_alpha_words`: ≥ 80% of words contain an alphabetic char
    *  - `r_symbol_ratio`: (# + …/"...") ≤ 10% of words
    *  - `r_bullet_lines`: ≤ 90% of lines start with a bullet (- or *)
    *  - `r_ellipsis_lines`: ≤ 30% of lines end with "..."
    *  - `r_stopwords`: ≥ 2 DISTINCT common stopwords present
    */
  /** Per-group Shannon token entropy (corpus-diversity profiling — the
    * collapse/diversity dial of mixture planning) in basis points of
    * nats, via the engine's quantized-ln device:
    *
    *   entropy_bp = (N·ln_bp(N) − Σ_t c_t·ln_bp(c_t)) div N
    *
    * with ln_bp(x) = floor(ln(x)·10⁴) floored ONCE per distinct count —
    * the algebraic rearrangement of Σ (c/N)·ln(N/c) that needs only ONE
    * ln per vocabulary row plus one per group. Exact integers after the
    * two floors, engine-portable. One corpus explode + a vocab-bounded
    * aggregate. */
  def tokenEntropy(df: DataFrame, group: String, text: String): DataFrame = {
    val toks = filter(split(lower(col(text)), "[^a-z0-9]+"),
      t => length(t) > 0)
    def lnBp(c: Column): Column =
      floor(log(c.cast("double")) * 10000).cast("long")
    val counts = df.select(col(group).as("g"), explode(toks).as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("c"))
    counts.groupBy("g")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_vocab"),
        sum(col("c") * lnBp(col("c"))).as("sclnc"))
      .withColumn("lnn", lnBp(col("n_tokens")))
      .select(col("g"), col("n_tokens"), col("n_vocab"),
        expr("(n_tokens * lnn - sclnc) div n_tokens").as("entropy_bp"))
  }

  /** Flesch reading-ease scoring, exact-integer form (the readability
    * gate of classic quality filtering): per document
    *
    *   flesch_milli = 206835 − (1015·words) div sentences
    *                         − (84600·syllables) div words
    *
    * — the published 206.835 − 1.015·(w/s) − 84.6·(syl/w) scaled ×1000
    * with each ratio floor-divided ONCE (the engine's deterministic
    * quantization contract). Sentences = `[.!?]+` runs (min 1);
    * syllables = vowel-group count per token with a 1-per-token floor,
    * computed as vowel groups over the space-joined token string plus
    * the vowel-less token count — two regex passes, no per-token lambda.
    * Map-only: fuses into the document scan. */
  def readability(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = filter(split(lower(col(text)), "[^a-z0-9]+"),
      t => length(t) > 0)
    df.select(col(id).as("doc"), col(text).as("_x"), toks.as("_t"))
      .select(col("doc"),
        size(col("_t")).cast("long").as("n_words"),
        greatest(lit(1L),
          size(regexp_extract_all(col("_x"), lit("[.!?]+"), lit(0)))
            .cast("long")).as("n_sentences"),
        (size(regexp_extract_all(concat_ws(" ", col("_t")),
            lit("[aeiouy]+"), lit(0))).cast("long") +
          size(filter(col("_t"), t => !t.rlike("[aeiouy]"))).cast("long"))
          .as("n_syllables"))
      .filter(col("n_words") >= 1L)
      .withColumn("flesch_milli",
        lit(206835L) - expr("(1015 * n_words) div n_sentences")
          - expr("(84600 * n_syllables) div n_words"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; word score = deg(w)/freq(w) where
    * freq counts occurrences and deg sums the lengths of phrases the
    * occurrence sits in; phrase score = Σ word scores (each ratio
    * floor-quantized to bp ONCE, then summed — exact integers, so the
    * ranking is engine-portable). Returns the top-k distinct phrases by
    * (score desc, phrase asc) with occurrence counts.
    *
    * Scale shape: phrase segmentation is the pos−row_number run device
    * (one doc-keyed window + one (doc, run) aggregation); word stats and
    * the phrase re-aggregation are phrase-bounded; the top-k is a
    * TakeOrdered. The corpus shuffles on doc once, everything after is
    * vocabulary/phrase-sized. */
  def rakeKeywords(df: DataFrame, id: String, text: String,
      stops: Seq[String] = stopwords, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(lower(col(text)), "[^a-z0-9]+"),
      t => length(t) > 0)
    val pos = df.select(col(id).as("doc"), toks.as("_t"))
      .select(col("doc"), posexplode(col("_t")).as(Seq("pos", "w")))
    val runs = pos.filter(!col("w").isin(stops.map(x => x: Any): _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc").orderBy("pos")))
      .withColumn("grp", col("pos") - col("rn"))
    val phrases = runs.groupBy("doc", "grp")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        s => s.getField("w")).as("words"))
      .select(col("doc"), col("grp"),
        concat_ws(" ", col("words")).as("phrase"),
        size(col("words")).cast("long").as("plen"), col("words"))
    val occur = phrases.select(col("doc"), col("grp"), col("phrase"),
      col("plen"), explode(col("words")).as("w"))
    val wordStats = occur.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("score_bp", expr("(deg * 10000) div freq"))
    occur.join(wordStats.select("w", "score_bp"), "w")
      .groupBy("doc", "grp", "phrase", "plen")
      .agg(sum("score_bp").as("score_bp"))
      .groupBy("phrase")
      .agg(min("plen").as("n_words"), count(lit(1)).as("n_occur"),
        min("score_bp").as("score_bp"))
      .orderBy(col("score_bp").desc, col("phrase").asc)
      .limit(k)
  }

  /** Hashing-trick featurization (Weinberger et al. 2009): tokens land
    * in `buckets` signed slots via the engine's portable md5 device —
    * bucket = first 8 md5 hex digits mod buckets, sign = parity of the
    * 9th digit — and each (doc, bucket) accumulates Σ sign (the signed
    * sum that keeps hashed inner products unbiased). Zero-sum slots are
    * dropped (a cancelled slot and an untouched slot are the same
    * feature value). Output (doc, bucket, w) sparse-triplet rows.
    * One explode + one (doc, bucket) aggregation — at 100 TB the
    * exchange is keyed on doc and map-side combine collapses repeats. */
  def hashFeatures(df: DataFrame, id: String, text: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val toks = filter(split(lower(col(text)), "[^a-z0-9]+"),
      t => length(t) > 0)
    df.select(col(id).as("doc"), explode(toks).as("w"))
      .select(col("doc"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
          % buckets).as("bucket"),
        when(conv(substring(md5(col("w")), 9, 1), 16, 10).cast("long")
          % 2 === 0L, lit(1L)).otherwise(lit(-1L)).as("s"))
      .groupBy("doc", "bucket").agg(sum("s").as("w"))
      .filter(col("w") =!= 0L)
  }

  def gopherRules(df: DataFrame, id: String, text: String): DataFrame = {
    val x = col("_x"); val toks = col("_toks"); val lines = col("_lines")
    def bp(num: Column, den: Column): Column =
      when(den === 0, 0L).otherwise(floor(num * 10000.0 / den).cast("long"))
    val nWords = when(length(trim(x)) === 0, 0L).otherwise(size(toks).cast("long"))
    val meanWl = bp(aggregate(toks, lit(0L), (a, t) => a + length(t)), size(toks))
    val alphaW = bp(size(filter(toks, t => t.rlike("[A-Za-z]"))), size(toks))
    val symbols = regexp_count(x, lit("#")) + regexp_count(x, lit("\\.\\.\\."))
    val symR = bp(symbols, size(toks))
    val bulletL = bp(size(filter(lines, l => ltrim(l).rlike("^[-*] "))), size(lines))
    val ellipL = bp(size(filter(lines, l => rtrim(l).endsWith("..."))), size(lines))
    val stopDistinct = size(array_intersect(
      transform(toks, t => lower(t)), typedLit(stopwords))).cast("long")
    df.select(col(id), col(text).as("_x"))
      .select(col(id), x, ws(x).as("_toks"), split(x, "\n").as("_lines"))
      .select(col(id),
        nWords.as("n_words"),
        nWords.between(10L, 100000L).as("r_word_count"),
        meanWl.between(30000L, 100000L).as("r_mean_word_len"),
        (alphaW >= 8000L).as("r_alpha_words"),
        (symR <= 1000L).as("r_symbol_ratio"),
        (bulletL <= 9000L).as("r_bullet_lines"),
        (ellipL <= 3000L).as("r_ellipsis_lines"),
        (stopDistinct >= 2L).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_alpha_words") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_stopwords"))
  }
}
