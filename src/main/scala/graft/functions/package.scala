package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.8 F1-F19), expressed as Column
  * combinators over built-in Catalyst expressions wherever one exists —
  * codegen'd and foldable, never closure UDFs. The two genuinely custom
  * pieces are [[functions.HtmlUnescape]] (F7, native Expression) and the
  * markdown renderer (F10, render-layer only, see graft.render).
  */
package object functions {

  // ---- F1: reddit base-36 id codec (reference common.py:43-65) ----------
  /** "abc123" → 623485333 (reddit ids are unsigned; sign branch not needed). */
  def b36decode(c: Column): Column = conv(lower(c), 36, 10).cast("long")
  /** 623485333 → "abc123" (lowercase, reddit convention). */
  def b36encode(c: Column): Column = lower(conv(c.cast("string"), 10, 36))

  // ---- F2: fullname prefixes (common.py:147-150) -------------------------
  def t3Prefix(c: Column): Column =
    when(c.startsWith("t3_"), c).otherwise(concat(lit("t3_"), c))
  def t1Prefix(c: Column): Column =
    when(c.startsWith("t1_"), c).otherwise(concat(lit("t1_"), c))
  /** Strip a `tN_` fullname prefix back to the bare base-36 id. */
  def stripTypePrefix(c: Column): Column =
    when(c.rlike("^t[0-9]_"), substring(c, 4, Int.MaxValue)).otherwise(c)

  // ---- F3/F4: human timestamp formats (common.py:94-97; index.py:17) ----
  /** epoch seconds → "Jan 01 2024 10:30:00" UTC (reference `human`). */
  def humanTime(epoch: Column): Column =
    date_format(to_utc_timestamp(from_unixtime(epoch), "UTC"), "MMM dd yyyy HH:mm:ss")
  /** epoch seconds → "2024 Jan 01" (reference index listing format). */
  def indexTime(epoch: Column): Column =
    date_format(to_utc_timestamp(from_unixtime(epoch), "UTC"), "yyyy MMM dd")

  // ---- F5: current UTC epoch (common.py:88-92) ---------------------------
  def nowEpoch(): Column = unix_timestamp(current_timestamp())

  // ---- F6: stored text length (tsdb.py:424,485) ---------------------------
  def textlen(c: Column): Column = length(c).cast("long")

  // ---- F7: HTML unescape (pushshift.py:72-73) — native Expression --------
  def htmlUnescape(c: Column): Column = column(HtmlUnescape(expression(c)))

  // ---- Unicode canonicalization (multilingual ingest) — native Expression
  /** NFC canonical composition (mirrors DuckDB nfc_normalize); ASCII fast
    * path. */
  def unicodeNfc(c: Column): Column = column(UnicodeNfc(expression(c)))
  /** NFKC compatibility folding (full-width forms, ligatures) — engine
    * API only; the hash-gated surface pins NFC. */
  def unicodeNfkc(c: Column): Column = column(UnicodeNfkc(expression(c)))
  /** NFD → drop combining marks → NFC (mirrors DuckDB strip_accents on
    * the Latin ranges). */
  def stripAccents(c: Column): Column = column(StripAccents(expression(c)))

  // ---- vector math (similarity/dedup scale path) — native Expression -----
  /** dot(a, b) over numeric arrays (cast to double), codegen'd tight loop. */
  def vecDot(a: Column, b: Column): Column =
    column(VectorDot(expression(a.cast("array<double>")),
      expression(b.cast("array<double>"))))

  /** Unit-normalize a numeric array in one pass; null for zero vectors. */
  def vecNormalize(a: Column): Column =
    column(VectorNormalize(expression(a.cast("array<double>"))))

  /** SRP/LSH signature: one bit per hyperplane (≤64), all dot products in
    * one codegen'd pass over the vector. */
  def srpSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    column(SrpSignature(expression(v.cast("array<double>")),
      planes.map(_.toIndexedSeq).toIndexedSeq))

  /** Top-`keep` nearest codebook indices (dot desc, index asc), map-only. */
  def nearestCentroids(v: Column, cents: Seq[Seq[Double]], keep: Int): Column =
    column(NearestCentroids(expression(v.cast("array<double>")),
      cents.map(_.toIndexedSeq).toIndexedSeq, keep))

  /** Integer-exact squared-L2 argmin over a quantized codebook, packed as
    * `dist²·|codebook| + cid` (ties to the smallest cid) — map-only. */
  def centroidArgminL2(v: Column, cents: Seq[Seq[Long]]): Column =
    column(CentroidArgminL2(expression(v),
      cents.map(_.toIndexedSeq).toIndexedSeq))

  /** PQ codes (length-m array<int>) for a vector — map-only, codebook as
    * plan metadata. Codebook shape: m subspaces × ksub codewords × d/m. */
  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqEncode(expression(v.cast("array<double>")),
      codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** Per-query ADC lookup table (m × ksub array<array<double>>). */
  def pqLut(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    column(PqLut(expression(v.cast("array<double>")),
      codebooks.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** ADC score: Σ_j lut[j][codes[j]] — m lookups per candidate pair. */
  def pqAdc(codes: Column, lut: Column): Column =
    column(PqAdc(expression(codes), expression(lut)))

  /** Apply one BPE merge rule to a symbol array — greedy left-to-right,
    * non-overlapping; map-only (rule is a plan-time constant). */
  def bpeMerge(syms: Column, left: String, right: String): Column =
    column(BpeMergeApply(expression(syms), left, right))

  /** Apply an entire learned BPE merge table in order — one call, rule
    * table as a codegen reference object (the serving form at real
    * merge budgets). */
  def bpeApplyRules(syms: Column, rules: Seq[(String, String)]): Column =
    column(BpeApplyRules(expression(syms), rules))

  /** Distinct word n-gram shingle set over a word array, one codegen'd pass. */
  def wordShingles(words: Column, n: Int): Column =
    column(WordShingles(expression(words), n))

  /** Character trigrams of a string (code-point boundaries, every
    * occurrence in position order), one codegen'd pass; `distinct`
    * keeps first occurrences only (≡ array_distinct). */
  def charTrigrams(c: Column, distinct: Boolean = false): Column =
    column(CharTrigrams(expression(c), distinct))

  /** Positional word n-grams (single-space joins, no dedup), one
    * codegen'd pass — the LM/feature counterpart of [[wordShingles]]. */
  def wordNgrams(words: Column, n: Int): Column =
    column(WordNgrams(expression(words), n))

  /** [[wordNgrams]] with an explicit join separator (event paths). */
  def wordNgrams(words: Column, n: Int, sep: String): Column =
    column(WordNgrams(expression(words), n, sep))

  /** |A ∩ B| of two string arrays — `size(array_intersect(a, b))`
    * without materializing the intersection array, one codegen'd pass. */
  def intersectSize(a: Column, b: Column): Column =
    column(IntersectSize(expression(a), expression(b)))

  /** 64-bit SimHash of a word array, one codegen'd pass (no shuffle). */
  def simHash64(words: Column): Column =
    column(SimHash64(expression(words)))

  /** Position-ordered k-gram hashes (no dedup), one codegen'd pass — the
    * per-position unit of duplicated-span detection. */
  def gramHashes(words: Column, k: Int): Column =
    column(GramHashes(expression(words), k))

  /** MinHash-LSH band buckets (length-`bands` array<long>) over a shingle
    * array, one codegen'd pass — signature and banding fused. */
  def minhashBands(shingles: Column, numHashes: Int, bands: Int): Column =
    column(MinHashBands(expression(shingles), numHashes, bands))

  // ---- F10: markdown → HTML5 (offline_reading.py:285-291) ----------------
  def markdownRender(c: Column): Column = column(MarkdownRender(expression(c)))

  // ---- F8: HTML escape of brackets (offline_reading.py:285-291) ----------
  /** Correct `&gt;` (the reference's `&rt;` is a bug — SURVEY §7.4.5). */
  def htmlEscapeBrackets(c: Column): Column =
    regexp_replace(regexp_replace(c, "<", "&lt;"), ">", "&gt;")

  // ---- F9: brace sanitizer (offline_reading.py:293-296) ------------------
  def sanitizeBraces(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\{", "{{"), "\\}", "}}")

  // ---- F11: multi-delimiter split (common.py:135-140) --------------------
  def splitAny(c: Column): Column = split(c, "[+ ,]+")

  // ---- F12: newline strip in titles (index.py:159) ------------------------
  def stripNewlines(c: Column): Column = regexp_replace(c, "\n", " ")

  // ---- F16: author tombstone sentinel (tsdb.py:394-397) -------------------
  def authorOrDeleted(c: Column): Column = coalesce(c, lit("[DELETED]"))

  // ---- F17: link templating (index.py:137-146) -----------------------------
  /** Short reddit link for a submission id ("abc123" → redd.it/abc123). */
  def shortLink(id: Column): Column =
    concat(lit("https://redd.it/"), stripTypePrefix(id))
  def permalink(subreddit: Column, submissionId: Column): Column =
    format_string("https://reddit.com/r/%s/comments/%s",
      subreddit, stripTypePrefix(submissionId))

  /** Column ↔ Expression bridges (Spark 4 classic API, via graftshim). */
  private[graft] def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftshim.ColumnBridge.expression(c)
  private[graft] def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(e)
}
