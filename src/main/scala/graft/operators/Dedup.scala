package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, plus connected-components clustering
  * over the resulting pair graphs. All operators are pure DataFrame plans
  * (codegen'd built-ins, no UDFs; [[clusters]] adds a driver-side fixpoint
  * loop of DataFrame rounds) designed so the candidate-generation stage —
  * the only quadratic danger at 100 TB — is blocked/banded and
  * frequency-capped.
  *
  * Plan-shape principle: shingle SETS are per-document state, so set
  * construction (`array_distinct`), set size (`size`), and candidate-pair
  * set intersection (`array_intersect`) all run row-local with zero
  * shuffle; the only exchanges left are the ones inherent to the
  * algorithm — the inverted-index block join and its count aggregation.
  */
object Dedup {

  /** Whitespace/case-normalized text (dedup canonical form). */
  def normText(c: Column): Column = lower(regexp_replace(trim(c), "\\s+", " "))

  /** Sorted-neighborhood dedup (Hernández & Stolfo 1995): rank the
    * corpus by a sort key that clusters near-duplicates (here the
    * normalized text itself), compare each row only against its next
    * `window − 1` neighbors in rank order, keep pairs whose 3-token
    * SHINGLE-set Jaccard ≥ `thresholdBp` (the n-gram family's
    * similarity contract — word-SET Jaccard is useless on shared-vocab
    * corpora where every long doc contains most of the vocabulary).
    * The third blocking paradigm in this
    * engine next to hash blocking (grouped inverted index) and LSH
    * banding — O(n·w) comparisons from ONE global order.
    *
    * Scale: the global rank is the two-phase range device (range
    * repartition → per-partition row_number + broadcast prefix offsets
    * — never a single-task window); the probe self-join moves
    * (w−1)·n rank-keyed rows; the Jaccard verify is row-local
    * (array_intersect on the pair row). SNM's known blind spot —
    * near-dups whose sort keys diverge in the first characters — is a
    * recall/cost trade the operator makes BY DESIGN (multi-pass SNM
    * with rotated keys is the standard recall fix and composes here as
    * a union of passes).
    */
  /** SNM's per-doc sort key + distinct 3-token shingle set —
    * (_id, _nt, _toks); shared by [[sortedNeighborhood]] and the
    * evaluation ground truth so the two sides cannot drift. */
  private[operators] def snmBase(df: DataFrame, id: String,
      text: String): DataFrame =
    df.select(col(id).as("_id"), normText(col(text)).as("_nt"))
      .withColumn("_w", filter(split(col("_nt"), " "), t => length(t) > 0))
      // distinct 3-token shingles; short docs fall back to the whole
      // text. The n-gram branch is the native one-pass expression
      // (identical output to the old transform/slice/concat_ws HOF —
      // single-space joins, first-occurrence dedup — minus the
      // per-element slice copies and interpreted lambdas the
      // shingleExpr history measured at 10-30×).
      .withColumn("_toks",
        when(size(col("_w")) >= 3, graft.functions.wordShingles(col("_w"), 3))
          .otherwise(array(concat_ws(" ", col("_w")))))
      .drop("_w")

  def sortedNeighborhood(df: DataFrame, id: String, text: String,
      window: Int, thresholdBp: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2 && thresholdBp >= 0 && thresholdBp <= 10000)
    val base = snmBase(df, id, text)
    // ALWAYS pin the ranged frame: offsets and ranks both read it, and a
    // ReuseExchange miss would re-SAMPLE the range boundaries per branch
    // — two different partitionings means corrupted global ranks (bit us
    // at sf0.1: 200 pairs where the oracle found 821; the conditional-
    // checkpoint form indexListingRanked uses survives only because its
    // two branches stay structurally identical after pruning)
    val ranged = base.repartitionByRange(col("_nt"), col("_id"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val offsets = ranged.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum("_cnt").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    val ranked = ranged.join(broadcast(offsets), "_pid")
      .withColumn("_rank", col("_off") +
        row_number().over(Window.partitionBy("_pid").orderBy("_nt", "_id")))
      .select("_id", "_toks", "_rank")
      .localCheckpoint(false)
    val probes = ranked.select(col("_id").as("_aid"), col("_toks").as("_atoks"),
      explode(sequence(col("_rank") + 1, col("_rank") + (window - 1)))
        .as("_rank"))
    val inter = graft.functions.intersectSize(col("_atoks"), col("_toks"))
    val uni = size(col("_atoks")) + size(col("_toks")) - inter
    probes.join(ranked, "_rank")
      .withColumn("_inter", inter.cast("long"))
      .withColumn("_uni", uni.cast("long"))
      // integer div — Spark's `/` on longs is double division
      .withColumn("jaccard_bp", expr("(_inter * 10000) div _uni"))
      .filter(col("jaccard_bp") >= thresholdBp)
      .select(least(col("_aid"), col("_id")).as("i"),
        greatest(col("_aid"), col("_id")).as("j"), col("jaccard_bp"))
  }

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** The distinct-shingle-set expression: one codegen'd pass
    * ([[graft.functions.WordShingles]]). The earlier higher-order-function
    * formulation was rebuilt twice around optimizer traps measured at
    * 10-30× each (lambda re-evaluation of inline `split`, `slice` array
    * copies, InferFiltersFromGenerate re-substituting the whole pipeline
    * into a scan filter); a single native expression is faster than the
    * best HOF form AND structurally immune — there is nothing for the
    * optimizer to take apart. Docs with fewer than n words yield the
    * empty set; set semantics (first-occurrence dedup) come from the
    * expression, never a distinct() shuffle. */
  private def shingleExpr(w: Column, n: Int): Column =
    graft.functions.wordShingles(w, n)

  /** (doc, _arr) — per-document distinct shingle set as an array column.
    * Short docs (< n words) are filtered out up front: the cheap
    * `size(words) >= n` predicate pushes to the scan WITHOUT dragging the
    * shingle construction with it (rule 3 above). */
  def shingleSet(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id).as("doc"), words(col(text)).as("_w"))
      .filter(size(col("_w")) >= n)
      .select(col("doc"), shingleExpr(col("_w"), n).as("_arr"))

  /** Distinct (doc, shingle) rows. The generator is the inline shingle
    * expression over the materialized word array (rules 1+3 above). */
  def shingles(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    df.select(col(id).as("doc"), words(col(text)).as("_w"))
      .select(col("doc"), explode(shingleExpr(col("_w"), n)).as("s"))

  /** (doc, nsh, s) — shingle rows carrying their doc's set size, so
    * Jaccard denominators need no size aggregation or post-join. The size
    * rides inside the exploded struct: the lambda reads `size(_arr)` on an
    * attribute (O(1) per element), and the complex generator input keeps
    * InferFiltersFromGenerate away (rule 3). */
  private[operators] def shingleRows(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    shingleSet(df, id, text, n)
      .select(col("doc"), explode(transform(col("_arr"),
        s => struct(s.as("s"), size(col("_arr")).as("nsh")))).as("_e"))
      .select(col("doc"), col("_e.nsh").as("nsh"), col("_e.s").as("s"))

  /** Exact dedup: group by normalized text; canonical row = min id.
    * One hash-agg shuffle; at 100 TB group instead by a 128-bit text hash
    * (`md5`) so the exchange carries 16 bytes, not document bodies —
    * `byHash=true` does exactly that. */
  def exact(df: DataFrame, id: String, text: String, byHash: Boolean = true): DataFrame = {
    val key = if (byHash) md5(normText(col(text))) else normText(col(text))
    df.select(col(id).as("doc_id"), key.as("k"))
      .groupBy("k")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")
  }

  /** Inverted-index blocking, grouped form: shuffle the (key, member)
    * rows ONCE into per-key groups, drop singleton groups (no pair) and
    * groups above the frequency cap (skew shed), then emit each group's
    * ordered pairs IN-TASK with row-local lambdas over the collected
    * member array. Versus the classic self-equi-join this computes the
    * key-derivation lineage once instead of twice and exchanges once
    * instead of twice (measured ~2.3× on sf0.1). The cap bounds the worst
    * task at f²·|group| pair emissions — the same bound the join form has,
    * but concentrated; that is exactly what the cap is for.
    */
  private[operators] def groupPairs(keyed: DataFrame, keys: Seq[String], member: Column,
      pairOf: (Column, Column) => Column, freqCap: Long,
      device: String = "groupPairs"): DataFrame =
    keyed.groupBy(keys.map(col): _*).agg(collect_list(member).as("_ds"))
      // the shed is spec-proven; observe() makes it VISIBLE at runtime
      // too (no silent caps): shed group/member counts ride the same
      // stage as the filter — CollectMetrics is a pass-through, no extra
      // job — retrievable from queryExecution.observedMetrics under the
      // graft_shed_ prefix
      .observe(Guard.shedMetricName(device),
        sum(when(size(col("_ds")) > freqCap, 1L).otherwise(0L))
          .as("shed_groups"),
        sum(when(size(col("_ds")) > freqCap, size(col("_ds")).cast("long"))
          .otherwise(0L)).as("shed_members"))
      .filter(size(col("_ds")).between(2, freqCap))
      // pair emission as two chained explodes (x-major, y-minor — the
      // exact order the old flatten(transform(filter(transform)))
      // emitted): Generate fuses into the whole-stage-codegen loop, so
      // each candidate is one codegen'd expression eval instead of an
      // interpreted per-element lambda allocating f arrays of f structs
      // per group. Same f² per-group bound, far cheaper constant — the
      // pair stage is byte-light but compute-dense, so AQE legitimately
      // gives it few tasks and the constant IS the stage.
      .select(col("_ds"), explode(col("_ds")).as("_x"))
      .select(col("_x"), explode(col("_ds")).as("_y"))
      .select(pairOf(col("_x"), col("_y")).as("_p"))
      .filter(col("_p").isNotNull)

  /** All pairs with shingle-set Jaccard ≥ threshold, exactly.
    *
    * Candidate generation is grouped inverted-index blocking
    * ([[groupPairs]] on the shingle). `freqCap` sheds shingle groups
    * larger than the cap: a stop-shingle shared by f docs would emit f²
    * pairs. Shedding only affects candidate generation — a pair whose
    * shared shingles are ALL hot is missed, but set sizes in the Jaccard
    * denominator always use the full sets (cap ≫ duplicate-group size in
    * practice; it exists for pathological hot keys, the skew story at
    * scale). Set sizes ride the shingle rows (`nsh` from the row-local
    * array) — no per-doc size aggregation and no post-joins.
    *
    * Output: (i, j, jac_bp) with i < j, Jaccard in basis points.
    */
  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
      thresholdBp: Int, freqCap: Long = 1000000L): DataFrame = {
    val sh = shingleRows(df, id, text, n)
      .select(col("s"), struct(col("doc"), col("nsh")).as("dn"))
    groupPairs(sh, Seq("s"), col("dn"), (x, y) =>
        when(x.getField("doc") < y.getField("doc"),
          struct(x.getField("doc").as("i"), y.getField("doc").as("j"),
            x.getField("nsh").as("ni"), y.getField("nsh").as("nj"))),
        freqCap, device = "jaccardPairs")
      .select(col("_p.i").as("i"), col("_p.j").as("j"),
        col("_p.ni").as("ni"), col("_p.nj").as("nj"))
      .groupBy("i", "j", "ni", "nj")
      .agg(count(lit(1)).as("c"))
      .withColumn("jac_bp",
        floor(col("c") * 10000.0 / (col("ni") + col("nj") - col("c"))).cast("long"))
      .filter(col("jac_bp") >= thresholdBp)
      .select("i", "j", "jac_bp")
  }

  /** ALL pairs at Jaccard ≥ threshold over the SNM shingle definition —
    * the gold standard [[sortedNeighborhood]] approximates: grouped
    * inverted-index blocking over the same `snmBase` sets (never
    * all-pairs in the plan; any pair at a positive threshold shares a
    * shingle). Exists to feed [[pairSetEval]]; the relational oracle
    * replays it quadratically.
    *
    * The intersection size is the per-pair CO-SHINGLE COUNT the
    * blocking join already produces (the [[jaccardPairs]] device —
    * `_toks` is a distinct set, so |intersect| = the number of shingle
    * groups emitting the pair): one count aggregate replaces the old
    * shape's distinct + two array-carrying joins + row-local
    * `array_intersect` (measured 6.8 s → join-free at sf0.1's 1.37M
    * candidates). Set sizes ride the shingle rows. Under a `freqCap`
    * shed the count misses shared-but-shed shingles — the documented
    * [[jaccardPairs]] shed contract (nothing sheds at the default cap;
    * the shed observe() receipt stays loud). */
  def snmTruthPairs(df: DataFrame, id: String, text: String,
      thresholdBp: Long, freqCap: Long = 1000000L): DataFrame = {
    val sets = snmBase(df, id, text)
      .select(col("_id").as("doc"), col("_toks"))
    val sh = sets.select(col("doc"),
      explode(transform(col("_toks"),
        s => struct(s.as("s"), size(col("_toks")).as("nsh")))).as("_e"))
      .select(col("doc"), col("_e.nsh").as("nsh"), col("_e.s").as("s"))
    groupPairs(sh.select(col("s"), struct(col("doc"), col("nsh")).as("dn")),
        Seq("s"), col("dn"),
        (x, y) => when(x.getField("doc") < y.getField("doc"),
          struct(x.getField("doc").as("i"), y.getField("doc").as("j"),
            x.getField("nsh").as("ni"), y.getField("nsh").as("nj"))),
        freqCap, device = "snmTruthPairs")
      .select(col("_p.i").as("i"), col("_p.j").as("j"),
        col("_p.ni").as("ni"), col("_p.nj").as("nj"))
      .groupBy("i", "j", "ni", "nj")
      .agg(count(lit(1)).as("_c"))
      .withColumn("jaccard_bp", expr("(_c * 10000) div (ni + nj - _c)"))
      .filter(col("jaccard_bp") >= thresholdBp)
      .select("i", "j", "jaccard_bp")
  }

  /** Pair-set EVALUATION — the measurement harness for approximate
    * dedup: given the pairs a method FOUND and the ground-TRUTH pairs,
    * the confusion counts and exact-integer precision / recall / F1 in
    * bp (F1's rational form 2tp/(2tp+fp+fn) needs one floor division).
    * Any blocking method's recall/cost trade becomes a NUMBER the
    * gates can watch instead of a scaladoc promise. Anti-joins keyed on
    * the pair — truth-sized exchanges, one 1-row result. */
  def pairSetEval(found: DataFrame, truth: DataFrame): DataFrame = {
    val f = found.select(col("i"), col("j")).distinct()
      .localCheckpoint(false)
    val t = truth.select(col("i"), col("j")).distinct()
      .localCheckpoint(false)
    val tp = f.join(t, Seq("i", "j")).agg(count(lit(1)).as("tp"))
    val fp = f.join(t, Seq("i", "j"), "left_anti")
      .agg(count(lit(1)).as("fp"))
    val fn = t.join(f, Seq("i", "j"), "left_anti")
      .agg(count(lit(1)).as("fn"))
    tp.crossJoin(fp).crossJoin(fn)
      .select(col("tp"), col("fp"), col("fn"),
        expr("CASE WHEN tp + fp = 0 THEN 0 " +
          "ELSE (tp * 10000) div (tp + fp) END").as("precision_bp"),
        expr("CASE WHEN tp + fn = 0 THEN 0 " +
          "ELSE (tp * 10000) div (tp + fn) END").as("recall_bp"),
        expr("CASE WHEN 2 * tp + fp + fn = 0 THEN 0 " +
          "ELSE (2 * tp * 10000) div (2 * tp + fp + fn) END").as("f1_bp"))
  }

  /** Deterministic engine-portable doc-sample predicate: the first 8 md5
    * hex chars of the id as an exact integer, membership h % denom ==
    * residue — the [[Importance.dsirSample]] hash basis, so DuckDB
    * replays the SAME sample verbatim. The denom residue classes are
    * disjoint and cover the corpus, which is what lets a spec bracket
    * the exact metric with every class's estimate. */
  def md5DocSample(id: Column, denom: Long, residue: Long): Column = {
    require(denom >= 1 && residue >= 0 && residue < denom,
      s"need 0 <= residue < denom, got $residue / $denom")
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % denom === residue
  }

  /** SAMPLED pair-set evaluation — [[pairSetEval]]'s 100 TB route. The
    * exact gold standard compares every co-shingled pair; past ~10⁸ docs
    * that is no longer computable, and the standard move is a sampled
    * evaluation corpus: restrict the evaluation UNIVERSE to the
    * deterministic md5 doc-sample (both endpoints sampled — a 1/denom
    * doc sample is a 1/denom² pair sample), build the exact SNM ground
    * truth only there, and score the production method's found pairs on
    * the same restricted universe. Precision/recall/F1 are ratio
    * estimators of the full-corpus metrics; tp/fp/fn scale by ~denom².
    * The truth pass costs (1/denom)² of the exact harness — pick denom
    * so the sampled sub-corpus fits the exact-truth budget.
    *
    * The method still runs at FULL scale (its blocking sees every doc —
    * sampling must not change what the method found, only where it is
    * audited), so `found` is the unrestricted pair output. */
  def sampledPairEval(found: DataFrame, corpus: DataFrame, id: String,
      text: String, thresholdBp: Long, denom: Long,
      residue: Long = 0L): DataFrame = {
    val in = md5DocSample(_: Column, denom, residue)
    val truth = snmTruthPairs(corpus.filter(in(col(id))), id, text,
      thresholdBp)
    pairSetEval(found.filter(in(col("i")) && in(col("j"))), truth)
  }

  /** Residue for audit epoch k: the SCALE.md production pattern "rotate
    * residues across audits for disjoint coverage" as code — `k % denom`,
    * so `denom` CONSECUTIVE epochs visit every residue class exactly
    * once (the classes partition the corpus), then the cycle repeats.
    * An operator that re-audits weekly with denom 10 has touched every
    * doc's class within 10 weeks, with no class audited twice before
    * all were audited once. */
  def auditResidue(epoch: Long, denom: Long): Long = {
    require(denom >= 1 && epoch >= 0, s"need denom >= 1, epoch >= 0: $epoch / $denom")
    epoch % denom
  }

  /** [[sampledPairEval]] driven by an audit EPOCH instead of an explicit
    * residue — the rotation-aware production entry: successive epochs
    * audit disjoint doc-sample classes ([[auditResidue]]), so repeated
    * audits accumulate coverage instead of re-measuring one fixed
    * 1/denom² pair universe. */
  def sampledPairEvalAtEpoch(found: DataFrame, corpus: DataFrame,
      id: String, text: String, thresholdBp: Long, denom: Long,
      epoch: Long): DataFrame =
    sampledPairEval(found, corpus, id, text, thresholdBp, denom,
      residue = auditResidue(epoch, denom))

  /** Prefix-filtered set-similarity join — the All-Pairs/PPJoin prefix
    * principle (Chaudhuri et al. 2006; Bayardo et al. 2007; Xiao et al.
    * 2008) as the FOURTH blocking paradigm next to the full inverted
    * index, LSH banding, and the sorted neighborhood: order every
    * document's shingles by a GLOBAL rarity order (df asc, shingle asc)
    * and index only the first |x| − ⌈t·|x|⌉ + 1 of them. By the prefix-
    * filter theorem any pair with Jaccard ≥ t shares a PREFIX shingle
    * under that common order (J ≥ t ⇒ overlap ≥ ⌈t·|x|⌉ for each side,
    * and the ⌈t·|x|⌉-suffix alone cannot hold the whole overlap) — so
    * candidate generation touches only prefix postings, which the
    * rare-first order keeps short where the full index is hottest.
    * EXACT recall; candidates verify row-locally against the full
    * shingle arrays (the minhash verify device, no shingle-row shuffle).
    *
    * Same output contract as [[jaccardPairs]] — (i, j, jac_bp), i < j —
    * and the exact join IS its oracle. freqCap sheds pathological hot
    * prefix groups exactly as the family documents.
    */
  def prefixJaccardPairs(df: DataFrame, id: String, text: String, n: Int,
      thresholdBp: Int, freqCap: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sets = shingleSet(df, id, text, n).localCheckpoint(false)
    val sh = sets.select(col("doc"), size(col("_arr")).cast("long").as("nsh"),
      explode(col("_arr")).as("s"))
    val dfs = sh.groupBy("s").agg(count(lit(1)).as("dfs"))
    val ranked = sh.join(dfs, "s")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc").orderBy(col("dfs"), col("s"))))
    val prefix = ranked.filter(col("rn") <=
      col("nsh") - expr(s"(($thresholdBp * nsh + 9999) div 10000)") + 1)
    // LENGTH FILTER at emission (the prefix-filter family's standard
    // companion, exact like the prefix theorem: c ≤ min(ni,nj) and
    // ni+nj−c ≥ max(ni,nj), so J ≥ t forces min ≥ t·max) — sizes ride
    // the prefix rows, so incompatible-length pairs never reach the
    // distinct or the array-verify join (the verify stage attaches both
    // full shingle arrays per candidate; it was the measured hot spot).
    val cand = groupPairs(
        prefix.select(col("s"), struct(col("doc"), col("nsh")).as("d")),
        Seq("s"), col("d"),
        (x, y) => when(x.getField("doc") < y.getField("doc") &&
            least(x.getField("nsh"), y.getField("nsh")) * 10000 >=
              greatest(x.getField("nsh"), y.getField("nsh")) * thresholdBp,
          struct(x.getField("doc").as("i"), y.getField("doc").as("j"))),
        freqCap, device = "prefixJaccardPairs")
      .select(col("_p.i").as("i"), col("_p.j").as("j")).distinct()
    // count-only intersection (no intersection array per candidate)
    val inter = graft.functions.intersectSize(col("_ai"), col("_aj")).cast("long")
    cand
      .join(sets.select(col("doc").as("i"), col("_arr").as("_ai")), "i")
      .join(sets.select(col("doc").as("j"), col("_arr").as("_aj")), "j")
      .withColumn("_c", inter)
      // identical floor(double) form as jaccardPairs — shares its oracle
      .withColumn("jac_bp",
        floor(col("_c") * 10000.0 /
          (size(col("_ai")) + size(col("_aj")) - col("_c"))).cast("long"))
      .filter(col("jac_bp") >= thresholdBp)
      .select("i", "j", "jac_bp")
  }

  /** Directional CONTAINMENT join — the asymmetric near-dup the
    * symmetric Jaccard family cannot see (a quote, excerpt, or
    * truncated copy sits INSIDE a longer document: tiny Jaccard, full
    * containment): for ordered pairs, cont_bp = |A∩B|·10⁴ div |A| ≥
    * threshold, i.e. "this share of src's shingles appears in dst".
    * Both directions of each co-occurring pair are scored from ONE
    * unordered intersection count (same grouped inverted index + caps
    * as [[jaccardPairs]]); output (src, dst, cont_bp). */
  def containmentPairs(df: DataFrame, id: String, text: String, n: Int,
      thresholdBp: Int, freqCap: Long = 1000000L): DataFrame = {
    val sh = shingleRows(df, id, text, n)
      .select(col("s"), struct(col("doc"), col("nsh")).as("dn"))
    val counted = groupPairs(sh, Seq("s"), col("dn"), (x, y) =>
        when(x.getField("doc") < y.getField("doc"),
          struct(x.getField("doc").as("i"), y.getField("doc").as("j"),
            x.getField("nsh").as("ni"), y.getField("nsh").as("nj"))),
        freqCap)
      .select(col("_p.i").as("i"), col("_p.j").as("j"),
        col("_p.ni").as("ni"), col("_p.nj").as("nj"))
      .groupBy("i", "j", "ni", "nj")
      .agg(count(lit(1)).as("c"))
    counted.select(col("i").as("src"), col("j").as("dst"),
        expr("(c * 10000) div ni").as("cont_bp"))
      .unionByName(counted.select(col("j").as("src"), col("i").as("dst"),
        expr("(c * 10000) div nj").as("cont_bp")))
      .filter(col("cont_bp") >= thresholdBp)
  }

  /** MinHash + LSH banding + exact verification.
    *
    * Pipeline: shingle → k-wide signature → b bands of r rows hashed to a
    * bucket → docs sharing a (band, bucket) become candidate pairs →
    * candidates are verified with exact Jaccard and filtered to the
    * threshold. Verification makes the output exact (no false positives);
    * the banding parameters put the false-negative knee well below the
    * threshold: P(miss | J) = (1 − J^r)^b — with r=4, b=32 a true pair at
    * J=0.9 is missed with p ≈ 1e−15.
    *
    * Scale: the candidate join is on (band, bucket) — inverted-index
    * blocking, never all-pairs; signatures are 8k bytes per doc. The
    * verify stage joins the FEW candidate pairs back to the per-doc
    * shingle arrays and intersects row-locally (`array_intersect`) — no
    * shuffle of shingle rows, no count aggregation.
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String, n: Int,
      thresholdBp: Int, numHashes: Int = 128, bands: Int = 32,
      bucketCap: Long = 1000000L): DataFrame = {
    require(numHashes % bands == 0)
    val base = shingleSet(df, id, text, n)
    // Signature + banding fused into ONE native expression over the same
    // shingle array the verify stage uses: no exploded shingle rows, no
    // 128-buffer aggregate (and its multi-second one-time codegen), no
    // signature exchange — the only generated column is the bands array.
    minhashLshPairsFromState(
      base.select(col("doc"), col("_arr"),
        graft.functions.minhashBands(col("_arr"), numHashes, bands)
          .as("_bands")),
      thresholdBp, bucketCap)
  }

  /** [[minhashLshPairs]]' candidate+verify core over PREBUILT LSH state
    * (doc, _arr shingle set, _bands band buckets) — so pair detection can
    * serve from a MAINTAINED state table
    * ([[graft.streaming.StreamLsh]]) exactly as BM25 serves from the
    * maintained postings. Same contract: candidates from band-bucket
    * cogroups (bucketCap sheds pathological identical families), then
    * exact Jaccard verification against the stored shingle sets —
    * precision exact, recall the banding's. */
  def minhashLshPairsFromState(state: DataFrame, thresholdBp: Int,
      bucketCap: Long = 1000000L): DataFrame = {
    val buckets = state
      .select(col("doc"), posexplode(col("_bands")).as(Seq("band", "bucket")))
    // bucketCap: an all-identical-doc family lands in ONE bucket per band
    // and would emit its f² pairs in one task — same shed-on-pathology
    // contract as jaccardPairs' freqCap (collapse exact dups FIRST when a
    // corpus has giant identical families).
    val candidates = groupPairs(buckets, Seq("band", "bucket"), col("doc"),
        (x, y) => when(x < y, struct(x.as("i"), y.as("j"))), bucketCap,
        device = "minhashLsh")
      .select(col("_p.i").as("i"), col("_p.j").as("j"))
      .distinct()
    candidates
      .join(state.select(col("doc").as("i"), col("_arr").as("_ai")), "i")
      .join(state.select(col("doc").as("j"), col("_arr").as("_aj")), "j")
      .select(col("i"), col("j"),
        graft.functions.intersectSize(col("_ai"), col("_aj")).as("c"),
        size(col("_ai")).as("ni"), size(col("_aj")).as("nj"))
      .withColumn("jac_bp",
        floor(col("c") * 10000.0 / (col("ni") + col("nj") - col("c"))).cast("long"))
      .filter(col("jac_bp") >= thresholdBp)
      .select("i", "j", "jac_bp")
  }

  /** Keep-one-canonical policy in one call: retain each normalized-text
    * group's minimum-id row (the reference row [[exact]] reports).
    * Window-min over the 128-bit text-hash group, same shape as
    * [[exactPairs]]: ONE corpus scan and ONE exchange. The former
    * aggregate + left-semi formulation read the corpus twice and, at
    * scale, exchanged it twice — the canonical-id set is |distinct
    * texts|-sized, far past broadcast at 100 TB, so the semi join's
    * "small" side was a second full shuffle. */
  def dropExactDuplicates(df: DataFrame, id: String, text: String): DataFrame = {
    // window keyed on the hash EXPRESSION (no key helper column); the
    // one helper the filter needs gets a name proven absent from the
    // input, so a caller's own columns can never be clobbered and the
    // output schema is the input schema, exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(normText(col(text))))
    val m = Iterator.iterate("_min")(_ + "_")
      .dropWhile(n => df.columns.exists(_.equalsIgnoreCase(n))).next()
    df.withColumn(m, min(col(id)).over(w))
      .filter(col(id) === col(m))
      .drop(m)
  }

  /** (i, j) pairs of exact (normalized-text) duplicates, emitted as a
    * STAR per hash group (every member paired with the group minimum):
    * O(f) edges instead of a clique's O(f²) with identical connected
    * components — a 1M-copy family yields 1M−1 edges, not 5·10¹¹. One
    * aggregation on the text hash; no blowup anywhere. */
  def exactPairs(df: DataFrame, id: String, text: String): DataFrame =
    df.select(md5(normText(col(text))).as("k"), col(id).cast("long").as("doc"))
      .withColumn("i", min(col("doc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("k")))
      .filter(col("doc") =!= col("i"))
      .select(col("i"), col("doc").as("j"))

  /** Connected components over near-duplicate pairs: every document gets
    * `cluster` = the minimum doc id reachable through the pair graph, so
    * a dedup keep-policy is "keep doc == cluster".
    *
    * Min-label propagation, TWO hops per round: each round joins labels
    * across edges, min-aggs, joins again, min-aggs — label reach grows by
    * 2 edges per driver-side action instead of 1 (a CONSTANT 2× action
    * reduction: rounds = ⌈diameter/2⌉, NOT logarithmic — pointer-doubling
    * would need label-to-label joins this deliberately avoids, since its
    * intermediate sets blow past |edges|). Near-dup clusters are shallow
    * (a dup family links through its overlaps), so 1-2 rounds typical;
    * `maxIters` rounds (2·maxIters hops) bounds adversarial chains — a
    * chain longer than 2·maxIters edges converges incompletely, so size
    * maxIters to the corpus's plausible chain depth, not below it. The driver-side loop is rounds-many ACTIONS, not
    * data on the driver: each hop is two shuffles (join + min-agg) sized
    * by |edges|, and the round's only action is the localCheckpoint —
    * the convergence check rides it via `observe()` instead of running
    * its own aggregation job. Deterministic; isolated docs are seeded
    * with their own id and no edge ever updates them, so they form
    * singleton clusters.
    */
  def clusters(docs: DataFrame, id: String, pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    import org.apache.spark.sql.Observation
    val nodes = docs.select(col(id).cast("long").as("doc"))
    val ij = pairs.select(col("i").cast("long").as("u"), col("j").cast("long").as("v"))
    val edges = ij.unionByName(ij.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    // Convergence metric: labels only ever DECREASE, so the label sum
    // strictly decreases iff any node changed — one overflow-safe decimal
    // sum instead of a join-compare of full label sets. It is attached
    // with observe() so the SAME job that materializes the checkpoint
    // produces it (CollectMetricsExec is a streaming pass-through; no
    // extra action, no extra exchange).
    def observed(df: DataFrame): (DataFrame, Observation) = {
      val obs = Observation()
      (df.observe(obs, sum(col("lbl").cast("decimal(38,0)")).as("lblsum")), obs)
    }
    def sumOf(obs: Observation): java.math.BigDecimal =
      obs.get.get("lblsum") match {
        case Some(d: java.math.BigDecimal) => d
        case Some(null) | None => java.math.BigDecimal.ZERO // empty corpus → sum is null
        case Some(other) =>
          // A catch-all here would read any metric-type drift (e.g. a
          // Spark upgrade changing the external decimal type) as sum 0 ==
          // prevSum 0 and silently declare convergence after one round.
          throw new IllegalStateException(
            s"clusters(): observation metric 'lblsum' returned ${other.getClass.getName}; " +
              "expected java.math.BigDecimal — convergence check cannot proceed")
      }
    // localCheckpoint each round: iterative plans otherwise grow their
    // lineage (and re-execute every prior round) — the standard pattern
    // for fixpoint algorithms on DataFrames.
    // Labels seed from nodes ∪ edge endpoints: an endpoint missing from
    // `docs` must still contribute its OWN id as a label candidate, or a
    // node smaller than all its neighbors would converge to the wrong
    // cluster id.
    val (seed, obs0) = observed(
      nodes.unionByName(edges.select(col("u").as("doc"))).distinct()
        .select(col("doc"), col("doc").as("lbl")))
    var labels = seed.localCheckpoint()
    var prevSum = sumOf(obs0)
    // One propagation hop: push every label across every edge, keep the
    // per-node minimum of (own label ∪ neighbor labels).
    def hop(l: DataFrame): DataFrame = {
      val viaEdges = edges
        .join(l.withColumnRenamed("doc", "u").withColumnRenamed("lbl", "ulbl"), "u")
        .select(col("v").as("doc"), col("ulbl").as("lbl"))
      l.unionByName(viaEdges).groupBy("doc").agg(min("lbl").as("lbl"))
    }
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val (next, obs) = observed(hop(hop(labels)))
      labels = next.localCheckpoint()
      val nextSum = sumOf(obs)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      it += 1
    }
    labels.select(col("doc"), col("lbl").as("cluster"))
  }

  /** 64-bit SimHash over word unigrams: per bit, majority vote of the
    * word-hash bits (weight 1), folded row-locally by ONE native
    * expression ([[graft.functions.SimHash64]]) — a map-only projection.
    * The previous explode + 64-column hash aggregate exchanged every
    * token; this exchanges nothing. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).as("doc"),
      graft.functions.simHash64(words(normText(col(text)))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Banding: the 64-bit hash splits into (maxHamming+1) chunks; by
    * pigeonhole, any pair within the distance agrees on at least one full
    * chunk — so an equi-join per chunk finds ALL such pairs (no false
    * negatives, unlike probabilistic LSH), then `bit_count(xor)` verifies.
    */
  def simhashPairs(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3, bucketCap: Long = 1000000L): DataFrame =
    hammingPairs(simhash(df, id, text), maxHamming, bucketCap)

  /** Pigeonhole-banded Hamming join over ANY 64-bit signature column —
    * the [[simhashPairs]] core, reusable for other 64-bit perceptual
    * hashes (e.g. the image dHash): input (doc, simhash) rows, output
    * all pairs at Hamming ≤ maxHamming — EXACT recall by pigeonhole,
    * candidates from (maxHamming+1) chunk equi-joins, bucketCap skew
    * shed as everywhere else in the dedup family. */
  def hammingPairs(s: DataFrame, maxHamming: Int,
      bucketCap: Long = 1000000L): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1).as("key"))
    }
    val blocked = s.select(col("doc"), col("simhash"),
      explode(array(chunkCols: _*)).as("ck"))
      .select(col("ck.chunk").as("chunk"), col("ck.key").as("key"),
        struct(col("doc"), col("simhash")).as("dh"))
    groupPairs(blocked, Seq("chunk", "key"), col("dh"),
        (x, y) => when(x.getField("doc") < y.getField("doc"),
          struct(x.getField("doc").as("i"), y.getField("doc").as("j"),
            x.getField("simhash").as("hi"), y.getField("simhash").as("hj"))),
        bucketCap, device = "simhashPairs")
      .select(col("_p.i").as("i"), col("_p.j").as("j"),
        bit_count(col("_p.hi").bitwiseXOR(col("_p.hj"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
