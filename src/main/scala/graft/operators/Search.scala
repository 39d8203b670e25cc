package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical top-k search: BM25 ranking over a document corpus.
  *
  * The embedding ANN path ([[Similarity.bruteTopK]]/ivf) answers "what is
  * semantically near"; this is its lexical complement — the keyword-recall
  * side of a retrieval stack (and the classic pre-filter in front of a
  * reranker in training-data curation). The reference has no search
  * operator (its closest surface is the rendered index listings,
  * timesearch index.py family); BM25 is the standard public formulation
  * (Robertson et al., TREC-3; the +1-smoothed idf variant popularized by
  * Lucene) over the same tokenization contract the vocabulary/repetition
  * operators already pin (lowercased `[a-z0-9]+` runs).
  *
  * Score(q, d) = Σ_{t ∈ q} idf(t) · tf_c(t, d)
  *   idf(t)     = ln(1 + (N − df + 0.5) / (df + 0.5))
  *   tf_c(t, d) = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),  k1=1.2, b=0.75
  *
  * Determinism contract (the oracle device used across this engine):
  * idf and tf_c are floored to basis points SEPARATELY and multiplied as
  * integers, so the per-document score is an INTEGER sum — associative,
  * which means Spark's partial-aggregation order cannot perturb a rank,
  * and two engines computing the same rational sub-expressions on the
  * same inputs floor identically. The only transcendental is ln, applied
  * to one distinct input per query term (≤ |query terms| distinct df
  * values corpus-wide), floored at 1e4 — a cross-engine ULP flip would
  * need ln's result within ~1e-12 of a basis-point boundary.
  *
  * 100 TB shape: the query-term list is tiny and BROADCAST — corpus rows
  * containing no query term are dropped by a broadcast hash join before
  * any wide exchange, so the scored candidate set (and every shuffle
  * after it) is sized by the inverted-index posting lists of the query
  * terms, not the corpus. df/N/avgdl are corpus-wide aggregates with
  * map-side combine (|vocab|- and 1-row-sized exchanges). The final
  * per-query top-k is `row_number ≤ k` over a per-query window, which
  * AQE executes as partial take-ordered per partition (same shape as
  * [[Similarity.bruteTopK]]). Identical documents tie exactly (integer
  * scores) and break deterministically on doc id.
  */
object Search {

  /** @param queries (query_id, query text) — tokenized with the corpus
    *        tokenizer; duplicate terms within one query count once (term-
    *        SET semantics, documented over weighted-tf semantics for
    *        determinism of the contract, not convenience)
    * @return (query_id, rank, doc_id, score_bp), rank 1-based by
    *         (score_bp desc, doc_id asc), at most k rows per query */
  def bm25TopK(docs: DataFrame, id: String, text: String,
      queries: Seq[(Long, String)], k: Int = 10): DataFrame =
    // shared checkpoint-materialized postings pass — see
    // TextAnalysis.postings for the tokenization contract and the
    // build-the-index-once rationale (three consumers here: dl/stats,
    // dfq, scoring; ReuseExchange misses two of them)
    bm25TopKFromPostings(
      TextAnalysis.postings(docs, col(id).cast("long"), col(text)), queries, k)

  /** [[bm25TopK]]'s scoring core over a PREBUILT (doc, tok, tf) postings
    * frame — the serving entry point for indexes maintained elsewhere
    * (e.g. the streaming-upserted [[graft.streaming.StreamIndex]] table,
    * already materialized storage that needs no checkpoint pass). The
    * scoring plan and the determinism contract are exactly [[bm25TopK]]'s;
    * `doc` must be long (the corpus form casts its id column). */
  def bm25TopKFromPostings(tf: DataFrame,
      queries: Seq[(Long, String)], k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = tf.sparkSession
    import spark.implicits._

    // term-SET semantics must hold across REPEATED query_id entries too
    // (Seq(0 -> "alpha", 0 -> "alpha beta") is one query with 2 terms),
    // so the distinct runs on the flattened (qid, term) pairs
    val qterms = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(qid -> _)
    }.distinct.toDF("query_id", "tok")

    // document length = token count; derived from tf so the (doc, tok)
    // exchange is planned once and reused for both branches
    val dl = tf.groupBy("doc").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))

    // corpus-side inverted-index filter FIRST: only postings of query
    // terms survive past this broadcast join
    val tfq = tf.join(broadcast(qterms.select("tok").distinct()), "tok")
    val dfq = tfq.groupBy("tok").agg(count(lit(1)).as("df"))

    // expression shapes are written IDENTICALLY in the DuckDB oracle —
    // same literals, same association order → same doubles
    val avgdl: Column = col("sumdl").cast("double") / col("n").cast("double")
    val idf: Column = log(lit(1.0) +
      (col("n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfc: Column = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    val contrib = floor(idf * lit(10000)) * floor(tfc * lit(10000))

    val scored = tfq
      .join(broadcast(qterms), "tok")
      .join(broadcast(dfq), "tok")
      .join(dl, "doc")
      .crossJoin(broadcast(stats))
      .groupBy("query_id", "doc")
      .agg(sum(contrib).as("score_bp"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score_bp").desc, col("doc").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc").as("doc_id"),
        col("score_bp"))
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM3 family):
    * run BM25, mine expansion terms from the top `fbDocs` documents per
    * query, re-run BM25 with the expanded term set — the classic
    * two-pass PRF loop, in the engine's deterministic integer algebra:
    *
    *  - mining score = floor(idf·10⁴) · Σtf over the feedback docs
    *    (same idf expression as scoring, floored ONCE), original query
    *    terms excluded, top `expandTerms` by (score desc, tok asc);
    *  - the expanded query is the term-SET union, re-scored by the
    *    SAME bm25 core — so the final ranking hash-gates end to end.
    *
    * The mined terms pass through the driver (|queries|·expandTerms
    * rows — query metadata, the per-query loop every PRF serving stack
    * runs; same bounded-collect contract as the ANN codebooks). The
    * postings pass is checkpoint-materialized once and feeds both
    * passes — the corpus is never re-read for the second pass.
    */
  def prfTopK(docs: DataFrame, id: String, text: String,
      queries: Seq[(Long, String)], k: Int = 10, fbDocs: Int = 5,
      expandTerms: Int = 3): DataFrame =
    prfTopKFromPostings(
      TextAnalysis.postings(docs, col(id).cast("long"), col(text)),
      queries, k, fbDocs, expandTerms)

  /** [[prfTopK]] over a prebuilt postings frame (serving form). */
  def prfTopKFromPostings(tf: DataFrame, queries: Seq[(Long, String)],
      k: Int, fbDocs: Int, expandTerms: Int): DataFrame = {
    require(fbDocs >= 1 && expandTerms >= 0)
    val spark = tf.sparkSession
    import spark.implicits._
    val qtermSet = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(qid -> _)
    }.distinct
    val qterms = qtermSet.toDF("query_id", "tok")
    val first = bm25TopKFromPostings(tf, queries, fbDocs)
    val n1 = tf.select(col("doc")).distinct().agg(count(lit(1)).as("n"))
    val dfAll = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idfFloor = floor(log(lit(1.0) +
      (col("n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      * 10000)
    val mined = first.select(col("query_id"), col("doc_id").as("doc"))
      .join(tf, "doc")
      .groupBy("query_id", "tok").agg(sum("tf").as("stf"))
      .join(qterms, Seq("query_id", "tok"), "left_anti")
      .join(dfAll, "tok")
      .crossJoin(broadcast(n1))
      .select(col("query_id"), col("tok"),
        (idfFloor * col("stf")).cast("long").as("ms"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("ms").desc, col("tok").asc)))
      .filter(col("rk") <= expandTerms)
    val extra = mined.select("query_id", "tok").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expanded = (qtermSet ++ extra).distinct
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (qid, ts) => qid -> ts.map(_._2).sorted.mkString(" ") }
    bm25TopKFromPostings(tf, expanded, k)
  }

  /** Hybrid retrieval: BM25 lexical candidates fused with embedding
    * cosine candidates by Reciprocal Rank Fusion (Cormack et al.,
    * SIGIR'09): score(d) = Σ_lists (10000 div (rrfK + rank_list(d))),
    * INTEGER-quantized (this engine's oracle device) so fused scores are
    * associative and ranks engine-independent. A document absent from a
    * list contributes nothing for it — the standard RRF treatment; ties
    * break on doc id.
    *
    * Pairing contract: query (qid, terms) uses the embedding with vector
    * id == qid as its semantic side (the caller aligns the key spaces).
    * The vector side never returns the query vector itself
    * ([[Similarity.bruteTopK]] excludes self); the lexical side has no
    * such notion (queries are term strings, not corpus rows).
    *
    * 100 TB shape: each candidate generator keeps its own audited plan
    * (bm25TopK broadcast-prunes the corpus to query-term postings;
    * bruteTopK broadcasts queries and never shuffles the corpus); fusion
    * then touches ≤ 2·kCand·|queries| rows, so every exchange after
    * candidate generation is candidate-sized, never corpus-sized.
    *
    * @param semTopK the semantic candidate generator,
    *        (emb, vecId, vec, queryIds, kCand) → (query_id, rank,
    *        neighbor_id, …) — default the exact [[Similarity.bruteTopK]];
    *        pass [[Similarity.ivfTopK]] (partially applied with its
    *        nlist/nprobe) for the probed serving path at scale. Fusion
    *        reads only (query_id, rank, neighbor_id). */
  def hybridTopK(docs: DataFrame, id: String, text: String,
      emb: DataFrame, vecId: String, vec: String,
      queries: Seq[(Long, String)], k: Int = 10, kCand: Int = 20,
      rrfK: Int = 60,
      semTopK: (DataFrame, String, String, Seq[Long], Int) => DataFrame =
        Similarity.bruteTopK): DataFrame = {
    // the fused pool holds up to 2·kCand docs per query, so any k up to
    // that depth is meaningful (k > pool size just returns the pool)
    require(k >= 1 && kCand >= 1, s"need k >= 1 and kCand >= 1, got k=$k kCand=$kCand")
    // 10000/(rrfK+rank) via double floor is exact integer division: an
    // IEEE quotient of small ints errs < 1 ulp, which cannot cross an
    // integer boundary unless the true quotient IS that integer (and
    // then the division is exact) — same argument as selectTopPctByScore
    def rrf(rank: Column): Column =
      floor(lit(10000.0) / (lit(rrfK) + rank)).cast("long")
    val lex = bm25TopK(docs, id, text, queries, kCand)
      .select(col("query_id"), col("doc_id"), rrf(col("rank")).as("rrf"))
    val sem = semTopK(emb, vecId, vec, queries.map(_._1), kCand)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        rrf(col("rank")).as("rrf"))
    val fused = lex.unionByName(sem)
      .groupBy("query_id", "doc_id")
      .agg(sum("rrf").as("rrf_bp"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_bp").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_bp"))
  }

  /** Trigram-index-accelerated SUBSTRING search (the pg_trgm
    * architecture): literal-pattern containment over the corpus without
    * a full contains() scan per pattern. Candidate generation: a doc
    * can contain pattern P only if it contains EVERY character trigram
    * of P — the per-doc distinct-trigram postings are built in one
    * corpus pass (or served MAINTAINED by
    * [[graft.streaming.StreamTrgm]], the lexical index's trigram
    * sibling), pattern trigrams broadcast, and a doc qualifies when its
    * matched-gram count equals |grams(P)|. Exact `contains` verification
    * (plus non-overlapping occurrence count via the replace-length
    * device) runs only on candidates — precision exact, recall exact
    * (the trigram condition is necessary), cost concentrated on the
    * selective prefilter.
    *
    * Patterns shorter than 3 chars get no prefilter (scan-verify);
    * matching is case-insensitive (both sides lowered).
    *
    * Output: (pid, doc_id, n_hits ≥ 1), one row per matching doc.
    */
  def substringSearch(docs: DataFrame, id: String, text: String,
      patterns: Seq[(Long, String)]): DataFrame =
    substringSearchFromGrams(gramRows(docs, id, text), docs, id, text,
      patterns)

  /** Per-doc DISTINCT character trigrams, (doc_id, g) — the postings
    * [[substringSearchFromGrams]] prefilters on; built in one corpus
    * pass here, or served maintained by
    * [[graft.streaming.StreamTrgm]]. */
  def gramRows(docs: DataFrame, id: String, text: String): DataFrame =
    // native one-pass distinct trigrams (code-point boundaries, first-
    // occurrence order — exactly the old substring-HOF + array_distinct
    // output, including the empty array under 3 chars)
    docs.select(col(id).as("doc_id"),
      explode(graft.functions.charTrigrams(lower(col(text)),
        distinct = true)).as("g"))

  /** [[substringSearch]]'s core over a PREBUILT (doc_id, g) trigram
    * postings view — candidate generation touches only the gram index
    * (maintained or batch-built); the exact contains verify reads the
    * corpus text for candidates alone. */
  def substringSearchFromGrams(grams: DataFrame, docs: DataFrame,
      id: String, text: String, patterns: Seq[(Long, String)]): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_._2.nonEmpty))
    require(patterns.forall(_._2.length >= 3),
      "patterns under 3 chars need the unfiltered scan path; keep them out " +
        "of the indexed operator")
    val lowered = docs.select(col(id).as("doc_id"), lower(col(text)).as("t"))
    val spark = docs.sparkSession
    import scala.jdk.CollectionConverters._
    val pRows = patterns.flatMap { case (pid, p) =>
      val lp = p.toLowerCase
      (0 to lp.length - 3).map(i => lp.substring(i, i + 3)).distinct
        .map(g => org.apache.spark.sql.Row(pid, lp, g))
    }
    val pSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pat", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType)))
    val pGrams = spark.createDataFrame(pRows.asJava, pSchema)
    val pMeta = pGrams.groupBy("pid", "pat").agg(count(lit(1)).as("need"))
    val candidates = grams.join(broadcast(pGrams), Seq("g"))
      .groupBy("doc_id", "pid").agg(count(lit(1)).as("have"))
      .join(broadcast(pMeta), Seq("pid"))
      .filter(col("have") === col("need"))
      .select("doc_id", "pid", "pat")
    // exact verify + occurrence count on candidates only; the length
    // difference is an exact multiple of len(pat), so the double
    // division is exact and the long cast lossless
    candidates.join(lowered, Seq("doc_id"))
      .filter(col("t").contains(col("pat")))
      .select(col("pid"), col("doc_id"),
        ((length(col("t")) - length(replace(col("t"), col("pat"), lit(""))))
          / length(col("pat"))).cast("long").as("n_hits"))
  }

  /** Positional-postings PHRASE search: documents containing the exact
    * consecutive token sequence `phrase` (corpus tokenizer contract:
    * lowercased `[a-z0-9]+` runs), with occurrence count and first
    * position (1-based, in token units).
    *
    * Scale shape: a map-only all-terms containment prune runs BEFORE the
    * positional explode — only documents holding every phrase term are
    * exploded, and only their phrase-term postings survive, so the
    * adjacency self-joins move candidate-sized posting lists, not the
    * corpus. The adjacency chain is (k−1) equi-joins on (doc, pos+i) —
    * the standard positional-index device (Lucene PhraseQuery's exact
    * mode) expressed relationally.
    */
  def phraseSearch(docs: DataFrame, id: String, text: String,
      phrase: String): DataFrame = {
    val terms = phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "empty phrase")
    val toks = docs.select(col(id).as("doc_id"),
      filter(split(lower(col(text)), "[^a-z0-9]+"), t => length(t) > 0)
        .as("toks"))
    val pruned = terms.foldLeft(toks)((d, t) =>
      d.filter(array_contains(col("toks"), t)))
    val posts = pruned
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos0", "tok")))
      .filter(col("tok").isin(terms: _*))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("tok"))
      // candidate-bounded (phrase-term postings of all-terms docs only);
      // pin it — the adjacency chain references it k times, and without
      // the checkpoint each reference re-scans and re-explodes the corpus
      .localCheckpoint(false)
    val first = posts.filter(col("tok") === terms.head)
      .select(col("doc_id"), col("pos"))
    val matches = terms.zipWithIndex.drop(1).foldLeft(first) {
      case (m, (t, i)) =>
        m.join(posts.filter(col("tok") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
    matches.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("pos").cast("long").as("first_pos"))
  }

  /** "More like this": top-k documents most similar to each seed doc by
    * the tf·idf dot product over shared terms — Lucene MoreLikeThis
    * re-expressed relationally. Weights are integer (tf · bp-floored
    * idf) so scores are exact associative sums; ranking is documented
    * as the UN-normalized dot (cosine's norm division would reintroduce
    * floats; seeds compare candidates against the same query vector, so
    * per-seed ranking only shifts for length-extreme candidates — the
    * standard MLT trade).
    *
    * Scale: postings built once (checkpoint); the seed postings are
    * query-sized and BROADCAST, so candidate generation streams the
    * corpus postings through a broadcast join keyed on the seeds'
    * terms; the (seed, cand) score agg and per-seed top-k window are
    * bounded by docs sharing ≥1 seed term.
    */
  def moreLikeThis(docs: DataFrame, id: String, text: String,
      seedIds: Seq[Long], k: Int = 10): DataFrame = {
    require(seedIds.nonEmpty && k >= 1)
    val tf = TextAnalysis.postings(docs, col(id).cast("long"), col(text))
    val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val ndocs = tf.agg(count_distinct(col("doc")).as("n"))
    // mirrored literally in the DuckDB oracle
    val idfBp = floor(log(col("n").cast("double") / col("df")) * 10000)
    val weights = tf.join(dfc, "tok").crossJoin(broadcast(ndocs))
      .select(col("doc"), col("tok"), (col("tf") * idfBp).as("w"))
    val seedW = weights.filter(col("doc").isin(seedIds: _*))
      .select(col("doc").as("seed"), col("tok"), col("w").as("sw"))
    weights.join(broadcast(seedW), Seq("tok"))
      .filter(col("doc") =!= col("seed"))
      .groupBy("seed", "doc")
      .agg(sum(col("sw") * col("w")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("seed")
          .orderBy(col("score").desc, col("doc").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("seed"), col("rank"), col("doc").as("doc_id"), col("score"))
  }

  /** Autocomplete / prefix index: for every term prefix up to
    * `maxPrefix` chars, the top-`k` corpus terms by frequency
    * (count desc, term asc). The type-ahead serving table — built like
    * an index, consumed by point lookups.
    *
    * Scale: one corpus token count (map-side combine, |vocab|-bounded
    * output); prefix explosion multiplies the VOCABULARY (≤ maxPrefix
    * rows per term), never the corpus; the per-prefix top-k window
    * partitions on the prefix — millions of tiny groups, no global
    * sort.
    */
  def prefixIndex(docs: DataFrame, id: String, text: String,
      maxPrefix: Int = 6, k: Int = 3): DataFrame = {
    require(maxPrefix >= 1 && k >= 1)
    val toks = filter(split(lower(col(text)), "[^a-z0-9]+"), t => length(t) > 0)
    val vocab = docs.select(explode(toks).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val prefixes = vocab.select(col("term"), col("n"),
      explode(expr(s"transform(sequence(1, least(length(term), $maxPrefix))," +
        " i -> substring(term, 1, i))")).as("prefix"))
    prefixes
      .withColumn("rank", row_number().over(
        Window.partitionBy("prefix")
          .orderBy(col("n").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("prefix", "rank", "term", "n")
  }

  /** MMR-diversified top-k (Carbonell & Goldstein 1998): greedy re-rank
    * of each query's candidate list trading relevance against redundancy
    * — step 0 takes the most relevant candidate; step t takes
    * argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s). The standard
    * diversity device over any dense retriever (and the dedup-at-serve
    * complement of the corpus-side near-dup operators).
    *
    * Determinism: scores are INTEGER basis-point combinations
    * (mmr_x = λ_bp·rel_bp − (10⁴−λ_bp)·maxsim_bp — no division), ties to
    * the smaller id, so the greedy trajectory is engine-independent and
    * the whole unrolled recursion replays relationally (the BPE-oracle
    * staging device, k stages instead of merge steps).
    *
    * Scale shape: candidate generation is [[Similarity.bruteTopK]]'s
    * audited plan (swap in IVF for corpus scale — the re-rank is
    * agnostic); everything after moves ≤ |queries|·kCand² rows — the
    * k-step greedy is a LAZY chain of candidate-sized joins partitioned
    * by query, one action total, no driver loop.
    *
    * Output: (query_id, step, neighbor_id, rel_bp, mmr_x), step 0..k−1
    * in selection order (step 0's mmr_x = λ_bp·rel_bp by convention). */
  def mmrTopK(emb: DataFrame, id: String, vec: String, queryIds: Seq[Long],
      kCand: Int, k: Int, lambdaBp: Long = 7000L): DataFrame = {
    require(k >= 1 && kCand >= k, s"need kCand >= k >= 1: kCand=$kCand k=$k")
    require(lambdaBp >= 0 && lambdaBp <= 10000, s"lambdaBp in [0,10000]: $lambdaBp")
    // checkpoint the candidate list: every greedy level references it
    // (directly and through the selected-set lineage), and an
    // un-truncated brute-top-k subtree would otherwise re-execute
    // O(2^k) times through the doubling union chain — measured 90 s at
    // sf0.1 vs ~1 s checkpointed
    val cand = Similarity.bruteTopK(emb, id, vec, queryIds, kCand)
      .select(col("query_id").as("qid"), col("neighbor_id").as("nid"),
        col("cos_bp").as("rel_bp"))
      .localCheckpoint(false)
    val n = Similarity.normalized(emb, id, vec)
    val cv = cand.join(n, col("nid") === col("vid"))
      .select(col("qid"), col("nid"), col("rel_bp"), col("nv"))
      .localCheckpoint(false)
    // directed candidate-pair sims per query: ≤ |queries|·kCand² rows
    val pair = cv.as("a").join(cv.as("b"),
        col("a.qid") === col("b.qid") && col("a.nid") =!= col("b.nid"))
      .select(col("a.qid").as("qid"), col("a.nid").as("i"), col("b.nid").as("j"),
        floor(Similarity.dot(col("a.nv"), col("b.nv")) * 10000)
          .cast("long").as("sim_bp"))
      .localCheckpoint(false)
    val w0 = Window.partitionBy("qid").orderBy(col("rel_bp").desc, col("nid").asc)
    var selected = cand.withColumn("_rn", row_number().over(w0))
      .filter(col("_rn") === 1)
      .select(col("qid"), lit(0).as("step"), col("nid"), col("rel_bp"),
        (lit(lambdaBp) * col("rel_bp")).as("mmr_x"))
    for (t <- 1 until k) {
      val remaining = cand.join(selected.select("qid", "nid"),
        Seq("qid", "nid"), "left_anti")
      val maxsim = remaining.select(col("qid"), col("nid").as("i"))
        .join(pair, Seq("qid", "i"))
        .join(selected.select(col("qid"), col("nid").as("j")), Seq("qid", "j"))
        .groupBy("qid", "i").agg(max("sim_bp").as("ms_bp"))
        .select(col("qid").as("mqid"), col("i"), col("ms_bp"))
      val wt = Window.partitionBy("qid")
        .orderBy(col("mmr_x").desc, col("nid").asc)
      val pick = remaining
        .join(maxsim, col("nid") === col("i") && col("qid") === col("mqid"))
        .select(col("qid"), col("nid"), col("rel_bp"),
          (lit(lambdaBp) * col("rel_bp") -
            (lit(10000L) - lit(lambdaBp)) * col("ms_bp")).as("mmr_x"))
        .withColumn("_rn", row_number().over(wt))
        .filter(col("_rn") === 1)
        .select(col("qid"), lit(t).as("step"), col("nid"), col("rel_bp"),
          col("mmr_x"))
      // truncate per level: selected appears twice in level t+1's plan
      // (remaining's anti-join AND maxsim's selected side), so without
      // truncation the chain doubles per step
      selected = selected.unionByName(pick).localCheckpoint(false)
    }
    selected.select(col("qid").as("query_id"), col("step"),
      col("nid").as("neighbor_id"), col("rel_bp"), col("mmr_x"))
  }
}
