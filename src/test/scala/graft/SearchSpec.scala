package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("BM25: rarer matching term outranks a common one; scores positive") {
    // 'needle' appears once; 'filler' is in every doc — the needle doc
    // must win a query containing both despite equal tf
    val docs = corpus(
      1L -> "filler needle word word",
      2L -> "filler word word word",
      3L -> "filler word word word",
      4L -> "filler word word word")
    val hits = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "needle filler"), k = 4)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_bp")))
    assert(hits.head._2 === 1L, s"needle doc must rank first: ${hits.toSeq}")
    assert(hits.forall(_._3 > 0L))
    assert(hits.map(_._1).toSeq === (1 to 4))
  }

  test("BM25: identical documents tie exactly and break on doc_id; k caps rows") {
    val docs = corpus(
      10L -> "alpha beta gamma",
      7L  -> "alpha beta gamma",
      3L  -> "unrelated words here")
    val hits = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "alpha"), k = 1)
      .collect()
    // integer scores → the duplicate docs tie EXACTLY; doc 7 wins the tie
    assert(hits.length === 1 && hits.head.getAs[Long]("doc_id") === 7L)
    val both = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "alpha"), k = 5).collect()
    assert(both.map(_.getAs[Long]("doc_id")).toSeq === Seq(7L, 10L))
    assert(both.map(_.getAs[Long]("score_bp")).distinct.length === 1,
      "identical docs must score identically")
  }

  test("BM25: absent query terms contribute nothing; all-absent query returns no rows") {
    val docs = corpus(1L -> "alpha beta", 2L -> "alpha alpha beta")
    val withGhost = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha zzzghost"), k = 5).collect()
    val without = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha"), k = 5).collect()
    assert(withGhost.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"))).toSeq
      === without.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"))).toSeq)
    val none = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "zzzghost"), k = 5).collect()
    assert(none.isEmpty)
  }

  test("BM25 term-SET semantics hold across repeated query_id entries") {
    val docs = corpus(1L -> "alpha beta", 2L -> "alpha alpha beta")
    // one query split over two entries, sharing 'alpha' — must score
    // identically to the single-entry spelling (no double-counting)
    val split = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha", 0L -> "alpha beta"), k = 5).collect()
    val whole = Search.bm25TopK(docs, "doc_id", "text",
      queries = Seq(0L -> "alpha beta"), k = 5).collect()
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_bp"))).toSeq
    assert(key(split) === key(whole))
  }

  test("BM25 plan: query-term postings filter is a broadcast join (corpus never shuffles for it)") {
    val docs = corpus((1L to 50L).map(i => i -> s"tok$i alpha common"): _*)
    val plan = Search.bm25TopK(docs, "doc_id", "text",
        queries = Seq(0L -> "alpha"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"query terms must broadcast against the postings:\n$plan")
  }

  /** Hand-computed RRF fixture: 4 docs whose LEXICAL relevance and
    * SEMANTIC proximity are engineered independently, so each query pins
    * one fusion contract. rrf(rank) = floor(10000/(60+rank)):
    * rank 1 → 163, rank 2 → 161. */
  private def hybridFixture = {
    val docs = corpus(
      1L -> "alpha beta gamma",     // q0 lexical hits
      2L -> "alpha delta",
      3L -> "epsilon zeta",         // q1 lexical hit
      4L -> "eta theta")            // q2 lexical hit
    // vec_id == query_id pairing: vec 0/1/2 are the query vectors
    val emb = Seq(
      0L -> Seq(1.0f, 0.0f, 0.0f),
      1L -> Seq(-1.0f, 0.0f, 0.0f),
      2L -> Seq(0.0f, 1.0f, 0.0f),
      3L -> Seq(1.0f, 0.1f, 0.0f),  // near q0 (cos .995), near-orthogonal q2
      4L -> Seq(1.0f, 0.2f, 0.0f)   // near q0 (cos .981)
    ).toDF("vec_id", "embedding")
    (docs, emb)
  }

  test("prfTopK: expansion pulls in co-occurring-term docs; expandTerms=0 degenerates to bm25") {
    // 'engine' co-occurs with the query term 'spark' in the feedback
    // docs; doc 5 never says 'spark' but is all about 'engine' — plain
    // BM25 cannot see it, PRF must after expansion
    val docs = corpus(
      1L -> "spark engine engine fast",
      2L -> "spark engine quick",
      3L -> "spark alone here",
      4L -> "unrelated words entirely",
      5L -> "engine engine engine engine")
    val plain = Search.bm25TopK(docs, "doc_id", "text",
        Seq(0L -> "spark"), k = 5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(!plain.contains(5L))
    val prf = Search.prfTopK(docs, "doc_id", "text",
        Seq(0L -> "spark"), k = 5, fbDocs = 3, expandTerms = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(prf.contains(5L), s"expanded query must retrieve doc 5: $prf")
    // zero expansion terms = exactly the plain bm25 ranking
    val zero = Search.prfTopK(docs, "doc_id", "text",
        Seq(0L -> "spark"), k = 5, fbDocs = 3, expandTerms = 0)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_bp"))).toSeq
    val ref = Search.bm25TopK(docs, "doc_id", "text",
        Seq(0L -> "spark"), k = 5)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score_bp"))).toSeq
    assert(zero === ref)
  }

  test("hybridTopK: disjoint lists — each doc contributes from ONE list; equal rrf ties break on doc_id") {
    val (docs, emb) = hybridFixture
    // q0 'alpha beta': lex = [1, 2]; sem (vs vec 0) = [3, 4] — disjoint.
    // doc1 and doc3 both score 163 (rank-1 in their own list): the tie
    // breaks on doc_id; same at 161 for doc2/doc4.
    val out = Search.hybridTopK(docs, "doc_id", "text", emb, "vec_id",
        "embedding", queries = Seq(0L -> "alpha beta"), k = 4, kCand = 2)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_bp")))
    assert(out.toSeq === Seq((1, 1L, 163L), (2, 3L, 163L),
      (3, 2L, 161L), (4, 4L, 161L)))
  }

  test("hybridTopK: a doc in BOTH lists sums contributions; short lists are fine") {
    val (docs, emb) = hybridFixture
    // q2 'eta theta': lex = [4] (one candidate — shorter than kCand);
    // sem (vs vec 2 = [0,1,0]) = [4 (cos .196), 3 (cos .0995)].
    // doc4 fuses 163 + 163 = 326 and must rank first.
    val out = Search.hybridTopK(docs, "doc_id", "text", emb, "vec_id",
        "embedding", queries = Seq(2L -> "eta theta"), k = 4, kCand = 2)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_bp")))
    assert(out.toSeq === Seq((1, 4L, 326L), (2, 3L, 161L)))
  }

  test("hybridTopK: multi-query isolation and the absent-from-lex side") {
    val (docs, emb) = hybridFixture
    // q1 'epsilon zeta': lex = [3]; sem (vs vec 1 = [-1,0,0]) ranks by
    // cosine DESC over negatives too = [2 (cos 0), 4 (cos -.98)].
    // doc2 (sem-only, 163) ties doc3 (lex-only, 163) → doc2 first.
    val out = Search.hybridTopK(docs, "doc_id", "text", emb, "vec_id",
        "embedding",
        queries = Seq(0L -> "alpha beta", 1L -> "epsilon zeta"),
        k = 4, kCand = 2)
      .collect().groupBy(_.getAs[Long]("query_id"))
    val q1 = out(1L).sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_bp")))
    assert(q1.toSeq === Seq((1, 2L, 163L), (2, 3L, 163L), (3, 4L, 161L)))
    // q0 must be unchanged by q1 riding along
    val q0 = out(0L).sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    assert(q0.toSeq === Seq(1L, 3L, 2L, 4L))
  }

  test("hybridTopK: the semantic half is pluggable — IVF full-probe composes identically") {
    import graft.operators.Similarity
    val (docs, emb) = hybridFixture
    val queries = Seq(0L -> "alpha beta", 2L -> "eta theta")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val viaBrute = rows(Search.hybridTopK(docs, "doc_id", "text", emb,
      "vec_id", "embedding", queries, k = 4, kCand = 2))
    // the probed serving path, full-probe here (nprobe = nlist degenerates
    // to exact — SimilaritySpec) so the fused output must be identical
    val viaIvf = rows(Search.hybridTopK(docs, "doc_id", "text", emb,
      "vec_id", "embedding", queries, k = 4, kCand = 2,
      semTopK = (e, i, v, q, kc) =>
        Similarity.ivfTopK(e, i, v, q, kc, nlist = 3, nprobe = 3,
          persistCorpus = false)))
    assert(viaIvf === viaBrute)
  }

  test("mmrTopK: naive greedy reference equality; lambda=10000 degenerates to relevance") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = Seq(0L, 1L, 2L)
    def run(lam: Long) = Search.mmrTopK(emb, "vec_id", "embedding", qids,
        kCand = 12, k = 4, lambdaBp = lam)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("step"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("mmr_x")))
      .sortBy(x => (x._1, x._2)).toSeq
    // naive reference: collect candidates + pair sims, replay the greedy
    val cand = Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 12)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("cos_bp")))
    val ids = cand.map(_._2).distinct.toSeq
    val n = Similarity.normalized(emb, "vec_id", "embedding")
      .filter(org.apache.spark.sql.functions.col("vid").isin(ids: _*))
    val sims = n.as("a").join(n.as("b"),
        org.apache.spark.sql.functions.col("a.vid") =!=
          org.apache.spark.sql.functions.col("b.vid"))
      .select(org.apache.spark.sql.functions.col("a.vid"),
        org.apache.spark.sql.functions.col("b.vid"),
        org.apache.spark.sql.functions.floor(
          Similarity.dot(org.apache.spark.sql.functions.col("a.nv"),
            org.apache.spark.sql.functions.col("b.nv")) * 10000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def refGreedy(lam: Long): Seq[(Long, Int, Long, Long)] = qids.flatMap { q =>
      val cs = cand.filter(_._1 == q).map(c => (c._2, c._3)).sortBy(x => (-x._2, x._1))
      var sel = List.empty[Long]
      var out = List.empty[(Long, Int, Long, Long)]
      for (t <- 0 until 4) {
        val rem = cs.filterNot(c => sel.contains(c._1))
        val scored = rem.map { case (nid, rel) =>
          val mmr = if (t == 0) lam * rel
            else lam * rel - (10000L - lam) * sel.map(s => sims((nid, s))).max
          (nid, mmr)
        }
        val (pick, mx) = scored.minBy { case (nid, mmr) => (-mmr, nid) }
        sel ::= pick
        out ::= ((q, t, pick, mx))
      }
      out.reverse
    }
    assert(run(7000L) === refGreedy(7000L))
    assert(run(5000L) === refGreedy(5000L))
    // pure-relevance degeneracy: selection order is the brute ranking
    val pure = run(10000L).map(x => (x._1, x._3))
    val brute = cand.sortBy(c => (c._1, -c._3, c._2))
      .groupBy(_._1).view.mapValues(_.take(4).map(_._2)).toMap
    qids.foreach { q =>
      assert(pure.filter(_._1 == q).map(_._2).toSeq === brute(q).toSeq,
        s"lambda=1 must reduce to relevance order for query $q")
    }
  }

  test("mmrTopK: redundancy penalty skips the near-duplicate of a selected item") {
    // q=0 at the pole; a,b nearly identical and closest to q; c distinct
    val rows = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(0.98, 0.2, 0.0)),   // a
      (2L, Array(0.975, 0.21, 0.01)),// b ~ a
      (3L, Array(0.6, -0.8, 0.0)))   // c diverse, less relevant
      .toDF("vec_id", "embedding")
    val got = Search.mmrTopK(rows, "vec_id", "embedding", Seq(0L),
        kCand = 3, k = 2, lambdaBp = 5000L)
      .orderBy("step").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(got.head === 1L,  "step 0 must take the most relevant")
    assert(got(1) === 3L, s"step 1 must skip the near-dup (got $got)")
  }

  test("substringSearch: equals the naive contains scan; prefilter never loses; verify never lies") {
    val docs = Seq(
      (1L, "the quick brown fox abcdef runs"),
      (2L, "abcd and cdef share grams but not the pattern"), // all trigrams, no match
      (3L, "AaAaA overlap aaaaa test"),
      (4L, "plain filler row"),
      (5L, "ABCDEF upper case hit")
    ).toDF("doc_id", "text")
    val pats = Seq(0L -> "abcdef", 1L -> "aaa", 2L -> "missingpattern")
    val got = Search.substringSearch(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference
    val want = (for {
      (pid, p) <- pats
      (id, t) <- Seq(1L -> "the quick brown fox abcdef runs",
        2L -> "abcd and cdef share grams but not the pattern",
        3L -> "AaAaA overlap aaaaa test",
        4L -> "plain filler row",
        5L -> "ABCDEF upper case hit")
      lt = t.toLowerCase; lp = p.toLowerCase
      if lt.contains(lp)
    } yield (pid, id, ((lt.length - lt.replace(lp, "").length) / lp.length).toLong)).toSet
    assert(got === want)
    // the gram-decoy doc is prefiltered IN but verified OUT
    assert(!got.exists(r => r._1 == 0L && r._2 == 2L))
    // case-insensitive hit; overlap counted non-overlapping:
    // "aaaaa"+"aaaaa"(from AaAaA) -> 1 + 1 = replace semantics
    assert(got.contains((0L, 5L, 1L)))
    assert(got.exists(r => r._1 == 1L && r._2 == 3L))
    // absent pattern contributes nothing
    assert(!got.exists(_._1 == 2L))
  }
}
