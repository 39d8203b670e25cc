package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-7 lexical queries, via the same
  * PlanAudit counters the Explain CLI prints. These exist to freeze the
  * fixes of the round-7 plan sweep — most importantly the shared
  * postings materialization that stopped q_bm25 reading the corpus 3×
  * (ReuseExchange misses branches whose pushed-down null filters differ)
  * — so a regression fails a test, not a bench comparison. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def audited(name: String): PlanAudit.Counters = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val c = PlanAudit.counters(df)
    info(s"$name: $c")
    c
  }

  test("q_bm25: corpus is scanned at most once post-checkpoint; small sides broadcast") {
    val c = audited("q_bm25")
    // the postings pass is materialized once — every lexical consumer
    // reads the checkpoint, so the FINAL plan may contain at most ONE
    // parquet scan of the corpus (the round-7 regression showed 3)
    assert(c.scans <= 1, s"corpus re-read regressed: $c")
    // query terms, df counts, and corpus stats all ride broadcasts —
    // nothing candidate-sized shuffles before the postings are pruned
    assert(c.broadcasts >= 4, s"expected the small sides broadcast: $c")
  }

  test("q_contamination_fuzzy: benchmark broadcasts; pair-count agg is the ONLY hash exchange") {
    val c = audited("q_contamination_fuzzy")
    // the (doc, bench_doc) pair-count agg is the single hash exchange in
    // the FINAL plan: when nothing clears the freqCap, AQE's
    // empty-relation propagation elides the hot-shed anti-join AND its
    // whole frequency-agg subtree at runtime (the shed costs nothing
    // until there is something to shed — exactly the wanted shape)
    assert(c.exchanges == 1, s"fuzzy contamination exchange count drifted: $c")
    // the benchmark shingle rows broadcast — the corpus never shuffles
    // for candidate generation
    assert(c.broadcasts >= 1, s"benchmark side must broadcast: $c")
    // corpus subset + bench subset: two scans of documents, never more
    assert(c.scans <= 2, s"documents re-read regressed: $c")
  }

  test("q_keywords: exchanges bounded by the postings-derived aggs, N broadcast") {
    val c = audited("q_keywords")
    // df agg on tok + tf⋈df join + per-doc rank window — all bounded by
    // distinct (doc, tok); the corpus itself is behind the checkpoint
    assert(c.scans <= 1, s"corpus re-read regressed: $c")
    assert(c.broadcasts >= 1, s"the 1-row N must broadcast: $c")
    assert(c.exchanges <= 4, s"keywords exchange count drifted: $c")
  }

  test("q_embed_cluster: assignment is map-only — the corpus never hash-shuffles") {
    val c = audited("q_embed_cluster")
    // the codebook rides the scan as a codegen reference object and the
    // centroid table broadcasts for the sim projection: ZERO hash
    // exchanges in the final plan (the orderBy range exchange is the
    // output contract, not the operator)
    assert(c.exchanges == 0, s"cluster assignment must not shuffle the corpus: $c")
    assert(c.broadcasts >= 1, s"the nlist-row centroid table must broadcast: $c")
    assert(c.scans <= 1, s"corpus re-read regressed: $c")
  }

  test("q_cluster_balance: the per-cid window is the ONLY hash exchange") {
    val c = audited("q_cluster_balance")
    assert(c.exchanges == 1, s"cluster-balance exchange count drifted: $c")
    assert(c.broadcasts >= 1, s"centroid table must broadcast: $c")
  }

  test("q_quality_select: histogram threshold, never a corpus-wide sort/window") {
    val c = audited("q_quality_select")
    // the ONLY hash exchange is the score-histogram aggregation (the
    // cumulative window runs over the histogram on a single partition —
    // bounded by the score domain, not the corpus)
    assert(c.exchanges <= 1, s"quality-select exchange count drifted: $c")
    // the 1-row total and 1-row threshold both broadcast back
    assert(c.broadcasts >= 2, s"total/threshold must broadcast: $c")
    // histogram pass + filter pass: two scans by design, never more
    assert(c.scans <= 2, s"corpus re-read regressed: $c")
  }
}
