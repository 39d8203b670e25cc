package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),    // exact dup of 1
    (3L, "THE  QUICK brown fox jumps over the lazy dog"),   // norm-dup of 1
    (4L, "the quick brown fox jumps over the sleepy dog"),  // near-dup of 1
    (5L, "completely different words entirely here now today"),
    (6L, "another unrelated document with its own words")
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, canonical = min id") {
    val r = Dedup.exact(docs, "doc_id", "text").orderBy("canonical_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ===
      Seq((1L, 3L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("exact dedup by raw text vs by hash agree") {
    val a = Dedup.exact(docs, "doc_id", "text", byHash = true)
    val b = Dedup.exact(docs, "doc_id", "text", byHash = false)
    assert(a.orderBy("canonical_id").collect() === b.orderBy("canonical_id").collect())
  }

  test("n-gram jaccard finds near-dups above threshold only") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, thresholdBp = 5000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))  // identical → 10000 bp
    assert(pairs.contains((1L, 4L)))  // 1-word change in 9 → jac ≈ 0.5-0.7
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("jaccard of identical docs is exactly 10000 bp") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 9999)
      .filter($"i" === 1 && $"j" === 2).head()
    assert(p.getAs[Long]("jac_bp") === 10000L)
  }

  test("minhash LSH pairs == exact jaccard pairs on the sf0.001 corpus") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Dedup.jaccardPairs(d, "doc_id", "text", 3, 8000)
      .select("i", "j", "jac_bp").collect().toSet
    val lsh = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 8000)
      .select("i", "j", "jac_bp").collect().toSet
    assert(lsh === exact)
    assert(exact.nonEmpty) // the corpus plants near-dups; test must bite
  }

  test("sampledPairEval: residue-class estimates bracket the exact metrics") {
    // q_dedup_eval's corpus at sf0.001; denom 3 gives three DISJOINT
    // residue classes covering the universe — the exact metric must lie
    // within the classes' min..max (the sampled-audit contract the
    // 100 TB route rests on), and the pair counts must shrink ~9×
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val corpus = d.unionByName(d.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000))
    val found = Dedup.sortedNeighborhood(corpus, "doc_id", "text",
      window = 8, thresholdBp = 8000L).localCheckpoint(false)
    val exact = Dedup.pairSetEval(found,
      Dedup.snmTruthPairs(corpus, "doc_id", "text", 8000L)).head()
    val ests = (0L until 3L).map { r =>
      Dedup.sampledPairEval(found, corpus, "doc_id", "text", 8000L,
        denom = 3, residue = r).head()
    }
    def bp(row: org.apache.spark.sql.Row, c: String) = row.getAs[Long](c)
    for (m <- Seq("precision_bp", "recall_bp", "f1_bp")) {
      val vals = ests.map(bp(_, m))
      info(s"$m exact=${bp(exact, m)} sampled=$vals")
      assert(vals.min <= bp(exact, m) && bp(exact, m) <= vals.max,
        s"$m=${bp(exact, m)} outside sampled bracket $vals")
    }
    // universe restriction is real: each class audits a ~1/9 pair slice
    val exactPairs = bp(exact, "tp") + bp(exact, "fn")
    ests.foreach { e =>
      val sampledPairs = bp(e, "tp") + bp(e, "fn")
      assert(sampledPairs > 0 && sampledPairs < exactPairs / 3,
        s"sampled truth not a strict subset: $sampledPairs vs $exactPairs")
    }
    // an ADVERSARIAL corpus where SNM genuinely misses: near-dup plants
    // whose first word changes ("zzz " prefix) sort far from their
    // originals, so the window never sees the pair — recall < 10000 and
    // the bracket must hold off the perfection boundary too
    val plants = d.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("zzz "), $"text").as("text"))
    val hard = corpus.unionByName(plants)
    val hFound = Dedup.sortedNeighborhood(hard, "doc_id", "text",
      window = 8, thresholdBp = 8000L).localCheckpoint(false)
    val hExact = Dedup.pairSetEval(hFound,
      Dedup.snmTruthPairs(hard, "doc_id", "text", 8000L)).head()
    info(s"hard exact: recall=${bp(hExact, "recall_bp")} fn=${bp(hExact, "fn")}")
    assert(bp(hExact, "recall_bp") < 10000L && bp(hExact, "fn") > 0L,
      "sort-displaced plants unexpectedly found — degraded probe lost its bite")
    val hVals = (0L until 3L).map { r =>
      bp(Dedup.sampledPairEval(hFound, hard, "doc_id", "text", 8000L,
        denom = 3, residue = r).head(), "recall_bp")
    }
    info(s"hard sampled recalls: $hVals")
    assert(hVals.min <= bp(hExact, "recall_bp") &&
      bp(hExact, "recall_bp") <= hVals.max,
      s"degraded recall ${bp(hExact, "recall_bp")} outside bracket $hVals")
  }

  test("simhash: identical normalized text → identical hash") {
    val s = Dedup.simhash(docs, "doc_id", "text")
      .filter($"doc".isin(1L, 2L, 3L)).select("simhash").distinct()
    assert(s.count() === 1)
  }

  test("simhash banding finds every pair within maxHamming (pigeonhole, no FNs)") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sims = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i, hi) <- sims; (j, hj) <- sims if i < j
      h = java.lang.Long.bitCount(hi ^ hj) if h <= 3
    } yield (i, j, h.toLong)).toSet
    val banded = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming"))).toSet
    assert(banded === brute)
  }

  test("short docs (< n words) shingle to empty sets, never crash") {
    val shorties = Seq(
      (1L, "hi"),                                          // 1 word < n
      (2L, "two words"),                                   // 2 words < n
      (3L, "exactly three words"),                         // == n → 1 shingle
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(shorties, "doc_id", "text", 3)
    assert(sh.filter($"doc".isin(1L, 2L)).count() === 0)
    assert(sh.filter($"doc" === 3L).count() === 1)
    val jac = Dedup.jaccardPairs(shorties, "doc_id", "text", 3, 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac === Set((4L, 5L)))
    val lsh = Dedup.minhashLshPairs(shorties, "doc_id", "text", 3, 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === Set((4L, 5L)))
  }

  test("property: LSH == exact jaccard on random small-vocab corpora (seeded)") {
    // small vocabulary forces heavy shingle overlap — the worst case for
    // banding false-positives and a dense pair graph for false-negatives
    for (seed <- Seq(7, 42, 1337)) {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val corpus = (1L to 40L).map { i =>
        val len = 3 + rng.nextInt(12)
        (i, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 8000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 8000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(lsh === exact, s"seed=$seed")
    }
  }

  test("clusters: chain and star components collapse to min id; isolates keep their own") {
    val nodes = (1L to 9L).map(i => Tuple1(i)).toDF("doc_id")
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain → cluster 1
      (6L, 7L), (6L, 8L)              // star  → cluster 6
    ).toDF("i", "j")
    val c = Dedup.clusters(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 9L))
  }

  test("dropExactDuplicates keeps exactly the canonical row per text group") {
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 4L, 5L, 6L))   // 2,3 are norm-dups of 1
  }

  test("dropExactDuplicates never clobbers caller columns, even ones named like its helpers") {
    // a caller column named _min (or _MIN — resolution is case-insensitive)
    // must survive with its values; output schema == input schema
    val df = docs.withColumn("_min", col("doc_id") * 100)
      .withColumn("_k", lit("caller-owned"))
    val out = Dedup.dropExactDuplicates(df, "doc_id", "text")
    assert(out.columns.toSeq === df.columns.toSeq)
    val rows = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("_min"), r.getAs[String]("_k"))).toMap
    assert(rows(4L) === ((400L, "caller-owned")))
  }

  test("exactPairs emits each duplicate group as a star on the min id") {
    val p = Dedup.exactPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p === Set((1L, 2L), (1L, 3L)))   // docs 1,2,3 normalize equal
  }

  test("shingle frequency cap sheds hot shingles (skew guard)") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0, freqCap = 1L)
    // with cap=1 every shared shingle is dropped → no pairs at all
    assert(capped.count() === 0)
    assert(sh.count() > 0)
  }

  // ==== adversarial skew: the 100 TB cap contract, demonstrated ==========
  //
  // Two pathologies at once, each 10,000 docs deep:
  //  - an identical-text FAMILY (every shingle hot: uncapped, each of its
  //    6 shingle groups would emit f² = 10⁸ pairs in ONE task);
  //  - a STOP-SHINGLE shared by 10,000 otherwise-unique docs (one hot
  //    group, ~5·10⁷ candidate pairs uncapped).
  // The documented contract (jaccardPairs/minhashLshPairs scaladoc): the
  // caps shed exactly the above-cap groups, the job completes without the
  // giant task, and the ONLY pairs missed are those whose every shared
  // key is hot — pairs with any cold shared shingle still surface.

  private lazy val skewCorpus = {
    val family = (100000L until 110000L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
    val stop = (200000L until 210000L)
      .map(i => (i, s"common shared phrase uq${i}a uq${i}b uq${i}c"))
    // the one COLD near-dup pair: must survive every capped run
    val planted = Seq(
      (300001L, "planted cold pair text one two three four five"),
      (300002L, "planted cold pair text one two three four five"))
    (family ++ stop ++ planted).toDF("doc_id", "text")
  }

  test("adversarial skew: freqCap sheds exactly the 7 hot shingle groups; cold pair survives") {
    val cap = 1000L
    // ground truth on the hot side: group sizes straight from the shingle
    // rows — 6 family shingles + 1 stop shingle, each exactly 10,000 deep
    val hot = Dedup.shingles(skewCorpus, "doc_id", "text", 3)
      .groupBy("s").count().filter($"count" > cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hot.size === 7)
    assert(hot.values.forall(_ === 10000L))
    assert(hot.contains("common shared phrase"))
    // thresholdBp=0 so NOTHING is filtered post-candidate: every surviving
    // candidate pair is returned — shedding is the only reduction
    val pairs = Dedup.jaccardPairs(skewCorpus, "doc_id", "text", 3, 0, freqCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the planted cold pair: the family's pairs are hot-only (missed
    // by contract — collapse exact dups first), the stop corpus shares
    // nothing but the hot shingle
    assert(pairs === Set((300001L, 300002L)))
  }

  test("shed observability: cap sheds surface as runtime observe() metrics") {
    import graft.operators.{Guard, Similarity, TextAnalysis}
    def shedOf(df: org.apache.spark.sql.DataFrame, device: String)
        : org.apache.spark.sql.Row = {
      df.collect()
      val ms = df.queryExecution.observedMetrics.collect {
        case (k, row) if k.startsWith(Guard.ShedMetricPrefix + device) => row
      }
      assert(ms.size === 1, s"expected one $device shed metric, got $ms")
      ms.head
    }
    // groupPairs freqCap family: the 7 hot shingle groups (10k deep
    // each) must be VISIBLE at runtime, not just provable by recount
    val jp = Dedup.jaccardPairs(skewCorpus, "doc_id", "text", 3, 0,
      freqCap = 1000L)
    val m1 = shedOf(jp, "jaccardPairs")
    assert(m1.getAs[Long]("shed_groups") === 7L)
    assert(m1.getAs[Long]("shed_members") === 70000L)
    // clusterCap family: pick a cap BETWEEN the real cluster sizes so
    // the shed is partial — a total shed lets AQE's empty-relation
    // propagation elide the whole plan (observer included; the result
    // is loudly empty, nothing silent), so partial is the observable
    // regime worth pinning
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val sizes = Similarity.clusterAssign(e, "vec_id", "embedding", nlist = 4)
      .groupBy("cid").count().collect().map(_.getLong(1)).sorted
    assert(sizes.length > 1 && sizes.head < sizes.last, s"degenerate sizes: ${sizes.toSeq}")
    val cap = sizes.head // sheds every cluster strictly above the smallest
    val wantShed = sizes.filter(_ > cap)
    val sd = Similarity.semDedupPairs(e, "vec_id", "embedding",
      nlist = 4, thresholdBp = 0L, clusterCap = cap)
    val m2 = shedOf(sd, "semDedupPairs")
    assert(m2.getAs[Long]("shed_groups") === wantShed.length.toLong)
    assert(m2.getAs[Long]("shed_members") === wantShed.sum)
    // hot-shingle anti-join family (fuzzy contamination): same 7 keys
    val bench = Seq((1L, "planted cold pair text one two three four five"))
      .toDF("doc_id", "text")
    val fc = TextAnalysis.fuzzyContamination(skewCorpus, bench,
      "doc_id", "text", n = 3, thresholdBp = 0L, freqCap = 1000L)
    val m3 = shedOf(fc, "fuzzyContamination")
    assert(m3.getAs[Long]("shed_groups") === 7L)
    assert(m3.getAs[Long]("shed_members") === 70000L)
    // an UNCAPPED run reports zero shed — the metric is a shed count,
    // not a group census (small fixture: uncapped over skewCorpus IS
    // the 10⁸-pair pathology the cap exists for)
    val m0 = shedOf(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0),
      "jaccardPairs")
    assert(m0.getAs[Long]("shed_groups") === 0L)
    assert(m0.getAs[Long]("shed_members") === 0L)
  }

  test("adversarial skew: minhash bucketCap sheds the identical family's 32 band buckets") {
    val cap = 1000L
    val pairs = Dedup.minhashLshPairs(skewCorpus, "doc_id", "text", 3, 8000,
        bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // family: identical signatures → ONE 10,000-deep bucket per band, all
    // 32 shed; stop docs: unique tails randomize the bands. The planted
    // pair (identical → jac 10000 bp) must come through.
    assert(pairs === Set((300001L, 300002L, 10000L)))
  }

  test("adversarial skew: simhash bucketCap sheds the family's chunk groups; cold pair survives") {
    val pairs = Dedup.simhashPairs(skewCorpus, "doc_id", "text",
        maxHamming = 3, bucketCap = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // family → one identical simhash → 4 chunk groups of 10,000, all shed;
    // planted pair hamming 0 survives. Stop docs may collide by chance on
    // a 16-bit chunk, so only assert family absence + planted presence.
    assert(pairs.contains((300001L, 300002L)))
    assert(!pairs.exists(p => p._1 >= 100000L && p._1 < 110000L))
  }

  test("sortedNeighborhood: exact duplicates always pair (adjacent in sort); " +
      "dissimilar neighbors filtered") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha  beta gamma delta epsilon zeta "), // normalizes identical to 1
      (3L, "alpha beta gamma delta epsilon eta"),     // near dup of 1 (5/7 shingle jac? below 8000)
      (4L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhood(docs, "doc_id", "text",
        window = 4, thresholdBp = 8000L)
      .select("i", "j", "jaccard_bp")
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 10000L))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("sortedNeighborhood: equals the within-window brute reference on random corpora") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(17)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1L to 80L).map(i =>
      (i, Seq.fill(4 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    def norm(t: String) = t.trim.replaceAll("\\s+", " ").toLowerCase
    def shingles(t: String): Set[String] = {
      val w = norm(t).split(" ").filter(_.nonEmpty)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val ranked = docs.sortBy { case (id, t) => (norm(t), id) }.zipWithIndex
    val w = 5
    val want = (for {
      ((ai, at), ar) <- ranked; ((bi, bt), br) <- ranked
      if br > ar && br <= ar + w - 1
      sa = shingles(at); sb = shingles(bt)
      inter = (sa & sb).size; uni = sa.size + sb.size - inter
      jac = inter.toLong * 10000 / uni if jac >= 7000
    } yield (math.min(ai, bi), math.max(ai, bi), jac)).toSet
    val got = Dedup.sortedNeighborhood(docs.toDF("doc_id", "text"), "doc_id",
        "text", window = w, thresholdBp = 7000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("prefixJaccardPairs: exact-recall equality with the full inverted index on random corpora") {
    val rnd = new scala.util.Random(20260814)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (0L until 60L).map { i =>
      i -> Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
    }.toMap
    val docs = base.toSeq.map { case (i, ws) => (i, ws.mkString(" ")) } ++
      // exact duplicates of every 5th doc under new ids, plus one-word
      // edits of every 7th (true near-dup pairs at mid thresholds)
      (0L until 60L by 5L).map(i => (i + 1000L, base(i).mkString(" "))) ++
      (0L until 60L by 7L).map(i =>
        (i + 2000L, (base(i) :+ "omega").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    for (t <- Seq(5000, 8000)) {
      val exact = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, t)
        .as[(Long, Long, Long)].collect().toSet
      val pref = Dedup.prefixJaccardPairs(df, "doc_id", "text", n = 3, t)
        .as[(Long, Long, Long)].collect().toSet
      assert(pref === exact, s"prefix filter lost/invented pairs at t=$t")
      assert(exact.nonEmpty, "fixture must actually produce pairs")
    }
  }

  test("containmentPairs: a strict subset contains fully one way, partially the other") {
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f"),            // subset of 1: all its shingles in 1
      (3L, "x y z q r s")             // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
        thresholdBp = 0)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // doc2 has 4 shingles, all inside doc1 (8 shingles)
    assert(got((2L, 1L)) === 10000L)
    assert(got((1L, 2L)) === 4L * 10000L / 8L)
    assert(!got.contains((3L, 1L)))
    // thresholding keeps only the full-containment direction
    val hi = Dedup.containmentPairs(df, "doc_id", "text", 3, 9000)
      .as[(Long, Long, Long)].collect().toSet
    assert(hi === Set((2L, 1L, 10000L)))
  }

  test("adversarial skew: prefix-join freqCap sheds hot PREFIX groups; cold pair survives") {
    // same skew corpus, same contract as the full inverted index: when a
    // prefix token's posting list exceeds the cap its candidate group is
    // shed, and the planted cold pair must still pair through its own
    // (cold) prefix tokens
    val pairs = Dedup.prefixJaccardPairs(skewCorpus, "doc_id", "text",
        n = 3, thresholdBp = 0, freqCap = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((300001L, 300002L)))
    // and WITHOUT the cap pressure (high cap) the hot family pairs come
    // back — shedding, not the prefix filter, was the reduction
    val uncapped = Dedup.prefixJaccardPairs(skewCorpus.filter(
        col("doc_id") >= 300000L || col("doc_id") < 100020L),
        "doc_id", "text", n = 3, thresholdBp = 0, freqCap = 1000000L)
      .count()
    assert(uncapped > 1L)
  }

  test("pairSetEval: SNM's window miss becomes a measured recall deficit") {
    // two near-identical docs whose SORT KEYS diverge at the first word,
    // with filler docs packing the window between them: SNM must miss
    // the pair, the truth join must find it, and the eval must report
    // exactly that recall deficit
    val sharedTail = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = (Seq(
      1L -> s"aaaa $sharedTail",
      2L -> s"zzzz $sharedTail") ++
      (10L until 30L).map(i => i -> s"m$i filler words here nothing alike ${i}x")
    ).toDF("doc_id", "text")
    val found = Dedup.sortedNeighborhood(docs, "doc_id", "text",
      window = 4, thresholdBp = 7000L)
    val truth = Dedup.snmTruthPairs(docs, "doc_id", "text", 7000L)
    assert(truth.count() === 1L) // the (1,2) near-dup pair
    val r = Dedup.pairSetEval(found, truth).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 1L)))
    assert(r.getLong(4) === 0L)      // recall 0: the window missed it
    // widening the window to cover the whole corpus recovers it
    val wide = Dedup.sortedNeighborhood(docs, "doc_id", "text",
      window = 30, thresholdBp = 7000L)
    val r2 = Dedup.pairSetEval(wide, truth).head()
    assert((r2.getLong(0), r2.getLong(4), r2.getLong(5)) === ((1L, 10000L, 10000L)))
  }

  test("hammingPairs: equals brute force on arbitrary 64-bit signatures incl. sign-bit hashes") {
    // distances: (1,2)=0, (1,3)=1, (1,4)=3, (1,5)=4 (over threshold),
    // plus a negative (top-bit) hash pair to pin the signed packing
    val sigs = Seq(
      (1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdefL),
      (3L, 0x0123456789abcdeeL), (4L, 0x0123456789abcde8L),
      (5L, 0x0123456789abcde0L), // f -> 0: 4 bits, over threshold
      (6L, 0xfedcba9876543210L), (7L, 0xfedcba9876543211L)
    ).toDF("doc", "simhash")
    val got = Dedup.hammingPairs(sigs, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    val raw = sigs.as[(Long, Long)].collect()
    val want = (for {
      (a, ha) <- raw; (b, hb) <- raw if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(want.contains((1L, 4L, 3L.toInt)) && !want.exists(p => p._1 == 1L && p._2 == 5L))
    assert(got === want)
  }

  test("shed metric device labels: every method reports under its OWN name") {
    import graft.operators.{Guard, Similarity, TextAnalysis}
    // monitoring separates production methods from audit harnesses by
    // the device segment of the graft_shed_* key; a copy-pasted label
    // (the r11 prefixJaccardPairs mislabel) silently files one method's
    // sheds under another's name — this pins the segment per method
    def shedDevices(df: org.apache.spark.sql.DataFrame): Set[String] = {
      df.collect()
      df.queryExecution.observedMetrics.keys
        .filter(_.startsWith(Guard.ShedMetricPrefix)).map { k =>
          // strip prefix and the trailing _<seq> uniquifier
          val core = k.stripPrefix(Guard.ShedMetricPrefix)
          core.substring(0, core.lastIndexOf('_'))
        }.toSet
    }
    assert(shedDevices(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0))
      === Set("jaccardPairs"))
    assert(shedDevices(Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0))
      === Set("prefixJaccardPairs"))
    assert(shedDevices(Dedup.snmTruthPairs(docs, "doc_id", "text", 0L))
      === Set("snmTruthPairs"))
    assert(shedDevices(Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 8000))
      === Set("minhashLsh"))
    assert(shedDevices(Dedup.simhashPairs(docs, "doc_id", "text"))
      === Set("simhashPairs"))
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    assert(shedDevices(Similarity.semDedupPairs(e, "vec_id", "embedding",
      nlist = 4, thresholdBp = 0L)) === Set("semDedupPairs"))
    // fuzzyContamination's observer rides the hot-shed subtree, which
    // AQE elides when nothing sheds (the documented caveat) — so label
    // it under the same genuinely-shedding skew fixture as the shed
    // test, where the metric is guaranteed to materialize
    val bench = Seq((1L, "planted cold pair text one two three four five"))
      .toDF("doc_id", "text")
    assert(shedDevices(TextAnalysis.fuzzyContamination(skewCorpus, bench,
      "doc_id", "text", n = 3, thresholdBp = 0L, freqCap = 1000L))
      === Set("fuzzyContamination"))
  }

  test("audit residue rotation: denom consecutive epochs cover every class exactly once") {
    // the pure rotation: epochs 0..denom-1 are a permutation of the
    // residue classes; epoch denom+k revisits class k (the cycle)
    assert((0L until 7L).map(Dedup.auditResidue(_, 7)).toSet
      === (0L until 7L).toSet)
    assert((0L until 7L).map(Dedup.auditResidue(_, 7)).distinct.size === 7)
    assert(Dedup.auditResidue(9L, 7) === Dedup.auditResidue(2L, 7))
    // and through the sample predicate: one rotation period selects each
    // doc EXACTLY once (disjoint classes, complete cover)
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val n = d.count()
    val perEpoch = (0L until 3L).map { e =>
      d.filter(Dedup.md5DocSample(col("doc_id"), 3,
        Dedup.auditResidue(e, 3))).count()
    }
    assert(perEpoch.sum === n, s"rotation cover leaked/lost docs: $perEpoch vs $n")
    assert(perEpoch.forall(_ > 0), s"degenerate class split: $perEpoch")
    // the epoch-driven entry is the residue entry, wired: epoch 4 at
    // denom 3 IS residue 1
    val found = Dedup.sortedNeighborhood(d, "doc_id", "text",
      window = 8, thresholdBp = 8000L).localCheckpoint(false)
    val byEpoch = Dedup.sampledPairEvalAtEpoch(found, d, "doc_id", "text",
      8000L, denom = 3, epoch = 4L).head()
    val byResidue = Dedup.sampledPairEval(found, d, "doc_id", "text",
      8000L, denom = 3, residue = 1L).head()
    assert(byEpoch === byResidue)
  }
}
