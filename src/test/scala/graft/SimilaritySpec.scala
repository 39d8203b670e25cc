package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(1.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: hand-checked values") {
    val c = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(c((0L, 2L))) < 1e-12)
    assert(math.abs(c((0L, 3L)) + 1.0) < 1e-12)
    assert(math.abs(c((0L, 4L)) - 1.0 / math.sqrt(2)) < 1e-9)
  }

  test("vecDot matches a hand fold; normalized drops zero vectors") {
    val withZero = vecs.union(Seq((9L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val n = Similarity.normalized(withZero, "vec_id", "embedding")
    assert(n.filter($"vid" === 9L).count() === 0)      // zero-norm dropped
    assert(n.count() === 5)
    val d = vecs.filter($"vec_id" === 4L)
      .select(graft.functions.vecDot($"embedding", $"embedding").as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 2.0) < 1e-12)
    // unit norm after normalization
    val norms = n.select(Similarity.norm($"nv").as("m")).collect().map(_.getDouble(0))
    assert(norms.forall(m => math.abs(m - 1.0) < 1e-12))
  }

  test("bruteTopK: ranks by cosine desc with id tiebreak, excludes self") {
    val r = Similarity.bruteTopK(vecs, "vec_id", "embedding", Seq(0L), k = 3)
      .orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 4L, 2L))
    assert(r.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("cosinePairs finds only pairs above threshold") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))  // cos ≈ 0.9939
  }

  test("IVF recall ≥ 0.5 vs brute on sf0.001 (approximate, must still be useful)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = resultSet(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val ivf = resultSet(Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 10,
      nlist = 8, nprobe = 4))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
    assert(brute.size === 80)
  }

  test("IVF with k-means-refined codebook keeps recall and determinism") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val refined = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 10,
      nlist = 8, nprobe = 4, kmeansIters = 2)
    val r1 = rs(refined)
    val r2 = rs(Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 10,
      nlist = 8, nprobe = 4, kmeansIters = 2))
    assert(r1 === r2)                                   // deterministic
    assert((brute & r1).size.toDouble / brute.size >= 0.5)
  }

  test("ivfTune + 1 refinement sweep (the SERVED q_ann_ivf config) keeps the recall floor") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val n = emb.count()
    val (nlist, nprobe) = Similarity.ivfTune(n)
    // sizing shape: √n cells, quarter-probe ratio
    assert(nlist === math.round(math.sqrt(n.toDouble)).toInt)
    assert(nprobe === math.max(1, (nlist + 3) / 4))
    val brute = rs(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val tuned = rs(Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 10,
      nlist = nlist, nprobe = nprobe, kmeansIters = 1))
    assert((brute & tuned).size.toDouble / brute.size >= 0.5,
      "tuned+refined IVF recall below floor")
  }

  test("SRP LSH pairs: clones always found (deterministic), recall vs exact usable") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // identical clones → cos=1.0 → identical signature → guaranteed candidates
    val clones = emb.filter($"vec_id" % 5 === 0).withColumn("vec_id", $"vec_id" + 100000L)
    val withClones = emb.unionByName(clones)
    val pairs = Similarity.srpPairs(withClones, "vec_id", "embedding", 9999L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = emb.filter($"vec_id" % 5 === 0)
      .select("vec_id").as[Long].collect().map(v => (v, v + 100000L)).toSet
    assert(expected.subsetOf(pairs))
    // moderate-threshold recall against the exact quadratic operator
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 4500L).count()
    val lsh = Similarity.srpPairs(emb, "vec_id", "embedding", 4500L).count()
    assert(lsh <= exact)                       // exact-verify: no false positives
    if (exact > 0) assert(lsh.toDouble / exact >= 0.5, s"recall $lsh/$exact")
  }

  test("verified wrappers: pass when exact, throw loudly on any miss/divergence") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // srpPairsVerified at the served tuned config (recall target 0.9999):
    // must find every exact pair and return them (no exception)
    val (bands, probes) = Similarity.srpTune(4500L, targetRecall = 0.9999)
    val got = Similarity.srpPairsVerified(emb, "vec_id", "embedding", 4500L,
        bands = bands, probeBits = probes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 4500L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact, "verified LSH output must equal the exact baseline")
    // a deliberately weak banding (wide bands, no probes) misses pairs at
    // the moderate threshold — the audit must THROW, not return a subset
    if (exact.nonEmpty) {
      val e = intercept[IllegalStateException](
        Similarity.srpPairsVerified(emb, "vec_id", "embedding", 4500L,
          bands = 2, probeBits = 0).collect())
      assert(e.getMessage.contains("missed"))
    }
    // ivfTopKVerified: full probe (exact by construction) passes…
    val full = Similarity.ivfTopKVerified(emb, "vec_id", "embedding",
      (0L to 7L), 10, nlist = 8, nprobe = 8, kmeansIters = 1)
    assert(full.count() === 80)
    // …and a pruning config that demonstrably loses rows must throw
    val e2 = intercept[IllegalStateException](
      Similarity.ivfTopKVerified(emb, "vec_id", "embedding",
        (0L to 7L), 10, nlist = 8, nprobe = 1).collect())
    assert(e2.getMessage.contains("diverged"))
  }

  test("srpTune: near-dup thresholds get wider bands and less noise than moderate ones") {
    val (bModerate, _) = Similarity.srpTune(4500L)
    val (bNear, prNear) = Similarity.srpTune(9000L)
    // wider bands = FEWER bands over the same 64 bits
    assert(bNear < bModerate, s"near-dup bands $bNear !< moderate $bModerate")
    def noise(bands: Int, probes: Int): Double = {
      val w = 64 / bands
      val pb = math.pow(0.5, w) + probes * math.pow(0.5, w - 1) * 0.5
      1 - math.pow(1 - pb, bands)
    }
    assert(noise(bNear, prNear) < noise(bModerate, 0))
    // e2e on real data: tuned params still find the planted clones
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val clones = emb.filter($"vec_id" % 5 === 0).withColumn("vec_id", $"vec_id" + 100000L)
    val pairs = Similarity.srpPairs(emb.unionByName(clones), "vec_id", "embedding",
        9999L, bands = bNear, probeBits = prNear)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = emb.filter($"vec_id" % 5 === 0)
      .select("vec_id").as[Long].collect().map(v => (v, v + 100000L)).toSet
    assert(expected.subsetOf(pairs))
    // impossible targets fail loudly instead of silently under-recalling
    intercept[IllegalArgumentException](Similarity.srpTune(500L, bits = 8,
      targetRecall = 0.999999))
  }

  test("serving path is srpTune'd: tuned recall ≥ the former hard-coded config, no extra noise") {
    // q_dedup_embed_lsh now serves srpTune(4500)'s (bands, probeBits)
    // instead of the former hard-coded (16, 0); the tuned config must be
    // at least as good on BOTH axes — measured recall vs the exact
    // operator, and analytic candidate noise for unrelated vectors.
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (bands, probes) = Similarity.srpTune(4500L)
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 4500L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lsh(b: Int, p: Int) =
      Similarity.srpPairs(emb, "vec_id", "embedding", 4500L,
          bands = b, probeBits = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tuned = lsh(bands, probes)
    val legacy = lsh(16, 0)
    assert(tuned.subsetOf(exact) && legacy.subsetOf(exact))   // exact verify
    assert(tuned.size >= legacy.size,
      s"tuned ($bands,$probes) recall ${tuned.size}/${exact.size} < " +
        s"legacy (16,0) ${legacy.size}/${exact.size}")
    def noise(b: Int, pr: Int): Double = {
      val w = 64 / b
      val pb = math.pow(0.5, w) + pr * math.pow(0.5, w - 1) * 0.5
      1 - math.pow(1 - pb, b)
    }
    assert(noise(bands, probes) <= noise(16, 0) + 1e-12)
  }

  test("adversarial skew: srpPairs bucketCap sheds an identical-embedding family; cold pair survives") {
    // the embedding analog of DedupSpec's adversarial-skew cases: 5,000
    // identical vectors share every band bucket (f² pair blowup uncapped);
    // with bucketCap=500 all 16 band buckets shed, while a planted
    // 2-member clone pair in a different direction still surfaces.
    // Multi-probe doubles each doc's emissions — the (1+probeBits) cap
    // scaling must keep the planted pair alive there too.
    import spark.implicits._
    val d = 8
    val family = (100000L until 105000L)
      .map(i => (i, Array.tabulate(d)(j => if (j == 0) 1.0f else 0.0f)))
    val planted = Seq(
      (200001L, Array.tabulate(d)(j => if (j == d - 1) 1.0f else 0.1f)),
      (200002L, Array.tabulate(d)(j => if (j == d - 1) 1.0f else 0.1f)))
    val corpus = (family ++ planted).toDF("vec_id", "embedding")
    def run(probeBits: Int) =
      Similarity.srpPairs(corpus, "vec_id", "embedding", 9999L,
          bucketCap = 500L, probeBits = probeBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(0)
    assert(base === Set((200001L, 200002L)),
      s"family must shed, planted pair must survive; got ${base.size} pairs")
    assert(run(2) === Set((200001L, 200002L)))
  }

  test("nearestCentroids: ties break to the lower index, keep caps at codebook size") {
    val df = Seq((1L, Seq(1.0, 0.0))).toDF("vid", "nv")
    val cents = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))  // c0 == c1
    val out = df.select(graft.functions.nearestCentroids($"nv", cents, 5).as("c"))
      .head().getSeq[Int](0)
    assert(out === Seq(0, 1, 2))   // tie → index order; keep=5 capped to 3
  }

  test("SrpSignature native expression is bit-identical to the HOF fold") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val rnd = new scala.util.Random(987L)
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val planes = Seq.fill(64)(Seq.fill(dim)(rnd.nextGaussian()))
    val n = Similarity.normalized(emb, "vec_id", "embedding")
    val both = n.select($"vid",
      graft.functions.srpSignature($"nv", planes).as("native"),
      aggregate(typedLit(planes), lit(0L), (acc, p) =>
        shiftleft(acc, 1).bitwiseOR(
          when(graft.functions.vecDot($"nv", p) > 0, 1L).otherwise(0L))).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
    assert(both.count() > 0)
  }

  test("multi-probe SRP: recall ≥ single-probe at the same band layout, no false positives") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 4500L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // WIDE bands (w=8, 8 bands): weak single-probe recall by design — the
    // regime multi-probe exists for (vs the default's 16 narrow bands)
    def lsh(probeBits: Int) =
      Similarity.srpPairs(emb, "vec_id", "embedding", 4500L,
          bits = 64, bands = 8, probeBits = probeBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = lsh(0)
    val probed = lsh(8)
    assert(single.subsetOf(exact) && probed.subsetOf(exact))  // exact verify holds
    // Hamming-1 buckets strictly add candidates → pair set can only grow
    assert(single.subsetOf(probed))
    val (rS, rP) = (single.size.toDouble / exact.size, probed.size.toDouble / exact.size)
    info(f"exact=${exact.size} recall single=$rS%.3f probed=$rP%.3f")
    // the probes must actually buy recall at this fixed layout
    assert(probed.size > single.size, s"probing added nothing ($rS -> $rP)")
    assert(rP >= 0.5, s"multi-probe recall $rP too low")
  }

  test("ivfTopK persistCorpus=false returns identical results (no staging)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = Seq(0L, 1L, 2L)
    def rs(persist: Boolean) =
      Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 5,
          nlist = 8, nprobe = 3, persistCorpus = persist)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("neighbor_id"))).toSet
    assert(rs(true) === rs(false))
  }

  test("IVF plan shape: the only window is the final per-query top-k (no assignment shuffle)") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  // see AnalyticsSpec note
    val plan =
      try Similarity.ivfTopK(emb, "vec_id", "embedding", Seq(0L, 1L), 5,
          nlist = 8, nprobe = 3).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size === 1 && windows.head.partitionSpec.nonEmpty,
      s"assignment must be map-only; windows found:\n$windows")
    // and no corpus×codebook join remains anywhere
    assert(plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }.isEmpty, s"corpus×codebook join found:\n$plan")
  }

  test("IVF with nprobe = nlist degenerates to exact (full scan)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = Seq(0L, 1L)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", qids, 5,
      nlist = 4, nprobe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(full === brute)
  }

  // ---- coarse clustering / SemDeDup ------------------------------------

  /** The q_semdedup planted corpus shape: every 20th vector re-inserted
    * under a shifted id with the mild per-index perturbation (planted
    * cosines ≈ 0.95-0.98 against their originals; cross pairs < 0.9). */
  private def plantedEmb = {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    e.unionByName(e.filter($"vec_id" % 20 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", (x, i) =>
          x * (lit(1.0) + (lit(0.4) * ((i % 5).cast("double") - lit(2.0))) / lit(2.0)))
          .as("embedding")))
  }

  test("clusterAssign: every vector gets one cell; seeds map to themselves at 10000 bp") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    val (nlist, _) = Similarity.ivfTune(n)
    val a = Similarity.clusterAssign(emb, "vec_id", "embedding", nlist)
    assert(a.count() === n)
    assert(a.select("doc").distinct().count() === n)
    val cids = a.select("cid").distinct().collect().map(_.getInt(0))
    assert(cids.forall(c => c >= 0 && c < nlist))
    // the md5-seeded codebook vectors ARE centroids: own-cell sim_bp = 10000
    // (this is the case that forces round over floor — 1.0 sits on the
    // floor boundary one double ulp either way)
    val seedIds = emb.select($"vec_id")
      .orderBy(substring(md5($"vec_id".cast("string")), 1, 8).asc, $"vec_id".asc)
      .limit(nlist).collect().map(_.getLong(0)).toSet
    val seedSims = a.filter($"doc".isin(seedIds.toSeq: _*))
      .select("sim_bp").collect().map(_.getLong(0))
    assert(seedSims.length === nlist && seedSims.forall(_ === 10000L))
  }

  test("semDedupPairs: subset of exact pairs, members co-clustered") {
    val emb = plantedEmb
    val (nlist, _) = Similarity.ivfTune(emb.count())
    val pairs = Similarity.semDedupPairs(emb, "vec_id", "embedding", nlist, 9000L)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.subsetOf(exact))
    assert(got.nonEmpty, "some plants must co-cluster with their originals")
    val a = Similarity.clusterAssign(emb, "vec_id", "embedding", nlist)
      .select($"doc", $"cid")
    val bad = pairs
      .join(a.withColumnRenamed("doc", "i").withColumnRenamed("cid", "ci"), "i")
      .join(a.withColumnRenamed("doc", "j").withColumnRenamed("cid", "cj"), "j")
      .filter($"ci" =!= $"cid" || $"cj" =!= $"cid").count()
    assert(bad === 0, "every pair's members must share the pair's cluster")
  }

  test("semDedup with nlist=1 equals the global near-dup keep composition") {
    val emb = plantedEmb
    val pairs = Similarity.cosinePairs(emb, "vec_id", "embedding", 9000L)
    val global = graft.operators.Dedup.clusters(emb, "vec_id", pairs)
      .filter($"doc" === $"cluster").select($"doc")
      .collect().map(_.getLong(0)).toSet
    val one = Similarity.semDedup(emb, "vec_id", "embedding", 1, 9000L)
      .collect().map(_.getLong(0)).toSet
    assert(one === global)
  }

  test("semDedup removes EXACTLY the co-clustered plants; originals always survive") {
    val emb = plantedEmb
    val (nlist, _) = Similarity.ivfTune(emb.count())
    val survivors = Similarity.semDedup(emb, "vec_id", "embedding", nlist, 9000L)
      .collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    val removed = all -- survivors
    val cid = Similarity.clusterAssign(emb, "vec_id", "embedding", nlist)
      .select("doc", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // near-dup pairs at 0.9 only link a plant to its original on this
    // corpus, so the removed set must be precisely the plants sharing
    // their original's cell; a cluster-boundary plant survives — the
    // documented SemDeDup recall trade, part of the operator contract
    val expected = all.filter(p => p >= 1000000L && cid(p) == cid(p - 1000000L))
    assert(removed === expected)
    assert(removed.nonEmpty)
  }

  // ---- product quantization --------------------------------------------

  test("PQ: seed vectors encode to their own codeword in every subspace") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = Similarity.normalized(emb, "vec_id", "embedding")
    val cb = Similarity.pqCodebooks(n, m = 16, ksub = 32)   // the served geometry
    assert(cb.length === 16 && cb.forall(_.length === 32) &&
      cb.forall(_.forall(_.length === 4)))             // 64 dims / 16 subspaces
    // the codebook's seed ids, in ascending-id = codeword-index order
    val seedIds = n.orderBy(substring(md5($"vid".cast("string")), 1, 8).asc,
        $"vid".asc)
      .limit(32).select("vid").collect().map(_.getLong(0)).sorted
    val codes = n.filter($"vid".isin(seedIds: _*))
      .select($"vid", graft.functions.pqEncode($"nv", cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // codeword c of every subspace IS seed c's slice; L2 distance 0 to
    // itself always wins the argmin, so each seed reconstructs exactly
    seedIds.zipWithIndex.foreach { case (id, idx) =>
      assert(codes(id) === Seq.fill(16)(idx),
        s"seed $id should encode to its own codeword $idx in all subspaces")
    }
  }

  test("PQ ADC recall@10 vs brute on sf0.001 — the quantization trade, floor-pinned") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val pq = rs(Similarity.pqTopK(emb, "vec_id", "embedding", qids, 10))
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"PQ recall@10 = $recall%.3f")
    // the near-uniform synthetic corpus is PQ's documented worst case
    // (random codewords in wide subspaces reconstruct ~nothing: 0.05 at
    // m=4); the served m=16/ksub=32 geometry measured ~0.46 here and
    // does better on real clustered embeddings
    assert(recall >= 0.35, s"PQ recall $recall below floor")
    // deterministic: a second run is identical
    assert(pq === rs(Similarity.pqTopK(emb, "vec_id", "embedding", qids, 10)))
  }

  test("labelFilteredTopK: pre-filter semantics — constraint always holds, k rows served") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qids = (0L to 7L)
    val got = Similarity.labelFilteredTopK(emb, "vec_id", "embedding", "label",
      qids, 10).collect()
    // constraint holds on every served row
    got.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(labels(n) !== labels(q), s"neighbor $n shares label with query $q")
    }
    // full k per query (pre-filter guarantees it; post-filtering brute
    // top-k could come up short when same-label rows crowd the top)
    val perQ = got.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    qids.foreach(q => assert(perQ(q) === 10))
    // equals brute top-k over the per-query label-filtered corpus
    import org.apache.spark.sql.functions.col
    qids.take(3).foreach { q =>
      val sub = emb.filter(col("label") =!= labels(q) || col("vec_id") === q)
      val want = Similarity.bruteTopK(sub, "vec_id", "embedding", Seq(q), 10)
        .select("neighbor_id", "cos_bp").collect().map(_.toSeq).toSeq
      val mine = got.filter(_.getAs[Long]("query_id") == q)
        .sortBy(_.getAs[Int]("rank"))
        .map(r => Seq(r.getAs[Long]("neighbor_id"), r.getAs[Long]("cos_bp"))).toSeq
      assert(mine === want, s"query $q filtered result diverged")
    }
  }

  test("SQ8 recall@10 ≫ PQ on the same corpus; near-exact floor; deterministic") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val sq = rs(Similarity.sq8TopK(emb, "vec_id", "embedding", qids, 10))
    val recall = (brute & sq).size.toDouble / brute.size
    info(f"SQ8 recall@10 = $recall%.3f")
    // 256 affine levels per dim lose almost nothing even on the
    // near-uniform corpus that floors PQ at ~0.46 — the 4×-memory /
    // near-exact point of the compression family
    assert(recall >= 0.9, s"SQ8 recall $recall below floor")
    val pq = rs(Similarity.pqTopK(emb, "vec_id", "embedding", qids, 10))
    val pqRecall = (brute & pq).size.toDouble / brute.size
    assert(recall > pqRecall, s"SQ8 ($recall) should beat PQ ($pqRecall)")
    assert(sq === rs(Similarity.sq8TopK(emb, "vec_id", "embedding", qids, 10)))
  }

  test("sq8RerankTopK: exact scores on SQ8 candidates; equals brute when recall holds") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val rr = Similarity.sq8RerankTopK(emb, "vec_id", "embedding", qids,
      kCand = 30, k = 10)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10)
    // SQ8 recall on this corpus is 1.0 (pinned above), so the reranked
    // result — exact scores over a superset of the true top-10 — must
    // EQUAL brute exactly, ranks and scores included
    assert(rows(rr) === rows(brute))
    // degenerate kCand = k: rerank reorders the SQ8 list by exact score
    val tight = Similarity.sq8RerankTopK(emb, "vec_id", "embedding", qids,
      kCand = 10, k = 10).collect()
    val perQ = tight.groupBy(_.getAs[Long]("query_id"))
    qids.foreach(q => assert(perQ(q).length === 10))
  }

  test("trained PQ: recall beats sampled codebooks; iterations refine monotonically-ish") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val sampled = rs(Similarity.pqTopK(emb, "vec_id", "embedding", qids, 10))
    val trained = rs(Similarity.pqTrainedTopK(emb, "vec_id", "embedding",
      qids, 10, iters = 2))
    val (rS, rT) = ((brute & sampled).size.toDouble / brute.size,
      (brute & trained).size.toDouble / brute.size)
    info(f"PQ recall@10: sampled = $rS%.3f, kmeans-trained = $rT%.3f")
    // Lloyd refinement is the measured step that moves PQ recall on
    // this corpus (0.46 → 0.56; the OPQ-rotation experiment moved it
    // DOWN — see ROUND13.md): trained must stay strictly ahead
    assert(rT > rS, s"training did not beat sampling: $rS vs $rT")
    assert(rT >= 0.5, s"trained recall floor: $rT")
    // deterministic: the integer fixpoint gives identical results
    assert(trained === rs(Similarity.pqTrainedTopK(emb, "vec_id",
      "embedding", qids, 10, iters = 2)))
  }

  test("ivfpqRefineTopK: exact scores at compressed-stage recall; refine never loses to no-refine") {
    val rnd = new scala.util.Random(20260816L)
    val d = 64; val nCenters = 24
    val centers = IndexedSeq.fill(nCenters)(IndexedSeq.fill(d)(rnd.nextGaussian()))
    val clustered = (0L until 1200L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, Array.tabulate(d)(j => (c(j) + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val (nlist, nprobe) = Similarity.ivfTune(1200L)
    val brute = rs(Similarity.bruteTopK(clustered, "vec_id", "embedding", qids, 10))
    val plain = rs(Similarity.ivfpqResidualTrainedTopK(clustered, "vec_id",
      "embedding", qids, 10, nlist = nlist, nprobe = nprobe, iters = 2))
    val ref = Similarity.ivfpqRefineTopK(clustered, "vec_id", "embedding",
      qids, kCand = 30, k = 10, nlist = nlist, nprobe = nprobe, iters = 2)
    val refSet = rs(ref)
    val (rP, rR) = ((brute & plain).size.toDouble / brute.size,
      (brute & refSet).size.toDouble / brute.size)
    info(f"clustered recall@10: rtrained=$rP%.3f refine(kCand=30)=$rR%.3f")
    // over-fetch + exact rerank can only help: any true neighbor inside
    // the ADC top-30 surfaces into the top-10 by its exact score
    assert(rR >= rP, s"refine lost recall: $rP vs $rR")
    // served scores are EXACT cosines — rows shared with brute match
    val bruteScores = Similarity.bruteTopK(clustered, "vec_id", "embedding",
        qids, 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("cos_bp")).toMap
    ref.collect().foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("neighbor_id"))
      bruteScores.get(key).foreach(b => assert(b === r.getAs[Long]("cos_bp")))
    }
    assert(refSet === rs(Similarity.ivfpqRefineTopK(clustered, "vec_id",
      "embedding", qids, 30, 10, nlist, nprobe, iters = 2)))
  }

  test("opqIvfpqTopK: the full Faiss composition — no catastrophe vs unrotated, deterministic") {
    // the clustered-corpus regime (residual encoding's home turf): the
    // rotation must compose losslessly — coarse assignment, residuals,
    // training, and ADC all move to rotated space together, and since
    // rotation preserves dots the composition must land in the same
    // recall band as the unrotated trained-residual pipeline
    val rnd = new scala.util.Random(20260815L)
    val d = 64; val nCenters = 24
    val centers = IndexedSeq.fill(nCenters)(IndexedSeq.fill(d)(rnd.nextGaussian()))
    val clustered = (0L until 1200L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, Array.tabulate(d)(j => (c(j) + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val (nlist, nprobe) = Similarity.ivfTune(1200L)
    val brute = rs(Similarity.bruteTopK(clustered, "vec_id", "embedding", qids, 10))
    val rt = rs(Similarity.ivfpqResidualTrainedTopK(clustered, "vec_id",
      "embedding", qids, 10, nlist = nlist, nprobe = nprobe, iters = 2))
    val oi = Similarity.opqIvfpqTopK(clustered, "vec_id", "embedding",
      qids, 10, nlist = nlist, nprobe = nprobe, iters = 2)
    val oiSet = rs(oi)
    val (rRt, rOi) = ((brute & rt).size.toDouble / brute.size,
      (brute & oiSet).size.toDouble / brute.size)
    info(f"clustered recall@10: residual-trained=$rRt%.3f OPQ+IVFPQ=$rOi%.3f")
    // rotation composes losslessly: same band (within 25% relative),
    // never a catastrophe
    assert(rOi >= rRt * 0.75, s"rotation broke the composition: $rRt vs $rOi")
    assert(rOi >= 0.15, s"OPQ+IVFPQ recall floor: $rOi")
    // deterministic end to end (rotation literals + md5 seeds + integer
    // training fixpoint + fixed folds)
    assert(oiSet === rs(Similarity.opqIvfpqTopK(clustered, "vec_id",
      "embedding", qids, 10, nlist = nlist, nprobe = nprobe, iters = 2)))
  }

  test("pcaReducedTopK: 8x-reduced candidates + exact rerank; whitening measured worse for dot recall") {
    // clustered corpus — the regime PCA reduction serves (structure in
    // few directions; the tail is noise the reduction drops)
    val rnd = new scala.util.Random(31415L)
    val d = 64; val nCenters = 12
    val centers = IndexedSeq.fill(nCenters)(IndexedSeq.fill(d)(rnd.nextGaussian()))
    val corpus = (0L until 900L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, Array.tabulate(d)(j => (c(j) + 0.2 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(corpus, "vec_id", "embedding", qids, 10))
    val red = Similarity.pcaReducedTopK(corpus, "vec_id", "embedding", qids, 10)
    val rRed = (brute & rs(red)).size.toDouble / brute.size
    val white = rs(Similarity.pcaReducedTopK(corpus, "vec_id", "embedding",
      qids, 10, whiten = true))
    val rWhite = (brute & white).size.toDouble / brute.size
    info(f"PCA-reduced recall@10 (kRed=8, kCand=40): plain = $rRed%.3f, whitened = $rWhite%.3f")
    // reduction to 8 of 64 dims keeps the clustered structure
    assert(rRed >= 0.6, s"PCA-reduced recall floor: $rRed")
    // whitening re-inflates suppressed noise directions — measured
    // worse-or-equal for dot-product candidates; the served default is
    // unwhitened (the flag is for k-means/Mahalanobis consumers)
    assert(rWhite <= rRed, s"whitening unexpectedly helped: $rWhite > $rRed")
    // served scores are EXACT cosines: rows shared with brute carry
    // identical cos_bp
    val bruteScores = Similarity.bruteTopK(corpus, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("cos_bp")).toMap
    red.collect().foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("neighbor_id"))
      bruteScores.get(key).foreach(b => assert(b === r.getAs[Long]("cos_bp")))
    }
    // deterministic end to end
    assert(rs(red) === rs(Similarity.pcaReducedTopK(corpus, "vec_id",
      "embedding", qids, 10)))
  }

  test("opqAssign: permutation, balanced slot counts, greedy log-product order, deterministic") {
    val vals = Array(8.0, 4.0, 2.0, 1.0, 0.5, 0.25, 0.1, 0.05)
    val perm = Similarity.opqAssign(vals, m = 2)
    assert(perm.sorted.toSeq === (0 until 8))
    // greedy trace: λ0→b0, λ1→b1, λ2→b1 (log 4 < log 8), λ3→b1
    // (4·2 = 8 = b0? log equal → tie to lower index b0)… verify the
    // invariant rather than the trace: each bucket gets exactly dsub
    // columns and the log-product spread is no worse than naive
    // contiguous slicing
    val (b0, b1) = (perm.take(4), perm.drop(4))
    assert(b0.length === 4 && b1.length === 4)
    def lp(ix: Seq[Int]) = ix.map(i => math.log(vals(i))).sum
    val spreadBal = math.abs(lp(b0.toSeq) - lp(b1.toSeq))
    val spreadNaive = math.abs(lp(0 to 3) - lp(4 to 7))
    assert(spreadBal <= spreadNaive,
      s"balanced spread $spreadBal worse than contiguous $spreadNaive")
    assert(perm.toSeq === Similarity.opqAssign(vals, 2).toSeq)
  }

  test("OPQ over trained codebooks: rotation pays on variance-concentrated dims") {
    // The r12/r13 negative result: rotation HURTS md5-SAMPLED codebooks.
    // Its stated prerequisite — trained Voronoi codebooks — exists now;
    // this is the re-run at the new bar, on the corpus shape OPQ exists
    // for: all signal variance packed into ONE subspace's dims (4
    // decaying factors mixed into dims 0-3), the other subspace pure
    // tiny noise. Direct PQ spends one 16-codeword quantizer on a 4D
    // structure and wastes the other; balanced rotation splits the
    // spectrum across both.
    val rnd = new scala.util.Random(909)
    val d = 8
    val sig = Array(1.0, 0.8, 0.6, 0.45)
    // fixed mixing of the 4 factors into dims 0..3 (rows orthonormal-ish
    // is irrelevant — PCA recovers whatever basis the mix spans)
    val mix = Array.tabulate(4, 4)((j, kk) =>
      math.cos(1.7 * j + 2.3 * kk) + (if (j == kk) 1.2 else 0.0))
    val data = (0 until 600).map { i =>
      val f = Array.fill(4)(rnd.nextGaussian())
      val v = Array.tabulate(d) { j =>
        if (j < 4) (0 until 4).map(kk => mix(j)(kk) * f(kk) * sig(kk)).sum
        else rnd.nextGaussian() * 0.02
      }
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "v")
    val qids = (0L to 7L)
    def rs(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(df, "vec_id", "v", qids, 10))
    val direct = rs(Similarity.pqTrainedTopK(df, "vec_id", "v", qids, 10,
      m = 2, ksub = 16, iters = 2))
    val opq = rs(Similarity.opqTrainedTopK(df, "vec_id", "v", qids, 10,
      m = 2, ksub = 16, iters = 2))
    val (rD, rO) = ((brute & direct).size.toDouble / brute.size,
      (brute & opq).size.toDouble / brute.size)
    info(f"trained-PQ recall@10: direct = $rD%.3f, OPQ-rotated = $rO%.3f")
    // measured: 0.250 direct → 0.275 OPQ (a genuinely hard corpus —
    // full-rank 4D Gaussian signal against 16 codewords; the point is
    // the ORDERING, rotation pays where r12's sampled-codebook
    // experiment measured it hurting). Deterministic corpus + integer
    // pipeline → exact reproduction, strict compare is safe.
    assert(rO > rD, s"OPQ did not pay at the trained bar: $rD vs $rO")
    assert(rO >= 0.25, s"OPQ recall floor: $rO")
    // deterministic end to end (integer rotation literals + fixpoint)
    assert(opq === rs(Similarity.opqTrainedTopK(df, "vec_id", "v", qids, 10,
      m = 2, ksub = 16, iters = 2)))
  }

  test("non-parametric OPQ: alternation vs parametric on the variance-concentrated corpus; orthogonal; deterministic") {
    // the same corpus shape as the OPQ-P test (same seed — identical
    // data): 4 decaying Gaussian factors mixed into dims 0-3, the other
    // subspace pure tiny noise
    val rnd = new scala.util.Random(909)
    val d = 8
    val sig = Array(1.0, 0.8, 0.6, 0.45)
    val mix = Array.tabulate(4, 4)((j, kk) =>
      math.cos(1.7 * j + 2.3 * kk) + (if (j == kk) 1.2 else 0.0))
    val data = (0 until 600).map { i =>
      val f = Array.fill(4)(rnd.nextGaussian())
      val v = Array.tabulate(d) { j =>
        if (j < 4) (0 until 4).map(kk => mix(j)(kk) * f(kk) * sig(kk)).sum
        else rnd.nextGaussian() * 0.02
      }
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "v")
    val qids = (0L to 7L)
    def rs(x: org.apache.spark.sql.DataFrame) =
      x.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = rs(Similarity.bruteTopK(df, "vec_id", "v", qids, 10))
    val rotP = Similarity.opqRotationFor(df, "vec_id", "v", m = 2)
    val rotNp = Similarity.opqRotationNpFor(df, "vec_id", "v", m = 2,
      npIters = 2, ksub = 16, lloydIters = 2)
    // the learned rotation stays orthogonal (to grid precision):
    // RᵀR ≈ I over the double matrix the integer grid encodes
    val rd = rotNp.map(_.map(_ / (1L << 30).toDouble))
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => rd(k)(i) * rd(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"RᵀR[$i][$j] = $dot")
    }
    // the alternation's PUBLISHED claim is reconstruction-MSE descent —
    // assert exactly that: each alternation's rotation (with codebooks
    // retrained there) reconstructs no worse than the OPQ-P init.
    // Driver-side on the 600-row corpus (test-only measurement).
    def mseAt(p: Array[Array[Long]]): Double = {
      val scale = (1L << 30).toDouble
      val pd = p.map(_.map(_ / scale))
      val rows = Similarity.normalized(df, "vec_id", "v")
        .select("vid", "nv").as[(Long, Seq[Double])].collect()
      val rdf = rows.toSeq.map { case (vid, x) =>
        (vid, Seq.tabulate(d)(j => (0 until d).map(i => x(i) * pd(i)(j)).sum))
      }.toDF("vid", "nv")
      val cb = graft.operators.KMeans.trainSubspaces(rdf, "vid", "nv", 2, 16, 2)
        .map(_.map(_.map(c =>
          (c - graft.operators.KMeans.Offset).toDouble /
            graft.operators.KMeans.Scale)))
      val enc = rdf.select(col("vid"),
          graft.functions.pqEncode(col("nv"), cb).as("codes"), col("nv"))
        .as[(Long, Seq[Int], Seq[Double])].collect()
      enc.map { case (_, codes, rv) =>
        val xh = codes.zipWithIndex.flatMap { case (cIdx, s) => cb(s)(cIdx) }
        rv.zip(xh).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / enc.length
    }
    val (mseP, mseNp) = (mseAt(rotP), mseAt(rotNp))
    info(f"reconstruction MSE: OPQ-P = $mseP%.6f, OPQ-NP = $mseNp%.6f")
    assert(mseNp <= mseP + 1e-9,
      s"NP alternation failed its own objective: $mseP -> $mseNp")
    val pOpq = rs(Similarity.opqTrainedTopK(df, "vec_id", "v", qids, 10,
      m = 2, ksub = 16, iters = 2, rot = Some(rotP)))
    val np = rs(Similarity.opqTrainedTopK(df, "vec_id", "v", qids, 10,
      m = 2, ksub = 16, iters = 2, rot = Some(rotNp)))
    val (rP, rN) = ((brute & pOpq).size.toDouble / brute.size,
      (brute & np).size.toDouble / brute.size)
    info(f"trained-PQ recall@10: OPQ-P = $rP%.3f, OPQ-NP = $rN%.3f")
    // MEASURED NEGATIVE RESULT, pinned on purpose (the r12/r14 device):
    // the alternation DOES descend its MSE objective (0.10679 → 0.10597,
    // asserted above) and recall still DROPS (0.275 → 0.163) — on the
    // variance-concentrated corpus the recall-optimal rotation is
    // MSE-suboptimal, the same mechanism as opqAssign's documented
    // greedy-beats-snake finding: a lopsided quantizer that privileges
    // the dominant signal directions ranks neighbors better than the
    // MSE-balanced one. If this ordering ever flips, the pin fails and
    // the negative result must be re-adjudicated, not silently enjoyed.
    assert(rN < rP, s"negative-result pin flipped: OPQ-P $rP vs NP $rN — " +
      "re-measure and re-document")
    assert(rN >= 0.1, s"NP recall floor: $rN")
    // deterministic end to end (integer-grid rotations + exact-integer
    // cross-moments + the Lloyd fixpoint)
    assert(rotNp.map(_.toSeq).toSeq === Similarity.opqRotationNpFor(df,
      "vec_id", "v", m = 2, npIters = 2, ksub = 16, lloydIters = 2)
      .map(_.toSeq).toSeq)
  }

  test("procrustesRotation: recovers an orthogonal M's factor; output orthogonal on a degenerate M") {
    // M already orthogonal -> R = M exactly (SVD of Q is Q·I·Iᵀ)
    val th = 0.6
    val q3 = Array(
      Array(math.cos(th), -math.sin(th), 0.0),
      Array(math.sin(th), math.cos(th), 0.0),
      Array(0.0, 0.0, 1.0))
    val r3 = Similarity.procrustesRotation(q3)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(r3(i)(j) - q3(i)(j)) < 1e-9, s"R[$i][$j]")
    // rank-1 M: completion must still hand back a fully orthogonal R
    val m1 = Array(
      Array(2.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0))
    val r1 = Similarity.procrustesRotation(m1)
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => r1(k)(i) * r1(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RᵀR[$i][$j] = $dot")
    }
  }

  test("trainSubspaces: codewords land on quantized-mean grid; empty codeword carries") {
    import graft.operators.KMeans
    // 2 subspaces of width 2; two tight planted blobs per subspace
    val data = (0 until 40).map { i =>
      val (a, b) = (if (i % 2 == 0) 0.2f else 0.6f, if (i % 3 == 0) -0.4f else 0.1f)
      (i.toLong, Seq(a, a, b, b))
    }
    val df = data.toDF("vid", "v")
    val cbs = KMeans.trainSubspaces(df, "vid", "v", m = 2, ksub = 4, iters = 3)
    assert(cbs.length === 2 && cbs.forall(_.length === 4))
    assert(cbs.forall(_.forall(_.length === 2)))
    // every codeword is a floor-mean of quantized members or a carried
    // seed — always inside the quantized value range of its subspace
    val q = data.map(_._2.map(x =>
      math.floor(x.toDouble * 10000).toLong + 16384L))
    for (j <- 0 until 2) {
      val (lo, hi) = (q.map(_(j * 2)).min min q.map(_(j * 2 + 1)).min,
        q.map(_(j * 2)).max max q.map(_(j * 2 + 1)).max)
      cbs(j).foreach(cw => cw.foreach(c =>
        assert(c >= lo && c <= hi, s"codeword $c outside [$lo, $hi]")))
    }
    // determinism across runs (exact integer pipeline)
    assert(cbs === KMeans.trainSubspaces(df, "vid", "v", 2, 4, 3))
  }

  test("trainSubspaces: out-of-domain input fails LOUD, not round apart") {
    import graft.operators.KMeans
    // |x| ≤ 1.6384 is the offset domain; -2.0 quantizes negative, where
    // Scala's truncating and the oracle's floor division diverge — the
    // guard must fire on the min("x") statistic, not silently train
    val df = ((0 until 8).map(i => (i.toLong, Seq(0.1f, 0.2f))) :+
      (8L, Seq(-2.0f, 0.3f))).toDF("vid", "v")
    val e = intercept[IllegalArgumentException] {
      KMeans.trainSubspaces(df, "vid", "v", m = 1, ksub = 2, iters = 1)
    }
    assert(e.getMessage.contains("offset domain"), e.getMessage)
    assert(e.getMessage.contains("-3616"), // floor(-2.0·10⁴) + 16384
      s"message should carry the offending min value: ${e.getMessage}")
  }

  test("binaryRerankTopK: candidate semantics exact, recall floor, scores exact") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    val got = Similarity.binaryRerankTopK(emb, "vec_id", "embedding", qids,
      kCand = 30, k = 10)
    val rows = got.collect()
    // exact cosine scores on the served rows: recompute per query
    import org.apache.spark.sql.functions.col
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val gotPairs = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val recall = (brute.toSet & gotPairs.toSet).size.toDouble / brute.length
    info(f"binary-rerank recall@10 (kCand=30) = $recall%.3f")
    // 1 bit/dim on the near-uniform corpus: the coarsest first stage —
    // the floor documents the measured trade (SQ8 ~1.0, PQ ~0.46)
    assert(recall >= 0.25, s"binary recall $recall below floor")
    // Hamming column is the true signature distance: recompute from
    // the sign bits of the normalized vectors for a few served rows
    val nv = Similarity.normalized(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.take(20).foreach { r =>
      val (q, n, h) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("ham"))
      val want = nv(q).zip(nv(n)).count { case (a, b) => (a > 0) != (b > 0) }
      assert(h === want.toLong, s"ham($q, $n)")
    }
    // widening the candidate budget can only help: kCand = corpus size
    // degenerates to brute exactly (ranks and scores included)
    val nAll = emb.count().toInt
    val wide = Similarity.binaryRerankTopK(emb, "vec_id", "embedding", qids,
      kCand = nAll, k = 10).drop("ham").orderBy("query_id", "rank")
    assert(wide.collect().map(_.toSeq).toSeq ===
      Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq)
    // deterministic across runs
    assert(rows.map(_.toSeq).toSeq ===
      Similarity.binaryRerankTopK(emb, "vec_id", "embedding", qids,
        kCand = 30, k = 10).collect().map(_.toSeq).toSeq)
  }

  test("SQ8 scores are within the per-dim half-step error bound of exact cosine") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val sq = Similarity.sq8TopK(emb, "vec_id", "embedding", Seq(0L), 10)
      .select("neighbor_id", "sq_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", Seq(0L), 1000)
      .select("neighbor_id", "cos_bp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // |q·(r̂−r)| ≤ Σ|q_i|·(Δ_i/2·(1/255)) — on unit vectors ≤ ~Δ/2·√d/255;
    // generous integer-bp bound: 200 bp
    sq.foreach { case (nid, s) =>
      assert(math.abs(s - brute(nid)) <= 200L,
        s"SQ8 score drifted ${math.abs(s - brute(nid))} bp for $nid")
    }
  }

  test("IVFPQ with nprobe = nlist degenerates to plain PQ (full probe)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = Seq(0L, 1L, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc_bp"))).toSet
    val full = rows(Similarity.ivfpqTopK(emb, "vec_id", "embedding", qids, 5,
      nlist = 8, nprobe = 8))
    val pq = rows(Similarity.pqTopK(emb, "vec_id", "embedding", qids, 5))
    assert(full === pq)
  }

  test("IVFPQ pruning loses only what the probe budget predicts; served config floor") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val (nlist, nprobe) = Similarity.ivfTune(emb.count())
    val pq = rs(Similarity.pqTopK(emb, "vec_id", "embedding", qids, 10))
    val ivfpq = rs(Similarity.ivfpqTopK(emb, "vec_id", "embedding", qids, 10,
      nlist = nlist, nprobe = nprobe))
    // vs its own unpruned quantized baseline (isolates the IVF trade
    // from the PQ trade): near-uniform synthetic vectors scatter true
    // neighbors across cells, the documented worst case for pruning
    val vsPq = (pq & ivfpq).size.toDouble / pq.size
    info(f"IVFPQ overlap with PQ = $vsPq%.3f (nlist=$nlist nprobe=$nprobe)")
    assert(vsPq >= 0.2, s"IVFPQ lost too much to pruning: $vsPq")
  }

  test("residual IVFPQ: recall ≥ direct encoding on a clustered corpus; deterministic") {
    // Residual encoding's win is conditional on the corpus CLUSTERING —
    // then ‖x − centroid‖ ≪ ‖x‖ and the quantizer's ksub codewords cover
    // a tight offset ball instead of the whole sphere. Real embedding
    // corpora cluster (that is why Faiss defaults to residual); the
    // sf* synthetic embeddings are near-UNIFORM, the documented
    // worst case where residual norms EXCEED 1 (top coarse dot ≈ 0.35 in
    // 64-dim ⇒ ‖r‖² ≈ 1.3) and residual cannot beat direct. So the
    // recall pin runs on a deterministic clustered corpus, and the
    // uniform corpus gets a no-catastrophe + determinism check below.
    // noise 0.15 ⇒ within-cluster cosine ≈ 0.98, the tight-cluster
    // regime where residual norms (≈0.3) are far below 1 and the win is
    // decisive (measured 0.238 vs 0.150 recall@10); at looser noise the
    // 32-seed UNTRAINED codebooks make the comparison noisy in both
    // directions — k-means-refined codebooks (the production path) are
    // what recovers the textbook uniform win; since trainSubspaces they
    // ARE relationally replayable (see the trained assertions below and
    // q_ann_pq_trained / q_ann_ivfpq_rtrained), and the pin stays in
    // the regime where the seed-codebook effect is unambiguous.
    val rnd = new scala.util.Random(20260814L)
    val d = 64; val nCenters = 24
    val centers = IndexedSeq.fill(nCenters)(IndexedSeq.fill(d)(rnd.nextGaussian()))
    val clustered = (0L until 1200L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, Array.tabulate(d)(j => (c(j) + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val (nlist, nprobe) = Similarity.ivfTune(1200L)
    val brute = rs(Similarity.bruteTopK(clustered, "vec_id", "embedding", qids, 10))
    val direct = rs(Similarity.ivfpqTopK(clustered, "vec_id", "embedding", qids, 10,
      nlist = nlist, nprobe = nprobe))
    val res = rs(Similarity.ivfpqResidualTopK(clustered, "vec_id", "embedding", qids, 10,
      nlist = nlist, nprobe = nprobe))
    val rDirect = (brute & direct).size.toDouble / brute.size
    val rRes = (brute & res).size.toDouble / brute.size
    info(f"clustered IVFPQ recall@10: direct=$rDirect%.3f residual=$rRes%.3f (nlist=$nlist nprobe=$nprobe)")
    assert(rRes > rDirect, s"residual recall $rRes !> direct $rDirect on clustered corpus")
    assert(rRes >= 0.2, s"residual recall $rRes below floor on clustered corpus")
    // deterministic replay (fixed seeds, fixed association order)
    assert(res === rs(Similarity.ivfpqResidualTopK(clustered, "vec_id", "embedding",
      qids, 10, nlist = nlist, nprobe = nprobe)))
    // trained residual codebooks (the full Faiss default — and, since
    // trainSubspaces, RELATIONALLY REPLAYABLE after all: the integer
    // fixpoint removed this test's former "not replayable" caveat):
    // Lloyd over the corpus residuals must not lose to the salted
    // sample, and stays deterministic
    val rt = rs(Similarity.ivfpqResidualTrainedTopK(clustered, "vec_id",
      "embedding", qids, 10, nlist = nlist, nprobe = nprobe, iters = 2))
    val rTrained = (brute & rt).size.toDouble / brute.size
    info(f"clustered IVFPQ recall@10: residual-trained=$rTrained%.3f")
    assert(rTrained >= rRes, s"trained residual $rTrained lost to sampled $rRes")
    assert(rt === rs(Similarity.ivfpqResidualTrainedTopK(clustered, "vec_id",
      "embedding", qids, 10, nlist = nlist, nprobe = nprobe, iters = 2)))
  }

  test("residual IVFPQ: ADC score error strictly below direct encoding (clustered)") {
    // The mechanism behind the recall win, asserted directly: residual
    // codes approximate q·x with lower absolute error because they
    // quantize the within-cell offset (‖r‖ ≪ 1) instead of the unit
    // sphere. Measured mean |ADC − q·x| over query 0 × full corpus.
    val rnd = new scala.util.Random(20260814L)
    val d = 64; val nCenters = 24
    val centers = IndexedSeq.fill(nCenters)(IndexedSeq.fill(d)(rnd.nextGaussian()))
    val clustered = (0L until 1200L).map { i =>
      val c = centers((i % nCenters).toInt)
      (i, Array.tabulate(d)(j => (c(j) + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val (nlist, _) = Similarity.ivfTune(1200L)
    val n = Similarity.normalized(clustered, "vec_id", "embedding")
    val coarse = Similarity.md5Codebook(n, nlist)
    val coarseLit = array(coarse.map(cv => array(cv.map(x => lit(x)): _*)): _*)
    val cbD = Similarity.pqCodebooks(n, 16, 32)
    val pseeds = Similarity.md5Codebook(n, 32, salt = "r")
    def nearestCid(v: IndexedSeq[Double]): Int = {
      var best = -1; var bestS = 0.0; var c = 0
      while (c < coarse.length) {
        val cv = coarse(c); var s = 0.0; var i = 0
        while (i < d) { s += v(i) * cv(i); i += 1 }
        if (best < 0 || s > bestS) { best = c; bestS = s }
        c += 1
      }
      best
    }
    val cbR = {
      val rseeds = pseeds.map { sv =>
        val cv = coarse(nearestCid(sv)); IndexedSeq.tabulate(d)(i => sv(i) - cv(i))
      }
      IndexedSeq.tabulate(16)(j => rseeds.map(_.slice(j * 4, (j + 1) * 4)))
    }
    val qv = n.filter(col("vid") === 0L).select("nv").head().getSeq[Double](0)
    val qvCol = array(qv.map(lit(_)): _*)
    val cent = element_at(coarseLit, (col("cid") + 1).cast("int"))
    val errs = n.select(col("vid"), col("nv"),
        graft.functions.nearestCentroids(col("nv"), coarse, 1).getItem(0).as("cid"))
      .select(
        abs(graft.functions.pqAdc(
              graft.functions.pqEncode(col("nv"), cbD),
              graft.functions.pqLut(qvCol, cbD))
          - graft.functions.vecDot(col("nv"), qvCol)).as("ed"),
        abs(graft.functions.pqAdc(
              graft.functions.pqEncode(zip_with(col("nv"), cent, (x, c) => x - c), cbR),
              graft.functions.pqLut(qvCol, cbR))
            + graft.functions.vecDot(qvCol, cent)
          - graft.functions.vecDot(col("nv"), qvCol)).as("er"))
      .agg(avg("ed"), avg("er")).head()
    val (eDirect, eRes) = (errs.getDouble(0), errs.getDouble(1))
    info(f"mean |ADC − q·x|: direct=$eDirect%.4f residual=$eRes%.4f")
    assert(eRes < eDirect, s"residual score error $eRes !< direct $eDirect")
  }

  test("residual IVFPQ on the near-uniform corpus: usable recall, its worst case") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qids = (0L to 7L)
    def rs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val (nlist, nprobe) = Similarity.ivfTune(emb.count())
    val brute = rs(Similarity.bruteTopK(emb, "vec_id", "embedding", qids, 10))
    val res = rs(Similarity.ivfpqResidualTopK(emb, "vec_id", "embedding", qids, 10,
      nlist = nlist, nprobe = nprobe))
    val rRes = (brute & res).size.toDouble / brute.size
    info(f"uniform-corpus residual IVFPQ recall@10 = $rRes%.3f (nlist=$nlist nprobe=$nprobe)")
    // near-uniform 64-dim data is the documented worst case (residual
    // norms exceed 1) — still must stay a usable retriever, not noise
    assert(rRes >= 0.2, s"residual recall $rRes collapsed on uniform corpus")
  }

  test("PQ plan shape: encode/score map-only, queries broadcast, one final top-k window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try Similarity.pqTopK(emb, "vec_id", "embedding", Seq(0L, 1L), 5)
          .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size === 1 && windows.head.partitionSpec.nonEmpty,
      s"expected exactly the final per-query top-k window:\n$plan")
    // queries ride a broadcast nested-loop join (vid != qid predicate);
    // the ONLY shuffle is the top-k window's qid exchange
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size === 1)
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size === 1,
      s"corpus must not shuffle for encoding/scoring:\n$plan")
  }

  test("semDedup clusterCap sheds an oversized cluster (missed pairs, no crash)") {
    val mass = (0L until 30L).map(i => (i, Array(1.0f, 0.2f, 0.1f)))
    val df = mass.toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, "vec_id", "embedding", 1, 9000L,
        clusterCap = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(kept === (0L until 30L).toSet)  // shed cluster → no pairs → all survive
    val collapsed = Similarity.semDedup(df, "vec_id", "embedding", 1, 9000L)
      .collect().map(_.getLong(0)).toSet
    assert(collapsed === Set(0L))          // cap off: identical family collapses
  }
}
