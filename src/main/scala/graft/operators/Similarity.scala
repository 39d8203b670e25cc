package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{vecDot, vecNormalize}

/** Embedding similarity search (`Array[Float]` columns).
  *
  * Pair scoring runs through [[graft.functions.VectorDot]] — a native
  * codegen'd Catalyst expression (tight primitive loop over Tungsten array
  * data) instead of interpreted higher-order functions; the accumulation
  * order is a sequential left-to-right fold in DOUBLE, bit-identical
  * between runs and matching DuckDB's sequential list kernels, which makes
  * similarity outputs oracle-comparable after basis-point rounding.
  */
object Similarity {

  /** dot(a,b) in double; sequential fold, deterministic. */
  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalize once so pair scoring is a plain dot product — n·d work
    * instead of 3·n·d, and the norm never recomputes per candidate pair.
    * Normalization is ONE native expression ([[graft.functions.VectorNormalize]],
    * norm fold + scale in a single traversal): a materialize-the-norm
    * formulation gets re-inlined into the division lambda by
    * CollapseProject and turns O(d²) per row again. Zero-norm vectors
    * carry no direction and are dropped (the expression yields null). */
  def normalized(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id).as("vid"), vecNormalize(col(vec)).as("nv"))
      .filter(col("nv").isNotNull)

  /** Brute-force exact top-k neighbors for the given query ids.
    *
    * Queries are a broadcast nested-loop join (small side broadcast, big
    * side streamed — the correct physical shape: every executor scores its
    * local shard against all queries, no shuffle of the corpus). The only
    * exchange is the final per-query top-k, which `rank ≤ k` turns into a
    * partial TakeOrdered per partition under AQE.
    *
    * Output: (query_id, rank, neighbor_id, cos_bp).
    */
  def bruteTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val n = normalized(emb, id, vec)
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv")))
    val scored = n.join(q, col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vid").as("neighbor_id"),
        col("cos_bp"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-duplicate dedup).
    * Exact O(n²/2) pair scan — correct but quadratic; the IVF/LSH variants
    * below are the 100 TB path, this is the oracle-checkable baseline and
    * fine for corpora that fit a broadcast (≤ ~1M vectors sharded). */
  def cosinePairs(emb: DataFrame, id: String, vec: String,
      thresholdBp: Long): DataFrame = {
    val n = normalized(emb, id, vec)
    val a = n.as("a"); val b = n.as("b")
    a.join(b, col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("i"), col("b.vid").as("j"),
        floor(dot(col("a.nv"), col("b.nv")) * 10000).cast("long").as("cos_bp"))
      .filter(col("cos_bp") >= thresholdBp)
  }

  /** SRP (signed-random-projection / random-hyperplane) LSH near-duplicate
    * pairs — the scale path for embedding dedup.
    *
    * Signature: `bits` hyperplanes drawn from a FIXED-seed gaussian (plan
    * is deterministic across runs/executors); bit b = sign(v·r_b).
    * P(bits agree) = 1 − θ/π, so banding (`bands` bands of bits/bands
    * rows; docs sharing a band value become candidates) concentrates
    * candidate generation on similar vectors instead of the exact
    * operator's O(n²) scan. Candidates are verified with the exact cosine,
    * so precision is exact; recall is probabilistic:
    * 1 − (1 − (1−θ/π)^w)^b. Tune (bits, bands) to the threshold — narrow
    * bands (small w) for moderate thresholds, wide bands for ≥0.9
    * near-dup. The hyperplane bootstrap reads the vector dimension from
    * one row (requires a non-empty corpus).
    *
    * ==Multi-probe (`probeBits` > 0)==
    *
    * Each doc additionally emits, per band, the `probeBits` keys at
    * Hamming distance 1 in the band's low bits (flagged non-base;
    * `probeBits` is capped at the band width `bits/bands` — a band has
    * no more bits to flip). A pair
    * becomes a candidate when its docs meet in a bucket and AT LEAST ONE
    * side is a base emission — i.e. band keys within Hamming distance 1 —
    * which recovers the near-misses that cost banding its recall without
    * the bucket-size blowup of halving the band width: emissions grow
    * linearly (×(1+probeBits)) while the collision probability per probe
    * stays that of the FULL band width. Standard multi-probe LSH (Lv et
    * al., VLDB'07) adapted to the self-join/dedup setting.
    *
    * Output: (i, j, cos_bp), i < j — a high-recall subset of
    * [[cosinePairs]]; rows-only checked by the driver, recall asserted in
    * SimilaritySpec.
    */
  def srpPairs(emb: DataFrame, id: String, vec: String, thresholdBp: Long,
      bits: Int = 64, bands: Int = 16, bucketCap: Long = 1000000L,
      probeBits: Int = 0): DataFrame = {
    require(bits <= 64 && bits % bands == 0)
    require(probeBits >= 0)
    val w = bits / bands
    val dim = emb.select(size(col(vec)).as("d")).head().getInt(0)
    val rnd = new scala.util.Random(1234567L)
    val planes = Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
    val n = normalized(emb, id, vec)
    // The whole signature is ONE native expression (SrpSignature): the
    // plane matrix rides as a single codegen reference object and all
    // `bits` dot products run in one primitive loop nest per row. The
    // predecessor — an aggregate() fold calling the dot kernel per plane —
    // evaluated its lambda through interpreted expression trees per plane
    // per row (HOF lambdas never codegen), the measured hot path here.
    val sig = n.select(col("vid"),
      graft.functions.srpSignature(col("nv"), planes).as("sig"))
    val bandCols = (0 until bands).flatMap { b =>
      val key = shiftright(col("sig"), b * w).bitwiseAND((1L << w) - 1)
      val base = struct(lit(b).as("band"), key.as("key"), lit(true).as("base"))
      val flips = (0 until math.min(probeBits, w)).map { bit =>
        struct(lit(b).as("band"),
          key.bitwiseXOR(lit(1L << bit)).as("key"), lit(false).as("base"))
      }
      base +: flips
    }
    val blocked = sig.select(col("vid"), explode(array(bandCols: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        struct(col("vid"), col("bk.base").as("base")).as("vb"))
    // probe∧probe meetings are Hamming-2 — outside the probe radius — so
    // at least one side must be a base emission for a candidate.
    // groupPairs caps on ROWS per (band, key) group, and multi-probe
    // multiplies each doc's rows by (1 + probes) — scale the cap by the
    // same factor so `bucketCap` keeps its documented meaning (docs per
    // bucket, up to probe-collision variance) at any probeBits.
    val effCap = bucketCap * (1 + math.min(probeBits, w))
    val candidates = Dedup.groupPairs(blocked, Seq("band", "key"), col("vb"),
        (x, y) => when(x.getField("vid") < y.getField("vid") &&
            (x.getField("base") || y.getField("base")),
          struct(x.getField("vid").as("i"), y.getField("vid").as("j"))),
        effCap, device = "embLshPairs")
      .select(col("_p.i").as("i"), col("_p.j").as("j"))
      .distinct()
    candidates
      .join(n.select(col("vid").as("i"), col("nv").as("ni")), "i")
      .join(n.select(col("vid").as("j"), col("nv").as("nj")), "j")
      .select(col("i"), col("j"),
        floor(dot(col("ni"), col("nj")) * 10000).cast("long").as("cos_bp"))
      .filter(col("cos_bp") >= thresholdBp)
  }

  /** [[srpPairs]] plus an IN-RUN exactness audit: the exact
    * [[cosinePairs]] baseline is computed over the same corpus and the
    * call THROWS if the LSH path missed any pair. Precision is already
    * exact by construction (candidates are cosine-verified), so "no
    * missed pair" == the output EQUALS the exact ground truth — which is
    * what lets the driver hash-compare q_dedup_embed_lsh against the
    * same relational oracle as the quadratic baseline, with the audit
    * failing loudly (never a silent hash drift) if banding recall ever
    * dips below 1 on the corpus at hand.
    *
    * The audit runs the quadratic baseline: this is the VERIFICATION
    * mode for CI/correctness gates and sampled production audits, not
    * the 100 TB serving path — serve [[srpPairs]] and monitor recall on
    * a sampled slice instead. */
  def srpPairsVerified(emb: DataFrame, id: String, vec: String,
      thresholdBp: Long, bits: Int = 64, bands: Int = 16,
      bucketCap: Long = 1000000L, probeBits: Int = 0): DataFrame = {
    // the banding pass is consumed at least twice (the audit + the
    // caller's own action; a downstream clusters() adds more) — pin it
    // so candidate generation runs ONCE. Same session-lifetime storage
    // note as TextAnalysis.postings; audit mode, not the serving path.
    val lsh = srpPairs(emb, id, vec, thresholdBp, bits, bands, bucketCap, probeBits)
      .localCheckpoint(false)
    val exact = cosinePairs(emb, id, vec, thresholdBp)
    val missed = exact.select("i", "j").exceptAll(lsh.select("i", "j")).count()
    if (missed > 0) throw new IllegalStateException(
      s"srpPairsVerified: LSH banding (bands=$bands, probeBits=$probeBits) " +
        s"missed $missed of the exact cosine>=$thresholdBp pairs — raise " +
        "srpTune's targetRecall (or probeBits) for this corpus")
    lsh
  }

  /** Auto-tune [[srpPairs]] banding: the (bands, probeBits) pair whose
    * ANALYTIC recall at the given cosine threshold meets `targetRecall`
    * with the least candidate noise (collision probability for unrelated,
    * near-orthogonal vectors). The SRP collision model is exact, not
    * heuristic: P(bit agrees) = 1 − θ/π; a band of width w matches with
    * p^w, plus w·p^(w−1)(1−p) per Hamming-1 probe bit; recall over b
    * bands = 1 − (1 − P_band)^b. Enumerates the divisors of `bits`.
    * Returns the tuned (bands, probeBits); throws if no configuration
    * reaches the target (lower the threshold's ambition or raise bits).
    *
    * Rule of thumb it reproduces: moderate thresholds need narrow bands
    * (w=4 at 0.45), near-dup thresholds (≥0.9) get wide bands + probes —
    * orders of magnitude fewer noise candidates for the same recall. */
  def srpTune(thresholdBp: Long, bits: Int = 64,
      targetRecall: Double = 0.9): (Int, Int) = {
    require(thresholdBp >= 0 && thresholdBp <= 10000 && bits >= 1 && bits <= 64)
    val p = 1.0 - math.acos(thresholdBp / 10000.0) / math.Pi
    val pNoise = 0.5                       // cos 0: unrelated vectors
    def bandP(q: Double, w: Int, probes: Int): Double =
      math.pow(q, w) + probes * math.pow(q, w - 1) * (1 - q)
    def recall(q: Double, w: Int, b: Int, probes: Int): Double =
      1.0 - math.pow(1.0 - math.min(1.0, bandP(q, w, probes)), b)
    val candidates = for {
      b <- (1 to bits).filter(bits % _ == 0)
      w = bits / b
      probes <- 0 to w
      noise = recall(pNoise, w, b, probes)
      // a config that pairs (nearly) everything is all-pairs in disguise,
      // not LSH — never "meet recall" through degenerate banding
      if noise < 0.999 && recall(p, w, b, probes) >= targetRecall
    } yield ((b, probes), noise)
    require(candidates.nonEmpty,
      s"no non-degenerate (bands, probeBits) at bits=$bits reaches recall " +
        s"$targetRecall for threshold $thresholdBp bp")
    candidates.minBy(_._2)._1
  }

  /** Auto-tune [[ivfTopK]]'s (nlist, nprobe) from corpus size — the IVF
    * analog of [[srpTune]]. nlist ≈ √n: per-query work is nlist (quantizer
    * scan) + n·nprobe/nlist (probed cells), and with nprobe a fixed
    * fraction of nlist the sum is minimized at nlist = Θ(√n) — the
    * standard IVF sizing. nprobe = ⌈nlist/4⌉ keeps the serving default's
    * probe ratio (16 → 4); it is the recall/cost knob — the recall floor
    * of the tuned config is asserted in SimilaritySpec. */
  def ivfTune(corpusSize: Long): (Int, Int) = {
    require(corpusSize > 0, "ivfTune requires a non-empty corpus")
    val nlist = math.max(1, math.round(math.sqrt(corpusSize.toDouble)).toInt)
    val nprobe = math.max(1, (nlist + 3) / 4)
    (nlist, nprobe)
  }

  /** [[ivfTopK]] plus an IN-RUN exactness audit against [[bruteTopK]]:
    * THROWS on any row divergence (both directions), so a successful run
    * certifies the probed-cells result EQUALS the exact top-k — the
    * device that turns q_ann_ivf's driver row into a hash-checked
    * comparison against the brute-force relational oracle. Same
    * contract as [[srpPairsVerified]]: verification/audit mode (the
    * brute pass is corpus×queries work), not the serving path. */
  def ivfTopKVerified(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, nlist: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 0, persistCorpus: Boolean = true): DataFrame = {
    // both sides feed two exceptAll directions plus the caller's action —
    // pin them so the IVF plan (incl. its codebook collect) and the brute
    // scan each run once (audit-mode pinning, as in srpPairsVerified)
    val ivf = ivfTopK(emb, id, vec, queryIds, k, nlist, nprobe, kmeansIters,
      persistCorpus).localCheckpoint(false)
    val brute = bruteTopK(emb, id, vec, queryIds, k).localCheckpoint(false)
    val diverged = ivf.exceptAll(brute).count() + brute.exceptAll(ivf).count()
    if (diverged > 0) throw new IllegalStateException(
      s"ivfTopKVerified: IVF (nlist=$nlist, nprobe=$nprobe) diverged from " +
        s"the exact top-$k on $diverged rows — raise nprobe for this corpus")
    ivf
  }

  /** IVF (inverted-file) approximate top-k — the scale path.
    *
    * Coarse quantizer: `nlist` centroids (a deterministic pseudo-random
    * sample of corpus vectors, the `nlist` smallest by `xxhash64(vid)`,
    * optionally k-means-refined). A query probes only its `nprobe`
    * nearest cells, so the pair scan touches n·nprobe/nlist of the corpus
    * instead of all of it. Recall vs [[bruteTopK]] is asserted in tests —
    * approx results are NOT oracle-hashable by design.
    *
    * Centroid selection is TakeOrdered (top-nlist by hash) — no global
    * window over the corpus (a `Window.orderBy` without partitioning
    * would serialize the whole table through one task at scale). The
    * codebook is COLLECTED (nlist·d doubles — plan metadata, the same
    * payload the former broadcast carried) and assignment happens in one
    * map-only native expression ([[graft.functions.nearestCentroids]]):
    * the previous crossJoin+window shape multiplied the corpus by nlist
    * rows and shuffled them all through a `Window.partitionBy(vid)`
    * exchange; now the corpus never shuffles for assignment at any size.
    */
  /** Spherical k-means refinement of a coarse codebook, driver-resident:
    * assignment is the same map-only [[graft.functions.nearestCentroids]]
    * expression the serving path uses; each cell's new mean comes back as
    * (cid, dim) partial-sum rows — nlist·d rows, CODEBOOK-sized, never
    * corpus-sized — assembled and unit-renormalized on the driver
    * (cosine geometry). Empty cells drop out. Per iteration: one map-only
    * assignment pass + one aggregation of nlist·d partials; no growing
    * lineage (each round's codebook is a plain array, not a plan). */
  private[graft] def kmeansRefine(n: DataFrame, cents: Seq[Seq[Double]],
      iters: Int): Seq[Seq[Double]] = {
    var c = cents
    for (_ <- 0 until iters) {
      val parts = n
        .select(graft.functions.nearestCentroids(col("nv"), c, 1)
          .getItem(0).as("cid"), col("nv"))
        .select(col("cid"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
        .collect()
      c = parts.groupBy(_.getInt(0)).toSeq.sortBy(_._1).flatMap { case (_, rows) =>
        val mean = rows.sortBy(_.getInt(1))
          .map(r => r.getDouble(2) / r.getLong(3)).toArray
        var s = 0.0
        var i = 0
        while (i < mean.length) { s += mean(i) * mean(i); i += 1 }
        if (s == 0.0) None    // zero direction: cell drops out
        else {
          val norm = math.sqrt(s)
          Some(mean.map(_ / norm).toIndexedSeq)
        }
      }
    }
    c
  }

  /** Oracle-portable coarse codebook: the `nlist` corpus vectors smallest
    * by (md5-prefix(id), id) — the same engine-neutral pseudo-random
    * device as the hash-split family — normalized, indexed by ascending
    * id. [[ivfTopK]] seeds by xxhash64, which is fine for a serving path
    * but engine-PRIVATE; clustering feeds hash-checked curation queries,
    * so the seed rule must be replayable relationally in any engine.
    * Selection is TakeOrdered (never a global window); the collect is
    * nlist·d doubles — codebook-sized plan metadata, same contract as
    * ivfTopK's (nlist ≈ √n stays driver-trivial even at 10⁹ vectors).
    *
    * `salt` prefixes the id before hashing — a DISTINCT replayable seed
    * rule for a second codebook drawn over the same corpus (the residual
    * PQ codebook must not coincide with the coarse one: a vector that IS
    * a coarse centroid has an all-zero residual, and a codebook of zero
    * vectors is a degenerate quantizer). */
  private[graft] def md5Codebook(n: DataFrame, nlist: Int,
      salt: String = ""): IndexedSeq[IndexedSeq[Double]] = {
    val key = if (salt.isEmpty) col("vid").cast("string")
      else concat(lit(salt), col("vid").cast("string"))
    val seed = n
      .orderBy(substring(md5(key), 1, 8).asc, col("vid").asc)
      .limit(nlist)
      .select(col("vid"), col("nv"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    require(seed.nonEmpty, "clustering requires a non-empty corpus")
    seed
  }

  /** Map-only coarse semantic clustering — the bucketing primitive under
    * topic balancing, per-topic corpus stats, and [[semDedupPairs]].
    * Output (doc, cid, sim_bp): assigned centroid index (argmax cosine,
    * ties to the smallest cid — [[graft.functions.VectorOps.nearestCentroids]]'
    * strict-`>` scan) and the ROUNDED basis-point cosine to it.
    *
    * sim_bp uses round, not the repo's usual floor: a seed vector's
    * similarity to its own centroid is analytically 1.0, which floor
    * turns into an engine-dependent 9999/10000 coin flip (the double
    * lands one ulp either side of the boundary depending on fold shape);
    * round is stable for anything farther than 5·10⁻⁵ from a half-integer,
    * which real similarities are.
    *
    * Scale shape: the codebook rides the corpus scan as a codegen
    * reference object (zero exchange, zero row blowup) and the sim
    * projection joins the nlist-row centroid table BROADCAST — the corpus
    * never shuffles. `kmeansIters` > 0 refines the codebook
    * (driver-resident Lloyd, [[kmeansRefine]]) for serving; the
    * hash-checked queries run iters=0 because a k-means fixpoint is not
    * relationally replayable in a SQL oracle. */
  def clusterAssign(emb: DataFrame, id: String, vec: String, nlist: Int,
      kmeansIters: Int = 0): DataFrame = {
    val n = normalized(emb, id, vec)
    val seed = md5Codebook(n, nlist)
    val codebook = if (kmeansIters <= 0) seed else kmeansRefine(n, seed, kmeansIters)
    assignToCodebook(emb, id, vec, codebook)
  }

  /** [[clusterAssign]]'s serving core against a GIVEN codebook — the
    * per-micro-batch unit of the incrementally-maintained assignment
    * table ([[graft.streaming.StreamClusters]] upserts these rows per
    * batch, the embedding analog of StreamIndex's postings unit): in
    * production the codebook is a trained artifact fixed up front, and
    * arriving vectors are assigned against it map-only. Same plan shape
    * as clusterAssign (codebook as codegen reference object, nlist-row
    * centroid table broadcast for the sim projection — the batch never
    * shuffles). Output: (doc, cid, sim_bp). */
  def assignToCodebook(emb: DataFrame, id: String, vec: String,
      codebook: Seq[Seq[Double]]): DataFrame = {
    val n = normalized(emb, id, vec)
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = broadcast(
      codebook.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cid", "cv"))
    n.select(col("vid").as("doc"), col("nv"),
        graft.functions.nearestCentroids(col("nv"), codebook, 1).getItem(0).as("cid"))
      .join(cents, "cid")
      .select(col("doc"), col("cid"),
        round(dot(col("nv"), col("cv")) * 10000).cast("long").as("sim_bp"))
  }

  /** Cluster-scoped exact near-dup pairs — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540): coarse clusters block the candidate space and
    * only WITHIN-cluster pairs are scored. Pair work drops from O(n²) to
    * Σ|cluster|² ≈ n²/nlist for balanced clusters — at nlist ≈ √n that
    * is n^1.5, the published device that makes embedding-level semantic
    * dedup feasible at corpus scale. Cross-cluster near-dups are
    * invisible BY DESIGN (SemDeDup's documented recall trade); the
    * global LSH path ([[srpPairs]]) owns that regime.
    *
    * Scale shape: assignment is map-only; both join sides shuffle ONCE
    * on cid (sort-merge — pairs stream out of the merge, no per-cluster
    * array materialization, unlike the shingle-bucket collect_list
    * shape whose groups are small by construction); `clusterCap` sheds
    * clusters larger than the cap from pair generation via a broadcast
    * of the ≤nlist-row size table — the hot-cluster skew guard, same
    * device as jaccardPairs' freqCap (shed pairs are MISSED pairs; the
    * cap exists for pathological mass points, cap ≫ expected |cluster|).
    *
    * Output: (i, j, cid, cos_bp), i < j, both assigned to cluster cid. */
  def semDedupPairs(emb: DataFrame, id: String, vec: String, nlist: Int,
      thresholdBp: Long, kmeansIters: Int = 0,
      clusterCap: Long = 1000000L): DataFrame = {
    val n = normalized(emb, id, vec)
    val seed = md5Codebook(n, nlist)
    val codebook = if (kmeansIters <= 0) seed else kmeansRefine(n, seed, kmeansIters)
    val withCid = n.select(col("vid"), col("nv"),
      graft.functions.nearestCentroids(col("nv"), codebook, 1).getItem(0).as("cid"))
    val keep = broadcast(withCid.groupBy("cid").agg(count(lit(1)).as("_n"))
      // runtime shed visibility (no silent caps): oversize-cluster and
      // shed-vector counts ride the cluster-count pass via observe()
      .observe(Guard.shedMetricName("semDedupPairs"),
        sum(when(col("_n") > clusterCap, 1L).otherwise(0L)).as("shed_groups"),
        sum(when(col("_n") > clusterCap, col("_n")).otherwise(0L))
          .as("shed_members"))
      .filter(col("_n") <= clusterCap).select("cid"))
    val scoped = withCid.join(keep, "cid")
    val a = scoped.select(col("cid"), col("vid").as("i"), col("nv").as("ni"))
    val b = scoped.select(col("cid"), col("vid").as("j"), col("nv").as("nj"))
    a.join(b, Seq("cid"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), col("cid"),
        floor(dot(col("ni"), col("nj")) * 10000).cast("long").as("cos_bp"))
      .filter(col("cos_bp") >= thresholdBp)
  }

  /** SemDeDup keep-one-canonical: [[semDedupPairs]] → connected
    * components ([[Dedup.clusters]], two-hop label propagation) → keep
    * each component's minimum id. Singletons survive as their own
    * canonical; a removed id is always a non-minimal member of some
    * within-cluster near-dup component. The embedding-modality analog of
    * [[Dedup.dropExactDuplicates]]. Output: (doc) — surviving ids. */
  def semDedup(emb: DataFrame, id: String, vec: String, nlist: Int,
      thresholdBp: Long, kmeansIters: Int = 0,
      clusterCap: Long = 1000000L): DataFrame = {
    val pairs = semDedupPairs(emb, id, vec, nlist, thresholdBp, kmeansIters, clusterCap)
    Dedup.clusters(emb, id, pairs)
      .filter(col("doc") === col("cluster"))
      .select(col("doc"))
  }

  /** Product-quantization codebooks from the md5-seeded sample: the
    * `ksub` corpus vectors smallest by (md5-prefix(id), id) — the same
    * engine-neutral seed rule as [[md5Codebook]], so a relational oracle
    * replays codeword selection exactly — sliced into `m` contiguous
    * subspaces of d/m dims each (codeword c of every subspace comes from
    * seed vector c; subvectors are NOT re-normalized — PQ quantizes the
    * normalized vector's coordinates, not directions). A production
    * deployment k-means-refines each subspace codebook offline (the
    * trained-artifact path, exactly as [[clusterAssign]]'s kmeansIters);
    * the hash-checked queries use the seed codebook because a k-means
    * fixpoint is not relationally replayable. */
  def pqCodebooks(n: DataFrame, m: Int, ksub: Int): IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
    val seeds = md5Codebook(n, ksub)
    val d = seeds.head.length
    require(d % m == 0, s"vector dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    IndexedSeq.tabulate(m)(j => seeds.map(s => s.slice(j * dsub, (j + 1) * dsub)))
  }

  /** PQ top-k by asymmetric distance computation (ADC) — the memory-side
    * scale path of similarity search (Jégou et al., TPAMI 2011): the
    * corpus is stored as `m` codes per vector (a 32× shrink at
    * d=64/m=16 with byte codes — the index fits in cluster RAM at
    * 100 TB) and scored against a per-query lookup table with m table
    * lookups per pair instead of a d-multiply dot product. Subspace
    * width trades recall for compression: on a near-uniform corpus the
    * nearest of ksub random codewords in a NARROW subspace is relatively
    * far closer than in a wide one (measured here: recall@10 0.05 at
    * m=4 → ~0.46 at m=16 on the synthetic embeddings), which is why the
    * served default is fine-grained.
    *
    * Plan shape: encoding is MAP-ONLY in the scan's own stage (codebook
    * rides as a codegen reference object — [[graft.functions.PqEncode]]);
    * queries carry their precomputed LUT through a broadcast join
    * ([[graft.functions.PqLut]], evaluated once per query row); the only
    * exchange is the final per-query top-k rank. The corpus never
    * shuffles.
    *
    * ADC scores approximate the true cosine (quantization error is the
    * recall trade — asserted in SimilaritySpec against [[bruteTopK]]),
    * but are DETERMINISTIC: every fold is sequential left-to-right and
    * the cross-subspace sum is left-associated, so a relational oracle
    * replays the exact doubles and the result is hash-checkable.
    *
    * Output: (query_id, rank, neighbor_id, adc_bp) — rank by floored
    * basis-point ADC score desc, neighbor id asc. */
  def pqTopK(emb: DataFrame, id: String, vec: String, queryIds: Seq[Long],
      k: Int, m: Int = 16, ksub: Int = 32): DataFrame = {
    val n = normalized(emb, id, vec)
    pqServe(n, pqCodebooks(n, m, ksub), queryIds, k)
  }

  /** The encode → LUT → ADC → rank serving tail over GIVEN codebooks —
    * shared by the sampled ([[pqTopK]]) and k-means-trained
    * ([[pqTrainedTopK]]) variants: the codebook's provenance is the
    * only difference between them. */
  private def pqServe(n: DataFrame,
      cb: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], queryIds: Seq[Long],
      k: Int): DataFrame = {
    val codes = n.select(col("vid"),
      graft.functions.pqEncode(col("nv"), cb).as("codes"))
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), graft.functions.pqLut(col("nv"), cb).as("lut")))
    val scored = codes.join(q, col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        floor(graft.functions.pqAdc(col("codes"), col("lut")) * 10000)
          .cast("long").as("adc_bp"))
    val w = Window.partitionBy("qid").orderBy(col("adc_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("adc_bp"))
  }

  /** PQ with K-MEANS-TRAINED sub-codebooks — the trained-centroid
    * upgrade over [[pqTopK]]'s sampled codewords (Jégou et al. train
    * with Lloyd; sampling is the bootstrap). Training runs on the
    * integer fixpoint device ([[KMeans.trainSubspaces]]: exact long
    * argmin + associative sums + floor division from the same md5
    * seeds pqCodebooks slices), so unlike classic float k-means the
    * WHOLE pipeline — training iterations included — unrolls
    * relationally and hash-gates (`q_ann_pq_trained`). Codewords
    * dequantize to the double grid ((c − offset)/scale, exact integer
    * operands) and serve through the same encode/LUT/ADC tail.
    *
    * The OPQ-rotation experiment (ROUND13.md) showed rotations do NOT
    * help sampled codebooks; trained codebooks are the prerequisite —
    * and the measured step that actually moves recall
    * (SimilaritySpec pins trained ≥ sampled on the PQ-floor corpus). */
  def pqTrainedTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, m: Int = 16, ksub: Int = 32,
      iters: Int = 2): DataFrame = {
    val n = normalized(emb, id, vec)
    val cb = KMeans.trainSubspaces(n, "vid", "nv", m, ksub, iters)
      .map(_.map(_.map(c =>
        (c - KMeans.Offset).toDouble / KMeans.Scale)))
    pqServe(n, cb, queryIds, k)
  }

  /** OPQ-P eigenvalue-balanced subspace assignment (Ge et al., CVPR
    * 2013 §4, the parametric variant): eigen-directions sorted by
    * eigenvalue descending are dealt greedily to the subspace with the
    * smallest running log-eigenvalue product (ties to the lowest
    * subspace index) among those with free slots — balancing the
    * per-subspace variance PRODUCT, which is what equalizes quantizer
    * workloads. Deterministic. Returns the output-column permutation:
    * rotated dim j projects onto eigenvector `perm(j)`, and subspace s
    * owns dims [s·dsub, (s+1)·dsub). */
  private[graft] def opqAssign(vals: Array[Double], m: Int): Array[Int] = {
    val d = vals.length
    require(d % m == 0, s"opqAssign: d=$d not divisible by m=$m")
    val dsub = d / m
    val logSum = new Array[Double](m)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    // vals arrive descending (jacobiEigen's contract). Note a measured
    // alternative: a boustrophedon deal equalizes per-bucket
    // log-PRODUCTS more tightly on near-zero-tail spectra (greedy's
    // product pins to ~0 after one tail λ and attracts every remaining
    // signal direction) — but on the SimilaritySpec corpus the greedy's
    // lopsided outcome actually RECALLS BETTER (0.275 vs snake 0.188):
    // giving the dominant eigendirection a near-private quantizer
    // resolves the variance that ranks neighbors. The published greedy
    // stays.
    for (t <- 0 until d) {
      val s = (0 until m).filter(buckets(_).length < dsub)
        .minBy(b => (logSum(b), b))
      buckets(s) += t
      logSum(s) += math.log(math.max(vals(t), 1e-12))
    }
    buckets.flatMap(_.toArray)
  }

  /** The OPQ rotation for a corpus, as scaled INTEGERS: Pᵢⱼ =
    * floor(vecs(i)(perm(j)) · 2^shift) — the PCA eigenbasis of the
    * normalized corpus with [[opqAssign]]'s balanced column order. The
    * integer form is the oracle-portable literal: both engines divide
    * by the power of two (exact in IEEE 754) and apply the identical
    * double matrix, so the rotation stage carries no cross-engine float
    * hazard. (Flooring costs ≤ 2⁻³⁰ per entry — orthogonality holds to
    * that precision, far below quantization noise.) */
  def opqRotationFor(emb: DataFrame, id: String, vec: String, m: Int,
      shift: Int = 30): Array[Array[Long]] = {
    val n = normalized(emb, id, vec)
    val d = n.select(size(col("nv"))).head().getInt(0)
    val model = Linalg.pcaFit(n, "nv", d)
    val perm = opqAssign(model.vals, m)
    Array.tabulate(d, d)((i, j) =>
      math.floor(model.vecs(i)(perm(j)) * (1L << shift).toDouble).toLong)
  }

  /** Apply the integer-scaled rotation: rvⱼ = Σᵢ nvᵢ · (Pᵢⱼ / 2^shift),
    * the fold sequential left-to-right over i — the engine's VectorOps
    * order, which DuckDB's list_dot_product replays bit-exactly. Map-
    * only; the d×d matrix rides the closures (codebook device). An
    * orthogonal rotation preserves norms and dot products, so serving
    * in rotated space scores the SAME cosines — only the quantization
    * cells move, which is OPQ's entire point. */
  private def rotatedFrame(n: DataFrame, p: Array[Array[Long]],
      shift: Int): DataFrame = {
    import n.sparkSession.implicits._
    val d = p.length
    val scale = (1L << shift).toDouble
    // rows = output dims for cache-friendly per-row dots
    val cols: Array[Array[Double]] =
      Array.tabulate(d, d)((j, i) => p(i)(j) / scale)
    n.select(col("vid").cast("long"), col("nv")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (vid, x) =>
          val out = new Array[Double](d)
          var j = 0
          while (j < d) {
            val rc = cols(j)
            var s = 0.0
            var i = 0
            while (i < d) { s += x(i) * rc(i); i += 1 }
            out(j) = s
            j += 1
          }
          (vid, out.toSeq)
        }
      }.toDF("vid", "nv")
  }

  /** OPQ: rotate, THEN train-and-serve PQ in rotated space — the last
    * production-Faiss preprocessing piece (OPQ+PQ at the same byte
    * budget). The r12 experiment measured rotation HURTING md5-SAMPLED
    * codebooks (samples already sit on the data manifold; ROUND13.md);
    * its stated prerequisite — trained Voronoi codebooks — exists since
    * r13 ([[pqTrainedTopK]]), so this composes [[opqRotationFor]] with
    * [[KMeans.trainSubspaces]] over the rotated corpus and the shared
    * [[pqServe]] tail. Queries rotate with the corpus (same map), so
    * ADC approximates the ORIGINAL cosine: (Rᵀq)·(Rᵀx) = q·x.
    *
    * Pass a precomputed `rot` (from [[opqRotationFor]]) to avoid a
    * second PCA fit when the caller also needs the matrix — e.g. to
    * write the oracle's fixture. Every stage replays relationally:
    * rotation (integer literals + sequential folds), training (the
    * integer Lloyd fixpoint), serving (the PQ tail) — `q_ann_opq`
    * hash-gates the full composition. */
  def opqTrainedTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, m: Int = 16, ksub: Int = 32,
      iters: Int = 2, rot: Option[Array[Array[Long]]] = None,
      shift: Int = 30): DataFrame = {
    val n = normalized(emb, id, vec)
    val p = rot.getOrElse(opqRotationFor(emb, id, vec, m, shift))
    val r = rotatedFrame(n, p, shift).localCheckpoint(eager = false)
    val cb = KMeans.trainSubspaces(r, "vid", "nv", m, ksub, iters)
      .map(_.map(_.map(c =>
        (c - KMeans.Offset).toDouble / KMeans.Scale)))
    pqServe(r, cb, queryIds, k)
  }

  /** NON-PARAMETRIC OPQ rotation (Ge et al. CVPR 2013 §3): the
    * alternation the parametric eigenbasis ([[opqRotationFor]], §4)
    * one-shots — initialize with OPQ-P (the paper's recommended init),
    * then alternate:
    *
    *  1. rotate the corpus on the CURRENT integer-grid rotation and
    *     Lloyd-train subspace codebooks there ([[KMeans.trainSubspaces]]
    *     — the integer fixpoint device, deterministic);
    *  2. reconstruct each rotated vector from its PQ codes
    *     (x̂ = concat of assigned codewords);
    *  3. re-solve the rotation as the orthogonal Procrustes problem
    *     min_R Σ‖Rᵀx − x̂‖² → R = UVᵀ from the SVD of the cross-moment
    *     matrix M = Σ x·x̂ᵀ.
    *
    * Every stage is deterministic: the rotation is floored to the
    * 2^-shift integer grid each iteration (so training sees the exact
    * matrix the fixture will carry), and M accumulates as EXACT long
    * sums of grid-quantized terms (order-free across partitions — a
    * plain double sum would make the learned rotation depend on task
    * scheduling). Only the FINAL rotation leaves the driver: it rides
    * the same basis-as-literal fixture as OPQ-P, so `q_ann_opq_np`
    * hash-gates through the identical rotated-training-serving oracle
    * chain — provenance of the matrix is the entire diff.
    *
    * Scale: per alternation, one trainSubspaces pass (map-side
    * integer Lloyd), one map-only encode/decode, and one d²-cell
    * integer aggregate (the momentStats shape) — the corpus never
    * shuffles; the SVD is a d×d driver problem.
    *
    * MEASURED NEGATIVE RESULT (SimilaritySpec, pinned): the alternation
    * descends its reconstruction-MSE objective exactly as published
    * (0.10679 → 0.10597 on the variance-concentrated corpus) and recall
    * still DROPS vs the parametric init (0.275 → 0.163) — MSE-optimal
    * is recall-suboptimal there, the same mechanism as [[opqAssign]]'s
    * greedy-beats-snake finding. Serve OPQ-P unless the corpus
    * spectrum is flat enough that MSE and recall agree. */
  def opqRotationNpFor(emb: DataFrame, id: String, vec: String, m: Int,
      shift: Int = 30, npIters: Int = 2, ksub: Int = 32,
      lloydIters: Int = 2): Array[Array[Long]] = {
    val n = normalized(emb, id, vec).localCheckpoint(eager = false)
    val d = n.select(size(col("nv"))).head().getInt(0)
    var p = opqRotationFor(emb, id, vec, m, shift)
    var it = 0
    while (it < npIters) {
      val r = rotatedFrame(n, p, shift).localCheckpoint(eager = false)
      val cb = KMeans.trainSubspaces(r, "vid", "nv", m, ksub, lloydIters)
        .map(_.map(_.map(c => (c - KMeans.Offset).toDouble / KMeans.Scale)))
      val recon = reconstructedFrom(r, cb)
      val pairs = n.join(recon, "vid").select(col("nv"), col("xr"))
      val mm = crossMoments(pairs, d)
      val rot = procrustesRotation(mm)
      p = Array.tabulate(d, d)((i, j) =>
        math.floor(rot(i)(j) * (1L << shift).toDouble).toLong)
      it += 1
    }
    p
  }

  /** Decode each row's PQ codes back to the reconstruction x̂ (concat of
    * assigned codewords) — map-only, codebook as array literals. */
  private def reconstructedFrom(r: DataFrame,
      cb: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): DataFrame = {
    val cbLits = cb.map(sub =>
      array(sub.map(cw => array(cw.map(x => lit(x)): _*)): _*))
    val codes = r.select(col("vid"),
      graft.functions.pqEncode(col("nv"), cb).as("codes"))
    val parts = cb.indices.map(s =>
      element_at(cbLits(s), element_at(col("codes"), s + 1) + 1))
    codes.select(col("vid"), flatten(array(parts: _*)).as("xr"))
  }

  /** Cross-moment matrix M = Σ x·x̂ᵀ over (nv, xr) pairs, accumulated as
    * EXACT integer sums of grid-quantized terms: per-task d² long cells,
    * one array per task, longs merge order-free — the momentStats
    * contract, here for the Procrustes input. Malformed rows are
    * skipped (they carry no usable geometry). */
  private def crossMoments(pairs: DataFrame, d: Int,
      grid: Double = 4096.0): Array[Array[Double]] = {
    import pairs.sparkSession.implicits._
    val acc = pairs.as[(Seq[Double], Seq[Double])]
      .mapPartitions { it =>
        val mArr = new Array[Long](d * d)
        it.foreach { case (x, xh) =>
          if (x != null && xh != null && x.length == d && xh.length == d) {
            val qx = Array.tabulate(d)(i => math.floor(x(i) * grid).toLong)
            val qh = Array.tabulate(d)(j => math.floor(xh(j) * grid).toLong)
            var i = 0
            while (i < d) {
              val b = i * d; val qi = qx(i)
              var j = 0
              while (j < d) { mArr(b + j) += qi * qh(j); j += 1 }
              i += 1
            }
          }
        }
        Iterator.single(mArr)
      }
      .reduce { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    Array.tabulate(d, d)((i, j) => acc(i * d + j).toDouble)
  }

  /** Orthogonal Procrustes solution R = UVᵀ maximizing tr(RᵀM): SVD via
    * [[Linalg.jacobiEigen]] on MᵀM (V, σ²), U = MV/σ; near-null singular
    * directions complete deterministically by Gram-Schmidt over identity
    * candidates. Driver-side d×d — the codebook-sized contract. */
  private[graft] def procrustesRotation(
      mm: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mm.length
    val mx = math.max(1e-300, mm.map(_.map(math.abs).max).max)
    val sm = Array.tabulate(d, d)((i, j) => mm(i)(j) / mx)
    val ata = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += sm(k)(i) * sm(k)(j); k += 1 }
      s
    }
    val (vals, v) = Linalg.jacobiEigen(ata)
    val sig = vals.map(x => math.sqrt(math.max(x, 0.0)))
    val s0 = math.max(sig(0), 1e-300)
    val u = Array.ofDim[Double](d, d)
    var c = 0
    while (c < d) {
      if (sig(c) > 1e-12 * s0) {
        var r = 0
        while (r < d) {
          var s = 0.0; var k = 0
          while (k < d) { s += sm(r)(k) * v(k)(c); k += 1 }
          u(r)(c) = s / sig(c)
          r += 1
        }
      } else {
        // rank-deficient tail: first identity vector with a non-trivial
        // residual against the U columns so far, orthonormalized
        var picked = false
        var cand = 0
        while (!picked && cand < d) {
          val w = Array.tabulate(d)(r => if (r == cand) 1.0 else 0.0)
          var cc = 0
          while (cc < c) {
            var dp = 0.0; var r = 0
            while (r < d) { dp += w(r) * u(r)(cc); r += 1 }
            r = 0
            while (r < d) { w(r) -= dp * u(r)(cc); r += 1 }
            cc += 1
          }
          val nrm = math.sqrt(w.map(x => x * x).sum)
          if (nrm > 1e-6) {
            var r = 0
            while (r < d) { u(r)(c) = w(r) / nrm; r += 1 }
            picked = true
          }
          cand += 1
        }
        require(picked, "procrustesRotation: orthonormal completion failed")
      }
      c += 1
    }
    Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < d) { s += u(i)(k) * v(j)(k); k += 1 }
      s
    }
  }

  /** PCA-REDUCED ANN serving — the dimensionality-reduction member of
    * the compression family (SCALE.md's PCA-as-preprocessing spec,
    * promoted to a served operator): candidates rank in the top-`kRed`
    * PCA subspace (8× fewer multiplies per pair at kRed=8, d=64), then
    * the usual exact-cosine rerank over candidates recovers full-space
    * scores — the same two-stage shape as [[sq8RerankTopK]]/
    * [[binaryRerankTopK]].
    *
    * The REDUCTION stage is [[Linalg.pcaProjectExact]]: all-long
    * projection with the eigenbasis as floor(v·2^shift) integers, so it
    * replays relationally (basis-as-literal fixture). Candidate scoring
    * casts the long projections to double (exact while |rv| < 2⁵³ —
    * required loudly) and ranks by their dot product: products and the
    * sequential fold are IEEE-identical cross-engine, the bruteTopK
    * device. Rerank is [[bruteTopK]]'s exact cosine on candidate pairs
    * only.
    *
    * `whiten` folds 1/√λ into the integer basis ([[Linalg.PcaModel
    * .intBasis]]). Measured on the clustered spec corpus: whitening
    * HURTS dot-product candidate recall (it re-inflates the noise
    * directions PCA just suppressed — see SimilaritySpec) — the served
    * default is unwhitened; the flag exists for the k-means/Mahalanobis
    * consumers whitening is actually for.
    *
    * Plan: fit = one stats pass (d²-collect); reduce = map-only with
    * the k×d basis a closure constant; candidates = ONE broadcast join
    * (reduced queries) + per-query top-kCand; rerank = candidate list
    * (|q|·kCand rows) broadcast back against the corpus scan + exact
    * cosine. The corpus never shuffles.
    *
    * Output: (query_id, rank, neighbor_id, cos_bp). */
  def pcaReducedTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, kRed: Int = 8, kCand: Int = 40,
      shift: Int = 10, whiten: Boolean = false,
      model: Option[Linalg.PcaModel] = None,
      basis: Option[Array[Array[Long]]] = None): DataFrame = {
    val n = normalized(emb, id, vec).localCheckpoint(eager = false)
    val d = n.select(size(col("nv"))).head().getInt(0)
    val m = model.getOrElse(Linalg.pcaFit(n, "nv", d))
    val p = basis.getOrElse(m.intBasis(kRed, shift, whiten))
    // double-cast exactness: |rv| ≤ d·254·n·max|P| must stay below 2^53
    val maxAbsP = math.max(1L, p.map(_.map(math.abs).max).max)
    require(m.n <= (1L << 53) / (d.toLong * 254L * maxAbsP),
      s"pcaReducedTopK: n=${m.n} too large for exact double-cast " +
        s"candidate scoring at d=$d max|P|=$maxAbsP")
    val red = Linalg.pcaProjectExact(n, "vid", "nv", m, kRed, shift,
        basis = Some(p))
      .select(col("vid"), col("proj").cast("array<double>").as("rv"))
    val q = broadcast(red.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("rv").as("qrv")))
    val wc = Window.partitionBy("qid").orderBy(col("rscore").desc, col("vid").asc)
    val cand = red.join(q, col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), dot(col("rv"), col("qrv")).as("rscore"))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= kCand)
      .select("qid", "vid")
    // exact rerank on candidates only: fetch full vectors for both sides
    val qv = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv")))
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("vid").asc)
    n.join(broadcast(cand), Seq("vid"))
      .join(qv, Seq("qid"))
      .select(col("qid"), col("vid"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("cos_bp"))
  }

  /** FILTERED vector search — attribute-constrained top-k (the
    * production "filtered ANN" feature every vector store grew:
    * hard-negative mining, per-tenant search, dedup-against-other-
    * shard). PRE-filter semantics: the metadata predicate applies
    * before ranking, so the result always holds k qualifying rows —
    * post-filtering an unconstrained top-k can return < k or even 0
    * (the classic filtered-ANN bug this operator exists to avoid).
    *
    * The predicate here is label-exclusion (corpus label ≠ the query's
    * label — the hard-negative shape); the mechanism generalizes to any
    * per-pair condition expressible on the joined row. Plan shape is
    * [[bruteTopK]]'s: queries (with labels) broadcast, the corpus
    * streams once with the predicate fused into the join condition —
    * at IVF scale the same predicate rides the probed-cell join
    * unchanged, so pre-filtering costs nothing extra in exchanges.
    *
    * Output: (query_id, rank, neighbor_id, cos_bp) — every neighbor
    * satisfies the constraint. */
  def labelFilteredTopK(emb: DataFrame, id: String, vec: String,
      label: String, queryIds: Seq[Long], k: Int): DataFrame = {
    // one projection carries vector AND metadata — no self-join re-scan
    val n = emb.select(col(id).as("vid"),
        vecNormalize(col(vec)).as("nv"),
        col(label).as("_lbl"))
      .filter(col("nv").isNotNull)
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv"), col("_lbl").as("_qlbl")))
    val scored = n.join(q,
        col("vid") =!= col("qid") && col("_lbl") =!= col("_qlbl"))
      .select(col("qid"), col("vid"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("cos_bp"))
  }

  /** Scalar (int8) quantization ANN — the other standard Faiss
    * compression point (SQ8): 4× memory shrink at near-exact recall,
    * vs PQ's 32× at coarser fidelity. Train = per-dimension [min, max]
    * over the normalized corpus (ONE map-side-combinable aggregate;
    * the d-row result is a codebook-sized collect, same contract as
    * [[pqCodebooks]]); encode = 256-level affine code per dimension,
    * map-only in the scan's stage; score = asymmetric query-float ·
    * reconstructed-corpus dot (the ADC analog), reconstruction
    * projected ONCE per corpus row before the broadcast join.
    *
    * Every step is plain double affine arithmetic with a fixed
    * association order, so the APPROXIMATION itself replays
    * relationally and hash-gates (the PQ device). At rest only the
    * codes (1 byte/dim) and the 2·d training bounds persist; decode is
    * on-the-fly.
    *
    * Output: (query_id, rank, neighbor_id, sq_bp). */
  def sq8TopK(emb: DataFrame, id: String, vec: String, queryIds: Seq[Long],
      k: Int): DataFrame = {
    val n = normalized(emb, id, vec)
    val stats = n.select(posexplode(col("nv")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
    val mnA = array(stats.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val mxA = array(stats.map(r => lit(r.getDouble(2))).toIndexedSeq: _*)
    def mn(i: Column) = element_at(mnA, (i + 1).cast("int"))
    def mx(i: Column) = element_at(mxA, (i + 1).cast("int"))
    val codes = transform(col("nv"), (x, i) =>
      when(mx(i) === mn(i), lit(0.0)).otherwise(
        least(greatest(floor((x - mn(i)) / (mx(i) - mn(i)) * 255), lit(0.0)),
          lit(255.0))))
    val recon = n.select(col("vid"),
      transform(codes, (c, i) =>
        mn(i) + (c + lit(0.5)) * (mx(i) - mn(i)) / 255.0).as("rv"))
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv")))
    val scored = recon.join(q, col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        floor(dot(col("qv"), col("rv")) * 10000).cast("long").as("sq_bp"))
    val w = Window.partitionBy("qid").orderBy(col("sq_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("sq_bp"))
  }

  /** BINARY (1-bit) quantization ANN — the 64×-shrink endpoint of the
    * compression family (SQ8 is the 4× point, PQ the 32× point): each
    * vector's SIGN BITS pack into two 32-bit halves (8 bytes at rest
    * for d=64), candidates come from Hamming distance over the packed
    * codes — two XOR + two POPCNT per (query, row), the cheapest first
    * stage there is — and only `kCand` candidates are re-scored with
    * exact cosine. This is the modern binary-quantization serving
    * shape; for unit vectors Hamming over sign bits estimates angle
    * (θ ≈ π·ham/d, the SimHash/SRP identity), which is why the rerank
    * recovers near-exact quality from a 1-bit first stage
    * (SimilaritySpec pins the recall floor).
    *
    * Everything is deterministic (sign test, integer Hamming, id
    * tiebreaks, floored cosine bp), so the COMPOSED pipeline
    * hash-gates against a full relational replay. Normalization does
    * not change signs, but the signature is built from the same
    * normalized view the rerank scores — one lineage, no drift.
    *
    * Plan: signatures map-only in the scan stage; queries broadcast;
    * the only exchanges are the two per-query top-k windows.
    * Output: (query_id, rank, neighbor_id, cos_bp, ham). */
  def binaryRerankTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], kCand: Int, k: Int): DataFrame = {
    require(kCand >= k && k >= 1, s"need kCand >= k >= 1: $kCand, $k")
    val n = normalized(emb, id, vec)
    // bit i of (lo | hi << 32) = [nv_i > 0]; 2^(i mod 32) via pow is
    // exact in doubles (powers of two), so the packing replays in SQL
    def half(lo: Boolean): Column = aggregate(
      transform(col("nv"), (x, i) =>
        when(x > lit(0.0) && (if (lo) i < 32 else i >= 32),
          floor(pow(lit(2.0), (i % 32).cast("double"))).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
    val sig = n.select(col("vid"), half(lo = true).as("lo"),
      half(lo = false).as("hi"))
    val qs = broadcast(sig.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("lo").as("qlo"), col("hi").as("qhi")))
    val ham = sig.join(qs, col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        (bitCount(col("lo").bitwiseXOR(col("qlo"))) +
          bitCount(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("ham"))
    val wc = Window.partitionBy("qid").orderBy(col("ham").asc, col("vid").asc)
    val cand = ham.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= kCand)
      .select(col("qid"), col("vid").as("nid"), col("ham"))
    val qv = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv")))
    val exact = cand.join(n, col("nid") === col("vid"))
      .join(qv, Seq("qid"))
      .select(col("qid"), col("nid"), col("ham"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("nid").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos_bp"), col("ham"))
  }

  private def bitCount(c: Column): Column =
    org.apache.spark.sql.functions.bit_count(c)

  /** Two-stage RETRIEVE + RERANK — the standard production serving
    * composition: a cheap compressed first stage (SQ8 ADC over int8
    * codes) over-fetches `kCand` candidates, and only those kCand rows
    * are re-scored exactly from the raw vectors. At 100 TB the raw
    * vectors never stream through scoring — the exact stage joins
    * kCand·|queries| ids back to the corpus (a broadcast-able id set),
    * which is the entire point of storing codes hot and raw cold.
    *
    * Both stages are deterministic integer-bp replays, so the COMPOSED
    * pipeline hash-gates end-to-end. Output: (query_id, rank,
    * neighbor_id, cos_bp) — exact scores, compressed-stage recall. */
  def sq8RerankTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], kCand: Int, k: Int): DataFrame = {
    require(kCand >= k && k >= 1)
    val cand = sq8TopK(emb, id, vec, queryIds, kCand)
      .select(col("query_id").as("qid"), col("neighbor_id").as("nid"))
    val n = normalized(emb, id, vec)
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv")))
    val exact = cand
      .join(n, col("nid") === col("vid"))
      .join(q, Seq("qid"))
      .select(col("qid"), col("nid"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("nid").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos_bp"))
  }

  /** IVF + PQ composed — the production ANN architecture at corpus scale
    * (Faiss's IVFPQ layout, Jégou et al. 2011 §V): the coarse quantizer
    * ([[md5Codebook]], nlist cells) prunes the candidate set to the
    * query's `nprobe` nearest cells, and PQ ADC scores only those
    * candidates from the compressed codes. Per query: nlist coarse dots
    * + (n·nprobe/nlist)·m lookups — neither term touches the full raw
    * corpus.
    *
    * Plan shape: corpus-side cell assignment AND encoding are map-only
    * in the scan's stage; queries (with probed cells exploded and LUT
    * attached) broadcast to the corpus — the join on cid never shuffles
    * the corpus because the query side is broadcast. Codes are encoded
    * from the FULL normalized vector per subspace (direct encoding, not
    * the residual x − centroid refinement: residual encoding couples
    * every code to its cell's centroid, which a relational oracle would
    * have to replay through an extra element-wise subtract per vector —
    * the direct form is the documented simplification and keeps the
    * whole operator hash-checkable; the accuracy delta is part of the
    * measured recall floor in SimilaritySpec). [[ivfpqResidualTopK]] is
    * the residual-encoded composition — equally hash-checkable (the
    * subtract replays relationally), higher recall, the served default
    * of production Faiss.
    *
    * Both quantizers use the md5 seed rule, so the ENTIRE pipeline —
    * cell assignment, probe selection, codes, ADC scores, final rank —
    * replays relationally and the driver hash-checks it end-to-end (no
    * in-run brute audit needed: this is approximate BY CONTRACT, and the
    * oracle models the same approximation exactly).
    *
    * Output: (query_id, rank, neighbor_id, adc_bp). */
  def ivfpqTopK(emb: DataFrame, id: String, vec: String, queryIds: Seq[Long],
      k: Int, nlist: Int, nprobe: Int, m: Int = 16, ksub: Int = 32): DataFrame = {
    val n = normalized(emb, id, vec)
    val coarse = md5Codebook(n, nlist)
    val cb = pqCodebooks(n, m, ksub)
    val corpus = n.select(col("vid"),
      graft.functions.nearestCentroids(col("nv"), coarse, 1).getItem(0).as("cid"),
      graft.functions.pqEncode(col("nv"), cb).as("codes"))
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"),
        explode(graft.functions.nearestCentroids(col("nv"), coarse, nprobe)).as("cid"),
        graft.functions.pqLut(col("nv"), cb).as("lut")))
    // corpus rows live in exactly ONE cell (keep=1), so a (qid, vid) pair
    // meets at most once across the probed cells — no distinct needed.
    val scored = corpus.join(q, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        floor(graft.functions.pqAdc(col("codes"), col("lut")) * 10000)
          .cast("long").as("adc_bp"))
    val w = Window.partitionBy("qid").orderBy(col("adc_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("adc_bp"))
  }

  /** IVF + PQ with RESIDUAL encoding — the Faiss-default composition
    * (Jégou et al. 2011 §V.A: quantize r = x − q₁(x), not x itself):
    * each corpus vector's PQ codes describe its offset from its coarse
    * centroid, so the quantizer's ksub codewords cover the residual
    * distribution (radius ≈ cell radius) instead of the whole sphere —
    * at production corpus scale this is most of IVFPQ's recall
    * advantage over [[ivfpqTopK]]'s documented direct simplification.
    *
    * Score decomposition keeps ADC's table-lookup economics:
    * q·x̂ = q·centroid(cell) + q·r̂, so the per-query work is the same
    * m-lookup LUT sum plus ONE extra dot per probed cell (q·centroid —
    * already computed for probe selection in spirit; here one nlist-dim
    * literal lookup per candidate row). The residual codebook trains on
    * the residuals of a SALTED md5 seed sample ('r'-prefixed rule —
    * an unsalted sample would coincide with the coarse seeds, whose
    * residuals are identically zero: a degenerate quantizer).
    *
    * Everything stays relationally replayable: both seed rules, the
    * strict-`>` assignments, the element-wise subtracts (exact, no
    * association), the sequential sub-dots, and the left-associated
    * ADC+centroid sum — so the oracle models the approximation itself
    * and the driver hash-checks it end-to-end, like [[ivfpqTopK]].
    *
    * Plan shape is ivfpqTopK's exactly: assignment + residual encode are
    * map-only in the scan's stage (coarse codebook rides as a codegen
    * reference object AND as an array literal for the subtract/centroid
    * terms), queries broadcast with probed cells exploded, the corpus
    * never shuffles; the only exchange is the final per-query top-k.
    *
    * Output: (query_id, rank, neighbor_id, adc_bp). */
  def ivfpqResidualTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, nlist: Int, nprobe: Int,
      m: Int = 16, ksub: Int = 32): DataFrame = {
    val n = normalized(emb, id, vec)
    val coarse = md5Codebook(n, nlist)
    val d = coarse.head.length
    require(d % m == 0, s"vector dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    // Residual codebook: the ksub salted-md5 seed vectors, each minus ITS
    // OWN nearest coarse centroid (the same strict-> rule the corpus
    // assignment uses — sequential L→R dots, keep-first ties), sliced
    // into m subspaces. Driver-side: both codebooks are plan metadata.
    val pseeds = md5Codebook(n, ksub, salt = "r")
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
    val cbRes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = {
      val rseeds = pseeds.map { sv =>
        val cv = coarse(nearestCid(sv))
        IndexedSeq.tabulate(d)(i => sv(i) - cv(i))
      }
      IndexedSeq.tabulate(m)(j => rseeds.map(_.slice(j * dsub, (j + 1) * dsub)))
    }
    ivfpqResidualServe(n, coarse, cbRes, queryIds, k, nprobe)
  }

  /** Residual IVFPQ with K-MEANS-TRAINED residual codebooks — the full
    * production-Faiss default composition: coarse quantizer + residual
    * encoding ([[ivfpqResidualTopK]]) + Lloyd-trained PQ codebooks
    * ([[KMeans.trainSubspaces]], here trained ON THE CORPUS RESIDUALS —
    * the distribution the codes actually quantize, which is where
    * trained codebooks pay most). Training is the integer fixpoint
    * device over the residual frame, so the whole composition —
    * coarse assign, residuals, training iterations, codes, ADC —
    * still replays relationally (`q_ann_ivfpq_rtrained`). */
  def ivfpqResidualTrainedTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, nlist: Int, nprobe: Int,
      m: Int = 16, ksub: Int = 32, iters: Int = 2): DataFrame =
    ivfpqResidualTrainedFrom(normalized(emb, id, vec), queryIds, k,
      nlist, nprobe, m, ksub, iters)

  /** The trained-residual pipeline over a prepared (vid, nv) frame —
    * shared by [[ivfpqResidualTrainedTopK]] (normalized corpus) and
    * [[opqIvfpqTopK]] (rotated corpus): the frame is the entire diff. */
  private def ivfpqResidualTrainedFrom(n: DataFrame, queryIds: Seq[Long],
      k: Int, nlist: Int, nprobe: Int, m: Int, ksub: Int,
      iters: Int): DataFrame = {
    val (coarse, cbRes) = trainAnnArtifact(n, nlist, m, ksub, iters)
    ivfpqResidualServe(n, coarse, cbRes, queryIds, k, nprobe)
  }

  /** Train the FROZEN ANN index artifact from a prepared (vid, nv)
    * frame: the coarse quantizer (md5 seed rule) plus residual PQ
    * codebooks Lloyd-trained ON THE CORPUS RESIDUALS (the integer
    * fixpoint device, [[KMeans.trainSubspaces]]) — exactly the
    * codebooks [[ivfpqResidualTrainedTopK]] derives inline. Exposed so
    * a MAINTAINED index ([[graft.streaming.StreamAnn]]) can freeze the
    * artifact once and encode micro-batches against it: re-training is
    * a batch act that rebuilds the codes table, never a streaming one
    * (the [[graft.streaming.StreamClusters]] contract, applied to the
    * full IVF+PQ artifact). */
  def trainAnnArtifact(n: DataFrame, nlist: Int, m: Int, ksub: Int,
      iters: Int): (IndexedSeq[IndexedSeq[Double]],
        IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) = {
    val coarse = md5Codebook(n, nlist)
    val d = coarse.head.length
    require(d % m == 0, s"vector dim $d not divisible by m=$m subspaces")
    val coarseLit = array(coarse.map(cv =>
      array(cv.map(x => lit(x)): _*)): _*)
    def centOf(cid: Column): Column = element_at(coarseLit, (cid + 1).cast("int"))
    val residuals = n.select(col("vid"),
        graft.functions.nearestCentroids(col("nv"), coarse, 1).getItem(0).as("cid"),
        col("nv"))
      .select(col("vid"),
        zip_with(col("nv"), centOf(col("cid")), (x, c) => x - c).as("rv"))
    val cbRes = KMeans.trainSubspaces(residuals, "vid", "rv", m, ksub, iters)
      .map(_.map(_.map(c => (c - KMeans.Offset).toDouble / KMeans.Scale)))
    (coarse, cbRes)
  }

  /** IVFPQ + REFINE — Faiss's "IVFPQ,RFlat" serving composition, the
    * refine stage the compression family was missing (SQ8 and binary
    * already rerank): the trained-residual pipeline over-fetches
    * `kCand` ADC candidates, and ONLY those |q|·kCand rows are
    * re-scored exactly from the raw normalized vectors. At 100 TB the
    * raw vectors never stream through scoring — codes stay hot, raw
    * stays cold, and the refine join is a broadcast-able id set (the
    * [[sq8RerankTopK]] economics on the IVFPQ first stage). Exact
    * scores at compressed-stage recall; hash-gates end to end
    * (`q_ann_ivfpq_refine`). */
  def ivfpqRefineTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], kCand: Int, k: Int, nlist: Int, nprobe: Int,
      m: Int = 16, ksub: Int = 32, iters: Int = 2): DataFrame = {
    require(kCand >= k && k >= 1, s"need kCand >= k >= 1: $kCand, $k")
    val n = normalized(emb, id, vec).localCheckpoint(eager = false)
    val cand = ivfpqResidualTrainedFrom(n, queryIds, kCand, nlist, nprobe,
        m, ksub, iters)
      .select(col("query_id").as("qid"), col("neighbor_id").as("nid"))
    refineTail(cand, n, queryIds, k)
  }

  /** The exact-rerank REFINE tail over a (qid, nid) candidate frame —
    * shared VERBATIM by the inline batch composition
    * ([[ivfpqRefineTopK]]) and the maintained-index serve
    * ([[graft.streaming.StreamAnn.serveRefine]]): candidate provenance
    * is the entire diff. Only the |q|·kCand candidate pairs re-score
    * exactly from the raw normalized vectors (`n`) — codes hot, raw
    * cold. Output: (query_id, rank, neighbor_id, cos_bp). */
  def refineTail(cand: DataFrame, n: DataFrame, queryIds: Seq[Long],
      k: Int): DataFrame = {
    val q = broadcast(n.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv").as("qv")))
    val exact = cand
      .join(n, col("nid") === col("vid"))
      .join(q, Seq("qid"))
      .select(col("qid"), col("nid"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("nid").asc)
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("nid").as("neighbor_id"), col("cos_bp"))
  }

  /** OPQ + IVF + PQ — the complete production-Faiss index string
    * ("OPQ16,IVF·,PQ16"): [[opqRotationFor]]'s balanced eigenbasis
    * rotation, THEN the full trained-residual pipeline
    * ([[ivfpqResidualTrainedFrom]]) in rotated space — coarse seeds,
    * cell assignment, probes, residuals, Lloyd training, and ADC all
    * operate on the rotated corpus, and since rotation preserves dot
    * products the score still approximates the original cosine. Every
    * stage replays relationally (rotation literals + the shared
    * residual/training/serving fragments), so the whole four-stage
    * composition hash-gates (`q_ann_opq_ivfpq`). */
  def opqIvfpqTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, nlist: Int, nprobe: Int,
      m: Int = 16, ksub: Int = 32, iters: Int = 2,
      rot: Option[Array[Array[Long]]] = None, shift: Int = 30): DataFrame = {
    val n = normalized(emb, id, vec)
    val p = rot.getOrElse(opqRotationFor(emb, id, vec, m, shift))
    val r = rotatedFrame(n, p, shift).localCheckpoint(eager = false)
    ivfpqResidualTrainedFrom(r, queryIds, k, nlist, nprobe, m, ksub, iters)
  }

  /** The residual-IVFPQ serving tail over GIVEN coarse + residual
    * codebooks — shared by the salted-seed and k-means-trained
    * variants (codebook provenance is the entire diff). */
  private def ivfpqResidualServe(n: DataFrame,
      coarse: IndexedSeq[IndexedSeq[Double]],
      cbRes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      queryIds: Seq[Long], k: Int, nprobe: Int): DataFrame =
    adcServeCodes(encodeResidual(n, coarse, cbRes), n, coarse, cbRes,
      queryIds, k, nprobe)

  /** Residual-encode a prepared (vid, nv) frame against GIVEN coarse +
    * residual codebooks → (vid, cid, codes). Map-only in the scan's
    * stage: both codebooks ride as codegen reference objects / array
    * literals, zero exchanges. Shared VERBATIM by the inline batch tail
    * ([[ivfpqResidualServe]]) and the maintained index's micro-batch
    * encoder ([[graft.streaming.StreamAnn]]) — the stored codes can
    * never drift from what batch serving would re-derive, which is what
    * lets `q_ann_incremental` share `q_ann_ivfpq_rtrained`'s oracle. */
  def encodeResidual(n: DataFrame,
      coarse: IndexedSeq[IndexedSeq[Double]],
      cbRes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]): DataFrame = {
    val coarseLit = array(coarse.map(cv =>
      array(cv.map(x => lit(x)): _*)): _*)
    def centOf(cid: Column): Column = element_at(coarseLit, (cid + 1).cast("int"))
    n.select(col("vid"), col("nv"),
        graft.functions.nearestCentroids(col("nv"), coarse, 1).getItem(0).as("cid"))
      .select(col("vid"), col("cid"),
        graft.functions.pqEncode(
          zip_with(col("nv"), centOf(col("cid")), (x, c) => x - c), cbRes)
          .as("codes"))
  }

  /** The ADC serving tail over an ALREADY-ENCODED (vid, cid, codes)
    * frame — inline batch serving passes the codes it just derived;
    * the maintained index passes the codes TABLE (raw vectors never
    * stream through scoring: codes stay hot, raw stays cold). `queries`
    * is a (vid, nv) frame the query vectors are drawn from. Plan shape
    * unchanged: queries broadcast with probed cells exploded, the codes
    * frame never shuffles, ONE top-k exchange. */
  def adcServeCodes(codes: DataFrame, queries: DataFrame,
      coarse: IndexedSeq[IndexedSeq[Double]],
      cbRes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]],
      queryIds: Seq[Long], k: Int, nprobe: Int): DataFrame = {
    val coarseLit = array(coarse.map(cv =>
      array(cv.map(x => lit(x)): _*)): _*)
    def centOf(cid: Column): Column = element_at(coarseLit, (cid + 1).cast("int"))
    // LUT uses the FULL query subvectors against the residual codewords
    // (q·r̂ term); q·centroid(cell) attaches per probed cell.
    val q = broadcast(queries.filter(col("vid").isin(queryIds: _*))
      .select(col("vid").as("qid"), col("nv"),
        explode(graft.functions.nearestCentroids(col("nv"), coarse, nprobe)).as("cid"),
        graft.functions.pqLut(col("nv"), cbRes).as("lut"))
      .select(col("qid"), col("cid"), col("lut"),
        dot(col("nv"), centOf(col("cid"))).as("qc")))
    val scored = codes.join(q, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        floor((graft.functions.pqAdc(col("codes"), col("lut")) + col("qc")) * 10000)
          .cast("long").as("adc_bp"))
    val w = Window.partitionBy("qid").orderBy(col("adc_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"),
        col("vid").as("neighbor_id"), col("adc_bp"))
  }

  /** @param persistCorpus memory contract: true (default) persists the
    *        normalized corpus MEMORY_AND_DISK — it is read 2 + kmeansIters
    *        times (corpus assign, query assign, refinement rounds) and
    *        spills rather than OOMs when it outgrows executor memory.
    *        NOTHING UNPERSISTS IT: the block lives until the session ends,
    *        the LRU store evicts it, or the caller clears it
    *        (`spark.catalog.clearCache()`). In a long-lived driver, pass
    *        false for one-shot queries over corpora not worth staging
    *        (each consumer then rescans + renormalizes the source — a
    *        compute/storage trade the CALLER owns, not this operator). */
  def ivfTopK(emb: DataFrame, id: String, vec: String,
      queryIds: Seq[Long], k: Int, nlist: Int = 16, nprobe: Int = 4,
      kmeansIters: Int = 0, persistCorpus: Boolean = true): DataFrame = {
    val n0 = normalized(emb, id, vec)
    val n = if (persistCorpus)
      n0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else n0
    // Codebook bootstrap: TakeOrdered + collect, sorted by vid for a
    // stable index order. Requires a non-empty corpus (throws otherwise,
    // like srpPairs' dimension probe).
    val seed: Seq[Seq[Double]] =
      n.orderBy(xxhash64(col("vid")).asc, col("vid").asc)
        .limit(nlist)
        .select(col("vid"), col("nv"))
        .collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    require(seed.nonEmpty, "ivfTopK requires a non-empty corpus")
    val codebook = if (kmeansIters <= 0) seed else kmeansRefine(n, seed, kmeansIters)
    // Map-only assignment: no crossJoin row blowup, no window exchange.
    def assign(df: DataFrame, keep: Int): DataFrame =
      df.select(col("vid"), col("nv"), explode(
        graft.functions.nearestCentroids(col("nv"), codebook, keep)).as("cid"))
    val corpus = assign(n, 1)                                  // vector → 1 cell
    val queries = assign(n.filter(col("vid").isin(queryIds: _*)), nprobe)
      .select(col("vid").as("qid"), col("nv").as("qv"), col("cid"))
    val scored = corpus.join(queries, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        floor(dot(col("nv"), col("qv")) * 10000).cast("long").as("cos_bp"))
      .distinct()   // a neighbor can appear via several probed cells
    val w = Window.partitionBy("qid").orderBy(col("cos_bp").desc, col("vid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("vid").as("neighbor_id"),
        col("cos_bp"))
  }
}
