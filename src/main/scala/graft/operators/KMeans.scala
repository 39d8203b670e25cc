package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.centroidArgminL2

/** Distributed k-means TRAINING with a hash-gateable fixpoint.
  *
  * [[Similarity.clusterAssign]]'s scaladoc records the standing limitation
  * this operator removes: its `kmeansIters` refine path runs on doubles,
  * whose centroid means depend on partition-order float summation — so the
  * hash-checked queries had to serve iters=0 ("a k-means fixpoint is not
  * relationally replayable in a SQL oracle"). Here the ENTIRE Lloyd
  * iteration is defined over integers:
  *
  *  - vectors quantize once to non-negative longs
  *    (`floor(x·10⁴) + offset` per element — float→double widening and the
  *    ×10⁴ product are both IEEE-exact, so the quantization itself is
  *    engine-portable),
  *  - assignment is exact squared-L2 argmin over long arithmetic with ties
  *    to the smallest centroid id ([[graft.functions.CentroidArgminL2]],
  *    map-only, codebook as a codegen reference object),
  *  - the centroid update is an ASSOCIATIVE long sum per (cluster, dim)
  *    followed by one integer floor-division (operands non-negative by the
  *    offset, so Spark's truncating long division, Scala's `/`, and
  *    DuckDB's `//` all agree),
  *  - an emptied cluster keeps its previous centroid (deterministic,
  *    relationally replayable as a left-join coalesce).
  *
  * Every step is exact and order-independent, so a FIXED iteration count
  * unrolls into a relational oracle that must match to the bit — the same
  * device family as the integer PageRank (Graphs.scala) and the BPE
  * training loop (Bpe.scala).
  *
  * ==Scale shape==
  * The quantized corpus is localCheckpointed once; each iteration is ONE
  * job over the checkpoint — a map-only assignment fused into the scan
  * stage plus a (k·d)-row partial-agg collect (k·d ≈ 512 longs here:
  * codebook-sized plan metadata, the same driver-collect contract as
  * [[Similarity.md5Codebook]]). No per-iteration shuffle of the corpus,
  * no crossJoin, no window. At 10⁹ vectors the per-iteration cost is one
  * scan + a k·d-row tree-aggregate; the driver loop holds k·d longs.
  *
  * Seeding follows the engine's md5-order device (the k corpus vectors
  * smallest by `(md5-prefix(id), id)`, indexed by ascending id) so the
  * initial codebook is engine-neutral pseudo-randomness, not a Spark
  * partitioning artifact.
  */
object KMeans {

  /** Quantization scale: 10⁴ units per 1.0 of embedding mass (the
    * engine's basis-point convention). */
  val Scale = 10000L

  /** Additive offset keeping every quantized element non-negative for
    * |x| ≤ 1.6384 (corpus elements are unit-norm coordinates, |x| < 1):
    * uniform shifts cancel in L2 distances, and non-negativity is what
    * makes truncating and floor integer division coincide across
    * engines. */
  val Offset = 16384L

  /** (vid, qv): id + quantized non-negative integer vector. */
  def quantized(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(col(id).cast("long").as("vid"),
      transform(col(vec).cast("array<double>"),
        x => floor(x * lit(Scale.toDouble)).cast("long") + lit(Offset)).as("qv"))

  /** md5-order seed codebook over the quantized corpus: the k rows
    * smallest by (md5-prefix(vid), vid), centroid index = rank by
    * ascending vid among them (the [[Similarity.md5Codebook]] rule on the
    * integer domain). TakeOrdered — never a global sort; k·d longs. */
  def seedCentroids(q: DataFrame, k: Int): IndexedSeq[IndexedSeq[Long]] = {
    val seed = q
      .orderBy(substring(md5(col("vid").cast("string")), 1, 8).asc, col("vid").asc)
      .limit(k)
      .select(col("vid"), col("qv"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    require(seed.nonEmpty, "k-means requires a non-empty corpus")
    seed
  }

  /** `iters` exact Lloyd iterations from the md5 seed; returns the final
    * codebook and the checkpointed quantized corpus (so serving reuses
    * the materialization the training already paid for). */
  def train(emb: DataFrame, id: String, vec: String, k: Int,
      iters: Int): (IndexedSeq[IndexedSeq[Long]], DataFrame) = {
    val q = quantized(emb, id, vec).localCheckpoint(eager = false)
    var cents = seedCentroids(q, k)
    // the pack modulus is the CODEBOOK size (CentroidArgminL2 packs
    // dist²·m + cid with m = cents.length) — a corpus smaller than k
    // seeds fewer centroids, and unpacking with k there would garble
    // cid/dist
    val m = cents.length.toLong
    var it = 0
    while (it < iters) {
      // one job: map-only assignment + (cid, dim) partial-sum collect —
      // k·d rows, codebook-sized (the md5Codebook collect contract)
      val parts = q
        .select(pmod(centroidArgminL2(col("qv"), cents), lit(m))
          .cast("int").as("cid"), col("qv"))
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
        .collect()
      val byCid = parts.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCid.get(c) match {
          case Some(rows) =>
            // operands non-negative: Scala's truncating / == floor ==
            // DuckDB's // — the cross-engine division contract
            rows.sortBy(_.getInt(1)).map(r => r.getLong(2) / r.getLong(3))
              .toIndexedSeq
          case None => cents(c) // emptied cluster keeps its centroid
        }
      }.toIndexedSeq
      it += 1
    }
    (cents, q)
  }

  /** Train k·`iters` and serve the final assignment:
    * (vec_id, cid, dist) — exact squared-L2 distance in quantized units,
    * ties to the smallest cid. Map-only over the training checkpoint. */
  def trainAssign(emb: DataFrame, id: String, vec: String, k: Int,
      iters: Int): DataFrame = {
    val (cents, q) = train(emb, id, vec, k, iters)
    val m = cents.length // pack modulus = codebook size, not requested k
    q.select(col("vid").as("vec_id"),
        centroidArgminL2(col("qv"), cents).as("code"))
      .select(col("vec_id"),
        pmod(col("code"), lit(m.toLong)).as("cid"),
        expr(s"code div ${m}L").as("dist"))
  }

  /** Per-SUBSPACE k-means on the same integer fixpoint device — the
    * trained-codebook upgrade for product quantization: m independent
    * Lloyd problems (one per d/m-wide subspace), all trained in ONE
    * job per iteration. The full vector quantizes and checkpoints
    * once; each iteration assigns every row to m codewords (m argmin
    * expressions over slices, map-only) and collects ONE
    * (j, cid, pos) partial-sum grid — m·ksub·dsub = k·d longs, the
    * codebook-sized collect contract. Seeds are the SAME md5-order
    * rows [[Similarity.pqCodebooks]] slices, so iters=0 is exactly the
    * sampled-codebook geometry on the quantized grid and every
    * iteration is pure refinement. Every step is exact long
    * arithmetic ⇒ a fixed iteration count unrolls relationally
    * (`q_ann_pq_trained` hash-gates the full composition).
    *
    * Returns quantized-unit codebooks: `result(j)(code)(pos)`. */
  def trainSubspaces(emb: DataFrame, id: String, vec: String, m: Int,
      ksub: Int, iters: Int,
      seedRows: Option[IndexedSeq[IndexedSeq[Long]]] = None):
      IndexedSeq[IndexedSeq[IndexedSeq[Long]]] = {
    val q = quantized(emb, id, vec).localCheckpoint(eager = false)
    val d = q.select(size(col("qv"))).head().getInt(0)
    require(d % m == 0, s"vector dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    // seedRows injects full-vector seeds in place of the md5 rule — the
    // Stress closed-form device: training over a ×mult-replicated corpus
    // from the BIG corpus' seeds must equal training over the single
    // copy from those same seeds (floor(mult·S / mult·C) = floor(S/C)).
    // Queries never pass it; the md5 rule stays the oracle contract.
    val seeds = seedRows.getOrElse(seedCentroids(q, ksub))
    var cbs = IndexedSeq.tabulate(m)(j =>
      seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
    val mod = seeds.length.toLong // corpus may seed fewer than ksub
    var it = 0
    while (it < iters) {
      val exploded = explode(array((0 until m).map { j =>
        struct(lit(j).as("j"),
          pmod(centroidArgminL2(
            slice(col("qv"), j * dsub + 1, dsub), cbs(j)), lit(mod))
            .cast("int").as("cid"),
          slice(col("qv"), j * dsub + 1, dsub).as("sv"))
      }: _*))
      val parts = q.select(exploded.as("e"))
        .select(col("e.j").as("j"), col("e.cid").as("cid"),
          posexplode(col("e.sv")).as(Seq("pos", "x")))
        .groupBy("j", "cid", "pos").agg(sum("x").as("sx"), count(lit(1)).as("cnt"),
          min("x").as("mn"))
        .collect()
      // non-negativity IS the cross-engine division contract (truncating
      // vs floor); the offset covers |x| ≤ 1.6384 — an input outside it
      // (e.g. pathological residuals) must fail LOUD, not round apart.
      // The guarded column is mn = min("x"), the smallest quantized
      // value any codeword sums — not cnt, which is trivially ≥ 1.
      parts.foreach(r => require(r.getLong(5) >= 0L,
        s"trainSubspaces: quantized value ${r.getLong(5)} < 0 — input " +
          "outside the offset domain (|x| <= 1.6384)"))
      val byKey = parts.groupBy(r => (r.getInt(0), r.getInt(1)))
      cbs = IndexedSeq.tabulate(m) { j =>
        cbs(j).indices.map { c =>
          byKey.get((j, c)) match {
            case Some(rows) =>
              rows.sortBy(_.getInt(2)).map(r => r.getLong(3) / r.getLong(4))
                .toIndexedSeq
            case None => cbs(j)(c) // emptied codeword keeps its centroid
          }
        }.toIndexedSeq
      }
      it += 1
    }
    cbs
  }

  /** Final assignment against a GIVEN trained codebook — the serving
    * split (train once, assign map-only), mirroring
    * [[Similarity.assignToCodebook]] on the integer domain. */
  def assignExact(emb: DataFrame, id: String, vec: String,
      cents: Seq[Seq[Long]]): DataFrame = {
    val k = cents.length.toLong
    quantized(emb, id, vec)
      .select(col("vid").as("vec_id"),
        centroidArgminL2(col("qv"), cents.map(_.toIndexedSeq).toIndexedSeq)
          .as("code"))
      .select(col("vec_id"),
        pmod(col("code"), lit(k)).as("cid"),
        expr(s"code div ${k}L").as("dist"))
  }
}
