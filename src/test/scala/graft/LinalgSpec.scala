package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Linalg

class LinalgSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def matMulVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
    a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)

  test("jacobiEigen: analytic 2x2 and 3x3 cases") {
    val (v2, e2) = Linalg.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    // eigvec for 3 is (1,1)/√2 — sign convention makes entries positive
    assert(math.abs(e2(0)(0) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(e2(1)(0) - math.sqrt(0.5)) < 1e-12)
    // diagonal matrix: eigenvalues sort, vectors are (signed) unit axes
    val (v3, e3) = Linalg.jacobiEigen(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(v3.toSeq === Seq(5.0, 3.0, 1.0))
    assert(e3(1)(0) === 1.0 && e3(2)(1) === 1.0 && e3(0)(2) === 1.0)
  }

  test("jacobiEigen: random symmetric matrices — residual, orthonormality, trace") {
    val rnd = new scala.util.Random(7331)
    for (trial <- 1 to 5) {
      val d = 8
      val m = Array.tabulate(d, d)((_, _) => rnd.nextDouble() * 2 - 1)
      val a = Array.tabulate(d, d)((i, j) => (m(i)(j) + m(j)(i)) / 2)
      val (vals, vecs) = Linalg.jacobiEigen(a)
      // A v_k = λ_k v_k
      for (k <- 0 until d) {
        val vk = Array.tabulate(d)(r => vecs(r)(k))
        val av = matMulVec(a, vk)
        for (r <- 0 until d)
          assert(math.abs(av(r) - vals(k) * vk(r)) < 1e-8,
            s"trial $trial: residual at ($r, $k)")
      }
      // VᵀV = I
      for (k1 <- 0 until d; k2 <- 0 until d) {
        val dot = (0 until d).map(r => vecs(r)(k1) * vecs(r)(k2)).sum
        assert(math.abs(dot - (if (k1 == k2) 1.0 else 0.0)) < 1e-10)
      }
      // Σλ = trace; eigenvalues descending
      assert(math.abs(vals.sum - (0 until d).map(i => a(i)(i)).sum) < 1e-9)
      assert(vals.toSeq === vals.toSeq.sortBy(-_))
      // determinism: a second run returns the identical decomposition
      val (vals2, vecs2) = Linalg.jacobiEigen(a)
      assert(vals.toSeq === vals2.toSeq)
      assert(vecs.map(_.toSeq).toSeq === vecs2.map(_.toSeq).toSeq)
    }
  }

  test("momentStats: integer-exact vs a local brute force, clamp and bad rows") {
    val rnd = new scala.util.Random(99)
    val d = 5
    val rows = (0 until 200).map { _ =>
      (0 until d).map(_ => (rnd.nextDouble() * 4 - 2).toFloat).toArray
    }
    // one oversized value exercises the ±127 clamp; one bad row is shed
    rows(0)(2) = 100f
    val df = (rows.map(r => Tuple1(r.toSeq)) :+ Tuple1(Seq(1f, 2f)))
      .toDF("v")
    val stats = Linalg.momentStats(df, "v", d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def q(x: Float): Long =
      math.max(-127L, math.min(127L, math.floor(x.toDouble * 64).toLong))
    assert(stats((-1, -1)) === 200L)
    assert(stats((-2, -2)) === 1L) // the length-2 row, loud
    for (i <- 0 until d) {
      assert(stats((i, -1)) === rows.map(r => q(r(i))).sum, s"sum $i")
      for (j <- i until d)
        assert(stats((i, j)) === rows.map(r => q(r(i)) * q(r(j))).sum,
          s"gram ($i, $j)")
    }
    assert(q(100f) === 127L) // the clamp engaged
    // covNumerators: relational form agrees with the definition
    val cov = Linalg.covNumerators(Linalg.momentStats(df, "v", d))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- 0 until d; j <- i until d)
      assert(cov((i.toLong, j.toLong)) ===
        200L * stats((i, j)) - stats((i, -1)) * stats((j, -1)))
  }

  test("pcaProject as ANN preprocessing: clustered corpus keeps its neighborhoods at k=8") {
    // the regime PCA reduction serves in production: cluster structure
    // (8 centers in 64-d) with small isotropic noise. Centers span ≤ 7
    // dims after centering, so the top-8 components carry ~all center
    // separation while dropping 56/64 of the noise — coarse
    // neighborhoods must survive the 8× reduction. (On the NEAR-UNIFORM
    // synthetic sf corpus the spectrum is flat — top-16/64 ≈ 0.38 of
    // variance, recall@10 ≈ 0.16 measured — PCA's documented worst
    // case, exactly like PQ's 0.46 on the same corpus.)
    val rnd = new scala.util.Random(515)
    val d = 64
    val centers = Array.fill(8, d)(rnd.nextDouble() * 1.6 - 0.8)
    val data = (0 until 480).map { i =>
      val c = centers(i % 8)
      (i.toLong, (0 until d).map(j =>
        (c(j) + rnd.nextGaussian() * 0.03).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "v")
    val (vals, _, _) = Linalg.pcaBasis(df, "v", d)
    assert(vals.take(8).sum / vals.sum > 0.95,
      s"cluster variance not in the top-8 components: ${vals.toSeq.take(10)}")
    val proj = Linalg.pcaProject(df, "vec_id", "v", d, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = proj.keys.toSeq.sorted
    for (q <- 0L until 16L) {
      val top = ids.filter(_ != q).sortBy(i => l2(proj(q), proj(i))).take(10)
      // every projected neighbor is a true cluster-mate of the query
      assert(top.forall(i => i % 8 == q % 8),
        s"query $q leaked cross-cluster neighbors after reduction")
    }
  }

  test("whitening: unit variances, decorrelated components, null directions don't explode") {
    val rnd = new scala.util.Random(6061)
    val d = 6
    // anisotropic correlated corpus: two dominant coupled directions
    val data = (0 until 800).map { i =>
      val (a, b) = (rnd.nextGaussian() * 0.5, rnd.nextGaussian() * 0.15)
      (i.toLong, Seq(
        (a + 0.1 * b).toFloat, (a - 0.1 * b).toFloat, (0.7 * a + b).toFloat,
        (b * 0.8).toFloat, (rnd.nextGaussian() * 0.02).toFloat,
        (rnd.nextGaussian() * 0.02).toFloat))
    }
    val df = data.toDF("vec_id", "v")
    val w = Linalg.pcaProject(df, "vec_id", "v", d, 4, whiten = true)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = w.length.toDouble
    for (c <- 0 until 4) {
      val mean = w.map(_(c)).sum / n
      val variance = w.map(x => (x(c) - mean) * (x(c) - mean)).sum / n
      // unit variance within quantization tolerance (basis from the
      // 1/64-grid statistics, applied to raw floats)
      assert(math.abs(variance - 1.0) < 0.15, s"component $c variance $variance")
      // decorrelated: off-diagonal covariances ~0 relative to unit scale
      for (c2 <- c + 1 until 4) {
        val mean2 = w.map(_(c2)).sum / n
        val cov = w.map(x => (x(c) - mean) * (x(c2) - mean2)).sum / n
        assert(math.abs(cov) < 0.1, s"components $c,$c2 correlated: $cov")
      }
    }
    // a strictly-zero direction: whitening must not amplify it to noise
    val degenerate = (0 until 100).map(i =>
      (i.toLong, Seq((i % 7).toFloat / 10, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "v")
    val dw = Linalg.pcaProject(degenerate, "vec_id", "v", d, d, whiten = true)
      .collect().map(_.getSeq[Double](1).toArray)
    assert(dw.forall(r => (1 until d).forall(c => math.abs(r(c)) < 1e-6)),
      "null directions exploded under whitening")
  }

  test("pcaProject: planted low-rank structure recovered, map-only plan") {
    val rnd = new scala.util.Random(2024)
    val d = 8
    // two orthogonal planted directions with variances 0.16 and 0.04,
    // plus tiny isotropic noise — scaled INSIDE the quantizer's ±127/64
    // domain (unit-normalized embeddings live there; clipping would
    // distort the spectrum, and that distortion is the clamp's loud
    // out-of-domain signal, not PCA's)
    val u1 = Array(1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0).map(_ / 2)
    val u2 = Array(0.0, 0.0, 0.0, 0.0, 1.0, -1.0, 1.0, -1.0).map(_ / 2)
    val data = (0 until 500).map { _ =>
      val (a, b) = (rnd.nextGaussian() * 0.4, rnd.nextGaussian() * 0.2)
      (0 until d).map(i =>
        (a * u1(i) + b * u2(i) + rnd.nextGaussian() * 0.002).toFloat).toSeq
    }
    val df = data.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "v")
    val (vals, vecs, _) = Linalg.pcaBasis(df, "v", d)
    // top-2 variance dominates: ≥ 99% of the spectrum
    assert(vals.take(2).sum / vals.sum > 0.99,
      s"planted rank-2 not recovered: ${vals.toSeq}")
    // leading eigenvector aligns with u1 (|cos| > 0.99)
    val cos1 = (0 until d).map(r => vecs(r)(0) * u1(r)).sum
    assert(math.abs(cos1) > 0.99, s"u1 alignment $cos1")
    val proj = Linalg.pcaProject(df, "vec_id", "v", d, 2)
    // projection variances match the eigenvalues (component order kept)
    val vars = proj.select(explode(col("proj")).as("x"))
      .groupBy().agg(sum(col("x") * col("x")).as("ss")).head().getDouble(0)
    assert(math.abs(vars / 500.0 - vals.take(2).sum) / vals.take(2).sum < 0.05)
    // map-only serving: the projection stage has no exchange of corpus
    // rows (stats pass aside) — the plan contains no hash/range
    // partitioning over the projected stream
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
    // deterministic: identical output across two runs
    val a1 = proj.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val a2 = Linalg.pcaProject(df, "vec_id", "v", d, 2)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    assert(a1.toSeq === a2.toSeq)
  }

  test("pcaProjectExact: affine-scaled twin of pcaProject — geometry preserved, long-exact, bounded") {
    val rnd = new scala.util.Random(4242)
    val d = 8
    val data = (0 until 300).map { i =>
      (i.toLong, (0 until d).map(_ => (rnd.nextGaussian() * 0.3)
        .max(-1.9).min(1.9).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "v")
    val model = Linalg.pcaFit(df, "v", d)
    val k = 3
    val exact = Linalg.pcaProjectExact(df, "vec_id", "v", model, k)
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    val dbl = Linalg.pcaProject(df, "vec_id", "v", d, k)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    // outᶜ / (n·64·2¹⁶) ≈ the double projection: identical geometry at
    // a known affine scale, off only by the ±1/64 quantization grid
    val scale = model.n.toDouble * 64.0 * 65536.0
    val tol = math.sqrt(d.toDouble) / 64.0 + 1e-6
    exact.zip(dbl).foreach { case (e, g) =>
      (0 until k).foreach { c =>
        assert(math.abs(e(c) / scale - g(c)) < tol,
          s"c=$c exact=${e(c) / scale} dbl=${g(c)}")
      }
    }
    // determinism: bit-identical across runs (the hash-gate property)
    val again = Linalg.pcaProjectExact(df, "vec_id", "v", model, k)
      .orderBy("vec_id").collect().map(_.getSeq[Long](1))
    assert(exact.toSeq === again.toSeq)
    // the long-overflow bound fails LOUD, not wraps
    val tiny = model.copy(n = Long.MaxValue / 2)
    val e = intercept[IllegalArgumentException] {
      Linalg.pcaProjectExact(df, "vec_id", "v", tiny, k)
    }
    assert(e.getMessage.contains("long-exact bound"), e.getMessage)
    // bad rows shed loud: null + receipt, same convention as pcaProject
    val withBad = (data :+ ((999L, null: Seq[Float]))).toDF("vec_id", "v")
    val mb = Linalg.pcaFit(withBad, "v", d)
    val pb = Linalg.pcaProjectExact(withBad, "vec_id", "v", mb, k)
    val rows = pb.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(999L) == null)
    val shed = pb.queryExecution.observedMetrics.collect {
      case (kk, r) if kk.contains("pcaProjectExact") => r.getLong(0)
    }.sum
    assert(shed === 1L)
  }

  test("pcaProject: null / wrong-length vectors shed LOUD — null row + receipt, never a zero vector") {
    val d = 4
    val good = (0 until 20).map(i =>
      (i.toLong, Seq(0.1f * (i % 3), 0.2f, -0.1f, 0.05f * (i % 5))))
    val bad: Seq[(Long, Seq[Float])] =
      Seq((100L, null), (101L, Seq(1.0f, 2.0f))) // null + wrong length
    val df = (good ++ bad).toDF("vec_id", "v")
    val proj = Linalg.pcaProject(df, "vec_id", "v", d, 2)
    val rows = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // bad rows are NULL (detonates downstream), not plausible zeros
    assert(rows(100L) == null && rows(101L) == null)
    assert(good.forall { case (id, _) => rows(id) != null })
    // ... and the shed receipt counts them
    val shed = proj.queryExecution.observedMetrics.collect {
      case (k, r) if k.startsWith(graft.operators.Guard.ShedMetricPrefix) &&
        k.contains("pcaProject") => r.getLong(0)
    }.sum
    assert(shed === 2L, s"expected 2 shed rows, receipts said $shed")
  }
}
