package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Integer-exact Lloyd training (operators/KMeans.scala): the q_kmeans
  * oracle proves cross-engine replay; these pin the semantics against an
  * independently-written naive reference and the documented edge rules
  * (smallest-cid ties, emptied-cluster carry, determinism). */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic corpus: n vectors of dim d with three
    * planted blobs (ids mod 3 pick a base direction, a small id-derived
    * wobble keeps vectors distinct). Floats, like the driver table. */
  private def corpus(n: Int, d: Int) =
    (0L until n.toLong).map { id =>
      val base = (id % 3).toInt
      val v = Array.tabulate(d) { j =>
        val blob = if (j % 3 == base) 1.0f else 0.05f
        blob + ((id * 31 + j * 7) % 11).toFloat / 100.0f
      }
      (id, v)
    }.toDF("vec_id", "embedding")

  /** Naive reference of the WHOLE training contract, written directly
    * from the scaladoc (no shared code with the operator beyond the
    * constants): quantize, md5-order seed, (dist, cid) argmin, integer
    * floor-division update, emptied-cluster carry. */
  private def reference(rows: Seq[(Long, Array[Float])], k: Int,
      iters: Int): Map[Long, (Long, Long)] = {
    val q = rows.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * KMeans.Scale).toLong + KMeans.Offset)
    }.toMap
    def md5hex8(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    var cents: IndexedSeq[Array[Long]] = q.keys.toSeq
      .sortBy(id => (md5hex8(id.toString), id)).take(k)
      .sorted.map(q(_)).toIndexedSeq
    def dist(v: Array[Long], c: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < v.length) { val x = v(i) - c(i); s += x * x; i += 1 }
      s
    }
    def assign(v: Array[Long]): (Int, Long) =
      cents.zipWithIndex.map { case (c, i) => (dist(v, c), i) }
        .min match { case (dd, i) => (i, dd) }
    for (_ <- 0 until iters) {
      val groups = q.toSeq.groupBy { case (_, v) => assign(v)._1 }
      cents = cents.indices.map { c =>
        groups.get(c) match {
          case Some(members) =>
            val n = members.size.toLong
            Array.tabulate(cents(c).length)(j =>
              members.map(_._2(j)).sum / n)
          case None => cents(c)
        }
      }.toIndexedSeq
    }
    q.map { case (id, v) => val (c, dd) = assign(v); id -> (c.toLong, dd) }
  }

  test("trainAssign equals the naive reference on a 60x8 blob corpus") {
    val df = corpus(60, 8)
    val got = KMeans.trainAssign(df, "vec_id", "embedding", k = 4, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = reference(
      df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq,
      k = 4, iters = 3)
    assert(got === want)
  }

  test("assignment ties break to the smallest centroid id") {
    // two identical seed centroids: every vector is equidistant to both,
    // so cid 0 must win everywhere
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq(Seq(10000L + KMeans.Offset, KMeans.Offset),
      Seq(10000L + KMeans.Offset, KMeans.Offset))
    val r = KMeans.assignExact(df, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r.values.toSet === Set(0L))
  }

  test("an emptied cluster keeps its previous centroid") {
    // k=2 over a corpus where everything collapses onto one blob after
    // the first update: the starved centroid must survive verbatim
    val df = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(1.02f, 1.02f))).toDF("vec_id", "embedding")
    val (cents, _) = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(cents.length === 2)
    assert(cents.distinct.length === 2) // starved seed carried, not collapsed
    // and the reference agrees end-to-end
    val got = KMeans.trainAssign(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = reference(
      df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq,
      k = 2, iters = 3)
    assert(got === want)
  }

  test("corpus smaller than k: codebook shrinks and assignments stay exact") {
    // seedCentroids can only return as many centroids as the corpus has
    // vectors; the argmin pack modulus is the CODEBOOK size, so the
    // unpack must use it too or cid/dist come out garbled
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val (cents, _) = KMeans.train(df, "vec_id", "embedding", k = 5, iters = 2)
    assert(cents.length === 2)
    val got = KMeans.trainAssign(df, "vec_id", "embedding", k = 5, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each vector sits exactly on its own centroid: dist 0, distinct cids
    assert(got.values.forall(_._2 === 0L), s"dists garbled: $got")
    assert(got.values.map(_._1).toSet === Set(0L, 1L))
    val want = reference(
      df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq,
      k = 2, iters = 2) // reference takes k after the same shrink
    assert(got === want)
  }

  test("training is deterministic across runs and partitioning") {
    val df = corpus(40, 6)
    val a = KMeans.train(df, "vec_id", "embedding", k = 3, iters = 2)._1
    val b = KMeans.train(df.repartition(7), "vec_id", "embedding",
      k = 3, iters = 2)._1
    assert(a === b)
  }
}
