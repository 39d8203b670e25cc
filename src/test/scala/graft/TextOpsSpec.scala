package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps

/** Pure-JVM cross-checks of the native kernels against naive reference
  * implementations on randomized inputs — no Spark session involved. */
class TextOpsSpec extends AnyFunSuite {

  private def arr(words: Seq[String]) =
    new GenericArrayData(words.map(UTF8String.fromString).toArray[Any])

  private def naiveShingles(words: Seq[String], n: Int): Seq[String] =
    if (words.length < n) Seq.empty
    else words.sliding(n).map(_.mkString(" ")).toSeq.distinct

  test("minhashBands kernel: empty in → empty out; deterministic; near-collision-free across sets") {
    assert(TextOps.minhashBands(arr(Seq.empty), 16, 4).numElements() === 0)
    val a = TextOps.minhashBands(arr(Seq("x y", "y z")), 16, 4)
    val b = TextOps.minhashBands(arr(Seq("x y", "y z")), 16, 4)
    assert(a.toLongArray().toSeq === b.toLongArray().toSeq)
    assert(a.numElements() === 4)
    // identical sets share every band; disjoint sets share (whp) none
    val c = TextOps.minhashBands(arr(Seq("p q", "q r")), 16, 4)
    assert(a.toLongArray().toSeq !== c.toLongArray().toSeq)
  }

  test("minhashBands kernel: all-null array → empty bands, no spurious collisions") {
    // an array of only nulls hashes nothing — without the guard every such
    // doc would share the identical MaxValue-mins signature and collide
    // with every other all-null doc via the SQL-registered function
    val allNull = new GenericArrayData(Array[Any](null, null))
    assert(TextOps.minhashBands(allNull, 16, 4).numElements() === 0)
    // a null mixed into real shingles still hashes the real ones
    val mixed = new GenericArrayData(
      Array[Any](null, UTF8String.fromString("x y"), UTF8String.fromString("y z")))
    assert(TextOps.minhashBands(mixed, 16, 4).toLongArray().toSeq ===
      TextOps.minhashBands(arr(Seq("x y", "y z")), 16, 4).toLongArray().toSeq)
  }

  test("minhashBands kernel: a superset-heavy overlap shares some bands (banding sanity)") {
    // jaccard 3/4 sets: with 16 hashes / 4 bands (r=4), P(band match) ≈ 0.32
    // per band — at least one of 4 bands should match for SOME of several
    // deterministic trials (kernel is fixed-seed, so this is a fixed fact)
    val trials = (0 until 8).map { t =>
      val base = Seq(s"a$t", s"b$t", s"c$t")
      val x = TextOps.minhashBands(arr(base :+ "x"), 16, 4).toLongArray()
      val y = TextOps.minhashBands(arr(base :+ "y"), 16, 4).toLongArray()
      x.zip(y).count { case (u, v) => u == v }
    }
    assert(trials.sum > 0)
  }

  test("property: TextOps.shingles == naive sliding-distinct on random inputs") {
    val rng = new scala.util.Random(99)
    val vocab = Vector("a", "bb", "ccc", "d", "e")
    for (_ <- 1 to 200) {
      val n = 1 + rng.nextInt(4)
      val words = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val got = TextOps.shingles(arr(words), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got === naiveShingles(words, n), s"words=$words n=$n")
    }
  }

  test("property: TextOps.winnow window minima match a naive implementation") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("x", "y", "z", "w")
    for (_ <- 1 to 200) {
      val k = 1 + rng.nextInt(3)
      val w = 1 + rng.nextInt(4)
      val words = Seq.fill(rng.nextInt(15))(vocab(rng.nextInt(vocab.size)))
      val got = TextOps.winnow(arr(words), k, w)
        .toLongArray().toSeq
      // naive: recompute gram hashes via the SAME kernel at window size 1
      // (w=1 selects every gram hash in order, deduped)
      val grams = TextOps.winnow(arr(words), k, 1).toLongArray().toSeq
      if (words.length < k) assert(got.isEmpty)
      else {
        // reconstruct full (non-deduped) gram sequence naively from k-grams:
        // winnow(k, 1) dedups, so instead check the winnowing invariants:
        assert(got.nonEmpty)
        assert(got.toSet.subsetOf(grams.toSet))          // minima are gram hashes
        assert(got.distinct === got)                     // deduped
        // every selected fp is the min of SOME w-window: verified by
        // membership + the guarantee test in TextAnalysisSpec
      }
    }
  }

  test("ngrams with separator == naive sliding mkString; null words join as empty") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "d")
    for (_ <- 1 to 100) {
      val n = 1 + rng.nextInt(3)
      val words = Seq.fill(rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
      val got = TextOps.ngrams(arr(words), n, UTF8String.fromString(" -> "))
      val want =
        if (words.length < n) Seq.empty
        else words.sliding(n).map(_.mkString(" -> ")).toSeq
      assert((0 until got.numElements())
        .map(got.getUTF8String(_).toString) === want)
    }
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("x"), null, UTF8String.fromString("z")))
    val g = TextOps.ngrams(withNull, 2, UTF8String.fromString("|"))
    assert((0 until g.numElements()).map(g.getUTF8String(_).toString) ===
      Seq("x|", "|z"))
  }

  test("intersectSize == size(array_intersect) semantics on random inputs") {
    val rng = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (_ <- 1 to 300) {
      val a = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val b = Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
      val want = a.distinct.count(b.contains)   // distinct common elements
      assert(TextOps.intersectSize(arr(a), arr(b)) === want, s"a=$a b=$b")
    }
    // a null element shared by both sides counts once (array_intersect)
    def withNull(ws: Seq[String]) = new GenericArrayData(
      (ws.map(UTF8String.fromString) :+ null).toArray[Any])
    assert(TextOps.intersectSize(withNull(Seq("a")), withNull(Seq("b"))) === 1)
    assert(TextOps.intersectSize(withNull(Seq("a")), arr(Seq("a"))) === 1)
    assert(TextOps.intersectSize(arr(Seq.empty), withNull(Seq("a"))) === 0)
  }

  test("simhash64: deterministic, order-insensitive for permutations, 0 for empty") {
    val a = arr(Seq("alpha", "beta", "gamma"))
    val b = arr(Seq("gamma", "alpha", "beta"))   // votes are order-free
    assert(TextOps.simhash64(a) === TextOps.simhash64(b))
    assert(TextOps.simhash64(arr(Seq.empty)) === 0L)
    // single-bit sensitivity: different words → different signature
    assert(TextOps.simhash64(a) !== TextOps.simhash64(arr(Seq("delta"))))
  }
}
