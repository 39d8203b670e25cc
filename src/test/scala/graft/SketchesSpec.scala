package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish corpus: token i appears with frequency ~ n/i, words drawn
  // from a 40-token vocabulary so a 16-bucket CMS row must collide.
  private lazy val corpus = {
    val words = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"w$i"))
    (0 until 300).map { d =>
      val text = (0 until 30).map(j => words((d * 31 + j * 7) % words.size))
        .mkString(" ")
      (d.toLong, text)
    }.toDF("doc_id", "text")
  }

  test("CMS estimates never underestimate (one-sided error)") {
    val hh = Sketches.cmsHeavyHitters(corpus, "text",
      depth = 4, widthHex = 1, minEst = 0L).collect()
    assert(hh.nonEmpty)
    hh.foreach(r => assert(r.getAs[Long]("err") >= 0L,
      s"CMS underestimated ${r.getAs[String]("tok")}"))
  }

  test("CMS with a collision-free width is exact; deeper sketches only tighten") {
    // widthHex=8 → 2^32 buckets ≫ vocab: every counter holds one token
    val exact = Sketches.cmsHeavyHitters(corpus, "text",
      depth = 2, widthHex = 8, minEst = 0L).collect()
    exact.foreach(r => assert(r.getAs[Long]("err") === 0L))
    // min over more rows is monotonically non-increasing
    val d1 = Sketches.cmsHeavyHitters(corpus, "text", 1, 1, 0L)
      .select("tok", "est").as[(String, Long)].collect().toMap
    val d4 = Sketches.cmsHeavyHitters(corpus, "text", 4, 1, 0L)
      .select("tok", "est").as[(String, Long)].collect().toMap
    d4.foreach { case (t, e4) => assert(e4 <= d1(t), s"depth-4 est grew for $t") }
  }

  test("CMS threshold keeps exactly the tokens whose ESTIMATE clears it") {
    val all = Sketches.cmsHeavyHitters(corpus, "text", 4, 1, 0L)
      .select("tok", "est").as[(String, Long)].collect().toMap
    val kept = Sketches.cmsHeavyHitters(corpus, "text", 4, 1, 300L)
      .select("tok").as[String].collect().toSet
    assert(kept === all.filter(_._2 >= 300L).keySet)
  }

  test("HLL estimate is within 3 standard errors on sets of varying cardinality") {
    // per-group true bigram cardinality spans ~200..2000
    val df = (0 until 4).flatMap { g =>
      (0 until (g + 1) * 120).map { i =>
        (s"g$g", s"a$i b${i % 97} c${(i * 7) % 53} d$i")
      }
    }.toDF("grp", "text")
    val rows = Sketches.hllDistinctBigrams(df, "grp", "text").collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_x100") / 100.0
      val exact = r.getAs[Long]("exact").toDouble
      val rse = 1.04 / math.sqrt(64) // ≈ 13%
      assert(math.abs(est - exact) <= 3 * rse * exact,
        s"${r.getAs[String]("grp")}: est $est vs exact $exact")
    }
  }

  test("HLL is insertion-invariant: duplicated content does not move the estimate") {
    val base = (0 until 200).map(i => ("g", s"x$i y${i % 31} z$i")).toDF("grp", "text")
    val dup = base.unionByName(base).unionByName(base)
    val a = Sketches.hllDistinctBigrams(base, "grp", "text")
      .select("est_x100").as[Long].head()
    val b = Sketches.hllDistinctBigrams(dup, "grp", "text")
      .select("est_x100").as[Long].head()
    assert(a === b)
  }

  test("HLL is partitioning-invariant (register max is order-free)") {
    val df = (0 until 500).map(i => (s"g${i % 3}", s"p$i q${i % 13} r$i"))
      .toDF("grp", "text")
    val a = Sketches.hllDistinctBigrams(df, "grp", "text")
      .orderBy("grp").collect().toSeq
    val b = Sketches.hllDistinctBigrams(df.repartition(13), "grp", "text")
      .orderBy("grp").collect().toSeq
    assert(a === b)
  }

  test("Bloom filter: zero false negatives; FP rate near theory; saturated filter passes all") {
    import org.apache.spark.sql.functions._
    val build = (0 until 500).map(i => Tuple1(i.toLong * 7)).toDF("k")
    val m = 8192; val k = 3
    val bits = Sketches.bloomBits(build, "k", m, k)
    val probe = (0 until 4000).map(i => Tuple1(i.toLong)).toDF("k")
      .withColumn("_bits", typedLit(bits.toSeq))
    val out = Sketches.bloomMightContain(probe, "k", "_bits", m, k)
      .select("k", "bloom_pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val truth = (0 until 500).map(_.toLong * 7).filter(_ < 4000).toSet
    // the Bloom guarantee: every member passes
    truth.foreach(t => assert(out(t), s"false negative for $t"))
    // false-positive rate near the analytic (1 - e^{-kn/m})^k ≈ 2.7%
    val negatives = out.keySet -- truth
    val fp = negatives.count(out(_)).toDouble / negatives.size
    val theory = math.pow(1 - math.exp(-k * 500.0 / m), k)
    assert(fp <= theory * 3 + 0.01, s"fp $fp vs theory $theory")
    // a saturated filter (tiny m) degrades to pass-everything — never drops
    val satBits = Sketches.bloomBits(build, "k", 64, k)
    val sat = Sketches.bloomMightContain(
        probe.withColumn("_bits", typedLit(satBits.toSeq)), "k", "_bits", 64, k)
      .select("bloom_pass").collect().map(_.getBoolean(0))
    assert(sat.forall(identity))
    // deterministic across partitioning
    val out2 = Sketches.bloomMightContain(
        probe.repartition(13), "k", "_bits", m, k)
      .select("k", "bloom_pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out2 === out)
  }

  test("graphDelta: basket-atomic batches add to the whole; a split basket loses pairs") {
    import graft.streaming.StreamGraph
    val whole = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L))
      .toDF("bk", "it")
    def deltas(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      StreamGraph.graphDelta(df, "bk", "it").as[(String, Long)].collect().toMap
    val all = deltas(whole)
    assert(all("e:10:20") === 2L && all("e:10:30") === 1L && all("n:10") === 2L)
    // basket-atomic split (by basket): deltas ADD to the whole
    val b1 = whole.filter(col("bk") === 1L); val b2 = whole.filter(col("bk") === 2L)
    val summed = (deltas(b1).toSeq ++ deltas(b2).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(summed === all)
    // basket SPLIT ACROSS batches: cross-batch pairs are lost — this is
    // exactly the admission contract the sink documents
    val s1 = whole.filter(col("it") <= 15L); val s2 = whole.filter(col("it") > 15L)
    val bad = (deltas(s1).toSeq ++ deltas(s2).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(!bad.contains("e:10:20"))
  }

  test("histDelta keys round-trip through histView parsing (incl. negative values)") {
    import graft.streaming.StreamSketch
    val batch = Seq(("src0", 5L), ("src0", 5L), ("src0", -3L), ("alpha", 0L))
      .toDF("g", "v")
    val keys = StreamSketch.histDelta(batch, "g", "v")
      .as[(String, Long)].collect().toMap
    assert(keys === Map("v:src0:5" -> 2L, "v:src0:-3" -> 1L, "v:alpha:0" -> 1L))
    // the view's split-based parse must invert the key codec
    val parsed = keys.keys.map { k =>
      val parts = k.drop(2).split(":")
      (parts(0), parts(1).toLong)
    }.toSet
    assert(parsed === Set(("src0", 5L), ("src0", -3L), ("alpha", 0L)))
  }
}
