package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Importance

/** DSIR importance weighting: feature extraction exactness, a full
  * reference-implementation cross-check on randomized corpora (same
  * exact-long-product-into-double-divide arithmetic), directional
  * sanity, and the feature-less-doc contract. */
class ImportanceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def md5b(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString.substring(0, 4)

  test("featureCounts: unigrams + adjacent bigrams, md5-prefix buckets, counts") {
    val df = Seq((1L, "a b a", true)).toDF("doc_id", "text", "t")
    val got = Importance.featureCounts(df, "doc_id", "text", col("t"))
      .as[(Long, Boolean, String, Long)].collect().toSet
    // features: a, b, a, "a b", "b a"
    assert(got === Set(
      (1L, true, md5b("a"), 2L),
      (1L, true, md5b("b"), 1L),
      (1L, true, md5b("a b"), 1L),
      (1L, true, md5b("b a"), 1L)))
  }

  test("featureCounts: case folds, punctuation splits, no bigram for 1-token docs, token-less docs absent") {
    val df = Seq((1L, "Hello!", false), (2L, "", false), (3L, "?! .", false))
      .toDF("doc_id", "text", "t")
    val got = Importance.featureCounts(df, "doc_id", "text", col("t"))
      .as[(Long, Boolean, String, Long)].collect().toSet
    assert(got === Set((1L, false, md5b("hello"), 1L)))
  }

  /** Reference implementation — same tokenization, same bucket rule,
    * same exact-long products cast to double around the one ln. */
  private def refWeights(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Long)] = {
    val B = 65536L
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    def feats(s: String) = { val w = toks(s); w ++ w.zip(w.drop(1)).map(p => s"${p._1} ${p._2}") }
    val fc = docs.map { case (id, text, t) =>
      (id, t, feats(text).groupBy(md5b).view.mapValues(_.size.toLong).toMap)
    }
    val buckets = fc.flatMap(_._3.keys).distinct
    val tcnt = buckets.map(b => b -> fc.filter(_._2).flatMap(_._3.get(b)).sum).toMap
    val rcnt = buckets.map(b => b -> fc.flatMap(_._3.get(b)).sum).toMap
    val t = tcnt.values.sum
    val r = rcnt.values.sum
    val wBp = buckets.map { b =>
      b -> math.floor(math.log(
        ((tcnt(b) + 1L) * (r + B)).toDouble / ((rcnt(b) + 1L) * (t + B)).toDouble
      ) * 10000).toLong
    }.toMap
    fc.filter(_._3.nonEmpty).map { case (id, _, m) =>
      id -> (m.values.sum, m.map { case (b, c) => c * wBp(b) }.sum)
    }.toMap
  }

  test("property: dsirWeights equals the reference implementation on random corpora") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "x1", "y2")
    for (trial <- 1 to 3) {
      val docs = (1L to 30L).map { id =>
        val n = 1 + rng.nextInt(8)
        val text = (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
        (id, text, rng.nextBoolean())
      }
      // a target split must exist for the model to be meaningful
      val fixed = if (docs.exists(_._3)) docs else docs.updated(0, docs.head.copy(_3 = true))
      val got = Importance.dsirWeights(fixed.toDF("doc_id", "text", "t"),
          "doc_id", "text", col("t"))
        .as[(Long, Long, Long)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      assert(got === refWeights(fixed), s"trial $trial diverged")
    }
  }

  test("directional: in-domain vocabulary outweighs off-domain vocabulary") {
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "gamma delta gamma delta", false),
      (5L, "alpha beta alpha beta", false),   // scored doc, target-like
      (6L, "gamma delta gamma delta", false)) // scored doc, off-domain
    val w = Importance.dsirWeights(docs.toDF("doc_id", "text", "t"),
        "doc_id", "text", col("t"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(w(5L) > w(6L),
      s"target-like doc must outweigh off-domain doc: $w")
    // same content ⇒ same weight, regardless of the doc's own flag
    assert(w(1L) === w(5L))
  }

  test("dsirSample: keys equal the reference formula exactly; top-k and tiebreak deterministic") {
    val weights = (1L to 50L).map(id => (id, 10L, (id % 7) * 1000L))
      .toDF("doc", "n_feats", "weight_bp")
    val got = Importance.dsirSample(weights, "doc", k = 10)
      .as[(Long, Long, Long)].collect()
    def refKey(id: Long, wBp: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      wBp + math.floor(-math.log(-math.log(u)) * 10000).toLong
    }
    val refAll = (1L to 50L).map(id => (id, (id % 7) * 1000L))
      .map { case (id, w) => (id, w, refKey(id, w)) }
    val refTop = refAll.sortBy(t => (-t._3, t._1)).take(10)
    assert(got.toSeq === refTop)
    // deterministic across invocations
    val again = Importance.dsirSample(weights, "doc", k = 10)
      .as[(Long, Long, Long)].collect()
    assert(again.toSeq === got.toSeq)
  }

  test("dsirSample: k beyond the pool returns the whole pool; overwhelming weight always selected") {
    val weights = Seq((1L, 5L, 500000L), (2L, 5L, 0L), (3L, 5L, 0L))
      .toDF("doc", "n_feats", "weight_bp")
    val all = Importance.dsirSample(weights, "doc", k = 10)
      .as[(Long, Long, Long)].collect()
    assert(all.length === 3)
    // Gumbel noise is bounded in ≈(−3.2, 23) nats → ±2.3e5 bp at the
    // 2^32 u-grid; a 5e5 bp lead cannot be overcome
    assert(all.head._1 === 1L)
  }

  test("token-less docs are absent from the scoring table") {
    val docs = Seq((1L, "alpha", true), (2L, "", false), (3L, "...", false))
    val got = Importance.dsirWeights(docs.toDF("doc_id", "text", "t"),
        "doc_id", "text", col("t"))
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(got === Set(1L))
  }
}
