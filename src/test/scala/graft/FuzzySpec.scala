package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Fuzzy, Search}

/** r10 fuzzy lookup + phrase search. */
class FuzzySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuzzyLookup: min distance wins, ties to smallest key, bound respected") {
    val corpus = Seq((1L, "widget"), (2L, "wadget"), (3L, "gadget"),
      (4L, "zzzzzzzzzz")).toDF("k", "n")
    val probes = Seq((100L, "widgat"), (200L, "qqqqqq")).toDF("pk", "pn")
    val got = Fuzzy.fuzzyLookup(corpus, "k", "n", probes, "pk", "pn", maxDist = 2)
      .select("probe_key", "match_key", "dist")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // widgat: widget d=1, wadget d=2 -> widget; qqqqqq: nothing within 2
    assert(got === Map(100L -> ((1L, 1L))))
  }

  test("fuzzyLookup: equal-distance candidates break on the smaller key") {
    val corpus = Seq((7L, "abcd"), (3L, "abce")).toDF("k", "n")
    val probes = Seq((1L, "abcf")).toDF("pk", "pn")
    val got = Fuzzy.fuzzyLookup(corpus, "k", "n", probes, "pk", "pn", 2)
      .select("match_key").as[Long].head()
    assert(got === 3L)
  }

  test("fuzzyLookup: length-band prune is lossless (matches unbanded brute)") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    def word() = (1 to 3 + rnd.nextInt(5))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val corpus = (1L to 60L).map(i => (i, word()))
    val probes = (101L to 110L).map(i => (i, word()))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = probes.flatMap { case (pk, pn) =>
      val cands = corpus.map { case (k, n) => (lev(pn, n), k, n) }
        .filter(_._1 <= 2)
      if (cands.isEmpty) None else Some(pk -> cands.min)
    }.toMap
    val got = Fuzzy.fuzzyLookup(corpus.toDF("k", "n"), "k", "n",
        probes.toDF("pk", "pn"), "pk", "pn", 2)
      .select("probe_key", "dist", "match_key", "match_name")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2.toInt, r._3, r._4))).toMap
    assert(got === want)
  }

  test("phraseSearch: counts consecutive occurrences, 1-based first position") {
    val docs = Seq(
      (1L, "the big cat sat; the big cat ran"), // 2 matches of "big cat"
      (2L, "big dog cat"),                      // terms present, not adjacent
      (3L, "BIG, Cat!"),                        // normalization: 1 match at pos 1
      (4L, "cat big")                           // wrong order
    ).toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "doc_id", "text", "big cat")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, 2L)), 3L -> ((1L, 1L))))
  }

  test("phraseSearch: three-term phrase needs the full chain") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x c"), (3L, "x a b c a b c")
    ).toDF("doc_id", "text")
    val got = Search.phraseSearch(docs, "doc_id", "text", "a b c")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((1L, 1L)), 3L -> ((2L, 2L))))
  }

  test("spellCorrect: distance first, then frequency prior, then lexicographic; out-of-range absent") {
    import graft.operators.Fuzzy
    val vocab = Seq(
      ("spark", 100L), ("spars", 500L),   // both dist-1 from 'sparc'
      ("table", 80L), ("cable", 80L),     // dist-1 tie broken by word
      ("engine", 10L)
    ).toDF("w", "f")
    val typos = Seq("sparc", "tible", "zzzzzzzzz").toDF("typo")
    val got = Fuzzy.spellCorrect(vocab, "w", "f", typos, "typo", maxDist = 2)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // 'sparc': spark & spars both at dist 1 — the PRIOR (freq 500) wins
    assert(got("sparc") === (("spars", 1L, 500L)))
    // 'tible': table/cable dist 1/2? table=1 (i->a)... cable needs 2 —
    // distance dominates regardless of equal freq
    assert(got("tible")._1 === "table")
    // nothing within distance 2 of the long garbage probe
    assert(!got.contains("zzzzzzzzz"))
  }
}
