package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(text: String) =
    TextAnalysis.profile(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()

  test("token and subword counts") {
    val p = profile("The cat, sat on 42 mats!")
    assert(p.getAs[Long]("n_tokens") === 6L)
    // the|cat|,|sat|on|42|mats|! → 8 subword units
    assert(p.getAs[Long]("n_subwords") === 8L)
  }

  test("empty text yields zeros, not nulls or NaN") {
    val p = profile("")
    assert(p.getAs[Long]("n_tokens") === 0L)
    assert(p.getAs[Long]("punct_ratio_bp") === 0L)
    assert(p.getAs[Long]("stopword_ratio_bp") === 0L)
  }

  test("stopword ratio: half the tokens are stopwords → 5000 bp") {
    val p = profile("the fox and dog")
    assert(p.getAs[Long]("stopword_ratio_bp") === 5000L)
  }

  test("punct ratio counts [.,;:!?] only") {
    val p = profile("a.b,c!d")  // 3 punct / 7 chars = 4285 bp
    assert(p.getAs[Long]("punct_ratio_bp") === 4285L)
  }

  test("language ID picks the language with most stopword hits") {
    assert(profile("the cat and the dog of the house is big")
      .getAs[String]("lang_pred") === "en")
    assert(profile("el perro que corre es grande la casa")
      .getAs[String]("lang_pred") === "es")
    assert(profile("xyzzy plugh qwerty").getAs[String]("lang_pred") === "und")
  }

  test("ambiguous language (tie) → und") {
    // 'la de' scores 2 for both es and fr
    assert(profile("la de").getAs[String]("lang_pred") === "und")
  }

  test("fingerprint is whitespace/case-insensitive md5") {
    val a = profile("Hello   World").getAs[String]("fingerprint")
    val b = profile("  hello world ").getAs[String]("fingerprint")
    assert(a === b)
    assert(a.length === 32)
  }

  test("redact scrubs emails, urls, long digit runs; counts replacements") {
    import graft.operators.TextAnalysis
    val r = Seq((1L, "mail a@b.co or http://x.io/z then call 12345678 or 123"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.redact($"text").as("c"),
        TextAnalysis.redactionCount($"text").as("n"))
      .head()
    assert(r.getString(0) === "mail <EMAIL> or <URL> then call <NUM> or 123")
    assert(r.getLong(1) === 3L)
  }

  test("chunk: overlapping windows cover every token; single window for short docs") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),  // 10 tokens
      (2L, "a b c")                                     // shorter than window
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.chunk(docs, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.head._3 === "t1 t2 t3 t4")
    assert(d1.map(_._2).toSeq === d1.indices.map(_.toLong))   // dense idx
    // every token appears in some chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
    // last chunk ends at the last token
    assert(d1.last._3.endsWith("t10"))
    val d2 = rows.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._3 === "a b c" && d2.head._4 === 3L)
  }

  test("winnowing: shared run of >= w+k-1 tokens guarantees a shared fingerprint") {
    import graft.operators.TextAnalysis
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 tokens >= w+k-1 = 6
    val docs = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared completely different tail here"),
      (3L, "nothing in common with the others at all")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)       // the winnowing guarantee
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("winnowing: short docs still fingerprint; sub-k docs drop") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "just three words"), (2L, "tiny")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(_.getLong(0))
    assert(fps.toSeq === Seq(1L))                  // doc 1: 1 fp; doc 2: none
  }

  test("quality score is bounded [0, 10000]") {
    val scores = Seq("", "x", "the a of to in is!!!,,,...;;;",
      "a perfectly normal sentence with the usual words in it")
      .map(t => profile(t).getAs[Long]("quality_bp"))
    assert(scores.forall(s => s >= 0L && s <= 10000L))
  }

  test("hashSplit: deterministic, order-independent, roughly proportional") {
    import graft.operators.TextAnalysis
    val ids = (1L to 5000L).map(Tuple1(_)).toDF("doc_id")
    val s1 = TextAnalysis.hashSplit(ids, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // same assignment regardless of row order / partitioning
    val s2 = TextAnalysis.hashSplit(ids.orderBy($"doc_id".desc).repartition(7), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2)
    // a doc's split never changes when the corpus grows
    val s3 = TextAnalysis.hashSplit((1L to 9000L).map(Tuple1(_)).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1.forall { case (k, v) => s3(k) == v })
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.03, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.02, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.02, s"test ${frac("test")}")
    // 100% boundary: "10000" would sort before "ffff" — every row must
    // still land in train (resp. train/val), never leak to test
    val all = TextAnalysis.hashSplit(ids, "doc_id", trainPct = 100, valPct = 0)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(all === Set("train"))
    val noTest = TextAnalysis.hashSplit(ids, "doc_id", trainPct = 90, valPct = 10)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(noTest === Set("train", "val"))
  }

  test("repetition: degenerate doc maxes the share; varied doc spreads it") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "spam spam spam spam"),            // 1 distinct token, share 100%
      (2L, "all words here are different"),   // share 1/5, distinct 5/5
      (3L, "")                                // tokenless: absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map(1L -> (10000L, 2500L), 2L -> (2000L, 10000L)))
  }

  test("stratifiedSample: per-stratum rates, consistent with hashSplit buckets") {
    import graft.operators.TextAnalysis
    val df = (1L to 4000L).map(i => (i, s"s${i % 2}")).toDF("doc_id", "source")
    val out = TextAnalysis.stratifiedSample(df, "doc_id", "source",
      Map("s0" -> 100, "s1" -> 25))
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("s0") === 2000L)                         // 100% keeps all
    assert(math.abs(bySrc("s1") - 500L) < 60, s"s1=${bySrc("s1")}")   // ~25%
    // unlisted strata default to 0%
    val dropped = TextAnalysis.stratifiedSample(
      df.withColumn("source", lit("other")), "doc_id", "source", Map("s0" -> 100))
    assert(dropped.count() === 0)
  }

  test("contamination flags only docs sharing an n-gram with the benchmark") {
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),        // shares "quick brown fox"
      (2L, "completely different words here"),  // clean
      (3L, "a quick brown fox appears twice quick brown fox")).toDF("doc_id", "text")
    val bench = Seq((100L, "quick brown fox runs")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 3's repeat counts ONCE (distinct shingles); doc 2 absent
    assert(out === Map(1L -> 1L, 3L -> 1L))
  }

  test("topTokens matches a naive count on a known corpus") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "The cat; the DOG!"), (2L, "cat cat dog-42")).toDF("doc_id", "text")
    val out = TextAnalysis.topTokens(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "cat", 3L), (2, "dog", 2L), (3, "the", 2L)))
  }

  test("packSequences: streaming fill — contiguous bins, capacity respected, shard-independent") {
    import spark.implicits._
    // one shard (ids ≡ 1 mod 32): tokens 200,200,200,200 at cap 512 →
    // cumsum-before 0,200,400,600 → bins 0,0,0,1
    val docs = Seq(1L, 33L, 65L, 97L).map(i => i -> ("w " * 200).trim).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 512L)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("shard")).distinct.toSeq === Seq(1L))
    assert(out.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 0L, 0L, 1L))
    // invariants on a larger mixed corpus: bins form contiguous runs per
    // shard, and no bin's PRE-ITEM fill reaches capacity (the straddling
    // item is the overhang, by the streaming-fill contract)
    val big = (0L until 300L).map(i => i -> ("tok " * (1 + (i % 37)).toInt).trim)
      .toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(big, "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 64L)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("bin"), r.getAs[Long]("n_tokens")))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._2)
      assert(inOrder.map(_._3).toSeq === inOrder.map(_._3).sorted.toSeq) // contiguous
      var cum = 0L
      inOrder.foreach { case (_, _, bin, n) =>
        assert(bin === cum / 64L)   // exactly the streaming-fill assignment
        cum += n
      }
    }
    // scale shape: exactly ONE exchange (the shard hash for the window)
    val plan = TextAnalysis.packSequences(big, "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 64L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1,
      s"packSequences must plan exactly one exchange:\n$plan")
  }

  test("duplicatedSpans: exact boundaries for planted shared runs, self-repeats, no-dup docs") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 a3 $shared b1 b2 b3",          // shared run at tokens 3..12
      2L -> s"c1 c2 $shared d1",                    // same run at tokens 2..11
      3L -> "unique tokens only here nothing repeats at all ever",
      4L -> "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8" // self-repeat
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.duplicatedSpans(docs, "doc_id", "text", L = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // cross-doc: exactly the 10-token shared run, positions per doc;
    // self-repeat: the two occurrences of x1..x8 mark positions 0 and 8
    // (grams crossing the repeat boundary occur once and are NOT marked)
    // — gap == L, covered tokens contiguous, ONE maximal span
    assert(spans === Set(
      (1L, 3L, 10L), (2L, 2L, 10L),
      (4L, 0L, 16L)))
    // enforcement: spans cut out of the reconstructed text, counts exact;
    // a fully-duplicated doc scrubs to the empty string, not a dropped row
    val clean = TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text", L = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(clean(1L) === (("a1 a2 a3 b1 b2 b3", 10L)))
    assert(clean(2L) === (("c1 c2 d1", 10L)))
    assert(clean(3L)._2 === 0L)
    assert(clean(4L) === (("", 16L)))
  }

  test("span merge: marked positions with gap < L merge into ONE span (never overlap)") {
    import spark.implicits._
    // doc 1 grams (L=3): "a b c"(0), "b c q"(1), "c q r"(2); doc 2
    // contains "a b c" and "c q r" but NOT "b c q" — so doc 1's marked
    // positions are 0 and 2 with 1 unmarked, the exact shape that made
    // the old pos − row_number run-grouping emit OVERLAPPING spans
    // (0,3) + (2,5) and the scrub oracle's one-row-per-covering-span
    // LEFT JOIN double-count tokens 2..4
    val docs = Seq(
      1L -> "a b c q r",
      2L -> "a b c z c q r"
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.duplicatedSpans(docs, "doc_id", "text",
        L = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: gap 2 < L → ONE merged span covering the whole doc;
    // doc 2: marked 0 and 4, gap 4 > L → two disjoint spans, token 3 free
    assert(spans === Set((1L, 0L, 5L), (2L, 0L, 3L), (2L, 4L, 3L)))
    // enforcement counts each covered token ONCE (5 tokens, not 6)
    val clean = TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text",
        L = 3, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(clean(1L) === (("", 5L)))
    assert(clean(2L) === (("z", 6L)))
  }

  test("span merge: spans touching at gap == L merge into one maximal covered run") {
    import spark.implicits._
    // L=2: doc 3 marked at 0 and 2 ("m n", "o p" both repeat; "n o" does
    // not) — the covered token runs [0,2) and [2,4) are CONTIGUOUS, so
    // the maximal-covered-run contract merges them into one span
    val docs = Seq(
      3L -> "m n o p",
      4L -> "m n x o p"
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.duplicatedSpans(docs, "doc_id", "text",
        L = 2, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((3L, 0L, 4L), (4L, 0L, 2L), (4L, 3L, 2L)))
  }

  test("removeDuplicatedSpans: thousands of disjoint spans per doc (hostile span-list point)") {
    import spark.implicits._
    // The scrub's _spans array is PER-ROW memory and the indexed token
    // filter is O(|tokens| × |spans|) row-local work — this pins behavior
    // at a hostile span count (2000 disjoint spans/doc, the worst shape:
    // maximally fragmented dup structure). See SCALE.md for the bound and
    // the chunked fallback past it.
    val n = 2000
    def doc(tag: String) =
      (1 to n).map(i => s"s${i}a s${i}b u$tag$i").mkString(" ")
    val docs = Seq(1L -> doc("a"), 2L -> doc("b")).toDF("doc_id", "text")
    // each shared 2-token run is its own span (separators break the runs:
    // gap 3 > L) → exactly n disjoint spans per doc
    val spans = TextAnalysis.duplicatedSpans(docs, "doc_id", "text",
      L = 2, minCount = 2)
    assert(spans.count() === 2L * n)
    val clean = TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text",
        L = 2, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(clean(1L) === (((1 to n).map(i => s"ua$i").mkString(" "), 2L * n)))
    assert(clean(2L) === (((1 to n).map(i => s"ub$i").mkString(" "), 2L * n)))
    // the positional fallback (SCALE.md's chunked path for pathological
    // span counts — no per-row span array) must be output-identical here
    val positional = TextAnalysis.removeDuplicatedSpansPositional(docs,
        "doc_id", "text", L = 2, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(positional === clean)
  }

  test("removeDuplicatedSpansPositional: output-identical to the row-local form (incl. scrub-to-empty)") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 a3 $shared b1 b2 b3",
      2L -> s"c1 c2 $shared d1",
      3L -> "unique tokens only here nothing repeats at all ever",
      4L -> "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8" // scrubs to ""
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val rowLocal = rows(
      TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text", L = 8))
    val positional = rows(
      TextAnalysis.removeDuplicatedSpansPositional(docs, "doc_id", "text", L = 8))
    assert(positional === rowLocal)
    // no-span docs pass through and the fully-duplicated doc scrubs to
    // the empty string in BOTH forms (the right-join resurrection case)
    assert(positional.exists(r => r._1 === 4L && r._2 === "" && r._3 === 16L))
    assert(positional.exists(r => r._1 === 3L && r._3 === 0L))
  }

  test("duplicatedSpans model check: 5 seeded random corpora equal a reference interval-union") {
    import spark.implicits._
    // Reference model in plain Scala: count L-gram strings corpus-wide,
    // mark positions whose gram repeats, union the [p, p+L) intervals
    // (adjacency merges) into maximal covered runs. The operator must
    // equal it EXACTLY on random corpora over a tiny vocab (dense
    // collisions — the regime where the old run-grouping overlapped).
    def refSpans(docs: Seq[(Long, String)], L: Int): Set[(Long, Long, Long)] = {
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
      val grams = toks.flatMap { case (id, ts) =>
        ts.sliding(L).filter(_.size == L).zipWithIndex
          .map { case (g, i) => (id, i, g.mkString(" ")) } }
      val counts = grams.groupBy(_._3).map { case (g, xs) => g -> xs.size }
      val marked = grams.filter(g => counts(g._3) >= 2).map(g => (g._1, g._2))
      marked.groupBy(_._1).flatMap { case (id, ps) =>
        val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
        for (p <- ps.map(_._2).sorted) {
          if (spans.nonEmpty && p <= spans.last._2) {
            val (s0, e0) = spans.last
            spans(spans.size - 1) = (s0, math.max(e0, p + L))
          } else spans += ((p, p + L))
        }
        spans.map { case (s0, e0) => (id, s0.toLong, (e0 - s0).toLong) }
      }.toSet
    }
    val rnd = new scala.util.Random(20260813L)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 5) {
      val docs = (1L to 30L).map(i =>
        i -> Seq.fill(rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = TextAnalysis.duplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", L = 3, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === refSpans(docs, 3), s"trial $trial diverged from the model")
      // structural guarantee: per doc, sorted spans are disjoint AND
      // non-adjacent (next start strictly past the previous end)
      got.groupBy(_._1).values.foreach { ss =>
        val sorted = ss.toSeq.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq((_, s1, l1), (_, s2, _)) =>
            assert(s2 > s1 + l1, s"overlapping/adjacent spans in trial $trial: $sorted")
          case _ => ()
        }
      }
      // enforcement count = total covered tokens = Σ span_len
      val removed = TextAnalysis.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", L = 3, minCount = 2)
        .agg(sum("n_removed")).head().getLong(0)
      assert(removed === got.toSeq.map(_._3).sum, s"trial $trial n_removed mismatch")
    }
  }

  test("contaminatedSpans model check: seeded random corpora equal the reference with a bench mark set") {
    import spark.implicits._
    // Same reference device as the duplicatedSpans model check, with the
    // mark set = the benchmark's distinct grams instead of corpus-wide
    // repeats — pins the shared coveredSpans merge through the second
    // entry point.
    def refSpans(corpus: Seq[(Long, String)], bench: Seq[(Long, String)],
        L: Int): Set[(Long, Long, Long)] = {
      def grams(docs: Seq[(Long, String)]) = docs.flatMap { case (id, t) =>
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
          .sliding(L).filter(_.size == L).zipWithIndex
          .map { case (g, i) => (id, i, g.mkString(" ")) } }
      val benchSet = grams(bench).map(_._3).toSet
      grams(corpus).filter(g => benchSet(g._3)).map(g => (g._1, g._2))
        .groupBy(_._1).flatMap { case (id, ps) =>
          val spans = scala.collection.mutable.ListBuffer[(Int, Int)]()
          for (p <- ps.map(_._2).sorted) {
            if (spans.nonEmpty && p <= spans.last._2) {
              val (s0, e0) = spans.last
              spans(spans.size - 1) = (s0, math.max(e0, p + L))
            } else spans += ((p, p + L))
          }
          spans.map { case (s0, e0) => (id, s0.toLong, (e0 - s0).toLong) }
        }.toSet
    }
    val rnd = new scala.util.Random(424242L)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    for (trial <- 1 to 3) {
      val corpus = (1L to 25L).map(i =>
        i -> Seq.fill(rnd.nextInt(26))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val bench = (100L to 104L).map(i =>
        i -> Seq.fill(5 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = TextAnalysis.contaminatedSpans(corpus.toDF("doc_id", "text"),
          bench.toDF("doc_id", "text"), "doc_id", "text", L = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === refSpans(corpus, bench, 3), s"trial $trial diverged from the model")
    }
  }

  test("contaminatedSpans: exact benchmark-overlap boundaries; clean docs absent") {
    import spark.implicits._
    val leak = (1 to 9).map(i => s"q$i").mkString(" ")       // 9-token eval leak
    val corpus = Seq(
      1L -> s"w1 w2 $leak w3 w4",                             // leak at tokens 2..10
      2L -> "all original tokens here nothing from the benchmark at all"
    ).toDF("doc_id", "text")
    val bench = Seq(10L -> s"intro words $leak outro").toDF("doc_id", "text")
    val spans = TextAnalysis.contaminatedSpans(corpus, bench, "doc_id", "text", L = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 8-grams of the 9-token leak occur in bench → positions 2..3 → span (2, 9)
    assert(spans === Set((1L, 2L, 9L)))
  }

  test("standalone column helpers equal profile's inlined formulas (drift guard)") {
    import spark.implicits._
    // profile() re-implements these formulas inline over ONCE-materialized
    // token arrays (the measured materialize-once plan shape — using the
    // standalone helpers there would re-split the text per metric, ~8
    // splits/row). The standalone single-column forms stay public API for
    // ad-hoc projections; this guard pins them column-equal to profile on
    // a shared frame so neither copy can drift silently.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        9000001L -> "",                            // empty
        9000002L -> "   ",                         // whitespace-only
        9000003L -> "...!!!,,,;;;:::???",          // punctuation soup
        9000004L -> "the the the the el el la de", // stopword/lang collision
        9000005L -> "der und ist die das le la et est une" // multi-lang tie
      ).toDF("doc_id", "text"))
    val viaHelpers = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).as("n_subwords"),
      length(col("text")).cast("long").as("n_chars"),
      TextAnalysis.meanWordLenBp(col("text")).as("mean_word_len_bp"),
      TextAnalysis.punctRatioBp(col("text")).as("punct_ratio_bp"),
      TextAnalysis.stopwordRatioBp(col("text")).as("stopword_ratio_bp"),
      TextAnalysis.qualityScoreBp(col("text")).as("quality_bp"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"),
      TextAnalysis.fingerprintBucket(col("text")).as("fp_bucket"))
    val viaProfile = TextAnalysis.profile(docs, "doc_id", "text")
    assert(viaProfile.columns.toSeq ===
      viaHelpers.columns.toSeq, "column sets must stay aligned")
    val diff = viaHelpers.exceptAll(viaProfile).count() +
      viaProfile.exceptAll(viaHelpers).count()
    assert(diff === 0L, "standalone helpers drifted from profile's inlined formulas")
  }

  test("postings materialization modes agree (local default vs lineage-backed persist)") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      i -> s"alpha beta gamma tok$i shared words alpha beta").toDF("doc_id", "text")
    def run(): Seq[(Long, Long, Long, Long)] =
      TextAnalysis.unigramSurprisal(docs, "doc_id", "text").orderBy("doc")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val viaLocal = run()                       // default mode: localCheckpoint
    spark.conf.set("spark.graft.postings.materialization", "persist")
    try {
      assert(run() === viaLocal, "persist mode diverged from localCheckpoint mode")
      spark.conf.set("spark.graft.postings.materialization", "bogus")
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains("spark.graft.postings.materialization"))
    } finally {
      spark.conf.unset("spark.graft.postings.materialization")
      spark.catalog.clearCache()
    }
  }

  test("packSequences: string ids shard by key hash, never into shard NULL") {
    import spark.implicits._
    // pmod(string_id, n) casts to null — before the type guard, EVERY row
    // landed in shard NULL and the parallel-shards contract collapsed to
    // one sequential stream. String keys must spread across real shards.
    val docs = (0 until 64).map(i => s"doc-$i" -> ("w " * 10).trim)
      .toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 32L, nShards = 8)
      .collect()
    assert(out.length === 64)
    val shards = out.map(_.getAs[Long]("shard"))
    assert(shards.forall(s => s >= 0 && s < 8), "shard out of range / null")
    assert(shards.distinct.length > 1, "string ids all fell into one shard")
    // deterministic: same keys → same shards on a re-run
    val again = TextAnalysis.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), capacity = 32L, nShards = 8)
      .collect().map(r => r.getAs[String]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(out.map(r => r.getAs[String]("doc_id") -> r.getAs[Long]("shard")).toMap === again)
  }

  test("gopherRules: each rule fails on exactly its crafted violator") {
    import spark.implicits._
    val good = "the quick brown fox jumps over a lazy dog and then it runs to the hill"
    val docs = Seq(
      0L -> good,                                                 // passes all
      1L -> "the and of to",                                      // < 10 words
      2L -> ("the of " + Seq.fill(20)("pneumonoultramicroscopics").mkString(" ")), // mean word len > 10
      3L -> ("the of " + Seq.fill(20)("12345").mkString(" ")),    // < 80% alpha words
      4L -> ("the of " + Seq.fill(10)("# tag #").mkString(" ")),  // symbol-heavy
      5L -> ((1 to 10).map(i => s"- item $i the of").mkString("\n")), // all bullet lines
      6L -> ((1 to 10).map(i => s"line $i the of...").mkString("\n")), // all ellipsis lines
      7L -> "purple monkey dishwasher banana keyboard elephant curtain window door floor" // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"), "good doc must pass every rule")
    val expect = Map(
      1L -> "r_word_count", 2L -> "r_mean_word_len", 3L -> "r_alpha_words",
      4L -> "r_symbol_ratio", 5L -> "r_bullet_lines", 6L -> "r_ellipsis_lines",
      7L -> "r_stopwords")
    expect.foreach { case (id, rule) =>
      assert(!out(id).getAs[Boolean](rule), s"doc $id must fail $rule")
      assert(!out(id).getAs[Boolean]("keep"), s"doc $id must be dropped")
    }
    // map-only at any scale: the verdict projection plans ZERO exchanges
    val plan = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRules must not shuffle:\n$plan")
  }

  test("unigram surprisal: hand-computed integer scores; rare tokens raise the mean") {
    // counts: a=3, b=1, c=1, T=5
    // surp_bp(a) = floor(ln(5/3)·1e4) = 5108; surp_bp(b) = surp_bp(c)
    //            = floor(ln(5)·1e4) = 16094
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("total_surprisal_bp"),
         r.getAs[Long]("mean_surprisal_bp"))).toMap
    assert(out(1L) === ((3L, 2 * 5108L + 16094L, (2 * 5108L + 16094L) / 3)))
    assert(out(2L) === ((2L, 5108L + 16094L, (5108L + 16094L) / 2)))
    assert(!out.contains(3L), "token-less docs are absent, not zero/null rows")
    // the doc leaning on rare tokens is more surprising per token
    assert(out(2L)._3 > out(1L)._3)
  }

  test("fuzzy contamination: identical doc scores 10000 bp, disjoint doc is absent, threshold filters") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),   // identical to bench 100
      (2L, "completely different words here now ok"), // disjoint
      (3L, "the quick brown fox sleeps all day long") // partial overlap
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over dogs")).toDF("doc_id", "text")
    val all = TextAnalysis.fuzzyContamination(corpus, bench,
        "doc_id", "text", n = 3, thresholdBp = 1L)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("jac_bp")).toMap
    assert(all(1L) === 10000L, "identical text must score exactly 10000 bp")
    assert(!all.contains(2L), "no shared shingle → no pair")
    // doc 3 shares 'the quick brown'+'quick brown fox' of its 6 vs bench 5:
    // jaccard = 2/(6+5-2) = 2222 bp
    assert(all(3L) === 2222L)
    val strict = TextAnalysis.fuzzyContamination(corpus, bench,
      "doc_id", "text", n = 3, thresholdBp = 5000L).collect()
    assert(strict.map(_.getAs[Long]("doc")).toSeq === Seq(1L))
  }

  test("fuzzy contamination freqCap sheds corpus-hot shingles; cold-shingle link survives") {
    // docs 2-5 share one boilerplate shingle also present in the bench
    // doc; doc 1 links to the bench only through a COLD shingle
    val corpus = Seq(
      (1L, "z z2 z3 cold a b"),
      (2L, "hot hot2 hot3"), (3L, "hot hot2 hot3"),
      (4L, "hot hot2 hot3"), (5L, "hot hot2 hot3")).toDF("doc_id", "text")
    val bench = Seq((100L, "cold a b hot hot2 hot3")).toDF("doc_id", "text")
    val uncapped = TextAnalysis.fuzzyContamination(corpus, bench,
        "doc_id", "text", n = 3, thresholdBp = 1L)
      .collect().map(_.getAs[Long]("doc")).toSet
    assert(uncapped === Set(1L, 2L, 3L, 4L, 5L))
    // cap 2 < the hot shingle's corpus frequency 4 → boilerplate pairs
    // shed, the cold link survives with its FULL-set-size jaccard
    val capped = TextAnalysis.fuzzyContamination(corpus, bench,
        "doc_id", "text", n = 3, thresholdBp = 1L, freqCap = 2L)
      .collect()
    assert(capped.map(_.getAs[Long]("doc")).toSeq === Seq(1L))
    // |shared|=1 ('cold a b'), sizes 4 and 4: 1/(4+4-1) = 1428 bp
    assert(capped.head.getAs[Long]("jac_bp") === 1428L)
  }

  test("keywords: tf-idf top-k with hand-computed integer scores and deterministic ties") {
    // N=3; df: apple=1 banana=1 cherry=1 shared=3
    // idf_bp(rare) = floor(ln(3)·1e4) = 10986; idf_bp(shared) = 0
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "cherry shared"),
      (3L, "shared")).toDF("doc_id", "text")
    val out = TextAnalysis.keywords(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Int]("rank"),
        r.getAs[String]("token"), r.getAs[Long]("score_bp")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    assert(out(1L) === Seq(("apple", 2 * 10986L), ("banana", 10986L), ("shared", 0L)))
    assert(out(2L) === Seq(("cherry", 10986L), ("shared", 0L)))
    assert(out(3L) === Seq(("shared", 0L)), "an everywhere-token still ranks, at score 0")
    // k caps rows per doc
    val k1 = TextAnalysis.keywords(docs, "doc_id", "text", k = 1).collect()
    assert(k1.length === 3 && k1.forall(_.getAs[Int]("rank") === 1))
  }

  test("selectTopPctByScore: exact ceil target, keep-ties at the cut, monotone in pct") {
    val df = Seq((1L, 10L), (2L, 9L), (3L, 9L), (4L, 8L), (5L, 5L), (6L, 1L))
      .toDF("id", "score_bp")
    val top50 = TextAnalysis.selectTopPctByScore(df, "score_bp", 50)
      .collect().map(_.getLong(0)).toSet
    assert(top50 === Set(1L, 2L, 3L))   // target = 3 → threshold = 9
    // ties AT the threshold all survive: target 1 but three rows at 9
    val ties = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 1L)).toDF("id", "score_bp")
    val top25 = TextAnalysis.selectTopPctByScore(ties, "score_bp", 25)
      .collect().map(_.getLong(0)).toSet
    assert(top25 === Set(1L, 2L, 3L))
    // pct=100 keeps everything; larger pct keeps a superset
    assert(TextAnalysis.selectTopPctByScore(df, "score_bp", 100).count() === 6)
    val top80 = TextAnalysis.selectTopPctByScore(df, "score_bp", 80)
      .collect().map(_.getLong(0)).toSet
    assert(top50.subsetOf(top80))
    // ceil rounding: 1 of 6 at 10% is ceil(0.6) = 1 row, not zero
    val top10 = TextAnalysis.selectTopPctByScore(df, "score_bp", 10)
      .collect().map(_.getLong(0)).toSet
    assert(top10 === Set(1L))
  }

  test("bigramSurprisal: hand-computed scores, BOS conditioning, token-less docs absent") {
    // corpus: "a b a b" + "a a" →
    //   c2: (<s>,a)=2 (a,b)=2 (b,a)=1 (a,a)=1; c1: <s>=2 a=3 b=1; V=2
    //   w(<s>,a)=floor(ln(4/3)·1e4)=2876  w(a,b)=floor(ln(5/3)·1e4)=5108
    //   w(b,a)=floor(ln(3/2)·1e4)=4054    w(a,a)=floor(ln(5/2)·1e4)=9162
    //   doc1 = 2876+2·5108+4054 = 17146, n=4, mean=4286
    //   doc2 = 2876+9162       = 12038, n=2, mean=6019
    val docs = Seq((1L, "a b a b"), (2L, "a a"), (3L, ""), (4L, "?!"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 4L, 17146L, 4286L), (2L, 2L, 12038L, 6019L)))
    // a single-token doc scores exactly its one BOS-conditioned event
    val solo = Seq((1L, "x"), (2L, "x y")).toDF("doc_id", "text")
    val soloGot = TextAnalysis.bigramSurprisal(solo, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // c2: (<s>,x)=2 (x,y)=1; c1: <s>=2 x=1; V=2
    // w(<s>,x)=floor(ln(4/3)·1e4)=2876; w(x,y)=floor(ln(3/2)·1e4)=4054
    assert(soloGot === Seq((1L, 1L, 2876L, 2876L), (2L, 2L, 6930L, 3465L)))
  }

  test("histogramQuantiles: type-1 sorted-rank reference equality incl. ties and edges") {
    def ref(vals: Seq[Long], qBp: Long): Long = {
      val s = vals.sorted
      s((((qBp * s.size + 9999) / 10000) - 1).toInt)
    }
    val rng = new scala.util.Random(5)
    val data = (0 until 3).flatMap { g =>
      (0 until 50 + g * 37).map(_ => (s"g$g", rng.nextInt(40).toLong))
    }
    val qs = Seq(100L, 2500L, 5000L, 9000L, 10000L)
    val got = TextAnalysis.histogramQuantiles(
        data.toDF("grp", "v"), "grp", "v", qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    for ((g, vals) <- byG; q <- qs)
      assert(got((g, q)) === ref(vals, q), s"($g, $q)")
    // q=10000 is the max; a constant column answers itself at every q
    assert(got(("g0", 10000L)) === byG("g0").max)
    val const = TextAnalysis.histogramQuantiles(
        Seq(("c", 7L), ("c", 7L), ("c", 7L)).toDF("grp", "v"), "grp", "v",
        Seq(1L, 5000L, 10000L))
      .collect().map(_.getLong(2))
    assert(const.forall(_ === 7L))
  }

  test("mixturePlan: waterfilling fixpoint reference equality, conservation, degenerate budgets") {
    // naive iterative waterfilling: re-solve lambda until the capped set
    // stabilizes (the textbook fixpoint the windowed scan must equal)
    def ref(inv: Seq[(String, Long)], wts: Map[String, Long], budget: Long)
        : Map[String, Long] = {
      val rows = inv.filter { case (s, a) => a > 0 && wts.contains(s) }
      var capped = Set.empty[String]
      var lam = 0.0
      var done = false
      while (!done) {
        val freeW = rows.filterNot(r => capped(r._1)).map(r => wts(r._1)).sum
        val usedT = rows.filter(r => capped(r._1)).map(_._2).sum
        lam = if (freeW == 0) Double.PositiveInfinity
              else (budget - usedT).toDouble / freeW
        val newly = rows.filterNot(r => capped(r._1))
          .filter { case (s, a) => a.toDouble / wts(s) < lam }.map(_._1)
        if (newly.isEmpty) done = true else capped ++= newly
      }
      rows.map { case (s, a) =>
        s -> (if (capped(s) || lam.isPosInfinity) a
              else math.floor(lam * wts(s)).toLong)
      }.toMap
    }
    def plan(inv: Seq[(String, Long)], wts: Map[String, Long], budget: Long) =
      TextAnalysis.mixturePlan(inv.toDF("src", "avail"), "src", "avail", wts, budget)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // hand fixture: heavy source caps, freed budget re-flows
    val inv = Seq("a" -> 100L, "b" -> 1000L, "c" -> 1000L)
    val wts = Map("a" -> 500L, "b" -> 100L, "c" -> 100L)
    val got = plan(inv, wts, 2000L)
    assert(got("a") === 100L) // wants 2000·5/7 ≈ 1428, capped at 100
    // remaining 1900 split evenly: floor(9.5 · 100)
    assert(got("b") === 950L && got("c") === 950L)
    assert(got === ref(inv, wts, 2000L))
    // random instances equal the fixpoint reference; conservation holds
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 8) {
      val n = 2 + rng.nextInt(8)
      val rInv = (0 until n).map(i => s"s$i" -> (1L + rng.nextInt(5000)))
      val rWts = (0 until n).map(i => s"s$i" -> (1L + rng.nextInt(400))).toMap
      val budget = 1L + rng.nextInt(12000)
      val p = plan(rInv, rWts, budget)
      assert(p === ref(rInv, rWts, budget))
      assert(p.values.sum <= budget || p.values.sum === rInv.map(_._2).sum)
      rInv.foreach { case (s, a) => assert(p(s) <= a) }
    }
    // budget beyond the whole inventory: everything caps at avail
    val over = plan(inv, wts, 10000000L)
    assert(over === inv.toMap)
    // zero budget: zero allocations (nothing caps, lambda = 0)
    assert(plan(inv, wts, 0L).values.forall(_ === 0L))
    // unweighted/empty sources are excluded from the plan
    val part = plan(Seq("a" -> 10L, "zz" -> 50L, "e" -> 0L), wts, 100L)
    assert(part.keySet === Set("a"))
  }

  test("knBigramSurprisal: equals a naive KN reference; per-context probabilities normalize") {
    // independent naive interpolated-KN implementation
    def ref(corpus: Seq[(Long, String)]): (Map[Long, (Long, Long, Long)],
        Map[String, Map[String, Double]]) = {
      def tok(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val events = corpus.flatMap { case (id, t) =>
        val w = tok(t)
        if (w.isEmpty) Nil
        else ("<s>" +: w.init).zip(w).map { case (p, tk) => (id, p, tk) }
      }
      val c2 = events.groupBy(e => (e._2, e._3)).view.mapValues(_.size.toLong).toMap
      val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val n1f = c2.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
      val n1b = c2.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
      val bt = c2.size.toLong
      def p(pr: String, t: String): Double =
        (c2((pr, t)) - 0.75) / c1(pr) +
          0.75 * n1f(pr) / c1(pr) * (n1b(t).toDouble / bt)
      val perDoc = events.groupBy(_._1).map { case (id, es) =>
        val total = es.map { case (_, pr, t) =>
          math.floor(-math.log(p(pr, t)) * 10000).toLong
        }.sum
        id -> (es.size.toLong, total,
          math.floor(total.toDouble / es.size).toLong)
      }
      val vocab = events.map(_._3).distinct
      val dists = (c1.keySet).map { pr =>
        pr -> vocab.map { t =>
          t -> (if (c2.contains((pr, t))) p(pr, t)
                else 0.75 * n1f(pr) / c1(pr) * (n1b(t).toDouble / bt))
        }.toMap
      }.toMap
      (perDoc, dists)
    }
    val rng = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val corpus = (0L until 40L).map(i =>
      (i, Seq.fill(3 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")))
    val (want, dists) = ref(corpus)
    val got = TextAnalysis.knBigramSurprisal(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === want)
    // interpolated KN is a proper distribution: Σ_t P(t|p) = 1 per context
    dists.foreach { case (pr, d) =>
      val s = d.values.sum
      assert(math.abs(s - 1.0) < 1e-9, s"context $pr sums to $s")
    }
    // BOS conditioning + empty/token-less docs absent (same contract as bigramSurprisal)
    val edge = Seq((1L, "x"), (2L, ""), (3L, "?!")).toDF("doc_id", "text")
    val ids = TextAnalysis.knBigramSurprisal(edge, "doc_id", "text")
      .select("doc").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("collocations: exclusive pairs rank top; support floor drops hapax pairs") {
    // "xq yq" always and only together (6x); "aa bb" frequent but both
    // tokens promiscuous; "zz ww" appears once (below the floor)
    val docs = (
      (1L to 6L).map(i => (i, "xq yq")) ++
      (7L to 12L).map(i => (i, "aa bb aa cc bb aa")) ++
      Seq((13L, "zz ww"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "doc_id", "text",
        minCount = 2L, k = 10)
      .select("a", "b").as[(String, String)].collect()
    assert(got.head === (("xq", "yq")))
    assert(!got.contains(("zz", "ww")))
  }

  test("knTrigramSurprisal: equals a naive order-3 interpolated-KN reference") {
    def ref(corpus: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
      def tok(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val events = corpus.flatMap { case (id, t) =>
        val w = tok(t)
        w.indices.map { i =>
          val p1 = if (i >= 1) w(i - 1) else "<s>"
          val p2 = if (i >= 2) w(i - 2) else "<s>"
          (id, p2, p1, w(i))
        }
      }
      val c3 = events.groupBy(e => (e._2, e._3, e._4))
        .view.mapValues(_.size.toLong).toMap
      val ctx3 = c3.groupBy(k => (k._1._1, k._1._2))
        .view.mapValues(m => (m.values.sum, m.size.toLong)).toMap
      val cont2 = c3.keySet.groupBy(k => (k._2, k._3))
        .view.mapValues(_.size.toLong).toMap
      val ctx2 = cont2.groupBy(_._1._1)
        .view.mapValues(m => (m.values.sum, m.size.toLong)).toMap
      val cont1 = cont2.keySet.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val t2 = cont2.size.toLong
      def p(p2: String, p1: String, t: String): Double = {
        val (c12, n3f) = ctx3((p2, p1))
        val (cp1, n2f) = ctx2(p1)
        val inner = (cont2((p1, t)) - 0.75) / cp1 +
          0.75 * n2f / cp1 * (cont1(t).toDouble / t2)
        (c3((p2, p1, t)) - 0.75) / c12 + 0.75 * n3f / c12 * inner
      }
      events.groupBy(_._1).map { case (id, es) =>
        val total = es.map { case (_, a, b, c) =>
          math.floor(-math.log(p(a, b, c)) * 10000).toLong
        }.sum
        id -> ((es.size.toLong, total,
          math.floor(total.toDouble / es.size).toLong))
      }
    }
    val rng = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val corpus = (0L until 30L).map(i =>
      (i, Seq.fill(1 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
        .mkString(" ")))  // length-1 docs exercise the <s> <s> padding
    val want = ref(corpus)
    val got = TextAnalysis.knTrigramSurprisal(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === want)
  }

  test("tokenBudgetSample: equals the global-prefix-sum reference on random corpora; boundary and degenerate budgets") {
    def md5p(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 4)
    def ref(docs: Seq[(Long, String)], budget: Long): Set[Long] = {
      def nTok(t: String) = t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong
      var cum = 0L
      docs.map { case (id, t) => (md5p(id.toString), id, nTok(t)) }
        .sortBy(x => (x._1, x._2))
        .flatMap { case (_, id, n) => cum += n; if (cum <= budget) Some(id) else None }
        .toSet
    }
    val rng = new scala.util.Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (1L to 60L).map { id =>
      (id, (0 until rng.nextInt(8)).map(_ => vocab(rng.nextInt(4))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (budget <- Seq(0L, 7L, 40L, 100L, 100000L)) {
      val got = TextAnalysis.tokenBudgetSample(df, "doc_id", "text", budget)
        .select("doc").as[Long].collect().toSet
      assert(got === ref(docs, budget), s"budget $budget diverged")
    }
    // the whole corpus fits → everything kept, n_tok faithful
    val all = TextAnalysis.tokenBudgetSample(df, "doc_id", "text", 100000L)
      .as[(Long, Long)].collect().toMap
    assert(all.keySet === docs.map(_._1).toSet)
    assert(all.values.sum ===
      docs.map(_._2.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong).sum)
  }

  test("scoreTertiles: exact thirds on a 9-row ladder; ties never split a bucket; degenerate all-equal") {
    val ladder = (1L to 9L).map(i => (i, i * 100L)).toDF("id", "s")
    val got = TextAnalysis.scoreTertiles(ladder, "s")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 3L).forall(got(_) == "head"))
    assert((4L to 6L).forall(got(_) == "middle"))
    assert((7L to 9L).forall(got(_) == "tail"))
    // a tie run crossing BOTH cut targets collapses into the lower
    // bucket: scores [1,1,1,1,9] → t1 = t2 = 1 → middle is empty
    val ties = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 9L))
      .toDF("id", "s")
    val tied = TextAnalysis.scoreTertiles(ties, "s")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert((1L to 4L).forall(tied(_) == "head"))
    assert(tied(5L) === "tail")
    // all-equal scores: one bucket, nothing arbitrary
    val flat = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("id", "s")
    val flatGot = TextAnalysis.scoreTertiles(flat, "s")
      .select("bucket").as[String].collect().toSet
    assert(flatGot === Set("head"))
  }

  test("leak-free split: no duplicate group straddles splits; unique docs match plain hashSplit") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "ALPHA   beta gamma"),  // dups (normalized)
      (3L, "delta epsilon"), (4L, "zeta eta theta"),
      (5L, "delta epsilon")                                   // dup of 3
    ).toDF("doc_id", "text")
    val w = Window.partitionBy(md5(Dedup.normText(col("text"))))
    val out = TextAnalysis.hashSplit(
        corpus.withColumn("canon", min(col("doc_id")).over(w)), "canon")
      .select("doc_id", "canon", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every member of a dup group carries the group's split
    val byCanon = out.groupBy(_._2)
    byCanon.foreach { case (c, rows) =>
      assert(rows.map(_._3).toSet.size === 1, s"group $c straddles splits")
    }
    assert(out.find(_._1 == 1L).get._3 === out.find(_._1 == 2L).get._3)
    assert(out.find(_._1 == 3L).get._3 === out.find(_._1 == 5L).get._3)
    // a unique doc's canon is itself -> identical to the plain split
    val plain = TextAnalysis.hashSplit(corpus.filter(col("doc_id") === 4L)
      .select("doc_id"), "doc_id").collect().head.getString(1)
    assert(out.find(_._1 == 4L).get._3 === plain)
  }

  test("curriculum: positions are a permutation, phases monotone, within-phase md5 order") {
    val q = PipelineQueries.all("q_curriculum")(spark, "/root/testdata/sf0.001")
    val rows = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val n = rows.length
    assert(rows.map(_._1).toSet === (1L to n.toLong).toSet, "pos not a permutation")
    // phases never decrease along the curriculum
    rows.sortBy(_._1).map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ => ()
    }
    // each phase is a contiguous block of ~a third
    val sizes = rows.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.keySet === Set(0, 1, 2))
    sizes.values.foreach(s => assert(s >= n / 5, s"degenerate phase size $s"))
    // within a phase the order is md5(doc), not doc id (shuffled)
    def md5p(x: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.toString.getBytes).map("%02x".format(_)).mkString
    val p0 = rows.filter(_._3 == 0).sortBy(_._1).map(_._2)
    assert(p0 === p0.sortBy(x => (md5p(x), x)), "within-phase order is not md5")
    assert(p0 !== p0.sorted, "suspiciously id-ordered phase")
  }

  test("readability: hand-computed Flesch components; sentence floor; token-less docs absent") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),   // 6 words, 2 sentences
      (2L, "xyz qqq"),                     // no vowels: 1 syllable each
      (3L, "beautiful onomatopoeia"),      // rich vowel groups
      (4L, "...!!!")                       // no tokens: dropped
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(!r.contains(4L))
    // doc1: the/cat/sat/the/dog/ran -> 6 words, 2 sentences, 6 vowel
    // groups (one per word); flesch = 206835 - 1015*6/2 - 84600*6/6
    assert(r(1L) === ((6L, 2L, 6L, 206835L - 3045L - 84600L)))
    // doc2: zero vowel groups, floor 1 per token -> 2 syllables
    assert(r(2L)._1 === 2L); assert(r(2L)._2 === 1L); assert(r(2L)._3 === 2L)
    // doc3: beau-ti-ful (3 groups: eau, i, u) + o-o-a-o-oeia (5 groups)
    assert(r(3L)._3 === 8L)
  }

  test("rake: phrase runs split at stopwords; deg/freq scores hand-checked") {
    // stoplist contains "the"/"of": "red apple" and "red tree" are the
    // candidate runs; "red" occurs twice (deg 2+2), "apple"/"tree" once
    val docs = Seq(
      (1L, "the red apple of the red tree"),
      (2L, "the apple")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.rakeKeywords(docs, "doc_id", "text", k = 10)
      .collect().map(x =>
        x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // word scores: red deg=4 freq=2 -> 20000; apple deg=3 freq=2 -> 15000;
    // tree deg=2 freq=1 -> 20000
    assert(r("red apple") === ((2L, 1L, 35000L)))
    assert(r("red tree") === ((2L, 1L, 40000L)))
    assert(r("apple") === ((1L, 1L, 15000L)))
    // ranking: scores descend, ties on phrase text ascend
    val ordered = TextAnalysis.rakeKeywords(docs, "doc_id", "text", k = 10)
      .collect().map(x => (x.getLong(3), x.getString(0)))
    assert(ordered === ordered.sortBy { case (s, p) => (-s, p) })
  }

  test("hashFeatures: signed sums cancel collisions deterministically; zero slots dropped") {
    val docs = Seq((1L, "alpha alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val r = TextAnalysis.hashFeatures(docs, "doc_id", "text", buckets = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    // reference hash: same md5 device computed independently
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    def bucket(w: String) = java.lang.Long.parseLong(md5hex(w).take(8), 16) % 64
    def sign(w: String) =
      if (Integer.parseInt(md5hex(w).charAt(8).toString, 16) % 2 == 0) 1L else -1L
    val ba = bucket("alpha"); val bb = bucket("beta")
    if (ba != bb) {
      assert(r((1L, ba)) === 2L * sign("alpha"))
      assert(r((1L, bb)) === sign("beta"))
    }
    assert(r((2L, ba)) === sign("alpha"))
    // doc-level totals conserve the signed token mass
    val total = TextAnalysis.hashFeatures(docs, "doc_id", "text", 64)
      .groupBy().agg(sum("w")).head().getLong(0)
    assert(total === 3L * sign("alpha") + sign("beta"))
  }

  test("langid: trigram profiles separate planted languages; short/no-hit docs → und; ties break lang-ASC") {
    // two synthetic languages with disjoint trigram inventories
    val train = Seq(
      ("aa", "the cat and the dog and the fox"),
      ("aa", "the end of the land and the sand"),
      ("bb", "zyx wvu zyx wvu qpo zyx"),
      ("bb", "wvu qpo zyx qpo wvu qpo")).toDF("lang", "text")
    val profiles = TextAnalysis.trigramProfiles(train, "lang", "text", k = 16)
    // ≤ k rows per language, weights descend from k with rank
    val pCount = profiles.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pCount.values.forall(_ <= 16L))
    assert(profiles.agg(max("w")).head().getLong(0) === 16L)
    val docs = Seq(
      (1L, "the cat and the fox ran to the sand"), // aa-shaped
      (2L, "qpo zyx wvu zyx"),                     // bb-shaped
      (3L, "zz"),                                  // sub-trigram → und
      (4L, "#### !!!! ****")                       // no profile hits → und
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langidByProfiles(docs, "doc_id", "text", profiles)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L)._1 === "aa" && got(1L)._2 > 0L)
    assert(got(2L)._1 === "bb" && got(2L)._2 > 0L)
    assert(got(3L) === ("und", 0L))
    assert(got(4L) === ("und", 0L))
    // deterministic tie: equal scores resolve to the lexicographically
    // smallest language
    val tied = Seq(("aa", "xq z"), ("bb", "xq z")).toDF("lang", "text")
    val tp = TextAnalysis.trigramProfiles(tied, "lang", "text", k = 4)
    val t = TextAnalysis.langidByProfiles(Seq((9L, "xq ")).toDF("doc_id", "text"),
      "doc_id", "text", tp).head()
    assert(t.getString(1) === "aa")
    // charTrigrams: the sub-3-char guard (sequence(1, 0) would DESCEND)
    val tg = Seq(("ab"), ("abcd")).toDF("t")
      .select(size(TextAnalysis.charTrigrams(col("t"))).as("n"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(tg === Seq(0, 2))
  }

  test("duplicatedSpansEval: no reported spans → NULL precision (zero-division guard)") {
    // a corpus with no repeated L-grams reports zero spans; precision is
    // UNDEFINED there, not 0 and not a crash — NULL on both engines
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.duplicatedSpansEval(docs, "doc_id", "text", L = 8).head()
    assert(r.getAs[Long]("n_spans") === 0L)
    assert(r.getAs[Long]("n_verified") === 0L)
    assert(r.isNullAt(r.fieldIndex("precision_bp")))
  }

  test("Guard.domainBounded: over-bound frames fail the JOB loudly; in-bound pass through") {
    import graft.operators.Guard
    // in-bound: rows pass through unchanged
    val small = spark.range(0, 100).toDF("v")
    assert(Guard.domainBounded(small, "t", maxRows = 100L).count() === 100L)
    // over-bound: the job fails with the device name and the fix, not a
    // silent single-task corpus serialization
    val ex = intercept[Exception] {
      Guard.domainBounded(small, "testdev", maxRows = 99L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("testdev") &&
      m.contains("bucket the domain first")), s"unexpected error: $ex")
    // and through a REAL device: a continuous-domain misuse of the
    // histogram-quantile family must fail loudly at the default bound
    val continuous = spark.range(0, Guard.MaxFrameRows + 1)
      .select(lit("g").as("g"), col("id").as("v"))
    val ex2 = intercept[Exception] {
      TextAnalysis.histogramQuantiles(continuous, "g", "v", Seq(5000L))
        .collect()
    }
    assert(msgs(ex2).exists(m => m != null && m.contains("histogramQuantiles")),
      s"unexpected error: $ex2")
  }
}
