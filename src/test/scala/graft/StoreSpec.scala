package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Store

class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("partitioned store prunes to one target at the scan") {
    val dir = tmp("store")
    val df = Seq(
      ("sub_a", "t3_1", 10L), ("sub_a", "t3_2", 20L),
      ("sub_b", "t3_3", 30L)).toDF("target", "idstr", "score")
    Store.writePartitioned(df, dir)
    val one = Store.readTarget(spark, dir, "sub_a")
    assert(one.count() === 2)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("target"),
      s"expected partition pruning in:\n$plan")
    // the pruned scan must not list sub_b's directory
    val scanned = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("sub_b"))
  }

  test("S8 single-file listing and JSON sinks") {
    import graft.sources.Sinks
    val d1 = tmp("listing")
    Sinks.writeListing(Seq("line one", "line two").toDF("line"), "line", s"$d1/out")
    val lines = spark.read.text(s"$d1/out").collect().map(_.getString(0)).toSet
    assert(lines === Set("line one", "line two"))
    Sinks.writeJson(Seq((1L, "a")).toDF("n", "s"), s"$d1/json")
    val back = spark.read.json(s"$d1/json").collect()
    assert(back.length === 1 && back.head.getAs[String]("s") === "a")
  }

  test("q_bucketed_join driver query: join side has zero hash exchanges, rows match a plain join") {
    val q = TimesearchQueries.all("q_bucketed_join")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    // the only exchange allowed is the final ORDER BY's range partitioning —
    // the join itself must ride the co-located buckets
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed driver join must not hash-exchange:\n$plan")
    val rows = q.collect()
    val expected = spark.table("graft_bucket_old")
      .join(spark.table("graft_bucket_new"), "idstr").count()
    assert(rows.length.toLong === expected && rows.nonEmpty)
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    val wh = tmp("wh") // explicit per-table paths; warehouse.dir is static
    val left = (1L to 1000L).map(i => (i, s"body$i")).toDF("idint", "body")
    val right = (500L to 1500L).map(i => (i, i * 2)).toDF("idint", "score")
    Store.writeBucketed(left, "bk_left", s"$wh/bk_left", "idint", 8)
    Store.writeBucketed(right, "bk_right", s"$wh/bk_right", "idint", 8)
    val joined = spark.table("bk_left").join(spark.table("bk_right"), "idint")
    assert(joined.count() === 501)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join in:\n$plan")
  }

  test("ZOrder: interleave matches reference bit-twiddling; writeZOrdered tightens per-file bounding boxes") {
    import graft.sources.ZOrder
    import org.apache.spark.sql.functions._
    // reference interleave on random bucket pairs
    def refInterleave(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { k =>
        (((a >> k) & 1L) << (2 * k + 1)) | (((b >> k) & 1L) << (2 * k))
      }.sum
    val rng = new scala.util.Random(3)
    val pairs = Seq.fill(64)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pairs.map { case (a, b) => refInterleave(a, b, 8) })
    // bucket edges: min -> 0; max lands in the top bucket for wide ranges
    val edges = Seq(0L, 999L).toDF("v")
      .select(ZOrder.bucketOf(col("v"), 0L, 999L, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(edges === Seq(0L, 255L))
    // layout: two independent uniform dims; z-order vs second-dim-blind sort
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, (i * 48271 % 1009).toLong, (i * 16807 % 1013).toLong)
    }.toDF("id", "x", "y")
    def meanSpread(path: String, c: String, range: Double): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .collect().map(_.getLong(1).toDouble / range)
      perFile.sum / perFile.length
    }
    val zPath = java.nio.file.Files.createTempDirectory("graft_z").toString
    ZOrder.writeZOrdered(data, "x", "y", zPath, numFiles = 16)
    val linPath = java.nio.file.Files.createTempDirectory("graft_lin").toString
    data.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)
    val (zx, zy) = (meanSpread(zPath, "x", 1009), meanSpread(zPath, "y", 1013))
    val liny = meanSpread(linPath, "y", 1013)
    // x-sorted layout is blind on y: every file spans ~the full y range;
    // z-order gives BOTH dims materially tighter boxes
    assert(liny > 0.8, s"x-sorted layout unexpectedly tight on y: $liny")
    assert(zy < 0.62 && zx < 0.62,
      s"z-order boxes not tight: x=$zx y=$zy (linear y=$liny)")
  }

  test("ZOrder n-column: 3-dim boxes tighten on EVERY dim; zone map prunes on the third column; n=2 reproduces the classic interleave") {
    import graft.sources.{ZOrder, ZoneMap}
    import org.apache.spark.sql.functions._
    // the generalized layout at n = 2 IS the classic (2k+1, 2k)
    // interleave — one definition, every arity
    def refInterleave(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map { k =>
        (((a >> k) & 1L) << (2 * k + 1)) | (((b >> k) & 1L) << (2 * k))
      }.sum
    val got2 = Seq((170L, 85L), (255L, 0L), (3L, 200L)).toDF("a", "b")
      .select(ZOrder.interleaveN(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got2 === Seq((170L, 85L), (255L, 0L), (3L, 200L))
      .map { case (a, b) => refInterleave(a, b, 8) })
    // driver-side reference of the 3-way layout: col i bit k at 3k+(2-i)
    def ref3(a: Long, b: Long, c: Long, bits: Int): Long =
      (0 until bits).map { k =>
        (((a >> k) & 1L) << (3 * k + 2)) | (((b >> k) & 1L) << (3 * k + 1)) |
          (((c >> k) & 1L) << (3 * k))
      }.sum
    val got3 = Seq((5L, 6L, 7L), (255L, 0L, 128L)).toDF("a", "b", "c")
      .select(ZOrder.interleaveN(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got3 === Seq((5L, 6L, 7L), (255L, 0L, 128L))
      .map { case (a, b, c) => ref3(a, b, c, 8) })
    // arity/width guards: < 2 dims and > 62 result bits refuse
    intercept[IllegalArgumentException](ZOrder.interleaveN(Seq(col("a")), 8))
    intercept[IllegalArgumentException](
      ZOrder.interleaveSqlN(Seq("a", "b", "c"), 21))
    // layout: three independent uniform dims; the 3-way curve tightens
    // ALL of them vs an x-sorted layout that is blind on y and z
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, (i * 48271 % 1009).toLong, (i * 16807 % 1013).toLong,
        (i * 69621 % 1019).toLong)
    }.toDF("id", "x", "y", "z")
    def meanSpread(path: String, c: String, range: Double): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .collect().map(_.getLong(1).toDouble / range)
      perFile.sum / perFile.length
    }
    val zPath = tmp("graft_z3")
    ZOrder.writeZOrderedN(data, Seq("x", "y", "z"), zPath, numFiles = 27)
    val linPath = tmp("graft_z3lin")
    data.repartitionByRange(27, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)
    val (sx, sy, sz) = (meanSpread(zPath, "x", 1009),
      meanSpread(zPath, "y", 1013), meanSpread(zPath, "z", 1019))
    assert(meanSpread(linPath, "z", 1019) > 0.8,
      "x-sorted layout unexpectedly tight on z")
    assert(sx < 0.75 && sy < 0.75 && sz < 0.75,
      s"3-dim z-order boxes not tight: x=$sx y=$sy z=$sz")
    // the THIRD column prunes through the sidecar like the first two
    ZoneMap.build(spark, zPath, Seq("x", "y", "z"))
    val total = spark.read.parquet(zPath).inputFiles.length
    for (c <- Seq("x", "y", "z")) {
      val pruned = ZoneMap.scanRange(spark, zPath, c, 100L, 220L)
      assert(pruned.inputFiles.length < total,
        s"$c: no files skipped (${pruned.inputFiles.length} of $total)")
      val want = spark.read.parquet(zPath)
        .filter(col(c).between(100L, 220L))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === want,
        s"$c: pruning changed the result")
    }
  }

  test("zone maps: z-ordered layout prunes FILES on both dimensions; results unchanged") {
    import graft.sources.{ZOrder, ZoneMap}
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, (i * 48271 % 1009).toLong, (i * 16807 % 1013).toLong)
    }.toDF("id", "x", "y")
    val path = tmp("graft_zm")
    ZOrder.writeZOrdered(data, "x", "y", path, numFiles = 16)
    ZoneMap.build(spark, path, Seq("x", "y"))
    val total = spark.read.parquet(path).inputFiles.length
    assert(total === 16)
    // a selective range on EITHER interleaved dimension must skip files
    // — the z-order bounding boxes finally paying off at read time
    for (c <- Seq("x", "y")) {
      val pruned = ZoneMap.scanRange(spark, path, c, 100L, 250L)
      val read = pruned.inputFiles.length
      assert(read < total, s"$c: no files skipped ($read of $total)")
      val want = spark.read.parquet(path)
        .filter(col(c) >= 100L && col(c) <= 250L)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === want,
        s"$c: pruning changed the result")
    }
    // empty-range fast path keeps the schema
    val none = ZoneMap.scanRange(spark, path, "x", 5000L, 6000L)
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "x", "y"))
  }

  test("zone maps are advisory: missing/partial sidecar keeps every file, never wrong rows") {
    import graft.sources.{ZOrder, ZoneMap}
    val data = (0 until 1000).map(i => (i.toLong, (i % 97).toLong))
      .toDF("id", "v")
    val path = tmp("graft_zm2")
    ZOrder.writeZOrdered(data, "v", "id", path, numFiles = 8)
    // no sidecar at all: scanRange = plain filtered scan of every file
    val noMap = ZoneMap.scanRange(spark, path, "v", 10L, 20L)
    assert(noMap.inputFiles.length === 8)
    assert(noMap.count() ===
      spark.read.parquet(path).filter(col("v").between(10L, 20L)).count())
    // a sidecar covering a DIFFERENT column prunes nothing for this one
    ZoneMap.build(spark, path, Seq("id"))
    assert(ZoneMap.scanRange(spark, path, "v", 10L, 20L).inputFiles.length === 8)
    // string stats: UTF-8 byte-order comparison drives the pruning
    val sPath = tmp("graft_zm3")
    (0 until 260).map(i => (i.toLong, f"k$i%03d"))
      .toDF("id", "k")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(sPath)
    ZoneMap.build(spark, sPath, Seq("k"))
    val sPruned = ZoneMap.scanRangeString(spark, sPath, "k", "k010", "k049")
    assert(sPruned.inputFiles.length < 8, "string range skipped nothing")
    assert(sPruned.count() === 40)
  }

  test("zone maps via Catalyst: pushed predicates prune files with no explicit bounds") {
    import graft.sources.{ZOrder, ZoneMap}
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, (i * 48271 % 1009).toLong, (i * 16807 % 1013).toLong)
    }.toDF("id", "x", "y")
    val path = tmp("graft_zma")
    ZOrder.writeZOrdered(data, "x", "y", path, numFiles = 16)
    ZoneMap.build(spark, path, Seq("x", "y"))
    val (df, index) = ZoneMap.scanAuto(spark, path)
    // a PLAIN .filter — no scanRange, no bounds plumbing — skips files
    // because the pushed conjuncts reach the FileIndex at planning time
    val got = df.filter(col("x") >= 100L && col("x") <= 250L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(index.lastListed === 16, s"listed ${index.lastListed}")
    assert(index.lastKept < index.lastListed,
      s"no files skipped (${index.lastKept} of ${index.lastListed})")
    val want = spark.read.parquet(path)
      .filter(col("x") >= 100L && col("x") <= 250L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === want, "Catalyst pruning changed the result")
    // BOTH z-order dims prune through the same frame; equality + IN too
    val keptY = { df.filter(col("y") === 7L).count(); index.lastKept }
    assert(keptY < 16, s"equality on y skipped nothing ($keptY)")
    val keptIn = { df.filter(col("y").isin(3L, 7L, 11L)).count(); index.lastKept }
    assert(keptIn < 16, s"IN on y skipped nothing ($keptIn)")
    assert(df.filter(col("y").isin(3L, 7L, 11L)).count() ===
      spark.read.parquet(path).filter(col("y").isin(3L, 7L, 11L)).count())
    // an UNsupported predicate shape (function of the column) prunes
    // nothing and still answers correctly — conservative by design
    val keptFn = { df.filter(col("x") % 2L === 0L).count(); index.lastKept }
    assert(keptFn === 16, s"unsupported shape pruned ($keptFn) — unsound")
    assert(df.filter(col("x") % 2L === 0L).count() ===
      spark.read.parquet(path).filter(col("x") % 2L === 0L).count())
    // empty intersection: zero files planned, zero rows, schema intact
    val empty = df.filter(col("x") > 5000L)
    assert(empty.count() === 0 && index.lastKept === 0)
    assert(empty.columns.toSeq === Seq("id", "x", "y"))
    // no sidecar: scanAuto behaves exactly like a plain read
    val bare = tmp("graft_zmb")
    data.repartition(4).write.mode("overwrite").parquet(bare)
    val (df2, idx2) = ZoneMap.scanAuto(spark, bare)
    assert(df2.filter(col("x") <= 10L).count() ===
      spark.read.parquet(bare).filter(col("x") <= 10L).count())
    assert(idx2.lastKept === idx2.lastListed)
  }

  test("bloom sidecar: point/IN lookups skip files min/max cannot; keeps are conservative") {
    import graft.sources.ZoneMap
    // layout clustered by x; id is high-cardinality and UNclustered, so
    // every file's [min, max] for id straddles any probe value — the
    // zone map keeps all 16 files and only the bloom words can prune
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i * 48271 % 1009).toLong)
    }.toDF("id", "x", "v")
    val path = tmp("graft_bloom")
    data.repartition(16, col("x")).write.mode("overwrite").parquet(path)
    ZoneMap.build(spark, path, Seq("id", "x"))
    ZoneMap.buildBloom(spark, path, Seq("id"), mBits = 8192, k = 3)
    val (df, index) = ZoneMap.scanAuto(spark, path)
    // point lookup: id 1234 lives in exactly one file (id ≡ x layout:
    // file of x = 1234 % 16); min/max keeps everything, bloom must not
    val gotEq = df.filter(col("id") === 1234L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val listed = index.lastListed
    assert(listed > 2, s"layout degenerate: $listed files")
    assert(index.lastKept < listed,
      s"bloom skipped nothing (${index.lastKept} of $listed)")
    assert(gotEq === Seq((1234L, 2L, 1234L * 48271 % 1009)))
    // IN probe: union semantics — a file survives if ANY value might hit
    val gotIn = df.filter(col("id").isin(7L, 1234L)).count()
    assert(gotIn === 2L)
    assert(index.lastKept < listed, "IN probe skipped nothing")
    // a value NOT in the table: false-positive keeps are allowed — only
    // the RESULT is contractual
    assert(df.filter(col("id") === 999999L).count() === 0L)
    // range predicates never consult the bloom (zone map's job): every
    // file keeps (id min/max straddles) and the result is exact
    val gotRange = df.filter(col("id") >= 100L && col("id") <= 104L).count()
    assert(gotRange === 5L && index.lastKept === listed)
    // a column without bloom rows keeps every file
    assert(df.filter(col("v") === 7L).count() ===
      spark.read.parquet(path).filter(col("v") === 7L).count())
  }

  test("zone-map constraint extraction: shapes, operand order, conservatism") {
    import graft.sources.ZoneMap
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val a = AttributeReference("x", LongType)()
    val s = AttributeReference("k", StringType)()
    def c1(e: Expression) = ZoneMap.constraintsOf(Seq(e))
    assert(c1(EqualTo(a, Literal(5L))) ===
      Seq(ZoneMap.Constraint("x", "=", Seq("5"), "long")))
    // reversed operands normalize: 5 > x  ≡  x < 5
    assert(c1(GreaterThan(Literal(5L), a)) ===
      Seq(ZoneMap.Constraint("x", "<", Seq("5"), "long")))
    assert(c1(LessThanOrEqual(Literal(5L), a)) ===
      Seq(ZoneMap.Constraint("x", ">=", Seq("5"), "long")))
    // nested And splits; int literal against long attr is still "long"
    assert(c1(And(GreaterThanOrEqual(a, Literal(1)), LessThan(a, Literal(9))))
      .map(_.op) === Seq(">=", "<"))
    // strings ride as string-typed constraints
    assert(c1(EqualTo(s, Literal("k07"))) ===
      Seq(ZoneMap.Constraint("k", "=", Seq("k07"), "string")))
    // conservative: casts, disjunctions, functions, null literals → none
    assert(c1(EqualTo(Cast(a, IntegerType), Literal(5))).isEmpty)
    assert(c1(Or(EqualTo(a, Literal(1L)), EqualTo(a, Literal(2L)))).isEmpty)
    assert(c1(EqualTo(Literal(null, LongType), a)).isEmpty)
    // satisfiability: bounds semantics on both types
    val st = ZoneMap.Stat("f", "x", "long", hasBounds = true, "10", "20")
    def ok(op: String, v: String) =
      ZoneMap.fileSurvives(Map("x" -> st),
        Seq(ZoneMap.Constraint("x", op, Seq(v), "long")))
    assert(ok("=", "15") && !ok("=", "25") && !ok("=", "5"))
    assert(ok(">", "19") && !ok(">", "20") && ok(">=", "20") && !ok(">=", "21"))
    assert(ok("<", "11") && !ok("<", "10") && ok("<=", "10") && !ok("<=", "9"))
    assert(ZoneMap.fileSurvives(Map("x" -> st),
      Seq(ZoneMap.Constraint("x", "in", Seq("3", "12"), "long"))))
    assert(!ZoneMap.fileSurvives(Map("x" -> st),
      Seq(ZoneMap.Constraint("x", "in", Seq("3", "42"), "long"))))
    // type-mismatched constraint never prunes; uncovered column keeps
    assert(ZoneMap.fileSurvives(Map("x" -> st),
      Seq(ZoneMap.Constraint("x", "=", Seq("zzz"), "string"))))
    assert(ZoneMap.fileSurvives(Map("x" -> st),
      Seq(ZoneMap.Constraint("other", "=", Seq("99"), "long"))))
    // boundless stat (all-null file) always survives
    val nb = ZoneMap.Stat("f", "x", "long", hasBounds = false, "", "")
    assert(ZoneMap.fileSurvives(Map("x" -> nb),
      Seq(ZoneMap.Constraint("x", "=", Seq("99"), "long"))))
  }

  test("OPTIMIZE ZORDER on the versioned store: boxes tighten, 2-dim predicates skip files") {
    import graft.operators.Merge
    import graft.streaming.Livestream
    // created and score scatter independently of the merge-order layout
    // (decorrelated multiplicative scans of 0..511)
    val rows = (0 until 512).map { i =>
      C(i.toLong, s"t1_$i", (i * 193L) % 512, s"u$i", "p", "s", s"b$i",
        (i * 37L) % 512, "sub", null, 2L)
    }
    val dir = tmp("zopt")
    val table = new Livestream.UpsertTable(spark, dir, Merge.comments,
      Seq.empty[C].toDF(), outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 4)))
    table.seed(rows.toDF())
    table.refreshZoneMap(Seq("created", "score"))
    def avgWidth(c: String): Double = {
      val ss = graft.sources.ZoneMap.read(dir)
        .filter(s => s.col == c && s.hasBounds)
      ss.map(s => (s.mx.toLong - s.mn.toLong).toDouble).sum / ss.size
    }
    val pred = col("created").between(10L, 80L) &&
      col("score").between(10L, 80L)
    val (df0, idx0) = table.scanAuto()
    val want = df0.filter(pred).collect()
      .map(_.getAs[Long]("idint")).sorted.toSeq
    // pre-optimize: the hash-bucket merge-order layout scatters both
    // dims, every file straddles the box — the sidecar prunes nothing
    assert(idx0.lastKept === idx0.lastListed,
      s"pre-optimize already pruned (${idx0.lastKept}/${idx0.lastListed})")
    val w0 = avgWidth("created")
    table.optimize(maxFiles = 4, zorderBy = Some(("created", "score")))
    val (df1, idx1) = table.scanAuto()
    val got = df1.filter(pred).collect()
      .map(_.getAs[Long]("idint")).sorted.toSeq
    assert(got === want, "ZORDER compaction changed the data")
    assert(idx1.lastKept < idx1.lastListed,
      s"post-optimize 2-dim predicate skipped nothing " +
        s"(${idx1.lastKept}/${idx1.lastListed})")
    // per-file bounding boxes tightened on the z-dims
    assert(avgWidth("created") < w0,
      s"boxes did not tighten: $w0 -> ${avgWidth("created")}")
    // bucket boundaries stayed put: a key-pruned merge still lands in
    // one leaf and serves the edited row
    table.merge(Seq(C(21L, "t1_21", (21L * 193) % 512, "u21", "p", "s",
        "edited", 999L, "sub", null, 6L)).toDF()
      .withColumn("_seq", lit(0L)), "_seq", storeEdits = Some(false))
    assert(table.current.filter(col("idstr") === "t1_21")
      .head().getAs[String]("body") === "edited")
  }

  test("OPTIMIZE ZORDER at arity 3 (zorderByCols): data unchanged, the THIRD dimension prunes too") {
    import graft.operators.Merge
    import graft.streaming.Livestream
    // three decorrelated multiplicative scans of 0..511 — created,
    // score, AND textlen scatter independently of merge order
    val rows = (0 until 512).map { i =>
      C(i.toLong, s"t1_$i", (i * 193L) % 512, s"u$i", "p", "s", s"b$i",
        (i * 37L) % 512, "sub", null, (i * 101L) % 512)
    }
    val dir = tmp("zopt3")
    val table = new Livestream.UpsertTable(spark, dir, Merge.comments,
      Seq.empty[C].toDF(), outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 4)))
    table.seed(rows.toDF())
    // zorderBy and zorderByCols are mutually exclusive spellings
    intercept[IllegalArgumentException](table.optimize(
      zorderBy = Some(("created", "score")),
      zorderByCols = Seq("created", "score", "textlen")))
    val want = table.current.collect()
      .map(_.getAs[Long]("idint")).sorted.toSeq
    table.optimize(maxFiles = 4,
      zorderByCols = Seq("created", "score", "textlen"))
    val (df1, idx1) = table.scanAuto()
    assert(df1.collect().map(_.getAs[Long]("idint")).sorted.toSeq === want,
      "3-dim ZORDER compaction changed the data")
    // a selective range on EACH of the three curve dimensions skips
    // files through the refreshed sidecar — including the third one the
    // 2-dim arity could never cluster
    for (c <- Seq("created", "score", "textlen")) {
      val (dfc, idxc) = table.scanAuto()
      val got = dfc.filter(col(c).between(64L, 160L)).collect()
        .map(_.getAs[Long]("idint")).sorted.toSeq
      assert(idxc.lastKept < idxc.lastListed,
        s"$c: post-optimize predicate skipped nothing " +
          s"(${idxc.lastKept}/${idxc.lastListed})")
      val wantC = rows.filter(r => {
        val v = c match {
          case "created" => r.created; case "score" => r.score
          case _ => r.textlen
        }
        v >= 64L && v <= 160L
      }).map(_.idint).sorted.toSeq
      assert(got === wantC, s"$c: pruning changed the result")
    }
    assert(idx1.lastListed > 0)
  }

  test("format(\"graft\"): plain SQL reads the store — current, versionAsOf, savepoint world, DV suppression, pushed-predicate skipping") {
    import graft.operators.Merge
    import graft.streaming.{Livestream, Savepoint}
    val rows = (0 until 256).map { i =>
      C(i.toLong, s"t1_$i", (i * 193L) % 512, s"u${i % 8}", "p", "s",
        s"b$i", (i * 37L) % 512, "sub", null, 2L)
    }
    val dir = tmp("dsv2")
    val table = new Livestream.UpsertTable(spark, dir, Merge.comments,
      Seq.empty[C].toDF(), outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 4)))
    table.seed(rows.toDF())                                           // v0
    table.merge(Seq(C(1L, "t1_1", 193L, "u1", "p", "s", "edited", 999L,
        "sub", null, 6L)).toDF().withColumn("_seq", lit(0L)),
      "_seq", storeEdits = Some(false))                               // v1
    def viaFormat(extra: (String, String)*): org.apache.spark.sql.DataFrame =
      extra.foldLeft(spark.read.format("graft"))(
        (r, kv) => r.option(kv._1, kv._2)).load(dir)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select("idstr").collect().map(_.getString(0)).sorted.toSeq
    // the format read equals the Scala API's current snapshot, and a
    // plain-SQL consumer composes over it
    assert(ids(viaFormat()) === ids(table.current))
    viaFormat().createOrReplaceTempView("graft_dsv2_t")
    assert(spark.sql(
        "SELECT body FROM graft_dsv2_t WHERE idstr = 't1_1'")
      .head().getString(0) === "edited")
    // time travel through an option
    assert(viaFormat("versionAsOf" -> "0")
      .filter(col("idstr") === "t1_1").head().getAs[String]("body") === "b1")
    // schema generation: a widened reopen + evolving merge serves the
    // new column through the format read with old files null-filled
    // (covered structurally — the resolved schema IS the generation)
    assert(viaFormat().schema.fieldNames.toSeq ===
      table.currentSchema.fieldNames.toSeq)
    // savepoint world: pin v1, churn past it, the format read with the
    // savepoint option serves the pinned state
    val spRoot = tmp("dsv2_sp")
    val sp = Savepoint.create(spRoot, "w", Seq(table))
    table.merge(Seq(C(500L, "t1_500", 1L, "u5", "p", "s", "late", 1L,
        "sub", null, 4L)).toDF().withColumn("_seq", lit(0L)),
      "_seq", storeEdits = Some(false))                               // v2
    val pinned = viaFormat("savepoint" -> "w", "savepointRoot" -> spRoot)
    assert(ids(pinned) === ids(sp.read(table)))
    assert(!ids(pinned).contains("t1_500"))
    // DV suppression rides the format read (merge-on-read, bucket from
    // the file path)
    assert(table.purgeKeys(Seq("t1_7").toDF("idstr"), dv = true) === 1L) // v3
    assert(!ids(viaFormat()).contains("t1_7"))
    assert(ids(viaFormat()).contains("t1_500"))
    // pushed predicates reach the zone-map index: cluster the layout,
    // then a plain SQL WHERE skips files (kept < listed)
    table.optimize(maxFiles = 4, zorderBy = Some(("created", "score")))  // v4
    viaFormat().createOrReplaceTempView("graft_dsv2_t")
    val n = spark.sql(
      "SELECT count(*) AS n FROM graft_dsv2_t WHERE created BETWEEN 10 AND 80")
      .head().getLong(0)
    assert(n === table.current.filter(col("created").between(10L, 80L))
      .count())
    val idx = graft.sources.GraftSource.lastIndex.get
    assert(idx.lastKept < idx.lastListed,
      s"pushed predicate skipped nothing (${idx.lastKept}/${idx.lastListed})")
    // SQL DDL rides the same provider: CREATE TABLE ... USING graft
    // gives a catalog name any SQL-only consumer can query
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    spark.sql(s"CREATE TABLE graft_ddl_t USING graft OPTIONS (path '$dir')")
    assert(spark.sql("SELECT count(*) FROM graft_ddl_t").head().getLong(0)
      === table.current.count())
    spark.sql("DROP TABLE graft_ddl_t")
    // a vacuumed versionAsOf fails LOUDLY, never an empty frame
    Savepoint.drop(spRoot, "w", Seq(table))
    table.vacuum(keep = 1)
    val e = intercept[Exception](viaFormat("versionAsOf" -> "0").count())
    assert(e.getMessage.contains("not readable"))
  }

  test("format(\"graft\") change feed: equals changes(), classifies DV purges as deletes, refuses migration-crossing ranges and vacuumed bases") {
    import graft.operators.Merge
    import graft.streaming.Livestream
    val dir = tmp("dsv2cdc")
    val table = new Livestream.UpsertTable(spark, dir, Merge.comments,
      Seq.empty[C].toDF(), outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 4)))
    def cRow(id: Long, body: String, score: Long) =
      C(id, s"t1_$id", id, s"u$id", "p", "s", body, score, "sub", null, 2L)
    table.seed(Seq(cRow(1, "a1", 10), cRow(2, "a2", 20),
      cRow(3, "a3", 30)).toDF())                                           // v0
    table.merge(Seq(cRow(2, "a2-v2", 25), cRow(4, "a4", 40)).toDF()
      .withColumn("_seq", lit(0L)), "_seq", storeEdits = Some(false))      // v1
    def feed(f: Long, t: Long) = spark.read.format("graft")
      .option("changesFrom", f.toString).option("changesTo", t.toString)
      .load(dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("idstr", "kind", "before_body", "after_body")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).toSet
    // the SQL feed equals the Scala changes() read, shape and values
    assert(rows(feed(0, 1)) === rows(table.changes(0L, 1L)))
    assert(rows(feed(0, 1)) === Set(
      ("t1_2", "update", "a2", "a2-v2"), ("t1_4", "insert", null, "a4")))
    // changes(-1, v): the full snapshot as inserts (the empty base)
    assert(feed(-1, 0).filter(col("kind") === "insert").count() === 3L)
    // a DV-only purge re-points NOTHING, yet the feed classifies the
    // suppressed key as a delete (the vector-delta bucket join)
    assert(table.purgeKeys(Seq("t1_3").toDF("idstr"), dv = true) === 1L) // v2
    assert(rows(feed(1, 2)) === Set(("t1_3", "delete", "a3", null)))
    // half a range is refused; a vacuumed base is refused LOUDLY
    intercept[IllegalArgumentException](spark.read.format("graft")
      .option("changesFrom", "0").load(dir).count())
    table.vacuum(keep = 1)
    val eV = intercept[Exception](feed(0, 2).count())
    assert(eV.getMessage.contains("not readable"))
    // a migration boundary inside the range routes to the Scala API
    import org.apache.spark.sql.types._
    val to = StructType(Seq(StructField("idstr", StringType),
      StructField("author", StringType), StructField("body", StringType),
      StructField("score_s", StringType)))
    table.migrate(to, df => df
      .withColumn("score_s", concat(lit("s"), col("score"))))            // v3
    val eM = intercept[IllegalArgumentException](spark.read.format("graft")
      .option("changesFrom", "2").option("changesTo", "3").load(dir)
      .count())
    assert(eM.getMessage.contains("migration"))
  }

  test("sidecar refresh tracks coverage per (file, col): widening the column set backfills") {
    import graft.operators.Merge
    import graft.streaming.Livestream
    val rows = (0 until 64).map { i =>
      C(i.toLong, s"t1_$i", i.toLong, s"u${i % 8}", "p", "s", s"b$i",
        (i * 7L) % 64, "sub", null, 2L)
    }
    val dir = tmp("widen")
    val table = new Livestream.UpsertTable(spark, dir, Merge.comments,
      Seq.empty[C].toDF(), outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 4)))
    table.seed(rows.toDF())
    // first refresh covers only `created`
    table.refreshZoneMap(Seq("created"))
    table.refreshBloom(Seq("created"), mBits = 1024, k = 2)
    val files = table.current.inputFiles.toSet
    def zmCols = graft.sources.ZoneMap.read(dir).groupBy(_.col)
      .view.mapValues(_.map(_.file).toSet).toMap
    def blCols = graft.sources.ZoneMap.readBloom(dir).groupBy(_.col)
      .view.mapValues(_.map(_.file).toSet).toMap
    assert(zmCols.keySet === Set("created") && zmCols("created") === files)
    // a later refresh WIDENS the column set: the already-covered files
    // must backfill rows for the new columns (the old per-file coverage
    // rule left them unprunable on `score`/`author` forever)
    table.refreshZoneMap(Seq("created", "score"))
    table.refreshBloom(Seq("created", "author"), mBits = 1024, k = 2)
    assert(zmCols.keySet === Set("created", "score"))
    assert(zmCols("score") === files, "widened zone-map column not backfilled")
    assert(blCols.keySet === Set("created", "author"))
    assert(blCols("author") === files, "widened bloom column not backfilled")
    // (file, col) rows stay unique — no duplicate stats after backfill
    val zm = graft.sources.ZoneMap.read(dir)
    assert(zm.map(s => (s.file, s.col)).distinct.size === zm.size)
    val bl = graft.sources.ZoneMap.readBloom(dir)
    assert(bl.map(b => (b.file, b.col)).distinct.size === bl.size)
  }

  test("scanForKeys: co-partitioned rescan reads only the probe keys' buckets, never the table") {
    import graft.operators.Merge
    import graft.streaming.Livestream
    // fact store CO-PARTITIONED BY THE JOIN KEY (author-hash buckets) —
    // the layout that turns cdcApplyJoin's F⋈ΔD rescan into a pruned
    // read; author is stable per key here, so the layout contract holds
    val rows = (0 until 256).map { i =>
      C(i.toLong, s"t1_$i", i.toLong, s"u${i % 64}", "p", "s", s"b$i",
        i.toLong, "sub", null, 2L)
    }
    val dir = tmp("sfk")
    val table = new Livestream.UpsertTable(spark, dir, Merge.comments,
      Seq.empty[C].toDF(), outputPartitions = Some(1),
      partitioning = Some(pmod(xxhash64(col("author")), lit(16))))
    table.seed(rows.toDF())
    val probe = Seq("u1", "u2").toDF("author")
    val pruned = table.scanForKeys(probe)
    val full = table.current
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"pruned read listed ${pruned.inputFiles.length} of " +
        s"${full.inputFiles.length} files — no pruning")
    // every probed key's row IS in the pruned read (bucket-mates ride
    // along; the caller's residual filter handles them)
    val want = full.filter(col("author").isin("u1", "u2")).count()
    assert(pruned.filter(col("author").isin("u1", "u2")).count() === want)
    assert(want === 8L)
    // unpublished probe values contribute nothing and break nothing
    assert(table.scanForKeys(Seq("zz_missing").toDF("author")).count() >= 0L)
  }

  test("dynamic partition pruning: a dim filter prunes the partitioned fact THROUGH the join") {
    val dir = tmp("dpp")
    // fact partitioned by target (20 partitions), dim filtered to one
    val fact = (0 until 2000).map(i => (s"sub_${i % 20}", i.toLong, (i * 7).toLong))
      .toDF("target", "idint", "score")
    Store.writePartitioned(fact, dir)
    val dim = (0 until 20).map(i => (s"sub_$i", i % 4)).toDF("target", "grp")
    val joined = spark.read.parquet(dir)
      .join(dim.filter(col("grp") === 0), Seq("target"))
    val n = joined.count()
    assert(n === 500L) // 5 of 20 targets
    val plan = joined.queryExecution.executedPlan.toString
    // evidence that partition pruning flowed through the join: either
    // static partition filters (broadcast pushdown) or a DPP subquery
    assert(plan.contains("dynamicpruning") ||
           plan.contains("dynamicpruningexpression") ||
           plan.contains("PartitionFilters: ["),
      s"expected join-driven partition pruning in:\n$plan")
  }
}
