package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (per-file min/max sidecar) + a scan path that
  * prunes FILES before Spark sees them — the Delta/Iceberg
  * file-statistics device. Parquet row-group stats already skip row
  * groups, but only AFTER the scan has listed every file and opened
  * every footer; at 10⁵ files per table that listing/footer pass is the
  * read cost. A driver-side sidecar (one line per file × column) lets a
  * selective range scan hand Spark ONLY the intersecting files.
  *
  * Zone maps pay off exactly when the layout CLUSTERS the stat column —
  * [[ZOrder.writeZOrdered]]'s range-partitioned files have tight
  * bounding boxes in both interleaved dimensions, which is where the
  * sidecar turns into real file skipping (StoreSpec asserts the drop).
  * On an unclustered layout the stats are wide and pruning degrades to
  * a no-op — CORRECTNESS never depends on the map: files missing from
  * the sidecar, or with null/unparseable stats, are always kept.
  *
  * Stats travel as strings; `long` columns compare numerically, `string`
  * columns compare in UTF-8 BYTE order — the order Spark's min/max
  * (UTF8String) and parquet binary stats use. Java's String.compareTo
  * (UTF-16 code units) disagrees above U+FFFF, so the comparison here is
  * explicitly over UTF-8 bytes.
  */
object ZoneMap {

  /** Sidecar directory name, next to the data files. */
  val Dir = "_zonemap"

  /** One file × column stat. `typ` ∈ long | string; `mn`/`mx` are the
    * encoded bounds, null-state flagged separately (an all-null column
    * still names the file so it is recognized as covered). */
  final case class Stat(file: String, col: String, typ: String,
      hasBounds: Boolean, mn: String, mx: String)

  /** Per-file min/max of `cols` over the frame — ONE pass, one
    * files-sized aggregate (the codebook-sized collect contract: stats,
    * not data, reach the driver). The frame must be a parquet scan so
    * `input_file_name()` is populated. */
  def fileStats(df: DataFrame, cols: Seq[String]): Seq[Stat] = {
    val types = cols.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType => "long"
        case org.apache.spark.sql.types.StringType => "string"
        case other => throw new IllegalArgumentException(
          s"zone map column $c: unsupported type $other (long/string only)")
      }
    }
    val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val rows = df.select(input_file_name().as("_zf") +: cols.map(col): _*)
      .groupBy("_zf").agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.toSeq.flatMap { r =>
      val file = r.getString(0)
      cols.zip(types).zipWithIndex.map { case ((c, t), i) =>
        val mnAny = r.get(1 + 2 * i); val mxAny = r.get(2 + 2 * i)
        if (mnAny == null || mxAny == null) Stat(file, c, t, hasBounds = false, "", "")
        else Stat(file, c, t, hasBounds = true, mnAny.toString, mxAny.toString)
      }
    }
  }

  private def enc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '%' => sb.append("%25")
      case '\t' => sb.append("%09")
      case '\n' => sb.append("%0a")
      case '\r' => sb.append("%0d")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def dec(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Atomic sidecar write (tmp + rename), replacing any previous map. */
  def write(dataDir: String, stats: Seq[Stat]): Unit = {
    val dir = Paths.get(dataDir, Dir)
    Files.createDirectories(dir)
    val body = stats.map(s => Seq(enc(s.file), enc(s.col), s.typ,
      if (s.hasBounds) "1" else "0", enc(s.mn), enc(s.mx)).mkString("\t"))
      .mkString("\n")
    val tmp = dir.resolve("stats.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, dir.resolve("stats"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dataDir: String): Seq[Stat] = readFile(Paths.get(dataDir, Dir, "stats"))

  private[graft] def readFile(f: Path): Seq[Stat] = {
    if (!Files.exists(f)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(f).asScala.toSeq.filter(_.count(_ == '\t') == 5).flatMap { l =>
      val p = l.split('\t')
      // defensive: a torn line never poisons the map (file just unpruned)
      try Some(Stat(dec(p(0)), dec(p(1)), p(2), p(3) == "1", dec(p(4)), dec(p(5))))
      catch { case _: Exception => None }
    }
  }

  /** UTF-8 byte-order comparison (Spark/parquet binary string order). */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    ab.length - bb.length
  }

  /** Does a stat's [mn, mx] intersect the inclusive query range? Files
    * without bounds (all-null or missing) always intersect. */
  private def intersects(s: Stat, lo: String, hi: String): Boolean = {
    if (!s.hasBounds) return true
    s.typ match {
      case "long" =>
        try !(s.mx.toLong < lo.toLong || s.mn.toLong > hi.toLong)
        catch { case _: NumberFormatException => true }
      case _ => !(utf8Compare(s.mx, lo) < 0 || utf8Compare(s.mn, hi) > 0)
    }
  }

  /** Prune a file list by the sidecar: files whose stat for `c` excludes
    * [lo, hi] drop; files the map does not cover are KEPT (conservative —
    * the map accelerates, never decides). Returns (kept, prunedCount). */
  def pruneFiles(stats: Seq[Stat], allFiles: Seq[String], c: String,
      lo: String, hi: String): (Seq[String], Int) = {
    val byFile = stats.filter(_.col == c).map(s => s.file -> s).toMap
    val kept = allFiles.filter(f => byFile.get(f).forall(intersects(_, lo, hi)))
    (kept, allFiles.length - kept.length)
  }

  /** Build (or rebuild) the sidecar for a parquet directory. */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Unit =
    write(path, fileStats(spark.read.parquet(path), cols))

  // ===== Bloom sidecar (equality/IN file skipping) ======================
  //
  // Zone maps prune RANGES; a point lookup on a high-cardinality key
  // whose layout does not cluster it keeps every file whose [min, max]
  // straddles the value — which, on a hash-partitioned layout, is every
  // file. The per-file BLOOM sidecar is the standard complement (the
  // Delta bloom-index analog): k md5-salted bit positions per key (the
  // EXACT q_bloom_join rule, Sketches.bloomBits — so the sidecar's
  // verdicts, false positives included, are a deterministic function of
  // each file's keyset), consulted by ZoneMapFileIndex for =/IN
  // constraints. False-positive keeps are correctness-neutral (the
  // residual predicate always runs); false negatives are impossible by
  // construction. Files without a bloom row are always kept.

  /** Bloom sidecar file name, inside [[Dir]]. */
  val BloomFile = "bloom"

  /** One file × column bloom: k salted hash bits over the column's
    * distinct values, OR-folded into mBits/64 words. */
  final case class BloomStat(file: String, col: String, mBits: Int, k: Int,
      words: Array[Long])

  /** Per-file bloom words of `cols` over the frame — one pass per
    * column; the driver collect is bounded by files × min(k·n_file,
    * mBits) positions (the filter capacity, never the data — the
    * codebook-collect contract). Nulls never enter the filter: a NULL
    * key matches no equality predicate anyway. */
  def fileBloomStats(df: DataFrame, cols: Seq[String],
      mBits: Int = 262144, k: Int = 3): Seq[BloomStat] = {
    require(mBits > 0 && mBits % 64 == 0 && k >= 1,
      s"bloom geometry: mBits=$mBits (positive multiple of 64), k=$k (>=1)")
    cols.flatMap { c =>
      val rows = df
        .select(input_file_name().as("_zf"), col(c).cast("string").as("_s"))
        .filter(col("_s").isNotNull)
        .select(col("_zf"),
          explode(sequence(lit(0), lit(k - 1))).as("j"), col("_s"))
        .select(col("_zf"),
          (conv(substring(md5(concat(col("j").cast("string"), lit(":"),
            col("_s"))), 1, 8), 16, 10).cast("long") % mBits)
            .cast("int").as("p"))
        .groupBy("_zf").agg(collect_set(col("p")).as("ps"))
        .collect()
      rows.toSeq.map { r =>
        val words = new Array[Long](mBits / 64)
        r.getSeq[Int](1).foreach(p => words(p >> 6) |= (1L << (p & 63)))
        BloomStat(r.getString(0), c, mBits, k, words)
      }
    }
  }

  /** Atomic bloom-sidecar write (tmp + rename), replacing any previous
    * map. Words travel as hex (16 chars per word). */
  def writeBloom(dataDir: String, blooms: Seq[BloomStat]): Unit = {
    val dir = Paths.get(dataDir, Dir)
    Files.createDirectories(dir)
    val body = blooms.map(b => Seq(enc(b.file), enc(b.col),
      b.mBits.toString, b.k.toString,
      b.words.map(w => f"$w%016x").mkString).mkString("\t"))
      .mkString("\n")
    val tmp = dir.resolve("bloom.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(BloomFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readBloom(dataDir: String): Seq[BloomStat] = {
    val f = Paths.get(dataDir, Dir, BloomFile)
    if (!Files.exists(f)) return Seq.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(f).asScala.toSeq
      .filter(_.count(_ == '\t') == 4).flatMap { l =>
        val p = l.split('\t')
        // defensive: a torn line never poisons the map (file just unpruned)
        try {
          val mBits = p(2).toInt; val k = p(3).toInt
          val hex = p(4)
          if (mBits <= 0 || mBits % 64 != 0 || hex.length != mBits / 64 * 16)
            None
          else Some(BloomStat(dec(p(0)), dec(p(1)), mBits, k,
            hex.grouped(16).map(java.lang.Long.parseUnsignedLong(_, 16))
              .toArray))
        } catch { case _: Exception => None }
      }
  }

  /** Driver-side twin of the distributed position rule (md5 of "j:v",
    * first 8 hex chars as an int, mod mBits) — byte-identical to what
    * [[fileBloomStats]] set, so a miss PROVES absence. */
  private[graft] def bloomMightContain(b: BloomStat, v: String): Boolean = {
    var j = 0
    while (j < b.k) {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$v".getBytes("UTF-8"))
      val hex = md.take(4).map(x => f"${x & 0xff}%02x").mkString
      val p = (java.lang.Long.parseLong(hex, 16) % b.mBits).toInt
      if ((b.words(p >> 6) & (1L << (p & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** One file's bloom verdict against the pushed conjuncts: only =/IN
    * constraints consult the filter (ranges are the zone map's job); an
    * IN survives if ANY listed value might be present; columns without
    * a bloom row keep the file. */
  def fileSurvivesBloom(byCol: Map[String, BloomStat],
      cons: Seq[Constraint]): Boolean =
    cons.forall { c =>
      if (c.op != "=" && c.op != "in") true
      else byCol.get(c.col).forall(b => c.values.exists(bloomMightContain(b, _)))
    }

  /** Build (or rebuild) the bloom sidecar for a parquet directory. */
  def buildBloom(spark: SparkSession, path: String, cols: Seq[String],
      mBits: Int = 262144, k: Int = 3): Unit =
    writeBloom(path, fileBloomStats(spark.read.parquet(path), cols, mBits, k))

  // ===== Catalyst-pushed constraints (automatic file skipping) =========
  //
  // scanRange covers the explicit-bounds call site; scanAuto goes the
  // idiomatic Spark step further: a custom FileIndex (graftshim
  // ZoneMapFileIndex) receives the optimizer's ALREADY-PUSHED data
  // filters at planning time and prunes the file list with the sidecar —
  // any `.filter`/SQL WHERE over the frame skips files, no bounds
  // plumbing. The extraction below is deliberately conservative: only
  // shapes whose zone-map semantics are airtight prune; everything else
  // (casts, functions, disjunctions, null tests) keeps every file and
  // lets the residual filter decide — the map accelerates, never
  // decides.

  /** One pushed conjunct the map understands: `col op value(s)`,
    * op ∈ {=, in, >, >=, <, <=}, typ ∈ {long, string}. */
  final case class Constraint(col: String, op: String, values: Seq[String],
      typ: String)

  /** Extract prunable conjuncts from pushed data filters. Spark hands
    * `listFiles` the split conjuncts, but nested Ands still appear when
    * a single pushed predicate was conjunctive — recurse through them.
    * Operand order is normalized (`5 > c` ⇒ `c < 5`). */
  def constraintsOf(filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[Constraint] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def lit(e: Expression): Option[(String, String)] = e match {
      case Literal(v, LongType | IntegerType | ShortType | ByteType)
        if v != null => Some((v.toString, "long"))
      case Literal(v, StringType) if v != null => Some((v.toString, "string"))
      case _ => None
    }
    def mk(a: Expression, op: String, l: Expression): Option[Constraint] =
      a match {
        case ar: AttributeReference =>
          lit(l).map { case (v, t) => Constraint(ar.name, op, Seq(v), t) }
        case _ => None
      }
    def typOf(dt: DataType): Option[String] = dt match {
      case LongType | IntegerType | ShortType | ByteType => Some("long")
      case StringType => Some("string")
      case _ => None
    }
    filters.flatMap {
      case And(l, r) => constraintsOf(Seq(l, r))
      case EqualTo(a, b) => (mk(a, "=", b) orElse mk(b, "=", a)).toSeq
      case GreaterThan(a, b) => (mk(a, ">", b) orElse mk(b, "<", a)).toSeq
      case GreaterThanOrEqual(a, b) => (mk(a, ">=", b) orElse mk(b, "<=", a)).toSeq
      case LessThan(a, b) => (mk(a, "<", b) orElse mk(b, ">", a)).toSeq
      case LessThanOrEqual(a, b) => (mk(a, "<=", b) orElse mk(b, ">=", a)).toSeq
      case In(a: AttributeReference, vs) if vs.nonEmpty =>
        val lits = vs.map(lit)
        if (lits.forall(_.isDefined))
          Seq(Constraint(a.name, "in", lits.flatten.map(_._1),
            lits.flatten.head._2))
        else Nil
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        // optimizer form of a large IN list; values are Catalyst
        // internals (boxed integrals / UTF8String), toString is exact.
        // A null element never matches rows, so dropping it is sound.
        typOf(a.dataType).toSeq.map(t =>
          Constraint(a.name, "in",
            hset.toSeq.filter(_ != null).map(_.toString), t))
      case _ => Nil
    }
  }

  /** Could ANY row of a file with bounds [mn, mx] satisfy `c`? Errs to
    * true on missing bounds, type mismatch, or unparseable stats. */
  private def satisfiable(s: Stat, c: Constraint): Boolean = {
    if (!s.hasBounds || s.typ != c.typ) return true
    def cmp(a: String, b: String): Option[Int] =
      if (s.typ == "long")
        try Some(java.lang.Long.compare(a.toLong, b.toLong))
        catch { case _: NumberFormatException => None }
      else Some(utf8Compare(a, b))
    def contains(v: String): Boolean =
      (for { lo <- cmp(s.mn, v); hi <- cmp(s.mx, v) }
        yield lo <= 0 && hi >= 0).getOrElse(true)
    c.op match {
      case "="  => contains(c.values.head)
      case "in" => c.values.exists(contains)
      case ">"  => cmp(s.mx, c.values.head).forall(_ > 0)
      case ">=" => cmp(s.mx, c.values.head).forall(_ >= 0)
      case "<"  => cmp(s.mn, c.values.head).forall(_ < 0)
      case "<=" => cmp(s.mn, c.values.head).forall(_ <= 0)
      case _    => true
    }
  }

  /** One file's verdict against every pushed conjunct: drops only when
    * some constraint is provably unsatisfiable on its recorded bounds;
    * constraints on columns the map doesn't cover keep the file. */
  def fileSurvives(byCol: Map[String, Stat], cons: Seq[Constraint]): Boolean =
    cons.forall(c => byCol.get(c.col).forall(satisfiable(_, c)))

  /** Catalyst-integrated scan: the returned frame reads `path` through a
    * zone-map-aware [[org.apache.spark.sql.graftshim.ZoneMapFileIndex]],
    * so ANY pushed predicate prunes files at planning time — the
    * Delta/Iceberg data-skipping architecture, not a bespoke call shape.
    * The index rides along for skip-count observability (StoreSpec
    * asserts `lastKept < lastListed` under a selective predicate). */
  def scanAuto(spark: SparkSession, path: String):
      (DataFrame, org.apache.spark.sql.graftshim.ZoneMapFileIndex) =
    org.apache.spark.sql.graftshim.ZoneMapScan.scan(spark, path)

  /** Range scan through the zone map: list once, prune files on the
    * DRIVER, hand Spark only the survivors, and keep the residual filter
    * (zone maps bound, they don't prove membership). Long overload. */
  def scanRange(spark: SparkSession, path: String, c: String,
      lo: Long, hi: Long): DataFrame =
    scanImpl(spark, path, c, lo.toString, hi.toString,
      col(c) >= lo && col(c) <= hi)

  /** String-range overload (UTF-8 byte order, matching Spark min/max). */
  def scanRangeString(spark: SparkSession, path: String, c: String,
      lo: String, hi: String): DataFrame =
    scanImpl(spark, path, c, lo, hi, col(c) >= lo && col(c) <= hi)

  private def scanImpl(spark: SparkSession, path: String, c: String,
      lo: String, hi: String,
      residual: org.apache.spark.sql.Column): DataFrame = {
    val full = spark.read.parquet(path)
    val (kept, _) = pruneFiles(read(path), full.inputFiles.toSeq, c, lo, hi)
    if (kept.isEmpty) full.filter(residual).limit(0)
    else spark.read.schema(full.schema).parquet(kept: _*).filter(residual)
  }
}
