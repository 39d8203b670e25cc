package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Cross-store CONSISTENT SNAPSHOT — an atomically-published savepoint:
  * a vector of (table path → version, artifact root → basis) that
  * readers pass to `at()` / artifact serves to compose a consistent
  * multi-table WORLD, and that `vacuum`/`vacuumRetain` refuse to erase
  * from under.
  *
  * Why: every multi-table surface (the snowflake chains, the joined
  * dashboards) reads each table at its own `currentVersion` — a reader
  * composing two views while a merge publishes BETWEEN the reads serves
  * a state no rescan ever produced. The reference got this for free
  * from single-writer SQLite (tsdb.py:194-195 — one connection,
  * transactions at tsdb.py:354-356); on independent versioned stores
  * the transaction must be rebuilt as published metadata.
  *
  * ==Layout & atomicity==
  * Each participating table gets a PIN under its own root
  * (`<table>/_savepoints/<name>` = version — the vacuum-refusal
  * evidence, colocated so the store can refuse without a registry
  * lookup), written FIRST; the VECTOR file `<root>/sp=<name>` is
  * written LAST via tmp+ATOMIC_MOVE and is the single commit point. A
  * crash mid-create publishes no vector — readers never resolve a
  * half-pinned world; the orphan pins hold their versions until
  * [[drop]] (or a re-created savepoint of the same name) retires them,
  * which is the safe direction (over-retain, never under-pin).
  *
  * Single-writer per savepoint root (the UpsertTable contract);
  * readers are lock-free. The captured versions are each table's
  * CURRENT version at capture — the creator's observation point
  * defines the world, exactly as a SQLite `BEGIN` pins what the
  * connection currently sees.
  *
  * Scale: driver-side metadata only — a few files of a few bytes, no
  * Spark job; pinning a 100 TB fleet costs the same as pinning a test
  * fixture. Retention economics stay with vacuum/vacuumRetain — a
  * savepoint holds leaf files alive BY REFERENCE (no copies).
  */
object Savepoint {

  /** A resolved savepoint: normalized table path → pinned version,
    * artifact root → pinned basis. */
  final case class Snapshot(name: String, tables: Map[String, Long],
      artifacts: Map[String, Long]) {

    def versionOf(table: Livestream.UpsertTable): Long =
      versionOfPath(table.tablePath)

    def versionOfPath(path: String): Long =
      tables.getOrElse(normalize(path), sys.error(
        s"savepoint '$name' does not pin table $path — it pins " +
          s"[${tables.keys.mkString(", ")}]"))

    /** Read a table AT this savepoint's pinned version — the composing
      * read: any set of `read(...)` calls against one snapshot is a
      * consistent world regardless of merges publishing in between. */
    def read(table: Livestream.UpsertTable): DataFrame =
      table.at(versionOf(table))

    def basisOf(artifactRoot: String): Long =
      artifacts.getOrElse(normalize(artifactRoot), sys.error(
        s"savepoint '$name' does not pin artifact $artifactRoot"))
  }

  private def normalize(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  private def vectorFile(root: String, name: String) =
    Paths.get(root, s"sp=$name")

  /** Capture and publish a savepoint over `tables` (and optionally
    * `_BASIS`-bearing artifact roots — StreamTopK/StreamWindow views).
    * Pins first, vector last (see the atomicity note above). Re-using a
    * name re-points it (the previous vector is superseded atomically). */
  def create(root: String, name: String,
      tables: Seq[Livestream.UpsertTable],
      artifactRoots: Seq[String] = Nil): Snapshot = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"savepoint name '$name' must match [A-Za-z0-9._-]+")
    require(tables.nonEmpty, "savepoint: need at least one table")
    val tv = tables.map { t =>
      val v = t.currentVersion
      require(v >= 0, s"savepoint '$name': table ${t.tablePath} has no " +
        "published version to pin")
      t.pinSavepoint(name, v)
      normalize(t.tablePath) -> v
    }.toMap
    val av = artifactRoots.map { r =>
      val f = Paths.get(r, "_BASIS")
      require(Files.exists(f), s"savepoint '$name': artifact root $r has " +
        "no published _BASIS pointer")
      normalize(r) -> new String(Files.readAllBytes(f)).trim.toLong
    }.toMap
    Files.createDirectories(Paths.get(root))
    val body = (tv.toSeq.sorted.map { case (p, v) => s"T\t$p\t$v" } ++
      av.toSeq.sorted.map { case (p, b) => s"A\t$p\t$b" }).mkString("\n")
    val tmp = Paths.get(root, s"sp=$name.tmp")
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, vectorFile(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Snapshot(name, tv, av)
  }

  /** Resolve a published savepoint. Throws if the vector was never
    * published (a torn create publishes nothing — by design). */
  def load(root: String, name: String): Snapshot = {
    val f = vectorFile(root, name)
    require(Files.exists(f), s"no savepoint '$name' under $root " +
      "(a create that crashed before the vector write published nothing)")
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(f).asScala.filter(_.nonEmpty)
    val (t, a) = lines.partition(_.startsWith("T\t"))
    def parse(l: String): (String, Long) = {
      val parts = l.split('\t')
      parts(1) -> parts(2).toLong
    }
    Snapshot(name, t.map(parse).toMap, a.map(parse).toMap)
  }

  /** Published savepoint names under `root`. */
  def list(root: String): Seq[String] = {
    val d = Paths.get(root)
    if (!Files.exists(d)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("sp=") && !n.endsWith(".tmp"))
      .map(_.drop(3)).toSeq.sorted
    finally s.close()
  }

  /** Retire a savepoint: the VECTOR goes first (readers stop
    * resolving), then each table's pin (vacuum unblocks). Also the
    * recovery for a torn create (orphan pins, no vector): pass the
    * tables and the pins retire even though load() would throw. */
  def drop(root: String, name: String,
      tables: Seq[Livestream.UpsertTable]): Unit = {
    val f = vectorFile(root, name)
    if (Files.exists(f)) Files.delete(f)
    tables.foreach(_.unpinSavepoint(name))
  }
}
