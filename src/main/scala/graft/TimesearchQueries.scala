package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Analytics, Merge, Normalize, TemporalJoin, Trees}
import graft.sources.Ndjson
import graft.streaming.Livestream

/** Timesearch-semantics operators (SURVEY.md §2 ingest/store/analytics)
  * demonstrated over the driver tables. Role mapping per FIXTURES.md §3:
  * orders/lineitem ≈ submissions/comments, events ≈ livestream batches.
  *
  * Every query is deterministic (total ORDER BY, integer money via the
  * cents convention) so the DuckDB oracle hash-matches.
  */
object TimesearchQueries {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** TIMESTAMP_NTZ column → epoch seconds (matches DuckDB floor(epoch(x))). */
  private def epochSec(c: Column): Column =
    floor(c.cast("timestamp").cast("double")).cast("long")

  /** events.ts → epoch seconds, adaptive to the testdata generation:
    * nanos-as-long (integer division — a double round-trip at 1e18
    * magnitude can cross second boundaries) or a µs TIMESTAMP_NTZ
    * (floor(epoch) — exact below 2^53). Both match DuckDB
    * `floor(epoch(ts))` on the same file. */
  private[graft] def tsSec(ev: DataFrame): Column = ev.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => expr("ts div 1000000000")
    case _ => epochSec(col("ts"))
  }

  /** events → comment-shaped "old" store (the archive before a batch). */
  /** Stream-maintained leaderboard, once per session per corpus — seed
    * the fact store with the old batch, then drive the new batch
    * through [[graft.streaming.StreamTopK.leaderboardSink]] as TWO real
    * micro-batches (merge + |Δ| view catch-up per trigger). Returns
    * (fact table, view root). */
  private val builtTopkViews = new java.util.concurrent.ConcurrentHashMap[
    String, (Livestream.UpsertTable, String)]()
  private def incrementalTopk(s: SparkSession, dir: String):
      (Livestream.UpsertTable, String) =
    builtTopkViews.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir", _ => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_topk")
        val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
          Merge.comments, oldComments(s, dir).limit(0),
          outputPartitions = Some(1),
          partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
        table.seed(oldComments(s, dir))
        val root = tmp.resolve("view").toString
        graft.streaming.StreamTopK.seedView(table, root,
          "author", "idstr", "score", 3, "score_c", "rk")
        val src = tmp.resolve("in").toString
        val nc = newComments(s, dir)
        nc.repartition(2).write.parquet(src)
        val stream = s.readStream.schema(nc.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = graft.streaming.StreamTopK.leaderboardSink(stream, table,
          root, "author", "idstr", "score", 3,
          tmp.resolve("ckp").toString, "score_c", "rk").start()
        q.awaitTermination()
        (table, root)
      })

  /** Stream-maintained windowed dashboard (the 18th maintained
    * artifact), once per session per corpus — seed the fact store with
    * the old batch, then drive the new batch through
    * [[graft.streaming.StreamWindow.windowSink]] as TWO real
    * micro-batches (merge + |Δ|·k view catch-up per trigger). Same
    * parameters as q_cdc_window so the oracle is shared verbatim. */
  private val builtWindowViews = new java.util.concurrent.ConcurrentHashMap[
    String, String]()
  private def incrementalWindow(s: SparkSession, dir: String): String =
    builtWindowViews.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir", _ => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_win")
        val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
          Merge.comments, oldComments(s, dir).limit(0),
          outputPartitions = Some(1),
          partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
        table.seed(oldComments(s, dir))
        val root = tmp.resolve("view").toString
        graft.streaming.StreamWindow.seedView(table, root,
          Seq("distinguish"), "textlen", "score", 600L, 200L,
          "w_start", "n_rows", "sum_len")
        val src = tmp.resolve("in").toString
        val nc = newComments(s, dir)
        nc.repartition(2).write.parquet(src)
        val stream = s.readStream.schema(nc.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = graft.streaming.StreamWindow.windowSink(stream, table,
          root, Seq("distinguish"), "textlen", "score", 600L, 200L,
          tmp.resolve("ckp").toString, "w_start", "n_rows", "sum_len")
          .start()
        q.awaitTermination()
        root
      })

  /** Stream-maintained SESSION dashboard (the 19th maintained
    * artifact), once per session per corpus — seed the fact store with
    * the old batch, then drive the new batch through
    * [[graft.streaming.StreamSession.sessionSink]] as TWO real
    * micro-batches (merge + dirty-group session catch-up per trigger).
    * Same (group = author, axis = score, gap = 500) parameters as
    * q_cdc_session so the oracle is shared verbatim. */
  private val builtSessionViews = new java.util.concurrent.ConcurrentHashMap[
    String, String]()
  private def incrementalSession(s: SparkSession, dir: String): String =
    builtSessionViews.computeIfAbsent(
      s"${s.sparkContext.applicationId}:$dir", _ => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_sess")
        val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
          Merge.comments, oldComments(s, dir).limit(0),
          outputPartitions = Some(1),
          partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
        table.seed(oldComments(s, dir))
        val root = tmp.resolve("view").toString
        graft.streaming.StreamSession.seedView(table, root,
          "author", "score", 500L)
        val src = tmp.resolve("in").toString
        val nc = newComments(s, dir)
        nc.repartition(2).write.parquet(src)
        val stream = s.readStream.schema(nc.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
        val q = graft.streaming.StreamSession.sessionSink(stream, table,
          root, "author", "score", 500L, tmp.resolve("ckp").toString)
          .start()
        q.awaitTermination()
        root
      })

  private[graft] def oldComments(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("event_id") % 4 =!= 1)
      .select(
        col("event_id").cast("long").as("idint"),
        concat(lit("e"), col("event_id")).as("idstr"),
        col("user_id").as("created"),
        concat(lit("u"), col("user_id")).as("author"),
        lit("p0").as("parent"),
        lit("s0").as("submission"),
        col("props").as("body"),
        cents(col("value")).as("score"),
        lit("sub").as("subreddit"),
        when(col("event_id") % 3 === 0, lit("mod")).as("distinguish"),
        length(col("props")).cast("long").as("textlen"))

  /** events → the incoming batch: edited bodies, bumped scores, some
    * deletion tombstones, some rows new to the store. */
  private[graft] def newComments(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("event_id") % 2 === 0)
      .select(
        col("event_id").cast("long").as("idint"),
        concat(lit("e"), col("event_id")).as("idstr"),
        col("user_id").as("created"),
        when(col("event_id") % 5 === 0, lit("[DELETED]"))
          .otherwise(concat(lit("u"), col("user_id"))).as("author"),
        lit("p0").as("parent"),
        lit("s0").as("submission"),
        when(col("event_id") % 5 === 0, lit("[removed]"))
          .otherwise(concat(col("props"), lit("-v2"))).as("body"),
        (cents(col("value")) + 1).as("score"),
        lit("sub").as("subreddit"),
        lit(null).cast("string").as("distinguish"),
        when(col("event_id") % 5 === 0, lit("[removed]"))
          .otherwise(concat(col("props"), lit("-v2")))
          .pipe(length(_)).cast("long").as("textlen"),
        when(col("event_id") % 6 === 0, lit(1000L) + col("event_id")).as("_edited"),
        col("event_id").cast("long").as("_seq"))

  implicit private class ColPipe(val c: Column) {
    def pipe(f: Column => Column): Column = f(c)
  }

  /** events' user ids → the author DIMENSION batches for q_cdc_join:
    * batch 0 seeds every third user, batches 1 and 2 insert the other
    * thirds AND update overlapping slices (%5, %7) with batch-dependent
    * attribute values — so the maintained join view sees dim inserts
    * (fact rows GAIN a match mid-chain) and dim updates (re-attribution)
    * live. Batch 2 deliberately leaves a RESIDUE uncovered (%3 = 2 with
    * %11 = 0 and %7 ≠ 0 never receive a dim): those authors' facts are
    * absent from the inner view and carried null-dimmed in the outer
    * one — the two final states genuinely differ, so q_cdc_join_outer's
    * gate proves the outer algebra, not just the flip path. All
    * attribute values non-null, so the merge's coalesce(new, old) means
    * the LATEST batch containing a key wins — the oracle replays
    * exactly that with a row_number over batch DESC. */
  private def dimUsers(s: SparkSession, dir: String, batch: Int): DataFrame =
    dimUsersFrom(distinctUsers(s, dir), batch)

  /** The events-derived distinct user-id base every dim batch filters —
    * factored so multi-batch store builds can checkpoint it ONCE (each
    * merge otherwise re-runs the distinct per consumer: the touched-
    * partition aggregate and the union+window upsert both evaluate the
    * batch lineage). */
  private def distinctUsers(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(col("user_id")).distinct()

  private def dimUsersFrom(base: DataFrame, batch: Int): DataFrame = {
    val keep = batch match {
      case 0 => col("user_id") % 3 === 0
      case 1 => col("user_id") % 3 === 1 || col("user_id") % 5 === 0
      case _ => (col("user_id") % 3 === 2 && col("user_id") % 11 =!= 0) ||
        col("user_id") % 7 === 0
    }
    base.filter(keep).select(
      concat(lit("u"), col("user_id")).as("idstr"),
      lit(null).cast("string").as("author"),
      lit(null).cast("string").as("body"),
      concat(lit("t"), (col("user_id") + lit(batch)) % 4).as("tier"),
      (col("user_id") % 10 + lit(batch * 100)).cast("long").as("region_c"),
      col("user_id").cast("long").as("_seq"))
  }

  /** The dimension entity for q_cdc_join's second UpsertTable —
    * attributes updatable (latest batch wins via coalesce), author/body
    * present only for the merge fold's tombstone guard (always null
    * here, the [[graft.streaming.StreamClusters]] convention). */
  private val dimEntity: Merge.Entity = Merge.Entity(
    textCol = "body", editTextCol = "previous_body",
    updatable = Seq("tier", "region_c"), frozen = Seq("author"))

  /** q_cdc_join_pruned's fact batch: score bumps ONLY — author (the
    * co-partitioning column) and every other column stable per key, no
    * tombstones, so the replay is a plain coalesce and the layout
    * contract (key-stable partition value) provably holds. */
  private def joinFactsBatch(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("event_id") % 2 === 0)
      .select(
        col("event_id").cast("long").as("idint"),
        concat(lit("e"), col("event_id")).as("idstr"),
        col("user_id").as("created"),
        concat(lit("u"), col("user_id")).as("author"),
        lit("p0").as("parent"),
        lit("s0").as("submission"),
        concat(col("props"), lit("-v3")).as("body"),
        (cents(col("value")) + 2).as("score"),
        lit("sub").as("subreddit"),
        lit(null).cast("string").as("distinguish"),
        length(concat(col("props"), lit("-v3"))).cast("long").as("textlen"),
        col("event_id").cast("long").as("_seq"))

  /** q_cdc_join_pruned's dim batches: batch 0 seeds EVERY user; batch 1
    * updates only the %31 slice — a deliberately SMALL dirty set, so the
    * co-partitioned fact rescan touches few buckets. */
  private def dimJoinUsers(base: DataFrame, batch: Int): DataFrame = {
    val keep = if (batch == 0) lit(true) else col("user_id") % 31 === 0
    base.filter(keep).select(
      concat(lit("u"), col("user_id")).as("idstr"),
      lit(null).cast("string").as("author"),
      lit(null).cast("string").as("body"),
      concat(lit("t"), (col("user_id") + lit(batch)) % 4).as("tier"),
      (col("user_id") % 10 + lit(batch * 100)).cast("long").as("region_c"),
      col("user_id").cast("long").as("_seq"))
  }

  /** The two real versioned stores (facts ×3 versions, author dim ×3
    * versions) shared by the q_cdc_join family's rehearsals — built
    * fresh per call (the end-to-end store work IS the timed body of the
    * adjudicated cost class). */
  private def cdcJoinTables(s: SparkSession, dir: String):
      (Livestream.UpsertTable, Livestream.UpsertTable) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdcj")
    val facts = new Livestream.UpsertTable(s, tmp.resolve("f").toString,
      Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
    facts.seed(oldComments(s, dir))                                   // v0
    val nc = newComments(s, dir)
    facts.merge(nc.filter(col("idint") % 4 === 0), "_seq",
      storeEdits = Some(false))                                       // v1
    facts.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
      storeEdits = Some(false))                                       // v2
    // one materialization of the distinct-user base all three dim
    // batches filter (each merge evaluates its batch lineage twice)
    val users = distinctUsers(s, dir).localCheckpoint()
    val dim = new Livestream.UpsertTable(s, tmp.resolve("d").toString,
      dimEntity, dimUsersFrom(users, 0).drop("_seq").limit(0),
      outputPartitions = Some(1),
      partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
    dim.seed(dimUsersFrom(users, 0).drop("_seq"))                     // v0
    dim.merge(dimUsersFrom(users, 1), "_seq", storeEdits = Some(false)) // v1
    dim.merge(dimUsersFrom(users, 2), "_seq", storeEdits = Some(false)) // v2
    (facts, dim)
  }

  /** The two-schema-generation store shared by q_schema_evolve and
    * q_schema_evolve_changes: v0/v1 publish under the 11-column comments
    * schema; the table REOPENS widened (nullable `lang`, updatable) and
    * the v2 merge publishes the new generation. The widening batch sets
    * ONLY the key, the new column, and a score bump — every frozen
    * column rides the merge fold's first-row rule and the text column's
    * null-ignore, so the replay is exactly a LEFT JOIN fold. */
  private def schemaEvolvedTable(s: SparkSession, dir: String):
      Livestream.UpsertTable = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sev")
    val part = Some(Livestream.keyBucket(nBuckets = 16))
    val v1Table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
      Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
      partitioning = part)
    v1Table.seed(oldComments(s, dir))                                 // v0
    v1Table.merge(newComments(s, dir), "_seq", storeEdits = Some(false)) // v1
    // the reopen: widened schema + the new column's merge role
    val entityV2 = Merge.comments.copy(
      updatable = Merge.comments.updatable :+ "lang")
    val emptyV2 = oldComments(s, dir).limit(0)
      .withColumn("lang", lit(null).cast("string"))
    val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
      entityV2, emptyV2, outputPartitions = Some(1), partitioning = part)
    val batch = Tables.load(s, dir, "events")
      .filter(col("event_id") % 6 === 2)
      .select(
        col("event_id").cast("long").as("idint"),
        concat(lit("e"), col("event_id")).as("idstr"),
        lit(null).cast("long").as("created"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("parent"),
        lit(null).cast("string").as("submission"),
        lit(null).cast("string").as("body"),
        (cents(col("value")) + 100).as("score"),
        lit(null).cast("string").as("subreddit"),
        lit(null).cast("string").as("distinguish"),
        lit(null).cast("long").as("textlen"),
        concat(lit("l"), col("event_id") % 4).as("lang"),
        col("event_id").cast("long").as("_seq"))
    table.merge(batch, "_seq", storeEdits = Some(false))              // v2
    table
  }

  /** q_cdc_snowflake's SECOND-LEVEL dimension batches: region codes —
    * the domain the author dim's `region_c` draws from ({0..9} ∪
    * {100..109} ∪ {200..209}) — with batch-parametric attributes
    * (latest batch containing a code wins, the [[dimUsers]] device).
    * Batch 0 seeds the 0-level; batch 1 inserts the 100-level and
    * updates the even 0-level codes; batch 2 inserts the 200-level
    * MINUS 207 (a deliberate residue: view1 rows with region 207 stay
    * out of the inner level-2 view — the gate proves the inner drop,
    * not just the happy path) and updates the %5 codes below it. */
  private def dimRegion(s: SparkSession, batch: Int): DataFrame = {
    val code = col("id")
    val keep = batch match {
      case 0 => code < 100
      case 1 => (code >= 100 && code < 200) || (code < 100 && code % 2 === 0)
      case _ => (code >= 200 && code =!= 207) || (code < 200 && code % 5 === 0)
    }
    s.range(0, 300).filter(code % 100 < 10).filter(keep).select(
      concat(lit("r"), code).as("idstr"),
      lit(null).cast("string").as("author"),
      lit(null).cast("string").as("body"),
      concat(lit("z"), (code + lit(batch)) % 4).as("zone"),
      (code + lit(batch * 1000)).cast("long").as("zpop"),
      code.as("_seq"))
  }

  /** The region entity for the snowflake's third UpsertTable — same
    * convention as [[dimEntity]] (attributes updatable, author/body
    * only for the merge fold's tombstone guard, always null here). */
  private val regionEntity: Merge.Entity = Merge.Entity(
    textCol = "body", editTextCol = "previous_body",
    updatable = Seq("zone", "zpop"), frozen = Seq("author"))

  /** orders → submission-shaped rows shared by the q_index_* listings. */
  private def indexSubs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("idstr"),
      epochSec(col("o_orderdate")).as("created"),
      cents(col("o_totalprice")).as("score"),
      col("o_orderpriority").as("title"),
      col("o_custkey").cast("string").as("author"),
      col("o_orderstatus").as("subreddit"),
      nullif(col("o_orderpriority"), lit("1-URGENT")).as("flair_text"))

  /** Write the deterministic NDJSON fixture for `q_ingest_file`: submission
    * lines from orders, comment lines from lineitem, plus planted
    * unclassified / corrupt / blank lines. Null struct fields are OMITTED
    * by `to_json` (absent JSON keys, the pushshift reality), and `edited`
    * is post-processed into a BARE false/number token to exercise the
    * dual-typed read (tsdb.py:374-377). Path is per-sf under /tmp; the
    * oracle references it through the `__INGEST_SF__` token, bound by
    * [[oraclesAt]] to whatever sf Verify runs — no run-ordering
    * dependence between Verify and Bench. */
  private def ingestFileFixture(s: SparkSession, dir: String): String = {
    import s.implicits._
    val out = s"/tmp/graft_ingest_file/${new java.io.File(dir).getName}"
    val k = col("o_orderkey")
    val id = lower(conv(k.cast("string"), 10, 36))
    val subs = Tables.load(s, dir, "orders").filter(k % 10 < 3).select(
      to_json(struct(
        id.as("id"),
        when(k % 2 === 0, concat(lit("t3_"), id)).as("name"),
        epochSec(col("o_orderdate")).as("created_utc"),
        when(k % 7 =!= 0, concat(lit("u"), col("o_custkey"))).as("author"),
        col("o_orderpriority").as("title"),
        when(k % 4 === 1, concat(lit("/r/test/comments/"), id))
          .otherwise(concat(lit("https://example.com/"), id)).as("url"),
        when(k % 2 === 0, concat(lit("x &amp; y &lt;"), col("o_orderpriority"),
          lit("&gt; &quot;z&#39;"))).as("selftext"),
        when(k % 3 =!= 0, col("o_custkey").cast("long")).as("score"),
        concat(lit("sub_"), col("o_orderstatus")).as("subreddit"),
        when(k % 11 === 0, lit("moderator")).as("distinguished"),
        when(k % 5 === 0, lit(true)).as("over_18"),
        (k % 2 === 0).as("is_self"),
        when(k % 6 === 0, (epochSec(col("o_orderdate")) + 100).cast("string"))
          .otherwise(lit("false")).as("edited"))).as("line"))
      .select(regexp_replace(col("line"),
        "\"edited\":\"(false|[0-9]+)\"", "\"edited\":$1").as("line"))
    val ck = col("l_orderkey") * 10 + col("l_linenumber")
    val cid = lower(conv(ck.cast("string"), 10, 36))
    val coms = Tables.load(s, dir, "lineitem")
      .filter(col("l_linenumber") === 1 && col("l_orderkey") % 7 === 0)
      .select(to_json(struct(
        cid.as("id"),
        concat(lit("t1_"), cid).as("name"),
        epochSec(col("l_shipdate")).as("created_utc"),
        concat(lit("u"), col("l_suppkey")).as("author"),
        concat(lit("b "), col("l_returnflag")).as("body"),
        concat(lit("t3_"), lower(conv(col("l_orderkey").cast("string"), 10, 36)))
          .as("link_id"),
        lit("sub").as("subreddit"))).as("line"))
    val planted = Seq(
      "{\"title\":\"orphan parsed line\"}",   // parses; neither sub nor comment
      "{\"id\":\"zz\",\"name\":\"t3_zz",      // corrupt: unterminated object
      "definitely not json",                  // corrupt: not an object at all
      ""                                      // blank: dropped, not EOF
    ).toDF("line")
    subs.unionByName(coms).unionByName(planted)
      .coalesce(1).write.mode("overwrite").text(out)
    out
  }

  /** orders → raw pushshift-shaped submission rows (S1's dynamic JSON
    * surface synthesized deterministically): base-36 ids, absent fullnames,
    * HTML-escaped selftext, null authors/scores, relative + crosspost
    * urls, dual-typed `edited` — every fallback path Normalize handles. */
  private def rawSubmissions(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val id = lower(conv(k.cast("string"), 10, 36))
    Tables.load(s, dir, "orders").select(
      id.as("id"),
      when(k % 2 === 0, concat(lit("t3_"), id)).as("name"),
      epochSec(col("o_orderdate")).as("created_utc"),
      (k % 2 === 0).as("is_self"),
      when(k % 3 === 0, lit(null).cast("boolean")).otherwise(k % 7 === 0).as("over_18"),
      when(k % 7 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("u"), col("o_custkey"))).as("author"),
      col("o_orderpriority").as("title"),
      when(k % 4 === 1, concat(lit("/r/test/comments/"), id))
        .otherwise(concat(lit("https://example.com/"), id)).as("url"),
      when(k % 2 === 0,
        concat(lit("x &amp; y &lt;"), col("o_orderpriority"), lit("&gt; &quot;z&#39;")))
        .as("selftext"),
      when(k % 3 === 0, lit(null).cast("long"))
        .otherwise(col("o_custkey").cast("long")).as("score"),
      concat(lit("sub_"), col("o_orderstatus")).as("subreddit"),
      when(k % 11 === 0, lit("moderator")).as("distinguished"),
      nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("link_flair_text"),
      when(k % 5 === 0, lit("blue")).as("link_flair_css_class"),
      when(k % 2 === 0, lit(null).cast("long"))
        .otherwise((col("o_custkey") % 100).cast("long")).as("num_comments"),
      when(k % 5 === 0, lit("t3_parent")).as("crosspost_parent"),
      when(k % 5 === 0,
        array(struct(concat(lit("/r/xp/comments/"), id).as("permalink"))))
        .as("crosspost_parent_list"),
      when(k % 6 === 0, (epochSec(col("o_orderdate")) + 100).cast("string"))
        .otherwise(lit("false")).as("edited"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1+O7 — breakdown.py union+agg+zero-fill with the 'total' sort.
    "q_breakdown" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("name", col("user_id").cast("string"))
      val b = Analytics.breakdown(
        ev.filter(col("event_type") === "signup"),
        ev.filter(col("event_type") === "click"), "name")
      Analytics.breakdownSorted(b, "total")
    }),

    // P2+O5 — index listing: threshold filter, flair-first two-key sort,
    // F4/F12/F17 formatting folded into one projection.
    "q_index_listing" -> ((s, dir) => {
      Analytics.indexListing(indexSubs(s, dir), 30000000L, "flair")
        .select(col("idstr"), col("flair_text"), col("created"),
          format_string("%s: [%s] %s",
            graft.functions.indexTime(col("created")),
            col("idstr"),
            graft.functions.stripNewlines(col("title"))).as("line"))
    }),

    // O3 + F3 — score-sorted listing with MATERIALIZED position (the sort
    // survives an order-insensitive compare) and the `human` timestamp.
    "q_index_score" -> ((s, dir) => {
      Analytics.indexListingRanked(indexSubs(s, dir), 30000000L, "score")
        .select(col("pos"), col("idstr"), col("score"),
          graft.functions.humanTime(col("created")).as("when_str"))
        .orderBy("pos")
    }),

    // O1 — date-sorted listing, ranked.
    "q_index_date" -> ((s, dir) => {
      Analytics.indexListingRanked(indexSubs(s, dir), 30000000L, "date")
        .select(col("pos"), col("idstr"), col("created")).orderBy("pos")
    }),

    // O2 — title-sorted listing, ranked.
    "q_index_title" -> ((s, dir) => {
      Analytics.indexListingRanked(indexSubs(s, dir), 30000000L, "title")
        .select(col("pos"), col("idstr"), col("title")).orderBy("pos")
    }),

    // O4 — author-sorted listing, ranked.
    "q_index_author" -> ((s, dir) => {
      Analytics.indexListingRanked(indexSubs(s, dir), 30000000L, "author")
        .select(col("pos"), col("idstr"), col("author")).orderBy("pos")
    }),

    // S1/S2 + P6 + F1/F2/F6/F7/F16 — the full ingest-normalization
    // pipeline: raw pushshift-shaped rows → canonical store rows.
    "q_ingest_normalize" -> ((s, dir) => {
      Normalize.submissions(rawSubmissions(s, dir)).orderBy("idstr")
    }),

    // The comments side of the same pipeline — exercises the parent_id
    // repair chain (null → link_id; raw JSON int → t1_ + base36;
    // already-prefixed passes through; pushshift.py:74-78).
    "q_ingest_comments" -> ((s, dir) => {
      val k = col("l_orderkey") * 10 + col("l_linenumber")
      val id = lower(conv(k.cast("string"), 10, 36))
      val raw = Tables.load(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 3)
        .select(
          id.as("id"),
          when(k % 2 === 0, concat(lit("t1_"), id)).as("name"),
          epochSec(col("l_shipdate")).as("created_utc"),
          when(k % 7 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("u"), col("l_suppkey"))).as("author"),
          concat(lit("b &amp; "), col("l_returnflag")).as("body"),
          // parent_id: null (→ link_id) | raw int digits (→ t1_+b36) | prefixed
          when(k % 3 === 0, lit(null).cast("string"))
            .when(k % 3 === 1, col("l_orderkey").cast("string"))
            .otherwise(concat(lit("t1_"), lower(conv(col("l_orderkey").cast("string"), 10, 36))))
            .as("parent_id"),
          concat(lit("t3_"), lower(conv(col("l_orderkey").cast("string"), 10, 36)))
            .as("link_id"),
          when(k % 5 === 0, lit(null).cast("long")).otherwise(col("l_linenumber").cast("long"))
            .as("score"),
          lit("sub").as("subreddit"),
          when(k % 11 === 0, lit("moderator")).as("distinguished"),
          when(k % 6 === 0, (epochSec(col("l_shipdate")) + 9).cast("string"))
            .otherwise(lit("false")).as("edited"))
      Normalize.comments(raw).orderBy("idstr")
    }),

    // S1 end-to-end over an ACTUAL .ndjson file (ingest_jsonfile.py:25-40):
    // a deterministic dump is written to disk, then read back through
    // Ndjson.read's pinned-schema PERMISSIVE scan — type discrimination
    // (S2), `_corrupt_record` quarantine incl. a planted corrupt line,
    // blank-line tolerance, and raw-JSON dual typing (`edited` as a bare
    // false/number token) all exercised on the real JSON surface. The
    // oracle re-reads the same file with DuckDB read_json and counts
    // quarantined lines independently via json_valid over the raw text.
    "q_ingest_file" -> ((s, dir) => {
      val path = ingestFileFixture(s, dir)
      val raw = Ndjson.read(s, path)
      val counts = raw.agg(
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_quarantined"),
        sum(when(col("_corrupt_record").isNull &&
            !Ndjson.isSubmission && Ndjson.isComment, 1L).otherwise(0L))
          .as("n_comment_rows"),
        sum(when(col("_corrupt_record").isNull &&
            !Ndjson.isSubmission && !Ndjson.isComment, 1L).otherwise(0L))
          .as("n_unclassified"))
      Normalize.submissions(Ndjson.submissionsRaw(raw))
        .crossJoin(counts)
        .orderBy("idstr")
    }),

    // CSV ingest under RFC 4180 quoting — the two-independent-parsers
    // agreement check: the fixture embeds the three classic traps in a
    // quoted field (delimiter, doubled quote, NEWLINE inside the field)
    // and both engines must parse identical field bytes. Spark reads
    // with multiLine=true + escape='"' (RFC quote-doubling; Spark's
    // default backslash escape is NOT RFC and would diverge from every
    // standards-compliant producer). multiLine forgoes intra-file split
    // parallelism by design — newline-in-field makes row boundaries
    // unknowable without parsing; at scale you shard into many files
    // (the fixture writer does exactly that: one file per task).
    "q_csv_ingest" -> ((s, dir) => {
      val out = s"/tmp/graft_csv/${new java.io.File(dir).getName}"
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          rpad(substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 40),
            40, "x").as("t40"))
      val body = concat(lit("pre,fix \"q\"\n"), col("t40"))
      val quoted = concat(lit("\""),
        regexp_replace(body, "\"", "\"\""), lit("\""))
      docs.select(concat(col("doc_id"), lit(","), quoted, lit(","),
          concat(lit("t"), col("doc_id") % 3)).as("value"))
        .write.mode("overwrite").text(out)
      s.read
        .option("multiLine", true).option("escape", "\"")
        .schema("doc_id LONG, body STRING, tag STRING")
        .csv(out)
        .select(col("doc_id"), md5(encode(col("body"), "UTF-8")).as("digest"),
          length(col("body")).cast("long").as("n_chars"), col("tag"))
        .orderBy("doc_id")
    }),

    // J4 — submission↔comments equi-join (left outer: submissions keep a
    // row even when no comment survives the filter).
    "q_thread_join" -> ((s, dir) => {
      val subs = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").cast("string").as("submission"),
          col("o_orderpriority").as("title"))
      val comments = Tables.load(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 2 && col("l_quantity") <= 25)
        .select(col("l_orderkey").cast("string").as("submission"),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cidstr"),
          epochSec(col("l_shipdate")).as("created"),
          cents(col("l_extendedprice")).as("score"))
      subs.join(comments, Seq("submission"), "left_outer")
        .orderBy("submission", "cidstr")
    }),

    // S6/T1-T8 — livestream analog end-to-end: a REAL Structured Streaming
    // query (file source → AvailableNow trigger → foreachBatch upsert into
    // the versioned table) seeded with the same "old" store as
    // q_merge_upsert; the published table must equal the batch merge.
    "q_stream_upsert" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream")
      val src = tmp.resolve("in").toString
      val batch = newComments(s, dir).drop("_seq")
      batch.write.mode("overwrite").parquet(src)
      // keyBucket partitioning: the scale path — each micro-batch rewrites
      // only the key buckets it touches, never the table (this one seed +
      // one big batch touches all 16, but the LAYOUT is the 100 TB shape;
      // per-bucket pruning is asserted in StreamingSpec)
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      // backfill-then-stream: the initial load is a bulk seed (plain
      // partitioned write + manifest), not an upsert against empty —
      // the merge machinery is reserved for the streamed increment
      table.seed(oldComments(s, dir))
      val stream = s.readStream.schema(batch.schema).parquet(src)
      val q = Livestream.upsertSink(stream, table,
        tmp.resolve("ckp").toString, Trigger.AvailableNow()).start()
      q.awaitTermination()
      table.current.orderBy("idstr")
    }),

    // The SQL-readable store surface (spark.read.format("graft") — the
    // DataSource V2 TableProvider over the existing gated read stack):
    // the same seeded+merged store as q_stream_upsert, read back ONLY
    // through the format + a temp view + plain SQL, and gated on the
    // upsert oracle VERBATIM — a divergence anywhere in the standalone
    // resolution (pointer, manifest, schema generation, deletion
    // vector) between the Scala read stack and the SQL surface
    // hash-mismatches.
    "q_dsv2_read" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dsv2")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                 // v0
      table.merge(newComments(s, dir), "_seq", storeEdits = Some(false)) // v1
      s.read.format("graft").load(tmp.resolve("tbl").toString)
        .createOrReplaceTempView("graft_dsv2_read")
      s.sql("SELECT * FROM graft_dsv2_read ORDER BY idstr")
    }),

    // Version-range CDC over the versioned store — UpsertTable.changes,
    // the table_changes()/Delta-CDF analog: seed publishes v0, one
    // upsert batch publishes v1, and changes(0, 1) classifies every key
    // whose row differs between the two snapshots (insert = key new at
    // v1, update = any non-key column changed; upserts never drop keys,
    // so delete is structurally absent here). The read is
    // manifest-pruned to the re-pointed buckets. Oracle: derive both
    // snapshots relationally (v0 = the old store, v1 = the q_merge_upsert
    // replay) and re-classify — the q_table_diff device over time travel.
    "q_table_changes" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_changes")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                            // v0
      table.merge(newComments(s, dir), "_seq", storeEdits = Some(false)) // v1
      table.changes(0L, 1L).orderBy("kind", "idstr")
    }),

    // The CHANGE FEED through the SQL surface — the same version-range
    // CDC served by spark.read.format("graft") + changesFrom/changesTo
    // options (the Delta table_changes() analog for SQL-only
    // consumers): the standalone path-metadata resolution rebuilds the
    // manifest-pruned diff, and the read gates on q_table_changes'
    // oracle VERBATIM — a divergence between the Scala changes() and
    // the SQL surface hash-mismatches.
    "q_dsv2_changes" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dsv2ch")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                            // v0
      table.merge(newComments(s, dir), "_seq", storeEdits = Some(false)) // v1
      s.read.format("graft")
        .option("changesFrom", "0").option("changesTo", "1")
        .load(tmp.resolve("tbl").toString)
        .createOrReplaceTempView("graft_dsv2_changes")
      s.sql("SELECT * FROM graft_dsv2_changes ORDER BY kind, idstr")
    }),

    // STORE SCHEMA EVOLUTION — the reference's own lifecycle
    // (DATABASE_VERSION 1→2, utilities/database_upgrader.py:24-49)
    // landed at the store layer: the comments store publishes v0/v1
    // under the 11-column schema, REOPENS with a widened entity (a
    // nullable `lang` column, updatable), and the v2 merge publishes
    // the new schema generation — pre-evolution files never rewrite
    // (they null-fill at read), the batch's lang values land through
    // the ordinary merge fold, and the manifest carries untouched
    // buckets by reference ACROSS the boundary. Oracle: the replayed
    // upsert LEFT JOIN the replayed widening batch — a dropped old
    // row, a lost lang value, or a widened read of a stale generation
    // hash-mismatches.
    "q_schema_evolve" -> ((s, dir) => {
      val table = schemaEvolvedTable(s, dir)
      table.current
        .select(col("idstr"), col("author"), col("score"), col("lang"))
        .orderBy("idstr")
    }),

    // CDC ACROSS the evolution boundary: changes(v1, v2) reads both
    // endpoints at the TO-side schema generation, so the widening
    // surfaces as ordinary updates whose before-image holds NULL for
    // the new column — exactly what a downstream IVM applier needs.
    // Oracle: the widening batch re-derived against the replayed
    // merge.
    "q_schema_evolve_changes" -> ((s, dir) => {
      val table = schemaEvolvedTable(s, dir)
      table.changes(1L, 2L)
        .select(col("kind"), col("idstr"),
          col("before_score"), col("after_score"),
          col("before_lang"), col("after_lang"))
        .orderBy("idstr")
    }),

    // EXPLICIT MIGRATION — the sanctioned path THROUGH what widen-only
    // evolution refuses (UpsertTable.migrate): the merged store
    // rewrites wholesale under a new generation that RENAMES textlen →
    // body_len, RETYPES score to a string form, and DROPS distinguish;
    // the migrated handle is done by contract, so the read reopens
    // with the new shape (the lifecycle the query demonstrates).
    // Oracle: the replayed merge re-projected by the same rename/
    // retype/drop — a lost row, a stale-generation read, or a retype
    // drift hash-mismatches.
    "q_schema_migrate" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_smig")
      val part = Some(Livestream.keyBucket(nBuckets = 16))
      val t1 = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0),
        outputPartitions = Some(1), partitioning = part)
      t1.seed(oldComments(s, dir))                                    // v0
      t1.merge(newComments(s, dir), "_seq", storeEdits = Some(false)) // v1
      import org.apache.spark.sql.types._
      val to = StructType(Seq(
        StructField("idint", LongType), StructField("idstr", StringType),
        StructField("created", LongType), StructField("author", StringType),
        StructField("parent", StringType),
        StructField("submission", StringType),
        StructField("body", StringType),
        StructField("score_s", StringType),
        StructField("subreddit", StringType),
        StructField("body_len", LongType)))
      t1.migrate(to, df => df
        .withColumnRenamed("textlen", "body_len")
        .withColumn("score_s", concat(lit("s"), col("score")))
        .drop("score", "distinguish"))                                // v2
      // the old handle is DONE (widen-only validator refuses it) —
      // reopen with the migrated shape to read
      val entity2 = Merge.Entity(textCol = "body",
        editTextCol = "previous_body", updatable = Seq("score_s"),
        frozen = Seq("author"))
      val t2 = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        entity2, s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row], to),
        outputPartitions = Some(1), partitioning = part)
      t2.current.orderBy("idstr")
    }),

    // CROSS-STORE CONSISTENT SNAPSHOT: two independent versioned
    // stores churn to v2, but the reader composes the WORLD a
    // savepoint pinned at v1 of both — merges publishing between (and
    // after) the pins change nothing the savepoint serves. Oracle: the
    // PARTIAL replay (only the first fact batch, only the first two
    // dim batches) joined — a read that leaked any post-savepoint
    // state hash-mismatches against the pinned world.
    "q_snapshot_join" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_snap")
      val facts = new Livestream.UpsertTable(s, tmp.resolve("f").toString,
        Merge.comments, oldComments(s, dir).limit(0),
        outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      facts.seed(oldComments(s, dir))                                 // v0
      val nc = newComments(s, dir)
      facts.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                     // v1
      val users = distinctUsers(s, dir).localCheckpoint()
      val dim = new Livestream.UpsertTable(s, tmp.resolve("d").toString,
        dimEntity, dimUsersFrom(users, 0).drop("_seq").limit(0),
        outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      dim.seed(dimUsersFrom(users, 0).drop("_seq"))                   // v0
      dim.merge(dimUsersFrom(users, 1), "_seq", storeEdits = Some(false)) // v1
      val sp = graft.streaming.Savepoint.create(
        tmp.resolve("sps").toString, "world_v1", Seq(facts, dim))
      // the world churns ON past the pins
      facts.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                     // v2
      dim.merge(dimUsersFrom(users, 2), "_seq", storeEdits = Some(false)) // v2
      sp.read(facts).select(col("idstr"), col("author"), col("score"))
        .join(sp.read(dim).select(col("idstr").as("author"), col("tier"),
          col("region_c")), Seq("author"))
        .select(col("idstr"), col("author"), col("score"), col("tier"),
          col("region_c"))
        .orderBy("idstr")
    }),

    // SESSION-WINDOW IVM — the data-dependent window closing the
    // applier-family matrix (Scd.cdcApplySession): per-author sessions
    // on the SCORE axis (scores change across the merges, so session
    // boundaries genuinely move — splits and merges included),
    // maintained from version-range deltas by the dirty-GROUP rescan
    // (touched authors re-sessionize from the pruned snapshot,
    // untouched authors serve verbatim). Oracle: the final merged
    // state re-sessionized by the q_sessionize lag/cumsum replay.
    "q_cdc_session" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcsess")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                 // v0
      val nc = newComments(s, dir)
      table.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                     // v1
      table.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                     // v2
      val base = graft.operators.Scd.cdcBaseSession(table.at(0L),
        "author", "score", 500L)
      val v1 = graft.operators.Scd.cdcApplySession(base,
        table.changes(0L, 1L), table.at(1L), "author", "score", 500L)
      graft.operators.Scd.cdcApplySession(v1,
          table.changes(1L, 2L), table.at(2L), "author", "score", 500L)
        .orderBy("author", "session_id")
    }),

    // PREDICATE takedown — the form erasure requests actually arrive in
    // ("erase every document by these authors"): UpsertTable.purgeWhere
    // resolves the keys from the current snapshot, rewrites ONLY the
    // buckets holding them, vacuums superseded bytes, and scrubs the
    // CDC/edits log — the FULL erasure act in the timed body, on a
    // store with real stored edits. Gated against the replayed merge
    // minus the predicate's rows: a row that survived the purge, or a
    // non-matching row the rewrite dropped, hash-mismatches.
    "q_takedown_author" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_tdauth")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                 // v0
      table.merge(newComments(s, dir), "_seq", storeEdits = Some(true)) // v1
      table.purgeWhere(col("author").endsWith("5"))                   // v2
      table.current.orderBy("idstr")
    }),

    // DELETION-VECTOR takedown — the small-purge economics path: the
    // same erase-these-authors request served by purgeKeys(dv = true),
    // which publishes a sidecar-sized deletion vector instead of
    // rewriting the purged keys' buckets (the manifest carries every
    // bucket by reference; StoreSpec-class bytes pin lives in
    // StreamingSpec). The timed body is resolve + vector publish +
    // the merge-on-read serve. Gated on the SAME corpus-minus-keys
    // oracle as q_takedown_author: a suppressed row leaking through
    // the vector-filtered read, or an innocent row suppressed,
    // hash-mismatches. (A DV is NOT byte erasure — purge composes
    // the rewrite for the compliance path; this is the daily-batch
    // path.)
    "q_takedown_dv" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_tddv")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                 // v0
      table.merge(newComments(s, dir), "_seq", storeEdits = Some(false)) // v1
      val kf = table.current.filter(col("author").endsWith("5"))
        .localCheckpoint(false)
      table.purgeKeys(kf, dv = true)                                  // v2
      table.current.orderBy("idstr")
    }),

    // CDC CONSUMED: a downstream grouped view (docs + score mass per
    // author) maintained ONLY from version-range deltas across TWO real
    // published versions — the incremental-view-maintenance loop
    // changes() exists to feed. Seed publishes v0; two disjoint-key
    // merge batches publish v1 and v2; the view starts from the v0
    // aggregate and applies changes(0,1) then changes(1,2) — never
    // rescanning the table. The hash gate pins the delta algebra to the
    // final snapshot's aggregate exactly (integer measures). Scale: each
    // step costs |changed keys| (manifest-pruned) + one group exchange,
    // vs a 100 TB rescan per refresh.
    "q_cdc_consume" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcc")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                   // v0
      val nc = newComments(s, dir)
      table.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                       // v1
      table.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                       // v2
      val base = graft.operators.Scd.cdcBaseAgg(table.at(0L),
        "author", "score", "n_docs", "sum_score_c")
      val afterV1 = graft.operators.Scd.cdcApply(base, table.changes(0L, 1L),
        "author", "score", "n_docs", "sum_score_c")
      graft.operators.Scd.cdcApply(afterV1, table.changes(1L, 2L),
          "author", "score", "n_docs", "sum_score_c")
        .orderBy("author")
    }),

    // MIN/MAX incremental view maintenance — the non-additive half of
    // q_cdc_consume, via the dirty-group pruned rescan (Scd
    // .cdcApplyMinMax): after-images fold in monotonically, and ONLY
    // groups whose removed value WAS an extremum rescan — from the
    // versioned snapshot, semi-join-pruned to the dirty groups. Same
    // two-real-published-versions construction as q_cdc_consume; the
    // oracle rescans the final merged state, so a leak in the dirty
    // marking (a missed extremum removal serving a stale max) or in the
    // monotone fold hash-mismatches.
    "q_cdc_minmax" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcmm")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                   // v0
      val nc = newComments(s, dir)
      table.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                       // v1
      table.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                       // v2
      val cols = ("author", "score", "n_docs", "min_score_c", "max_score_c")
      val base = graft.operators.Scd.cdcBaseMinMax(table.at(0L),
        cols._1, cols._2, cols._3, cols._4, cols._5)
      val afterV1 = graft.operators.Scd.cdcApplyMinMax(base,
        table.changes(0L, 1L), table.at(1L),
        cols._1, cols._2, cols._3, cols._4, cols._5)
      graft.operators.Scd.cdcApplyMinMax(afterV1,
          table.changes(1L, 2L), table.at(2L),
          cols._1, cols._2, cols._3, cols._4, cols._5)
        .orderBy("author")
    }),

    // The leaderboard MAINTAINED BY THE STREAM (17th maintained
    // artifact): StreamTopK.leaderboardSink merges each micro-batch
    // into the versioned fact store and catches the published view up
    // by changes(basis, current) — the basis recorded IN the artifact
    // makes the refresh idempotent and crash-resumable. Build runs as
    // untimed setup (Bench.IncrementalSetup — the production split:
    // the stream maintains the view long before a query arrives);
    // the timed body READS the leaderboard. Shares q_cdc_topk's oracle
    // VERBATIM: maintenance leaks hash-mismatch.
    "q_topk_incremental" -> ((s, dir) => {
      val (_, root) = incrementalTopk(s, dir)
      graft.streaming.StreamTopK.view(s, root)
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("author", "rk")
    }),

    // Per-group TOP-K incremental view maintenance — the leaderboard
    // shape (top-3 docs per author by score, ranks included), via
    // Scd.cdcApplyTopK's KEYED dirty-group rescan: only groups where a
    // removed row actually HELD a top-k slot rescan (exact membership,
    // not min/max's conservative value-equality); groups an after-image
    // lands in re-rank |Δ|+k rows; every other group serves from the
    // view verbatim. Same two-real-published-versions construction as
    // q_cdc_consume; the oracle windows the final merged state, so a
    // stale rank, a missed eviction, or a resurrected below-top-k row
    // hash-mismatches.
    "q_cdc_topk" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdctk")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                   // v0
      val nc = newComments(s, dir)
      table.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                       // v1
      table.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                       // v2
      val base = graft.operators.Scd.cdcBaseTopK(table.at(0L),
        "author", "idstr", "score", 3, "score_c", "rk")
      val afterV1 = graft.operators.Scd.cdcApplyTopK(base,
        table.changes(0L, 1L), table.at(1L),
        "author", "idstr", "score", 3, "score_c", "rk")
      graft.operators.Scd.cdcApplyTopK(afterV1,
          table.changes(1L, 2L), table.at(2L),
          "author", "idstr", "score", 3, "score_c", "rk")
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("author", "rk")
    }),

    // JOIN-view incremental maintenance — the two-table half of the
    // cdcApply family (Scd.cdcApplyJoin): a facts ⋈ author-dimension
    // view maintained from BOTH tables' version-range changes across
    // two real published versions EACH — never a full rescan of either
    // table. Fact changes re-derive their rows against the new dim
    // image; dim changes (inserts that GAIN matches, updates that
    // re-attribute) re-derive exactly the dirty join keys' fact rows
    // via the pruned rescan; everything else serves from the view
    // untouched. Oracle: rescan join of the two replayed merges — any
    // leak (a stale dim attribute, a fact row that missed its gained
    // match, a double-counted ΔF⋈ΔD row) hash-mismatches.
    "q_cdc_join" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoin(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val v1 = graft.operators.Scd.cdcApplyJoin(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), factsAt(1), dimAt(1),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApplyJoin(v1,
          facts.changes(1L, 2L), dimCh(1L, 2L), factsAt(2), dimAt(2),
          "idstr", "author", fCols, dCols)
        .orderBy("idstr")
    }),

    // The PRUNED F⋈ΔD rescan — q_cdc_join's one scale caveat closed by
    // LAYOUT: here the fact store CO-PARTITIONS BY THE JOIN KEY
    // (author-hash buckets — stable per row key because this feed never
    // rewrites an author), so the dim-dirty branch's fact rescan reads
    // the dirty authors' buckets via the manifest (scanForKeys), never
    // the table. The dirty set is deliberately small (one user slice,
    // %31) — the production shape: a micro-batch dim update touches a
    // handful of buckets of a 100 TB fact store. StoreSpec pins
    // files(pruned) < files(table); the oracle is the same rescan-join
    // device, so the pruned read must also be CORRECT (bucket-mates are
    // residual-filtered by the apply's own semi-join).
    "q_cdc_join_pruned" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcjp")
      val facts = new Livestream.UpsertTable(s, tmp.resolve("f").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(pmod(xxhash64(col("author")), lit(16))))
      facts.seed(oldComments(s, dir))                                 // v0
      facts.merge(joinFactsBatch(s, dir), "_seq", storeEdits = Some(false)) // v1
      val users = distinctUsers(s, dir).localCheckpoint()
      val dim = new Livestream.UpsertTable(s, tmp.resolve("d").toString,
        dimEntity, dimJoinUsers(users, 0).drop("_seq").limit(0),
        outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      dim.seed(dimJoinUsers(users, 0).drop("_seq"))                   // v0
      dim.merge(dimJoinUsers(users, 1), "_seq", storeEdits = Some(false)) // v1
      def factsSel(df: DataFrame) =
        df.select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoin(factsSel(facts.at(0)),
        dimAt(0), "idstr", "author", fCols, dCols)
      val dimCh = dim.changes(0L, 1L)
        .select(col("idstr").as("author"), col("kind"))
      // the co-partitioned rescan: dirty authors → their buckets only
      val factsPruned = factsSel(facts.scanForKeys(
        dim.changes(0L, 1L).select(col("idstr").as("author"))))
      graft.operators.Scd.cdcApplyJoin(base, facts.changes(0L, 1L), dimCh,
          factsPruned, dimAt(1), "idstr", "author", fCols, dCols)
        .orderBy("idstr")
    }),

    // LEFT-OUTER join-view IVM — the late-arriving-dimension shape
    // (Scd.cdcApplyJoinOuter): every live fact stays in the view with
    // NULL dim columns until its dim arrives; the dim batches here
    // seed only a third of the users, so most fact rows START null-
    // dimmed and FLIP to joined as batches 1 and 2 insert their dims —
    // the flow runs live through both version steps, maintained from
    // deltas only. The outer invariant makes the view self-
    // maintainable: the dim-dirty branch re-derives from the VIEW
    // (semi-pruned to dirty keys), never a fact-table rescan. Oracle:
    // rescan LEFT JOIN of the two replayed merges.
    "q_cdc_join_outer" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoinOuter(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val v1 = graft.operators.Scd.cdcApplyJoinOuter(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), dimAt(1),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApplyJoinOuter(v1,
          facts.changes(1L, 2L), dimCh(1L, 2L), dimAt(2),
          "idstr", "author", fCols, dCols)
        .orderBy("idstr")
    }),

    // Δview CHAINING — the IVM stack closed end to end: the join view
    // is maintained by cdcApplyJoinWithDelta, which ALSO emits the
    // kind-tagged view delta, and a downstream cdcApply maintains a
    // grouped COUNT+SUM over the joined view from THAT delta — F⋈D →
    // groupBy, every stage |Δ|-sized, neither the tables nor the view
    // ever rescanned. Oracle: aggregate of the rescan join of both
    // replayed merges — a leak in the delta emission (a missed
    // re-attribution, a phantom no-op update) shifts a group and
    // hash-mismatches.
    "q_cdc_join_agg" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoin(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val agg0 = graft.operators.Scd.cdcBaseAgg(base, "tier", "score",
        "n_rows", "sum_score_c")
      val (v1, d1) = graft.operators.Scd.cdcApplyJoinWithDelta(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), factsAt(1), dimAt(1),
        "idstr", "author", fCols, dCols)
      val agg1 = graft.operators.Scd.cdcApply(agg0, d1, "tier", "score",
        "n_rows", "sum_score_c")
      val (_, d2) = graft.operators.Scd.cdcApplyJoinWithDelta(v1,
        facts.changes(1L, 2L), dimCh(1L, 2L), factsAt(2), dimAt(2),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApply(agg1, d2, "tier", "score",
          "n_rows", "sum_score_c")
        .orderBy("tier")
    }),

    // Δview chaining for the OUTER view — the late-arriving-dimension
    // view drives a downstream aggregate at |Δ| cost too: facts with
    // no dim yet live in the NULL-tier group, and the outer delta
    // carries each null→joined flip (a dim insert) as an update whose
    // before-image holds the null dims, so cdcApply moves those facts
    // between the null group and their new tier without ever seeing
    // the view. Oracle: aggregate of the rescan LEFT JOIN — the
    // uncovered-author residue keeps the NULL group non-empty at the
    // final state, so the null-group algebra faces the gate.
    "q_cdc_join_outer_agg" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoinOuter(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val agg0 = graft.operators.Scd.cdcBaseAgg(base, "tier", "score",
        "n_rows", "sum_score_c")
      val (v1, d1) = graft.operators.Scd.cdcApplyJoinOuterWithDelta(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), dimAt(1),
        "idstr", "author", fCols, dCols)
      val agg1 = graft.operators.Scd.cdcApply(agg0, d1, "tier", "score",
        "n_rows", "sum_score_c")
      val (_, d2) = graft.operators.Scd.cdcApplyJoinOuterWithDelta(v1,
        facts.changes(1L, 2L), dimCh(1L, 2L), dimAt(2),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApply(agg1, d2, "tier", "score",
          "n_rows", "sum_score_c")
        .orderBy("tier")
    }),

    // The PRUNED top-k dirty-group rescan — the q_cdc_join_pruned
    // layout applied to the new applier: the fact store CO-PARTITIONS
    // BY THE GROUP (author-hash buckets; key-stable because this feed
    // never rewrites an author), so the rescan snapshot is a
    // manifest-pruned scanForKeys read of the REMOVAL AUTHORS' buckets
    // — a correct over-approximation of the dirty set (dirty ⊆ removal
    // groups; the applier's own semi-join prunes exactly, bucket-mates
    // are residual-filtered). The dirty slice is deliberately small
    // (one %31 user slice of score bumps) — the micro-batch-against-
    // 100TB shape; StoreSpec pins files(pruned) < files(table) for the
    // device. Oracle: the replayed bump windowed — the pruned read
    // must also be CORRECT.
    "q_cdc_topk_pruned" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdctkp")
      val facts = new Livestream.UpsertTable(s, tmp.resolve("f").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(pmod(xxhash64(col("author")), lit(16))))
      facts.seed(oldComments(s, dir))                                 // v0
      val bump = oldComments(s, dir).filter(col("created") % 31 === 0)
        .withColumn("score", col("score") + lit(7L))
        .withColumn("_seq", lit(0L))
      facts.merge(bump, "_seq", storeEdits = Some(false))             // v1
      val base = graft.operators.Scd.cdcBaseTopK(facts.at(0),
        "author", "idstr", "score", 3, "score_c", "rk")
      val ch = facts.changes(0L, 1L)
      val removalAuthors = ch
        .filter(col("kind").isin("delete", "update"))
        .select(col("before_author").as("author"))
      val snapPruned = facts.scanForKeys(removalAuthors)
      graft.operators.Scd.cdcApplyTopK(base, ch, snapPruned,
          "author", "idstr", "score", 3, "score_c", "rk")
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("author", "rk")
    }),

    // The PRUNED session dirty-group rescan — the q_cdc_topk_pruned
    // layout applied to the session applier: the fact store
    // CO-PARTITIONS BY THE GROUP (author-hash buckets; key-stable
    // because this feed never rewrites an author), so the rescan
    // snapshot is a manifest-pruned scanForKeys read of the dirty
    // authors' buckets — a correct over-approximation (bucket-mates
    // ride along; the applier's semi-join prunes exactly). The dirty
    // slice is deliberately small (one %31 user slice of score bumps)
    // — the micro-batch-against-100TB shape. Oracle: the replayed
    // bump re-sessionized — the pruned read must also be CORRECT.
    "q_cdc_session_pruned" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcsp")
      val facts = new Livestream.UpsertTable(s, tmp.resolve("f").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(pmod(xxhash64(col("author")), lit(16))))
      facts.seed(oldComments(s, dir))                                 // v0
      val bump = oldComments(s, dir).filter(col("created") % 31 === 0)
        .withColumn("score", col("score") + lit(7L))
        .withColumn("_seq", lit(0L))
      facts.merge(bump, "_seq", storeEdits = Some(false))             // v1
      val base = graft.operators.Scd.cdcBaseSession(facts.at(0),
        "author", "score", 500L)
      val ch = facts.changes(0L, 1L)
      val dirtyAuthors = ch.filter(col("kind").isin("insert", "update"))
        .select(col("after_author").as("author"))
        .unionByName(ch.filter(col("kind").isin("delete", "update"))
          .select(col("before_author").as("author")))
        .distinct()
      val snapPruned = facts.scanForKeys(dirtyAuthors)
      graft.operators.Scd.cdcApplySession(base, ch, snapPruned,
          "author", "score", 500L)
        .orderBy("author", "session_id")
    }),

    // TOP-K chained off the join view — the leaderboard over an
    // ENRICHED view, maintained end to end at |Δ| cost: the emitted
    // Δview is cdcApplyTopK's changes frame verbatim (fact key +
    // before_/after_ images — the WithDelta contract IS the changes
    // contract), and the new view the SAME call returns is the top-k
    // applier's dirty-group rescan snapshot (the min/max chaining
    // device). Top-3 facts per tier by score through two version steps
    // on both tables; the oracle windows the rescan join, so a stale
    // rank riding a dim re-attribution (a fact whose tier CHANGED
    // must leave one leaderboard and enter another) hash-mismatches.
    "q_cdc_join_topk" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoin(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val tk0 = graft.operators.Scd.cdcBaseTopK(base, "tier", "idstr",
        "score", 3, "score_c", "rk")
      val (v1, d1) = graft.operators.Scd.cdcApplyJoinWithDelta(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), factsAt(1), dimAt(1),
        "idstr", "author", fCols, dCols)
      val tk1 = graft.operators.Scd.cdcApplyTopK(tk0, d1, v1,
        "tier", "idstr", "score", 3, "score_c", "rk")
      val (v2, d2) = graft.operators.Scd.cdcApplyJoinWithDelta(v1,
        facts.changes(1L, 2L), dimCh(1L, 2L), factsAt(2), dimAt(2),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApplyTopK(tk1, d2, v2,
          "tier", "idstr", "score", 3, "score_c", "rk")
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("tier", "rk")
    }),

    // SNOWFLAKE IVM — view-over-view: level 1 maintains F⋈D(users)
    // emitting Δview1; level 2 consumes Δview1 AS ITS FACT CHANGES
    // (the WithDelta contract is exactly the changesF contract — that
    // is the point) against a third versioned store, the region dim
    // keyed by view1's region_c. Three tables churn concurrently
    // (facts ×3, users ×3, regions ×3 versions); no table and neither
    // view is ever rescanned — level 2's dim-dirty branch reads
    // view1 (its "fact table" IS the maintained level-1 view). The
    // region batches leave 207 uncovered, so the inner drop at level
    // 2 is exercised, and view1 rows GAIN level-2 matches mid-chain
    // as the 100/200-level codes arrive. Oracle: rescan join of all
    // THREE replayed merges.
    "q_cdc_snowflake" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcsf")
      val reg = new Livestream.UpsertTable(s, tmp.resolve("r").toString,
        regionEntity, dimRegion(s, 0).drop("_seq").limit(0),
        outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 4)))
      reg.seed(dimRegion(s, 0).drop("_seq"))                          // v0
      reg.merge(dimRegion(s, 1), "_seq", storeEdits = Some(false))    // v1
      reg.merge(dimRegion(s, 2), "_seq", storeEdits = Some(false))    // v2
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val regionCode = expr("CAST(substr(idstr, 2) AS BIGINT)").as("region_c")
      def regAt(v: Long) =
        reg.at(v).select(regionCode, col("zone"), col("zpop"))
      def regCh(a: Long, b: Long) =
        reg.changes(a, b).select(regionCode, col("kind"))
      val f1Cols = Seq("score"); val d1Cols = Seq("tier", "region_c")
      val f2Cols = Seq("author", "score", "tier"); val d2Cols = Seq("zone", "zpop")
      val view1_0 = graft.operators.Scd.cdcBaseJoin(factsAt(0), dimAt(0),
        "idstr", "author", f1Cols, d1Cols)
      val view2_0 = graft.operators.Scd.cdcBaseJoin(view1_0, regAt(0),
        "idstr", "region_c", f2Cols, d2Cols)
      val (view1_1, dv1) = graft.operators.Scd.cdcApplyJoinWithDelta(view1_0,
        facts.changes(0L, 1L), dimCh(0L, 1L), factsAt(1), dimAt(1),
        "idstr", "author", f1Cols, d1Cols)
      val view2_1 = graft.operators.Scd.cdcApplyJoin(view2_0, dv1,
        regCh(0L, 1L), view1_1, regAt(1),
        "idstr", "region_c", f2Cols, d2Cols)
      val (view1_2, dv2) = graft.operators.Scd.cdcApplyJoinWithDelta(view1_1,
        facts.changes(1L, 2L), dimCh(1L, 2L), factsAt(2), dimAt(2),
        "idstr", "author", f1Cols, d1Cols)
      graft.operators.Scd.cdcApplyJoin(view2_1, dv2,
          regCh(1L, 2L), view1_2, regAt(2),
          "idstr", "region_c", f2Cols, d2Cols)
        .orderBy("idstr")
    }),

    // The OUTER top-k chain — the last cell of the chained-IVM matrix
    // (inner/outer × count-sum/min-max/top-k): the LEFT-OUTER join view
    // maintained by cdcApplyJoinOuterWithDelta feeds cdcApplyTopK, so
    // the NULL-tier group — facts whose author has no dim yet — runs a
    // live "unattributed" leaderboard. The dim batches seed only a
    // third of the users, so most facts START on the null-group
    // leaderboard and MOVE to their tier's as dims arrive (the outer
    // delta carries each flip as an update whose before-image holds
    // the null dims); the uncovered-author residue keeps the null
    // leaderboard non-empty at the gated final state. Oracle: the
    // rescan LEFT JOIN windowed per tier — q_cdc_topk's window form
    // verbatim, NULL tier one partition in both engines.
    "q_cdc_join_outer_topk" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val base = graft.operators.Scd.cdcBaseJoinOuter(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val tk0 = graft.operators.Scd.cdcBaseTopK(base, "tier", "idstr",
        "score", 3, "score_c", "rk")
      val (v1, d1) = graft.operators.Scd.cdcApplyJoinOuterWithDelta(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), dimAt(1),
        "idstr", "author", fCols, dCols)
      val tk1 = graft.operators.Scd.cdcApplyTopK(tk0, d1, v1,
        "tier", "idstr", "score", 3, "score_c", "rk")
      val (v2, d2) = graft.operators.Scd.cdcApplyJoinOuterWithDelta(v1,
        facts.changes(1L, 2L), dimCh(1L, 2L), dimAt(2),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApplyTopK(tk1, d2, v2,
          "tier", "idstr", "score", 3, "score_c", "rk")
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("tier", "rk")
    }),

    // TIME-WINDOWED IVM — the applier family's time dimension
    // (Scd.cdcApplyWindowed): a per-(window, group) COUNT+SUM dashboard
    // view maintained from version-range deltas only, hopping windows
    // (600 wide, sliding 200 — each image expands into its 3
    // memberships, the q_hopping_agg k-unnest device applied to the
    // |Δ|-sized change frame instead of the corpus). The window keys on
    // the SCORE axis deliberately: scores CHANGE across the merges, so
    // rows move between windows live through the gate (an update
    // subtracts from every before-window and adds to every
    // after-window); `distinguish` rides as a second, NULL-carrying
    // group column. Oracle: the final merged state re-windowed by the
    // same membership unnest — a row served in a stale window, a
    // missed move, or a lingering empty window hash-mismatches.
    "q_cdc_window" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdcw")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                   // v0
      val nc = newComments(s, dir)
      table.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                       // v1
      table.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                       // v2
      val gs = Seq("distinguish")
      val base = graft.operators.Scd.cdcBaseWindowed(table.at(0L), gs,
        "textlen", "score", 600L, 200L, "w_start", "n_rows", "sum_len")
      val v1 = graft.operators.Scd.cdcApplyWindowed(base,
        table.changes(0L, 1L), gs, "textlen", "score", 600L, 200L,
        "w_start", "n_rows", "sum_len")
      graft.operators.Scd.cdcApplyWindowed(v1,
          table.changes(1L, 2L), gs, "textlen", "score", 600L, 200L,
          "w_start", "n_rows", "sum_len")
        .orderBy("w_start", "distinguish")
    }),

    // WINDOWED view chained off the join Δview — the time-dimension
    // cell of the chained-IVM matrix: the enriched view's emitted
    // delta (cdcApplyJoinWithDelta) IS cdcApplyWindowed's changes
    // frame verbatim, so a per-(window, tier) dashboard over F⋈D
    // maintains end to end at |Δ|·k cost — re-attributed facts move
    // between tiers' windows, score bumps move rows between windows,
    // and neither table nor view ever rescans. Oracle: the rescan
    // join re-windowed by the same membership unnest.
    "q_cdc_join_window" -> ((s, dir) => {
      val (facts, dim) = cdcJoinTables(s, dir)
      def factsAt(v: Long) =
        facts.at(v).select(col("idstr"), col("author"), col("score"))
      def dimAt(v: Long) =
        dim.at(v).select(col("idstr").as("author"), col("tier"), col("region_c"))
      def dimCh(a: Long, b: Long) =
        dim.changes(a, b).select(col("idstr").as("author"), col("kind"))
      val fCols = Seq("score"); val dCols = Seq("tier", "region_c")
      val gs = Seq("tier")
      val base = graft.operators.Scd.cdcBaseJoin(factsAt(0), dimAt(0),
        "idstr", "author", fCols, dCols)
      val wv0 = graft.operators.Scd.cdcBaseWindowed(base, gs, "score",
        "score", 600L, 200L)
      val (v1, d1) = graft.operators.Scd.cdcApplyJoinWithDelta(base,
        facts.changes(0L, 1L), dimCh(0L, 1L), factsAt(1), dimAt(1),
        "idstr", "author", fCols, dCols)
      val wv1 = graft.operators.Scd.cdcApplyWindowed(wv0, d1, gs,
        "score", "score", 600L, 200L)
      val (_, d2) = graft.operators.Scd.cdcApplyJoinWithDelta(v1,
        facts.changes(1L, 2L), dimCh(1L, 2L), factsAt(2), dimAt(2),
        "idstr", "author", fCols, dCols)
      graft.operators.Scd.cdcApplyWindowed(wv1, d2, gs,
          "score", "score", 600L, 200L)
        .orderBy("w_start", "tier")
    }),

    // The windowed dashboard MAINTAINED BY THE STREAM (18th maintained
    // artifact): StreamWindow.windowSink merges each micro-batch into
    // the versioned fact store and catches the published view up by
    // changes(basis, current) — the StreamTopK device applied to the
    // applier family's time dimension. Build runs as untimed setup
    // (Bench.IncrementalSetup); the timed body READS the dashboard.
    // Shares q_cdc_window's oracle VERBATIM: maintenance leaks
    // hash-mismatch.
    "q_window_incremental" -> ((s, dir) => {
      val root = incrementalWindow(s, dir)
      graft.streaming.StreamWindow.view(s, root)
        .orderBy("w_start", "distinguish")
    }),

    // Stream-maintained SESSION dashboard — the 19th maintained
    // artifact (StreamSession.sessionSink): real micro-batches, each a
    // merge into the versioned fact store plus a dirty-group session
    // catch-up through the SHARED batch sessionizer; the published view
    // must equal q_cdc_session's chained-applier result, whose oracle
    // (the lag/cumsum rescan of the final merged state) gates VERBATIM.
    "q_session_incremental" -> ((s, dir) => {
      val root = incrementalSession(s, dir)
      graft.streaming.StreamSession.view(s, root)
        .orderBy("author", "session_id")
    }),

    // Multi-column group keys through the top-k applier — the
    // real-dashboard (dim1, dim2) leaderboard (Scd.cdcApplyTopKGrouped,
    // the struct-packing device over the proven single-group algebra):
    // top-2 docs per (author, distinguish) maintained across the same
    // two-version chain, the NULL distinguish value carrying its own
    // composite groups (null-safe struct grouping). Oracle: ROW_NUMBER
    // over the two-column partition of the final merged state.
    "q_cdc_topk_grouped" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_cdctkg")
      val table = new Livestream.UpsertTable(s, tmp.resolve("tbl").toString,
        Merge.comments, oldComments(s, dir).limit(0), outputPartitions = Some(1),
        partitioning = Some(Livestream.keyBucket(nBuckets = 16)))
      table.seed(oldComments(s, dir))                                   // v0
      val nc = newComments(s, dir)
      table.merge(nc.filter(col("idint") % 4 === 0), "_seq",
        storeEdits = Some(false))                                       // v1
      table.merge(nc.filter(col("idint") % 4 =!= 0), "_seq",
        storeEdits = Some(false))                                       // v2
      val gs = Seq("author", "distinguish")
      val base = graft.operators.Scd.cdcBaseTopKGrouped(table.at(0L), gs,
        "idstr", "score", 2, "score_c", "rk")
      val a1 = graft.operators.Scd.cdcApplyTopKGrouped(base,
        table.changes(0L, 1L), table.at(1L), gs, "idstr", "score", 2,
        "score_c", "rk")
      graft.operators.Scd.cdcApplyTopKGrouped(a1,
          table.changes(1L, 2L), table.at(2L), gs, "idstr", "score", 2,
          "score_c", "rk")
        .withColumn("rk", col("rk").cast("long"))
        .orderBy("author", "distinguish", "rk")
    }),

    // J2+A5+P5 — the batch upsert merge: final table state.
    "q_merge_upsert" -> ((s, dir) => {
      Merge.upsert(oldComments(s, dir), newComments(s, dir),
          Merge.comments, "_seq", nowEpoch = lit(55L))
        .table.orderBy("idstr")
    }),

    // T8 — the edit-CDC stream of the same merge.
    "q_merge_edits" -> ((s, dir) => {
      Merge.upsert(oldComments(s, dir), newComments(s, dir),
          Merge.comments, "_seq", nowEpoch = lit(55L))
        .edits.orderBy("idstr")
    }),

    // J1 — merge_db anti-join insert.
    "q_merge_db" -> ((s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("idint"), col("o_orderstatus"), col("o_totalprice"))
      val mine = orders.filter(col("idint") % 3 =!= 0)
        .withColumn("o_orderstatus", lit("MINE"))
      val other = orders.filter(col("idint") % 2 === 0)
      Merge.mergeDb(mine, other)
        .select(col("idint"), col("o_orderstatus"), cents(col("o_totalprice")).as("price_c"))
        .orderBy("idint")
    }),

    // J2-at-rest over the BUCKETED layout (Store.writeBucketed) — the
    // at-scale answer to the reference's idstr secondary index
    // (tsdb.py:71, 86): both sides are written bucketed+sorted on the
    // join key, so the upsert-probe-shaped join plans with ZERO hash
    // exchanges (co-located scan-side buckets; asserted in StoreSpec's
    // driver-query plan test). The bucketed write is part of the query on
    // purpose: it is the amortized cost the layout trades for every
    // subsequent shuffle-free join.
    "q_bucketed_join" -> ((s, dir) => {
      val base = s"/tmp/graft_bucketed/${new java.io.File(dir).getName}"
      s.sql("DROP TABLE IF EXISTS graft_bucket_old")
      s.sql("DROP TABLE IF EXISTS graft_bucket_new")
      graft.sources.Store.writeBucketed(oldComments(s, dir),
        "graft_bucket_old", s"$base/old", "idstr", 8)
      graft.sources.Store.writeBucketed(newComments(s, dir).drop("_seq", "_edited"),
        "graft_bucket_new", s"$base/new", "idstr", 8)
      val o = s.table("graft_bucket_old")
      val n = s.table("graft_bucket_new")
      o.join(n, Seq("idstr"))
        .select(col("idstr"),
          o("body").as("body_old"), n("body").as("body_new"),
          o("score").as("score_old"), n("score").as("score_new"))
        .orderBy("idstr")
    }),

    // J5/O9 — comment-tree reconstruction over an events-derived forest
    // (binary trees of 16 nodes); preorder rank + depth, DuckDB oracle via
    // WITH RECURSIVE — the operator Spark SQL itself cannot express.
    "q_tree" -> ((s, dir) => {
      val nodes = Tables.load(s, dir, "events").select(
        (col("event_id") - (col("event_id") % 16)).as("grp"),
        col("event_id").as("id"),
        when(col("event_id") % 16 === 0, lit(null).cast("long"))
          .otherwise(col("event_id") - (col("event_id") % 16) +
            floor((col("event_id") % 16 - 1) / 2)).as("parent"),
        lit(0L).as("sortKey"))
      Trees.buildFrame(nodes, "grp", "id", "parent", "sortKey")
        .select(col("group").as("grp"), col("id"), col("depth"), col("rank"))
        .orderBy("grp", "rank")
    }),

    // E3/J5/O9/F3/F8-F10/S8 — distributed thread render: cogroup per
    // submission, in-task tree assembly, markdown + escapes, score-desc
    // siblings. HTML is not SQL-expressible, so the oracle hash-compares
    // against the COMMITTED golden parquet (frozen by graft.RenderGolden,
    // regenerated only as an explicit reviewed act); construct-level
    // semantics are asserted in RenderSpec.
    "q_render_html" -> ((s, dir) => {
      import s.implicits._
      val subs = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 20 === 0)
        .select(
          concat(lit("t3_"), col("o_orderkey")).as("idstr"),
          col("o_orderpriority").as("title"),
          when(col("o_orderkey") % 7 === 0, lit("[deleted]"))
            .otherwise(concat(lit("u"), col("o_custkey"))).as("author"),
          epochSec(col("o_orderdate")).as("created"),
          cents(col("o_totalprice")).as("score"),
          lit("test").as("subreddit"),
          when(col("o_orderkey") % 2 === 0, concat(lit("https://ex.com/"), col("o_orderkey")))
            .as("url"),
          when(col("o_orderkey") % 2 =!= 0,
            concat(lit("body **"), col("o_orderpriority"), lit("** <raw>")))
            .as("selftext"))
      val coms = Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") % 20 === 0)
        .select(
          concat(lit("t1_"), col("l_orderkey") * 10 + col("l_linenumber")).as("idstr"),
          concat(lit("t3_"), col("l_orderkey")).as("submission"),
          when(col("l_linenumber") === 1, concat(lit("t3_"), col("l_orderkey")))
            .otherwise(concat(lit("t1_"),
              col("l_orderkey") * 10 + col("l_linenumber") - 1)).as("parent"),
          concat(lit("u"), col("l_suppkey")).as("author"),
          epochSec(col("l_shipdate")).as("created"),
          cents(col("l_extendedprice")).as("score"),
          concat(lit("comment *"), col("l_returnflag"), lit("*")).as("body"))
      graft.render.OfflineReading.fromFrames(subs, coms)
        .toDF("idstr", "html")
        .select(col("idstr"), length(col("html")).as("html_len"),
          md5(col("html")).as("html_md5"))
        .orderBy("idstr")
    }),

    // S3/S5 — page-overlap/live-enrichment dedupe: newest wins per key.
    "q_dedupe_latest" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
      Merge.dedupeLatest(ev, "user_id", "event_id")
        .orderBy("user_id")
    }),

    // Engine extension beyond the reference surface: event-time tumbling
    // windows (the batch form of the streaming windowed agg in
    // StreamingSpec). window() start is exposed as epoch for the oracle.
    "q_window_agg" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(
        to_timestamp(tsSec(raw)).as("t"), col("event_type"),
        cents(col("value")).as("v_c"))
      ev.groupBy(window(col("t"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("v_c").as("sum_v_c"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_v_c"))
        .orderBy("w_start", "event_type")
    }),

    // HOPPING (sliding) window aggregate: 6-hour windows advancing
    // hourly via Spark's native window(slide) — each event lands in 6
    // overlapping windows (Expand ×6 of the EVENT STREAM's projected
    // columns, then one shuffle on the window start; the fan-out factor
    // is duration/slide, a constant). The oracle replays membership as
    // an explicit k ∈ [0, 6) unnest.
    "q_hopping_agg" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(
        to_timestamp(tsSec(raw)).as("t"), cents(col("value")).as("v_c"))
      ev.groupBy(window(col("t"), "6 hours", "1 hour"))
        .agg(count(lit(1)).as("n"), sum("v_c").as("sum_v_c"))
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("n"), col("sum_v_c"))
        .orderBy("w_start")
    }),

    // Table profiling (warehouse ANALYZE/summarize): one row per column
    // with count / nulls / exact distinct / min / max, values stringified
    // from canonical integer forms so the report is engine-portable.
    // Each column's stats are one map-side-combined aggregate pass.
    "q_profile_table" -> ((s, dir) => {
      val ord = Tables.load(s, dir, "orders")
      def stats(name: String, c: Column): DataFrame =
        ord.agg(
          count(lit(1)).as("n"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(c).as("n_distinct"),
          min(c).cast("string").as("min_s"),
          max(c).cast("string").as("max_s"))
          .select(lit(name).as("column"), col("n"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      Seq(
        stats("o_orderkey", col("o_orderkey")),
        stats("o_custkey", col("o_custkey")),
        stats("o_orderstatus", col("o_orderstatus")),
        stats("o_totalprice_c", cents(col("o_totalprice"))),
        stats("o_orderdate_sec", epochSec(col("o_orderdate"))),
        stats("o_orderpriority", col("o_orderpriority")))
        .reduce(_ unionByName _)
        .orderBy("column")
    }),

    // Gap-based session windows over the event stream (batch form of the
    // flatMapGroupsWithState sessionizer — data-dependent windows that
    // clock-aligned window() cannot express).
    "q_sessionize" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.streaming.Sessionize.batch(
          raw.select(col("user_id"), tsSec(raw).as("ts")),
          "user_id", col("ts"), gapSec = 3600)
        .orderBy("user_id", "session_id")
    }),

    // M4 time-series downsampling: per-day min/max/first/last of the
    // event value — the pixel-exact line-chart reduction; one map-side-
    // combined aggregate, deterministic first/last via struct min/max.
    "q_m4_downsample" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.m4Downsample(raw, tsSec(raw), col("event_id"),
          cents(col("value")), bucketSec = 86400L)
        .orderBy("bucket")
    }),

    // Frequent event paths: top-15 3-step event-type sequences across
    // user timelines — funnel DISCOVERY; one key shuffle, row-local
    // shingling, shingle-bounded count agg.
    "q_event_paths" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.eventPaths(raw, "user_id", tsSec(raw),
        col("event_id"), col("event_type"), n = 3, k = 15)
    }),

    // Spearman rank correlation (exact integer device): does quantity
    // track price within each return-flag class? first-rank semantics
    // with id tiebreak; rho in basis points via integer division.
    "q_spearman" -> ((s, dir) => {
      graft.operators.Analytics.spearman(
          Tables.load(s, dir, "lineitem").select(
            col("l_returnflag"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("lid"),
            cents(col("l_quantity")).as("q_c"),
            cents(col("l_extendedprice")).as("p_c")),
          "l_returnflag", "lid", "q_c", "p_c")
        .orderBy("l_returnflag")
    }),

    // Offline CUSUM changepoint scan over the daily event-count series:
    // the mean-centered prefix walk n·prefix − k·total stays an exact
    // integer; |S| peaks at level-shift boundaries. One corpus exchange;
    // windows over the day-bounded series.
    "q_changepoint" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.changepoints(raw, tsSec(raw), k = 5)
    }),

    // Salted two-stage aggregation over a 5-value (maximally skewed) key:
    // stage 1 spreads each hot key over 8 salt tasks, stage 2 combines
    // the partials — row-identical to the plain GROUP BY the oracle runs.
    // The skew-mitigation device itself is what's hash-gated.
    "q_salted_agg" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Skew.saltedAgg(
          raw.select(col("event_type"), col("event_id"),
            cents(col("value")).as("v_c")),
          key = "event_type", salts = 8, saltSrc = col("event_id"),
          partial = Seq(count(lit(1)).as("_n"), sum("v_c").as("_s")),
          combine = Seq(sum("_n").as("n_events"), sum("_s").as("sum_c")))
        .orderBy("event_type")
    }),

    // Cluster (group-level) sampling: sample USERS, keep every event of
    // a sampled user — the correlation-safe subsample (row-level
    // sampling splits a user's history; downstream per-user features
    // would silently train on truncated trajectories). The md5-rate rule
    // keyed on user_id is map-only and group-atomic by construction.
    "q_user_sample" -> ((s, dir) => {
      graft.operators.TextAnalysis.stratifiedSample(
          Tables.load(s, dir, "events")
            .select(col("event_id"), col("user_id"), col("event_type"))
            .withColumn("_all", lit("all")),
          key = "user_id", strata = "_all", ratesPct = Map("all" -> 20))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    }),

    // Sweep-line concurrency profile over the gap-session intervals of
    // q_sessionize: seconds spent at each simultaneous-session count.
    // +1/−1 boundary deltas collapse to net-delta-per-distinct-second
    // (ONE corpus exchange, map-side combine); the cumulative window
    // runs over the time-DOMAIN-bounded delta frame, never the corpus.
    "q_concurrency" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val sessions = graft.streaming.Sessionize.batch(
        raw.select(col("user_id"), tsSec(raw).as("ts")),
        "user_id", col("ts"), gapSec = 3600)
      graft.operators.Events.concurrency(sessions, "start", "end")
        .orderBy("level")
    }),

    // Robust outlier detection: median ± 3·MAD per event class, exact
    // integer cents via histogram-rank devices (mean/σ z-scores need
    // squared sums that overflow BIGINT at corpus scale; median/MAD is
    // also the statistically robust choice on heavy-tailed values).
    // Corpus touched exactly twice; the MAD histogram derives from the
    // value histogram, never a second corpus aggregation.
    "q_outliers_mad" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      Analytics.madOutliers(
          raw.select(col("event_type"), col("event_id"),
            cents(col("value")).as("v_c")),
          "event_type", "event_id", "v_c", k = 3)
        .withColumnRenamed("med", "med_c").withColumnRenamed("mad", "mad_c")
        .orderBy("event_type", "event_id")
    }),

    // Engine extension: distributed AS-OF join — each click is matched
    // to the same user's most recent purchase at-or-before it, within
    // 24 h. Union-merge form: ONE hash exchange on user_id, a per-key
    // time sort, carry-forward window — no inequality join in the plan
    // (the oracle replays the semantics AS an inequality join, which is
    // exactly the shape this operator exists to avoid at 100 TB).
    "q_asof_join" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"),
        tsSec(raw).as("t"), col("event_type"), cents(col("value")).as("v_c"))
      TemporalJoin.asof(
          left = ev.filter(col("event_type") === "click"),
          right = ev.filter(col("event_type") === "purchase"),
          key = "user_id", leftTs = "t", leftId = "event_id",
          rightTs = "t", rightId = "event_id",
          rightPayload = Seq("v_c"), toleranceSec = 86400L)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("t").as("click_t"), col("matched_id").as("purchase_id"),
          col("v_c").as("purchase_c"),
          (col("t") - col("matched_ts")).as("lag_sec"))
        .orderBy("click_id")
    }),

    // Engine extension: bounded range/interval join — every click inside
    // a purchase's 1 h attribution window, per user, via time-bucket
    // decomposition (equi-join on (user, bucket) + BETWEEN residual;
    // each pair emitted exactly once, no dedup pass).
    "q_range_join" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"),
        tsSec(raw).as("t"), col("event_type"))
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          (col("t") - 3600L).as("w_start"), col("t").as("w_end"))
      TemporalJoin.rangeJoin(
          events = ev.filter(col("event_type") === "click"),
          intervals = windows, key = "user_id",
          eventId = "event_id", ts = "t",
          intervalId = "purchase_id", start = "w_start", end = "w_end",
          bucketSec = 3600L)
        .select(col("purchase_id"), col("event_id").as("click_id"),
          col("user_id"), (col("w_end") - col("t")).as("gap_sec"))
        .orderBy("purchase_id", "click_id")
    }),

    // Engine extension: Z-order curve position over (user_id, ts) — the
    // multi-column at-rest clustering key (Delta/Iceberg OPTIMIZE ZORDER
    // analog). Pure integer bucket-rank + bit-interleave, so the curve
    // position itself hash-gates; the layout writer (ZOrder.writeZOrdered)
    // range-partitions on exactly this value.
    "q_zorder" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"), tsSec(raw).as("t"))
      val r = ev.agg(min("user_id"), max("user_id"), min("t"), max("t")).head()
      ev.select(col("event_id"), col("user_id"), col("t"),
          graft.sources.ZOrder.zValue(
            col("user_id"), r.getLong(0), r.getLong(1),
            col("t"), r.getLong(2), r.getLong(3), bits = 8).as("zval"))
        .orderBy("event_id")
    }),

    // n-COLUMN Z-order (the Delta OPTIMIZE ZORDER BY (a, b, c) arity):
    // the same per-column affine bucket ranks interleaved 3 ways by the
    // generalized layout — column i's bit k at position n·k + (n−1−i),
    // which REPRODUCES q_zorder's classic 2-dim interleave at n = 2
    // (one definition, every arity; the oracle's term list is generated
    // by the SAME ZOrder.interleaveSqlN the Column form uses).
    "q_zorder3" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"), tsSec(raw).as("t"),
        cents(col("value")).as("value_c"))
      val r = ev.agg(min("user_id"), max("user_id"), min("t"), max("t"),
        min("value_c"), max("value_c")).head()
      ev.select(col("event_id"), col("user_id"), col("t"), col("value_c"),
          graft.sources.ZOrder.zValueN(Seq(
            (col("user_id"), r.getLong(0), r.getLong(1)),
            (col("t"), r.getLong(2), r.getLong(3)),
            (col("value_c"), r.getLong(4), r.getLong(5))),
            bits = 8).as("zval"))
        .orderBy("event_id")
    }),

    // File-level zone maps over the z-ordered layout: writeZOrdered
    // gives every file a tight bounding box in BOTH interleaved
    // dimensions, the ZoneMap sidecar records per-file min/max, and
    // scanRange hands Spark ONLY the intersecting files (driver-side
    // file skipping — the Delta/Iceberg stats device; the file-count
    // drop is asserted in StoreSpec, the RESULT is what hash-gates
    // here: pruning must lose nothing).
    "q_zonemap_scan" -> ((s, dir) => {
      val base = s"/tmp/graft_zonemap/${new java.io.File(dir).getName}"
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"), tsSec(raw).as("t"),
        cents(col("value")).as("value_c"))
      graft.sources.ZOrder.writeZOrdered(ev, "user_id", "t", base, numFiles = 16)
      graft.sources.ZoneMap.build(s, base, Seq("user_id", "t"))
      graft.sources.ZoneMap.scanRange(s, base, "user_id", 20L, 39L)
        .orderBy("event_id")
    }),

    // Catalyst-integrated file skipping: same sidecar, but the pruning
    // happens INSIDE planning — scanAuto routes the read through a
    // zone-map-aware FileIndex (graftshim.ZoneMapFileIndex). The filter
    // mixes conjuncts the conservative extractor DOES prune on (the
    // top-level user_id <= 59 range) with ones it deliberately passes
    // through to the residual (the OR disjunction, the Not) — so the
    // gated query exercises REAL planning-time pruning (the range
    // conjunct drops every file with min > 59) while the hash gate pins
    // that pruning + residual together lose nothing. StoreSpec pins the
    // file-count drop on the extractable shapes.
    "q_zonemap_auto" -> ((s, dir) => {
      val base = s"/tmp/graft_zonemap_auto/${new java.io.File(dir).getName}"
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"), tsSec(raw).as("t"),
        cents(col("value")).as("value_c"))
      graft.sources.ZOrder.writeZOrdered(ev, "user_id", "t", base, numFiles = 16)
      graft.sources.ZoneMap.build(s, base, Seq("user_id", "t"))
      val (df, _) = graft.sources.ZoneMap.scanAuto(s, base)
      df.filter(col("user_id") <= 59L) // extractable: prunes files
        .filter(col("user_id").between(40L, 59L) ||
          col("user_id").isin(5L, 17L)) // residual-only (Or)
        .filter(col("user_id") =!= 44L) // residual-only (Not)
        .orderBy("event_id")
    }),

    // Bloom-sidecar file skipping: a POINT/IN lookup on a
    // high-cardinality key over a layout clustered by something else —
    // every file's [min, max] for event_id straddles the probe values,
    // so the zone map keeps ALL files and the per-file bloom words (the
    // q_bloom_join md5-salted rule, per file) are the only pruner.
    // ZoneMapFileIndex consults them for the pushed IN constraint at
    // planning time; false-positive keeps are correctness-neutral (the
    // residual runs), which is exactly what the hash gate pins: pruning
    // + residual lose nothing. StoreSpec pins the file-count drop.
    "q_bloom_skip" -> ((s, dir) => {
      val base = s"/tmp/graft_bloomskip/${new java.io.File(dir).getName}"
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("event_id"), col("user_id"), tsSec(raw).as("t"),
        cents(col("value")).as("value_c"))
      ev.repartition(16, col("user_id")).write.mode("overwrite").parquet(base)
      graft.sources.ZoneMap.build(s, base, Seq("user_id", "t"))
      graft.sources.ZoneMap.buildBloom(s, base, Seq("event_id"))
      val (df, _) = graft.sources.ZoneMap.scanAuto(s, base)
      df.filter(col("event_id").isin(7L, 123L, 4242L))
        .orderBy("event_id")
    }),

    // Engine extension: ordered-funnel analysis (view -> click ->
    // purchase) — stage k counts only events strictly after stage k-1;
    // events shuffle ONCE on user, each stage reuses the clustering.
    "q_funnel" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("user_id"), tsSec(raw).as("t"), col("event_type"))
      graft.operators.Events.funnel(ev, "user_id", "t", "event_type",
          stages = Seq("view", "click", "purchase"))
        .select(col("u").as("user_id"), col("t1"), col("t2"), col("t3"),
          col("stage"))
        .orderBy("user_id")
    }),

    // Engine extension: weekly cohort retention triangle — users bucketed
    // by first-activity week, counted in every later active week.
    "q_retention" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.retention(
          raw.select(col("user_id"), tsSec(raw).as("t")),
          "user_id", col("t"), periodSec = 604800L)
        .orderBy("cohort", "offset")
    }),

    // Engine extension: subsampling-bootstrap CI for the mean purchase
    // value — 32 deterministic half-rate replicates via the md5
    // membership device, interval from order statistics of the
    // replicate means. Exact integers end to end.
    "q_bootstrap" -> ((s, dir) => {
      graft.operators.Events.bootstrapMeanCI(
        Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase"),
        "event_id", cents(col("value")))
    }),

    // Engine extension: EWMA control chart over each user's purchase
    // values — dyadic alpha=1/2 keeps the sequential recurrence in
    // exact integers; the identical left fold replays via list_reduce,
    // so the whole per-user trajectory hash-gates.
    "q_ewma" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase")
      graft.operators.Events.ewmaAlerts(raw, "user_id",
          TimesearchQueries.tsSec(raw), col("event_id"),
          cents(col("value")), thresholdC = 3000L)
        .withColumnRenamed("u", "user_id")
        .orderBy("user_id")
    }),

    // Engine extension: the user-journey MARKOV CHAIN — stationary
    // distribution of the event-type transition matrix by integer-exact
    // power iteration (the PageRank regime: fixed scale units, floor
    // division, bit-exact 10-iteration relational replay).
    "q_markov" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(col("user_id").as("u"), tsSec(raw).as("t"),
        col("event_id").as("id"), col("event_type").as("ty"))
      val w = Window.partitionBy("u").orderBy(col("t"), col("id"))
      val pairs = ev.withColumn("nxt", lead("ty", 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("ty").as("f"), col("nxt").as("t"))
        .agg(count(lit(1)).as("c"))
      graft.operators.Graphs.markovStationary(pairs, iters = 10)
        .withColumnRenamed("s", "event_type")
        .withColumnRenamed("v", "pi_scaled")
        .orderBy("event_type")
    }),

    // Engine extension: semi-structured JSON field extraction + rollup —
    // props' k pulled per row (codegen'd path extraction, no UDF) and
    // profiled per event type in one map-side-combined aggregate.
    "q_json_extract" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          countDistinct("k").as("n_distinct_k"))
        .orderBy("event_type")
    }),

    // Engine extension: Mann-Whitney U over purchase values (even- vs
    // odd-user carts) — doubled average ranks via the value histogram
    // (the corpus is never sorted), exact u2 and rank-biserial effect.
    "q_mwu" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.mannWhitney(
        raw.filter(col("event_type") === "purchase"),
        inGroup1 = col("user_id") % 2 === 0,
        valueCol = cents(col("value")))
    }),

    // Engine extension: Kaplan-Meier time-to-first-high-value-purchase
    // with RIGHT CENSORING (users who never hit censor at last
    // activity) — product-limit in quantized-log space (associative
    // integer sums), exact per-day hazard factors.
    "q_survival" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val per = raw.select(col("user_id").as("u"), tsSec(raw).as("t"),
        (col("event_type") === "purchase" && col("value") >= 90).as("hit"))
      val subj = per.groupBy("u").agg(
          min("t").as("t0"), max("t").as("tl"),
          min(when(col("hit"), col("t"))).as("te"))
        .select(col("u"), col("te").isNotNull.as("died"),
          expr("(coalesce(te, tl) - t0) div 86400").as("dur"))
      graft.operators.Events.kaplanMeier(subj, "dur", "died")
        .orderBy("duration")
    }),

    // Engine extension: seasonal-naive forecast BACKTEST — the baseline
    // any forecaster must beat: forecast(day) = actual(day − 7d), scored
    // days aggregated to exact-integer MAE per event type.
    "q_forecast" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.snaiveBacktest(raw, "event_type", tsSec(raw))
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")
    }),

    // Engine extension: per-type revenue TREND — exact-integer OLS slope
    // of daily summed cents on the day index (normal equation as one
    // grouped aggregate; day re-based per group to keep products small).
    "q_trend" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.linearTrend(raw, "event_type", tsSec(raw),
          cents(col("value")))
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")
    }),

    // Engine extension: A/B test as an exact-integer 2×2 χ² — variant by
    // user-id parity, conversion = any purchase; lift in bp, statistic
    // in milli against the 3841 critical value. No p-value doubles.
    "q_ab_test" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.abTest(raw, "user_id",
          variantA = col("user_id") % 2 === 0,
          converted = col("event_type") === "purchase" && col("value") >= 75)
    }),

    // Engine extension: DP histogram release (Laplace b=2, ε=0.5) over
    // event-type counts — deterministic md5-uniform noise through the
    // inverse CDF so the released values hash-gate.
    "q_dp_histogram" -> ((s, dir) => {
      graft.operators.Analytics.dpNoisyCounts(
          Tables.load(s, dir, "events"), "event_type", bMilli = 2000L)
        .orderBy("event_type")
    }),

    // Engine extension: multi-touch attribution — first/last/linear
    // credit (exact bp; every attributed conversion distributes exactly
    // 10000 bp per model) for view/click touches within 7 days of a
    // purchase. One user-keyed join + one conversion-keyed window.
    "q_attribution" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      graft.operators.Events.attribution(raw, "user_id", tsSec(raw),
          "event_type", "event_id", touchTypes = Seq("view", "click"),
          convType = "purchase", lookbackSec = 604800L)
        .orderBy("event_type")
    }),

    // Engine extension: integer-exact PageRank over the comment-reply
    // graph (the q_tree edge rule) — thread-influence scoring; exact
    // long arithmetic at every step so 10 iterations replay to the bit.
    "q_pagerank" -> ((s, dir) => {
      val nodes = Tables.load(s, dir, "events").select(
        col("event_id").as("id"),
        when(col("event_id") % 16 === 0, lit(null).cast("long"))
          .otherwise(col("event_id") - (col("event_id") % 16) +
            floor((col("event_id") % 16 - 1) / 2)).as("parent"))
      graft.operators.Graphs.pageRank(nodes,
          nodes.filter(col("parent").isNotNull)
            .select(col("id").as("src"), col("parent").as("dst")),
          iters = 10)
        .orderBy("id")
    }),

    // A3 — incremental lower bound: max(created) − 1 overlap.
    "q_incremental_bound" -> ((s, dir) => {
      val raw = Tables.load(s, dir, "events")
      val ev = raw.select(tsSec(raw).as("created"))
      Analytics.incrementalBound(ev)
    }),

    // J3 — NOT EXISTS anti-join: newest comment of an unaugmented submission.
    "q_latest_unaugmented" -> ((s, dir) => {
      val comments = Tables.load(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("idstr"),
        epochSec(col("l_shipdate")).as("created"),
        col("l_orderkey").cast("string").as("submission"))
      val submissions = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("string").as("idstr"),
        when(col("o_orderstatus") === "F", lit(1L)).as("augmented_at"))
      Analytics.latestUnaugmented(comments, submissions)
    })
  )

  /** Final-table state of the old+new comment merge — shared by the batch
    * (q_merge_upsert) and streaming (q_stream_upsert) paths, which must
    * produce identical tables. */
  /** The old/new comment-store CTEs (oldComments/newComments mirrored)
    * and the merge SELECT, shared by the upsert oracle and the
    * version-range CDC oracle (which time-travels between them). */
  /** [[oldNewCtes]] with a parameterized `new`-batch predicate — the
    * savepoint oracle replays the PARTIAL merge state (only the first
    * batch landed) by narrowing the filter; the default keeps the
    * original text byte-compatible. */
  private def oldNewCtesWhere(newWhere: String): String =
    s"""WITH old AS (
         SELECT CAST(event_id AS BIGINT) AS idint, 'e'||event_id AS idstr,
                user_id AS created, 'u'||user_id AS author,
                'p0' AS parent, 's0' AS submission, props AS body,
                CAST(round(value*100) AS BIGINT) AS score, 'sub' AS subreddit,
                CASE WHEN event_id % 3 = 0 THEN 'mod' END AS distinguish,
                CAST(length(props) AS BIGINT) AS textlen
         FROM events WHERE event_id % 4 != 1),
       new AS (
         SELECT CAST(event_id AS BIGINT) AS idint, 'e'||event_id AS idstr,
                user_id AS created,
                CASE WHEN event_id % 5 = 0 THEN '[DELETED]' ELSE 'u'||user_id END AS author,
                'p0' AS parent, 's0' AS submission,
                CASE WHEN event_id % 5 = 0 THEN '[removed]' ELSE props||'-v2' END AS body,
                CAST(round(value*100) AS BIGINT) + 1 AS score, 'sub' AS subreddit,
                CAST(NULL AS VARCHAR) AS distinguish,
                CAST(length(CASE WHEN event_id % 5 = 0 THEN '[removed]' ELSE props||'-v2' END) AS BIGINT) AS textlen
         FROM events WHERE $newWhere)"""

  private val oldNewCtes: String = oldNewCtesWhere("event_id % 2 = 0")

  private val mergedSelect: String =
    """SELECT COALESCE(o.idint, n.idint) AS idint,
              COALESCE(o.idstr, n.idstr) AS idstr,
              COALESCE(o.created, n.created) AS created,
              COALESCE(o.author, n.author) AS author,
              COALESCE(o.parent, n.parent) AS parent,
              COALESCE(o.submission, n.submission) AS submission,
              CASE WHEN o.idstr IS NULL THEN n.body
                   WHEN n.idstr IS NULL THEN o.body
                   WHEN (n.author IS NULL OR n.author='[DELETED]')
                        AND n.body IN ('[removed]','[deleted]') THEN o.body
                   WHEN n.body LIKE '%has been overwritten%'
                        OR n.body LIKE '%pastebin.com/64GuVi2F%' THEN o.body
                   ELSE n.body END AS body,
              COALESCE(n.score, o.score) AS score,
              COALESCE(o.subreddit, n.subreddit) AS subreddit,
              COALESCE(o.distinguish, n.distinguish) AS distinguish,
              COALESCE(o.textlen, n.textlen) AS textlen
       FROM old o FULL OUTER JOIN new n ON o.idstr = n.idstr"""

  private val upsertOracle: String =
    s"""$oldNewCtes
       $mergedSelect
       ORDER BY idstr"""

  /** Top-3-per-author over the final merged state — shared by
    * q_cdc_topk (explicit version-range applies) and q_topk_incremental
    * (the stream-maintained leaderboard) so both maintenance paths face
    * the identical gate. */
  private val topkOracle: String =
    s"""$oldNewCtes,
       merged AS (
         $mergedSelect),
       ranked AS (
         SELECT author, idstr, CAST(score AS BIGINT) AS score_c,
                ROW_NUMBER() OVER (PARTITION BY author
                  ORDER BY score DESC, idstr) AS rk
         FROM merged WHERE score IS NOT NULL)
       SELECT author, idstr, score_c, CAST(rk AS BIGINT) AS rk
       FROM ranked WHERE rk <= 3
       ORDER BY author, rk"""

  /** The final merged state re-windowed by the 3-membership unnest —
    * shared by q_cdc_window (explicit version-range applies) and
    * q_window_incremental (the stream-maintained dashboard) so both
    * maintenance paths face the identical gate. */
  private val windowOracle: String =
    s"""$oldNewCtes,
       merged AS (
         $mergedSelect),
       member AS (
         SELECT (score - (score % 200)) - k * 200 AS w_start,
                distinguish, textlen
         FROM (SELECT score, distinguish, textlen,
                      unnest(range(0, 3)) AS k FROM merged
               WHERE score IS NOT NULL) t0)
       SELECT w_start, distinguish, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(textlen) AS BIGINT) AS sum_len
       FROM member GROUP BY w_start, distinguish
       ORDER BY w_start, distinguish"""

  /** The final merged state re-sessionized per author on the score
    * axis (the q_sessionize lag/cumsum replay) — shared by
    * q_cdc_session (explicit version-range applies) and
    * q_session_incremental (the stream-maintained session dashboard)
    * so both maintenance paths face the identical gate. */
  private val sessionOracle: String =
    s"""$oldNewCtes,
       merged AS (
         $mergedSelect),
       m AS (SELECT author, score AS t FROM merged),
       x AS (
         SELECT author, t,
                CASE WHEN t - lag(t) OVER (PARTITION BY author ORDER BY t) > 500
                       OR lag(t) OVER (PARTITION BY author ORDER BY t) IS NULL
                     THEN 1 ELSE 0 END AS new_s
         FROM m),
       sg AS (
         SELECT author, t,
                SUM(new_s) OVER (PARTITION BY author ORDER BY t
                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM x)
       SELECT author, CAST(session_id AS BIGINT) AS session_id,
              min(t) AS start, max(t) AS "end", COUNT(*) AS n_events
       FROM sg GROUP BY author, session_id
       ORDER BY author, session_id"""

  /** changes(0, 1) replay: v0 = old, v1 = the merge result; full-outer
    * re-join classifies insert/update (delete is structurally absent for
    * an upsert-only table), with before_/after_ flattening. */
  private val tableChangesOracle: String = {
    val cols = Seq("idint", "created", "author", "parent", "submission",
      "body", "score", "subreddit", "distinguish", "textlen")
    val beforeAfter = (cols.map(c => s"o.$c AS before_$c") ++
      cols.map(c => s"m.$c AS after_$c")).mkString(",\n                ")
    val differs = cols.map(c => s"o.$c IS DISTINCT FROM m.$c")
      .mkString("\n                   OR ")
    val outCols = (cols.map(c => s"before_$c") ++ cols.map(c => s"after_$c"))
      .mkString(", ")
    s"""$oldNewCtes,
       merged AS (
         $mergedSelect),
       d AS (
         SELECT COALESCE(o.idstr, m.idstr) AS idstr,
                $beforeAfter,
                CASE WHEN o.idstr IS NULL THEN 'insert'
                     WHEN m.idstr IS NULL THEN 'delete'
                     WHEN $differs THEN 'update' END AS kind
         FROM old o FULL OUTER JOIN merged m ON o.idstr = m.idstr)
       SELECT kind, idstr, $outCols FROM d WHERE kind IS NOT NULL
       ORDER BY kind, idstr"""
  }

  /** The q_cdc_join family's shared rescan CTEs: both replayed merges —
    * facts (the upsert replay) and the author dimension (latest batch
    * containing the key wins). */
  private val cdcJoinCtes: String =
    s"""$oldNewCtes,
       merged AS (
         $mergedSelect),
       users AS (SELECT DISTINCT user_id FROM events),
       dimall AS (
         SELECT 'u'||user_id AS du, 't'||(user_id % 4) AS tier,
                CAST(user_id % 10 AS BIGINT) AS region_c, 0 AS b
         FROM users WHERE user_id % 3 = 0
         UNION ALL
         SELECT 'u'||user_id, 't'||((user_id + 1) % 4),
                CAST(user_id % 10 + 100 AS BIGINT), 1
         FROM users WHERE user_id % 3 = 1 OR user_id % 5 = 0
         UNION ALL
         SELECT 'u'||user_id, 't'||((user_id + 2) % 4),
                CAST(user_id % 10 + 200 AS BIGINT), 2
         FROM users WHERE (user_id % 3 = 2 AND user_id % 11 != 0)
            OR user_id % 7 = 0),
       dim AS (
         SELECT du, tier, region_c FROM (
           SELECT *, row_number() OVER (PARTITION BY du ORDER BY b DESC)
             AS rn
           FROM dimall) WHERE rn = 1)"""

  /** subs CTE shared by the q_index_* oracles. */
  private val indexSubsCte: String =
    """SELECT CAST(o_orderkey AS VARCHAR) AS idstr,
              CAST(floor(epoch(o_orderdate)) AS BIGINT) AS created,
              CAST(round(o_totalprice*100) AS BIGINT) AS score,
              o_orderpriority AS title,
              CAST(o_custkey AS VARCHAR) AS author
       FROM orders"""

  /** `__INGEST_SF__` in an oracle stands for the scale-factor directory
    * name the fixture was written under; [[oraclesAt]] binds it to the sf
    * Verify actually ran — the former hard-coded `sf0.01` silently relied
    * on Verify-running-before-Bench ordering. */
  private val IngestSfToken = "__INGEST_SF__"

  /** `__REPO__` stands for the repo root at RUNTIME (see [[repoRoot]]:
    * `GRAFT_REPO_ROOT` override, else `user.dir`), so the committed
    * golden parquet resolves in any checkout location and from any
    * launch directory; the former hard-coded `/root/repo/...` silently
    * broke the oracle anywhere else. */
  private val RepoToken = "__REPO__"


  /** PageRank replay generator: base/init constants via integer division
    * against the counted N, then `iters` unrolled stages — each stage's
    * in-mass from the previous stage only, AS MATERIALIZED throughout. */
  /** q_markov oracle: the integer power iteration unrolled — per stage
    * one transition join + destination aggregate over the 5-row state
    * vector, every stage materialized (the staged-CTE device). */
  private def markovOracle(iters: Int, scale: Long): String = {
    val head =
      s"""WITH ev AS (
           SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_id AS id, event_type AS ty
           FROM events),
         seqp AS (
           SELECT ty AS f,
                  lead(ty) OVER (PARTITION BY u ORDER BY t, id) AS t2
           FROM ev),
         pairs AS MATERIALIZED (
           SELECT f, t2 AS t, CAST(count(*) AS BIGINT) AS c
           FROM seqp WHERE t2 IS NOT NULL GROUP BY 1, 2),
         rt AS (SELECT f, CAST(sum(c) AS BIGINT) AS tot FROM pairs GROUP BY f),
         states AS MATERIALIZED (
           SELECT DISTINCT s FROM
             (SELECT f AS s FROM pairs UNION ALL SELECT t FROM pairs)),
         kv AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
         x0 AS (SELECT s, $scale // k AS v FROM states CROSS JOIN kv)"""
    val steps = (1 to iters).map { i =>
      s"""x$i AS MATERIALIZED (
           SELECT st.s, coalesce(nx.vn, 0) AS v
           FROM states st LEFT JOIN (
             SELECT p.t AS s, CAST(sum((x.v * p.c) // r.tot) AS BIGINT) AS vn
             FROM x${i - 1} x JOIN pairs p ON p.f = x.s
             JOIN rt r ON r.f = p.f
             GROUP BY p.t) nx USING (s))"""
    }
    s"""$head,
       ${steps.mkString(",\n")}
       SELECT s AS event_type, CAST(v AS BIGINT) AS pi_scaled
       FROM x$iters ORDER BY event_type"""
  }

  private def pagerankOracle(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH nodes AS (
           SELECT event_id AS id,
                  CASE WHEN event_id % 16 = 0 THEN NULL
                       ELSE event_id - (event_id % 16) + ((event_id % 16 - 1) // 2)
                  END AS parent
           FROM events),
         edges AS (SELECT id AS src, parent AS dst FROM nodes WHERE parent IS NOT NULL),
         outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         r0 AS MATERIALIZED (
           SELECT id, CAST(1000000000000 // n AS BIGINT) AS r
           FROM nodes CROSS JOIN nn)""")
    for (t <- 1 to iters) {
      sb.append(s""",
         r$t AS MATERIALIZED (
           SELECT a.id,
                  CAST((150000000000 // n) + COALESCE(s.cin, 0) AS BIGINT) AS r
           FROM nodes a CROSS JOIN nn
           LEFT JOIN (
             SELECT e.dst AS id,
                    CAST(sum(((p.r * 85) // 100) // d.deg) AS BIGINT) AS cin
             FROM r${t - 1} p
             JOIN edges e ON e.src = p.id
             JOIN outdeg d ON d.src = e.src
             GROUP BY e.dst) s ON s.id = a.id)""")
    }
    sb.append(s"""
         SELECT id, r AS pr FROM r$iters ORDER BY id""")
    sb.toString
  }

  private val oraclesRaw: Map[String, String] = Map(
    "q_stream_upsert" -> upsertOracle,

    // the format("graft") SQL surface serves the SAME merged state —
    // oracle shared verbatim with the batch and streaming upsert paths
    "q_dsv2_read" -> upsertOracle,
    "q_table_changes" -> tableChangesOracle,

    // the SQL-surface change feed serves the SAME diff — oracle shared
    // verbatim, so the standalone path-metadata resolution faces the
    // Scala changes() read's exact gate
    "q_dsv2_changes" -> tableChangesOracle,

    // schema evolution: the replayed upsert LEFT JOIN the replayed
    // widening batch — the oracle never sees the store, so a dropped
    // pre-evolution row, a lost lang value, or a stale-generation read
    // hash-mismatches
    "q_schema_evolve" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect),
         b3 AS (
           SELECT 'e'||event_id AS idstr,
                  CAST(round(value*100) AS BIGINT) + 100 AS score,
                  'l'||(event_id % 4) AS lang
           FROM events WHERE event_id % 6 = 2)
         SELECT m.idstr, m.author, COALESCE(b.score, m.score) AS score,
                b.lang
         FROM merged m LEFT JOIN b3 b ON m.idstr = b.idstr
         ORDER BY m.idstr""",

    // CDC across the evolution boundary: every widening-batch key is an
    // update (the score bump guarantees a differing column) whose
    // before-image holds NULL for the new column — the TO-side schema
    // read the endpoints
    "q_schema_evolve_changes" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect),
         b3 AS (
           SELECT 'e'||event_id AS idstr,
                  CAST(round(value*100) AS BIGINT) + 100 AS score,
                  'l'||(event_id % 4) AS lang
           FROM events WHERE event_id % 6 = 2)
         SELECT 'update' AS kind, m.idstr,
                m.score AS before_score, b.score AS after_score,
                CAST(NULL AS VARCHAR) AS before_lang, b.lang AS after_lang
         FROM merged m JOIN b3 b ON m.idstr = b.idstr
         ORDER BY m.idstr""",

    // explicit migration: the replayed merge re-projected by the same
    // rename (textlen → body_len), retype (score → 's'||score), and
    // drop (distinguish) — the oracle never sees the store, so a lost
    // row, a stale-generation read, or a retype drift hash-mismatches
    "q_schema_migrate" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect)
         SELECT idint, idstr, created, author, parent, submission, body,
                's'||score AS score_s, subreddit, textlen AS body_len
         FROM merged
         ORDER BY idstr""",

    // the savepoint-pinned world: only the FIRST fact batch (event_id
    // % 4 = 0 — the %2 batch narrowed to its first half) and the first
    // TWO dim batches existed at the pins; the oracle replays exactly
    // that partial state, so any leak of post-savepoint data into the
    // pinned read hash-mismatches
    "q_snapshot_join" ->
      s"""${oldNewCtesWhere("event_id % 4 = 0")},
         merged AS (
           $mergedSelect),
         users AS (SELECT DISTINCT user_id FROM events),
         dimall AS (
           SELECT 'u'||user_id AS du, 't'||(user_id % 4) AS tier,
                  CAST(user_id % 10 AS BIGINT) AS region_c, 0 AS b
           FROM users WHERE user_id % 3 = 0
           UNION ALL
           SELECT 'u'||user_id, 't'||((user_id + 1) % 4),
                  CAST(user_id % 10 + 100 AS BIGINT), 1
           FROM users WHERE user_id % 3 = 1 OR user_id % 5 = 0),
         dim AS (
           SELECT du, tier, region_c FROM (
             SELECT *, row_number() OVER (PARTITION BY du ORDER BY b DESC)
               AS rn
             FROM dimall) WHERE rn = 1)
         SELECT m.idstr, m.author, m.score, d.tier, d.region_c
         FROM merged m JOIN dim d ON m.author = d.du
         ORDER BY m.idstr""",

    // session IVM: the final merged state re-sessionized per author on
    // the score axis — the q_sessionize lag/cumsum replay; a stale
    // session served for a touched author, or a dropped untouched one,
    // hash-mismatches
    "q_cdc_session" -> sessionOracle,

    // the stream-maintained session dashboard serves the SAME state —
    // oracle shared verbatim, so the trigger-driven maintenance faces
    // the chained appliers' exact gate
    "q_session_incremental" -> sessionOracle,

    // predicate takedown: the replayed merge MINUS the erased authors —
    // the oracle never sees the purge, so both failure directions
    // (retained purged rows, dropped innocent rows) hash-mismatch
    "q_takedown_author" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect)
         SELECT * FROM merged WHERE author NOT LIKE '%5'
         ORDER BY idstr""",

    // the deletion-vector takedown serves the SAME corpus-minus-keys
    // state — oracle shared verbatim, so the vector-filtered read
    // faces the rewrite path's exact gate
    "q_takedown_dv" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect)
         SELECT * FROM merged WHERE author NOT LIKE '%5'
         ORDER BY idstr""",

    // CDC-maintained view == aggregate of the final merged state: the
    // oracle NEVER sees the deltas — it rescans the replayed merge, so
    // any leak in the delta algebra (a double-counted update, a
    // lingering zero group, a missed delete) hash-mismatches.
    "q_cdc_consume" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect)
         SELECT author, COUNT(*) AS n_docs,
                CAST(SUM(score) AS BIGINT) AS sum_score_c
         FROM merged GROUP BY author ORDER BY author""",

    // min/max IVM: identical construction — the oracle rescans the
    // final merged state, never the deltas, so the dirty-group pruning
    // and the monotone fold both face the gate
    "q_cdc_minmax" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect)
         SELECT author, COUNT(*) AS n_docs,
                CAST(MIN(score) AS BIGINT) AS min_score_c,
                CAST(MAX(score) AS BIGINT) AS max_score_c
         FROM merged GROUP BY author ORDER BY author""",

    // top-k IVM: same construction — the oracle windows the final
    // merged state (ROW_NUMBER over score DESC, idstr — the view's own
    // total order), so the keyed dirty marking, the eviction fold, and
    // the served ranks all face the gate
    "q_cdc_topk" -> topkOracle,

    // the stream-maintained leaderboard serves the SAME final state —
    // oracle shared verbatim, so maintenance (basis tracking, the
    // per-trigger catch-up, the atomic view publish) leaks
    // hash-mismatch
    "q_topk_incremental" -> topkOracle,

    // join IVM: the oracle rescans BOTH replayed merges and re-joins —
    // the maintained view never gets to lean on either delta
    "q_cdc_join" ->
      s"""$cdcJoinCtes
         SELECT m.idstr, m.author, m.score, d.tier, d.region_c
         FROM merged m JOIN dim d ON m.author = d.du
         ORDER BY m.idstr""",

    // pruned-rescan join IVM: its own replay (score-only batch ⇒ plain
    // coalesce; dim = seed-all then update the %31 slice) — the pruned
    // fact read must land on the same rescan join as a full one
    "q_cdc_join_pruned" ->
      """WITH oldf AS (
           SELECT 'e'||event_id AS idstr, 'u'||user_id AS author,
                  CAST(round(value*100) AS BIGINT) AS score
           FROM events WHERE event_id % 4 != 1),
         newf AS (
           SELECT 'e'||event_id AS idstr,
                  CAST(round(value*100) AS BIGINT) + 2 AS score
           FROM events WHERE event_id % 2 = 0),
         mergedf AS (
           SELECT o.idstr, o.author, COALESCE(n.score, o.score) AS score
           FROM oldf o LEFT JOIN newf n USING (idstr)),
         users AS (SELECT DISTINCT user_id FROM events),
         dim AS (
           SELECT 'u'||user_id AS du,
                  CASE WHEN user_id % 31 = 0 THEN 't'||((user_id+1)%4)
                       ELSE 't'||(user_id%4) END AS tier,
                  CAST(CASE WHEN user_id % 31 = 0 THEN user_id%10+100
                            ELSE user_id%10 END AS BIGINT) AS region_c
           FROM users)
         SELECT m.idstr, m.author, m.score, d.tier, d.region_c
         FROM mergedf m JOIN dim d ON m.author = d.du
         ORDER BY m.idstr""",

    // left-outer join IVM: same rescan, LEFT JOIN — facts keep their
    // rows with null dims (the late-arriving-dimension contract)
    "q_cdc_join_outer" ->
      s"""$cdcJoinCtes
         SELECT m.idstr, m.author, m.score, d.tier, d.region_c
         FROM merged m LEFT JOIN dim d ON m.author = d.du
         ORDER BY m.idstr""",

    // Δview-chained aggregate: the rescan join AGGREGATED — the engine
    // side maintained it through cdcApply over emitted view deltas only
    "q_cdc_join_agg" ->
      s"""$cdcJoinCtes
         SELECT d.tier, COUNT(*) AS n_rows,
                CAST(SUM(m.score) AS BIGINT) AS sum_score_c
         FROM merged m JOIN dim d ON m.author = d.du
         GROUP BY d.tier
         ORDER BY d.tier""",

    // pruned top-k rescan: its own replay (the %31 score bump) windowed
    // — the manifest-pruned rescan read must land on the same final
    // leaderboard as a full one
    "q_cdc_topk_pruned" ->
      """WITH oldc AS (
           SELECT 'e'||event_id AS idstr, 'u'||user_id AS author,
                  CAST(round(value*100) AS BIGINT)
                    + CASE WHEN user_id % 31 = 0 THEN 7 ELSE 0 END AS score
           FROM events WHERE event_id % 4 != 1),
         ranked AS (
           SELECT author, idstr, score AS score_c,
                  ROW_NUMBER() OVER (PARTITION BY author
                    ORDER BY score DESC, idstr) AS rk
           FROM oldc)
         SELECT author, idstr, score_c, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 3
         ORDER BY author, rk""",

    // the pruned session rescan: the replayed %31 score bump
    // re-sessionized per author — the manifest-pruned scanForKeys
    // snapshot must also be CORRECT, not just narrow
    "q_cdc_session_pruned" ->
      """WITH oldc AS (
           SELECT 'u'||user_id AS author,
                  CAST(round(value*100) AS BIGINT)
                    + CASE WHEN user_id % 31 = 0 THEN 7 ELSE 0 END AS t
           FROM events WHERE event_id % 4 != 1),
         x AS (
           SELECT author, t,
                  CASE WHEN t - lag(t) OVER (PARTITION BY author ORDER BY t) > 500
                         OR lag(t) OVER (PARTITION BY author ORDER BY t) IS NULL
                       THEN 1 ELSE 0 END AS new_s
           FROM oldc),
         sg AS (
           SELECT author, t,
                  SUM(new_s) OVER (PARTITION BY author ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM x)
         SELECT author, CAST(session_id AS BIGINT) AS session_id,
                min(t) AS start, max(t) AS "end", COUNT(*) AS n_events
         FROM sg GROUP BY author, session_id
         ORDER BY author, session_id""",

    // top-k over the joined view: the rescan join WINDOWED per tier —
    // the engine maintained the leaderboard from emitted view deltas
    // only, re-attributed facts moving between tiers' top-3
    "q_cdc_join_topk" ->
      s"""$cdcJoinCtes,
         ranked AS (
           SELECT d.tier, m.idstr, CAST(m.score AS BIGINT) AS score_c,
                  ROW_NUMBER() OVER (PARTITION BY d.tier
                    ORDER BY m.score DESC, m.idstr) AS rk
           FROM merged m JOIN dim d ON m.author = d.du
           WHERE m.score IS NOT NULL)
         SELECT tier, idstr, score_c, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 3
         ORDER BY tier, rk""",

    // the outer top-k chain: the rescan LEFT JOIN windowed per tier —
    // q_cdc_topk's window form verbatim; the NULL tier is one
    // partition in both engines, so the "unattributed" leaderboard
    // (and every fact that MOVED off it as its dim arrived) faces the
    // same gate as the attributed ones
    "q_cdc_join_outer_topk" ->
      s"""$cdcJoinCtes,
         ranked AS (
           SELECT d.tier, m.idstr, CAST(m.score AS BIGINT) AS score_c,
                  ROW_NUMBER() OVER (PARTITION BY d.tier
                    ORDER BY m.score DESC, m.idstr) AS rk
           FROM merged m LEFT JOIN dim d ON m.author = d.du
           WHERE m.score IS NOT NULL)
         SELECT tier, idstr, score_c, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 3
         ORDER BY tier, rk""",

    // windowed IVM: the final merged state re-windowed by the same
    // 3-membership unnest (w = s - s%200 - k*200; scores are
    // positive, so the mod device is exact) — the engine maintained
    // the window table from deltas only, score bumps moving rows
    // between windows included
    "q_cdc_window" -> windowOracle,

    // the windowed chain off the join Δview: the rescan join
    // re-windowed by the same 3-membership unnest — the engine
    // maintained the per-(window, tier) view from emitted view deltas
    // only
    "q_cdc_join_window" ->
      s"""$cdcJoinCtes,
         member AS (
           SELECT (x.score - (x.score % 200)) - x.k * 200 AS w_start,
                  x.tier, x.score
           FROM (SELECT m.score AS score, d.tier AS tier,
                        unnest(range(0, 3)) AS k
                 FROM merged m JOIN dim d ON m.author = d.du
                 WHERE m.score IS NOT NULL) x)
         SELECT w_start, tier, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(score) AS BIGINT) AS sum_m
         FROM member GROUP BY w_start, tier
         ORDER BY w_start, tier""",

    // the stream-maintained windowed dashboard serves the SAME final
    // state — oracle shared verbatim (the q_topk_incremental device),
    // so maintenance (basis tracking, per-trigger catch-up, atomic
    // publish) leaks hash-mismatch
    "q_window_incremental" -> windowOracle,

    // multi-column grouped top-k: ROW_NUMBER over the TWO-column
    // partition of the final merged state — NULL distinguish is one
    // partition value in both engines, gating the null-safe struct
    // grouping
    "q_cdc_topk_grouped" ->
      s"""$oldNewCtes,
         merged AS (
           $mergedSelect),
         ranked AS (
           SELECT author, distinguish, idstr,
                  CAST(score AS BIGINT) AS score_c,
                  ROW_NUMBER() OVER (PARTITION BY author, distinguish
                    ORDER BY score DESC, idstr) AS rk
           FROM merged WHERE score IS NOT NULL)
         SELECT author, distinguish, idstr, score_c, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 2
         ORDER BY author, distinguish, rk""",

    // outer Δview chaining: the rescan LEFT JOIN aggregated — the
    // engine maintained it from emitted outer deltas only, null-tier
    // group included (the uncovered-author residue keeps it non-empty)
    "q_cdc_join_outer_agg" ->
      s"""$cdcJoinCtes
         SELECT d.tier, COUNT(*) AS n_rows,
                CAST(SUM(m.score) AS BIGINT) AS sum_score_c
         FROM merged m LEFT JOIN dim d ON m.author = d.du
         GROUP BY d.tier
         ORDER BY d.tier""",

    // snowflake IVM: the oracle rescans and re-joins all THREE
    // replayed merges (facts, author dim, region dim — latest batch
    // containing a key wins) — the maintained level-2 view leaned
    // only on deltas, including Δview1 as its fact changes
    "q_cdc_snowflake" ->
      s"""$cdcJoinCtes,
         rcodes AS (SELECT range AS code FROM range(0, 300)
                    WHERE range % 100 < 10),
         regall AS (
           SELECT code, 'z'||(code % 4) AS zone,
                  CAST(code AS BIGINT) AS zpop, 0 AS b
           FROM rcodes WHERE code < 100
           UNION ALL
           SELECT code, 'z'||((code + 1) % 4), CAST(code + 1000 AS BIGINT), 1
           FROM rcodes WHERE (code >= 100 AND code < 200)
              OR (code < 100 AND code % 2 = 0)
           UNION ALL
           SELECT code, 'z'||((code + 2) % 4), CAST(code + 2000 AS BIGINT), 2
           FROM rcodes WHERE (code >= 200 AND code != 207)
              OR (code < 200 AND code % 5 = 0)),
         reg AS (
           SELECT code, zone, zpop FROM (
             SELECT *, row_number() OVER (PARTITION BY code ORDER BY b DESC)
               AS rn
             FROM regall) WHERE rn = 1)
         SELECT m.idstr, d.region_c, m.author, m.score, d.tier,
                r.zone, r.zpop
         FROM merged m JOIN dim d ON m.author = d.du
         JOIN reg r ON d.region_c = r.code
         ORDER BY m.idstr""",

    // Golden-file oracle: rendered HTML has no relational recomputation,
    // so the ground truth is the committed (idstr, html_len, html_md5)
    // parquet written by graft.RenderGolden — the driver's hash gate then
    // catches ANY rendering drift. RenderSpec carries the semantic
    // (construct-level) ground truth that justifies the golden.
    "q_render_html" ->
      """SELECT idstr, html_len, html_md5
         FROM read_parquet('__REPO__/src/test/resources/golden/render___INGEST_SF__.parquet')
         ORDER BY idstr""",

    // the bucketed layout holds the same rows — the oracle joins the same
    // derivations straight from the events table
    "q_bucketed_join" ->
      """WITH old AS (
           SELECT 'e'||event_id AS idstr, props AS body,
                  CAST(round(value*100) AS BIGINT) AS score
           FROM events WHERE event_id % 4 != 1),
         new AS (
           SELECT 'e'||event_id AS idstr,
                  CASE WHEN event_id % 5 = 0 THEN '[removed]'
                       ELSE props||'-v2' END AS body,
                  CAST(round(value*100) AS BIGINT) + 1 AS score
           FROM events WHERE event_id % 2 = 0)
         SELECT o.idstr, o.body AS body_old, n.body AS body_new,
                o.score AS score_old, n.score AS score_new
         FROM old o JOIN new n ON o.idstr = n.idstr
         ORDER BY o.idstr""",

    "q_index_score" ->
      s"""WITH subs AS ($indexSubsCte)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, idstr ASC) AS INT) AS pos,
                idstr, score,
                strftime(to_timestamp(created), '%b %d %Y %H:%M:%S') AS when_str
         FROM subs WHERE score >= 30000000
         ORDER BY pos""",

    "q_index_date" ->
      s"""WITH subs AS ($indexSubsCte)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY created ASC, idstr ASC) AS INT) AS pos,
                idstr, created
         FROM subs WHERE score >= 30000000
         ORDER BY pos""",

    "q_index_title" ->
      s"""WITH subs AS ($indexSubsCte)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY title ASC, idstr ASC) AS INT) AS pos,
                idstr, title
         FROM subs WHERE score >= 30000000
         ORDER BY pos""",

    "q_index_author" ->
      s"""WITH subs AS ($indexSubsCte)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY author ASC, idstr ASC) AS INT) AS pos,
                idstr, author
         FROM subs WHERE score >= 30000000
         ORDER BY pos""",

    "q_ingest_normalize" ->
      """WITH r AS (
           SELECT o_orderkey AS k, o_custkey AS c,
                  lower(to_base(o_orderkey, 36)) AS b36,
                  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS created,
                  o_orderpriority AS pri, o_orderstatus AS st
           FROM orders),
         u AS (
           SELECT *,
             CASE WHEN k % 2 = 0 THEN
               replace(replace(replace(replace(replace(
                 'x &amp; y &lt;' || pri || '&gt; &quot;z&#39;',
                 '&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),'&amp;','&')
               ELSE '' END AS sel
           FROM r)
         SELECT
           k AS idint,
           't3_' || b36 AS idstr,
           created,
           (k % 2 = 0) AS self,
           CASE WHEN k % 3 = 0 THEN false ELSE (k % 7 = 0) END AS nsfw,
           CASE WHEN k % 7 = 0 THEN '[DELETED]' ELSE 'u' || c END AS author,
           pri AS title,
           CASE WHEN k % 2 = 0 THEN NULL
                WHEN k % 5 = 0 THEN 'https://reddit.com/r/xp/comments/' || b36
                WHEN k % 4 = 1 THEN 'https://reddit.com/r/test/comments/' || b36
                ELSE 'https://example.com/' || b36 END AS url,
           sel AS selftext,
           CAST(CASE WHEN k % 3 = 0 THEN 0 ELSE c END AS BIGINT) AS score,
           'sub_' || st AS subreddit,
           CASE WHEN k % 11 = 0 THEN 'moderator' END AS distinguish,
           CAST(length(sel) AS BIGINT) AS textlen,
           CAST(CASE WHEN k % 2 = 0 THEN 0 ELSE c % 100 END AS BIGINT) AS num_comments,
           nullif(pri, '3-MEDIUM') AS flair_text,
           CASE WHEN k % 5 = 0 THEN 'blue' END AS flair_css_class,
           CAST(NULL AS BIGINT) AS augmented_at,
           CAST(NULL AS BIGINT) AS augmented_count,
           CAST(CASE WHEN k % 6 = 0 THEN created + 100 END AS BIGINT) AS _edited
         FROM u ORDER BY idstr""",

    "q_ingest_comments" ->
      """WITH r AS (
           SELECT l_orderkey*10 + l_linenumber AS k, l_orderkey AS ok,
                  l_suppkey AS sk, l_linenumber AS ln, l_returnflag AS fl,
                  CAST(floor(epoch(l_shipdate)) AS BIGINT) AS created
           FROM lineitem WHERE l_linenumber <= 3)
         SELECT
           k AS idint,
           't1_' || lower(to_base(k, 36)) AS idstr,
           created,
           CASE WHEN k % 7 = 0 THEN '[DELETED]' ELSE 'u' || sk END AS author,
           CASE WHEN k % 3 = 0 THEN 't3_' || lower(to_base(ok, 36))
                ELSE 't1_' || lower(to_base(ok, 36)) END AS parent,
           't3_' || lower(to_base(ok, 36)) AS submission,
           'b & ' || fl AS body,
           CAST(CASE WHEN k % 5 = 0 THEN 0 ELSE ln END AS BIGINT) AS score,
           'sub' AS subreddit,
           CASE WHEN k % 11 = 0 THEN 'moderator' END AS distinguish,
           CAST(length('b & ' || fl) AS BIGINT) AS textlen,
           CAST(CASE WHEN k % 6 = 0 THEN created + 9 END AS BIGINT) AS _edited
         FROM r ORDER BY idstr""",

    "q_thread_join" ->
      """WITH subs AS (
           SELECT CAST(o_orderkey AS VARCHAR) AS submission, o_orderpriority AS title
           FROM orders WHERE o_orderstatus = 'F'),
         comments AS (
           SELECT CAST(l_orderkey AS VARCHAR) AS submission,
                  CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cidstr,
                  CAST(floor(epoch(l_shipdate)) AS BIGINT) AS created,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS score
           FROM lineitem WHERE l_linenumber <= 2 AND l_quantity <= 25)
         SELECT s.submission, s.title, c.cidstr, c.created, c.score
         FROM subs s LEFT JOIN comments c ON s.submission = c.submission
         ORDER BY s.submission, c.cidstr""",

    "q_breakdown" ->
      """WITH s AS (SELECT CAST(user_id AS VARCHAR) AS name, COUNT(*) AS ns
                    FROM events WHERE event_type='signup' GROUP BY 1),
              c AS (SELECT CAST(user_id AS VARCHAR) AS name, COUNT(*) AS nc
                    FROM events WHERE event_type='click' GROUP BY 1)
         SELECT * FROM (
           SELECT COALESCE(s.name, c.name) AS name,
                  CAST(COALESCE(ns,0) AS BIGINT) AS n_submissions,
                  CAST(COALESCE(nc,0) AS BIGINT) AS n_comments,
                  CAST(COALESCE(ns,0)+COALESCE(nc,0) AS BIGINT) AS total
           FROM s FULL OUTER JOIN c ON s.name=c.name)
         ORDER BY total DESC, lower(name) ASC, name ASC""",

    "q_index_listing" ->
      """WITH subs AS (
           SELECT CAST(o_orderkey AS VARCHAR) AS idstr,
                  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS created,
                  CAST(round(o_totalprice*100) AS BIGINT) AS score,
                  o_orderpriority AS title,
                  nullif(o_orderpriority, '1-URGENT') AS flair_text
           FROM orders)
         SELECT idstr, flair_text, created,
                strftime(to_timestamp(created), '%Y %b %d') || ': [' || idstr || '] ' ||
                  replace(title, chr(10), ' ') AS line
         FROM subs WHERE score >= 30000000
         ORDER BY (flair_text IS NULL) ASC, created ASC, idstr ASC""",

    "q_merge_upsert" -> upsertOracle,

    "q_merge_edits" ->
      """WITH old AS (
           SELECT 'e'||event_id AS idstr, props AS body
           FROM events WHERE event_id % 4 != 1),
         new AS (
           SELECT 'e'||event_id AS idstr,
                  CASE WHEN event_id % 5 = 0 THEN '[DELETED]' ELSE 'u'||user_id END AS author,
                  CASE WHEN event_id % 5 = 0 THEN '[removed]' ELSE props||'-v2' END AS body,
                  CASE WHEN event_id % 6 = 0 THEN 1000+event_id END AS edited
           FROM events WHERE event_id % 2 = 0)
         SELECT n.idstr AS idstr, o.body AS previous_body,
                CAST(COALESCE(n.edited, 55) AS BIGINT) AS replaced_at
         FROM new n JOIN old o ON o.idstr = n.idstr
         WHERE n.body != o.body
           AND NOT ((n.author IS NULL OR n.author='[DELETED]')
                    AND n.body IN ('[removed]','[deleted]'))
           AND NOT (n.body LIKE '%has been overwritten%'
                    OR n.body LIKE '%pastebin.com/64GuVi2F%')
         ORDER BY idstr""",

    "q_merge_db" ->
      """WITH mine AS (
           SELECT o_orderkey AS idint, 'MINE' AS o_orderstatus, o_totalprice
           FROM orders WHERE o_orderkey % 3 != 0),
         other AS (
           SELECT o_orderkey AS idint, o_orderstatus, o_totalprice
           FROM orders WHERE o_orderkey % 2 = 0)
         SELECT idint, o_orderstatus, CAST(round(o_totalprice*100) AS BIGINT) AS price_c
         FROM (SELECT * FROM mine
               UNION ALL
               SELECT * FROM other WHERE idint NOT IN (SELECT idint FROM mine))
         ORDER BY idint""",

    "q_tree" ->
      """WITH nodes AS (
           SELECT event_id - (event_id % 16) AS grp, event_id AS id,
                  CASE WHEN event_id % 16 = 0 THEN NULL
                       ELSE event_id - (event_id % 16) + ((event_id % 16 - 1) // 2) END AS parent
           FROM events),
         roots AS (
           SELECT n.* FROM nodes n LEFT JOIN nodes p
             ON p.grp = n.grp AND p.id = n.parent
           WHERE n.parent IS NULL OR p.id IS NULL),
         t AS (
           WITH RECURSIVE walk AS (
             SELECT grp, id, 0 AS depth, lpad(CAST(id AS VARCHAR), 10, '0') AS spath
             FROM roots
             UNION ALL
             SELECT n.grp, n.id, w.depth + 1, w.spath || '/' || lpad(CAST(n.id AS VARCHAR), 10, '0')
             FROM nodes n JOIN walk w ON n.grp = w.grp AND n.parent = w.id
             WHERE n.id NOT IN (SELECT id FROM roots))
           SELECT * FROM walk)
         SELECT grp, id, depth,
                CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY spath) - 1 AS INT) AS rank
         FROM t ORDER BY grp, rank""",

    "q_dedupe_latest" ->
      """SELECT user_id, event_id, event_type FROM (
           SELECT user_id, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
           FROM events) WHERE rn = 1
         ORDER BY user_id""",

    "q_incremental_bound" ->
      """SELECT CAST(max(floor(epoch(ts))) - 1 AS BIGINT) AS lower_bound FROM events""",

    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
         m AS (
           SELECT user_id, t,
                  CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 3600
                         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                       THEN 1 ELSE 0 END AS new_s
           FROM e),
         s AS (
           SELECT user_id, t,
                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM m)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                min(t) AS start, max(t) AS "end", COUNT(*) AS n_events
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    "q_hopping_agg" ->
      """WITH ev AS (
           SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  CAST(round(value*100) AS BIGINT) AS v
           FROM events),
         member AS (
           SELECT (t - (t % 3600)) - k * 3600 AS w_start, v
           FROM (SELECT t, v, unnest(range(0, 6)) AS k FROM ev) t0)
         SELECT w_start, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(v) AS BIGINT) AS sum_v_c
         FROM member GROUP BY w_start ORDER BY w_start""",

    "q_profile_table" ->
      """SELECT * FROM (
           SELECT 'o_orderkey' AS "column", CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                  CAST(min(o_orderkey) AS VARCHAR) AS min_s,
                  CAST(max(o_orderkey) AS VARCHAR) AS max_s
           FROM orders
           UNION ALL
           SELECT 'o_custkey', count(*),
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_custkey),
                  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderstatus', count(*),
                  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_orderstatus),
                  min(o_orderstatus), max(o_orderstatus)
           FROM orders
           UNION ALL
           SELECT 'o_totalprice_c', count(*),
                  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT CAST(round(o_totalprice*100) AS BIGINT)),
                  CAST(min(CAST(round(o_totalprice*100) AS BIGINT)) AS VARCHAR),
                  CAST(max(CAST(round(o_totalprice*100) AS BIGINT)) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderdate_sec', count(*),
                  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT CAST(floor(epoch(o_orderdate)) AS BIGINT)),
                  CAST(min(CAST(floor(epoch(o_orderdate)) AS BIGINT)) AS VARCHAR),
                  CAST(max(CAST(floor(epoch(o_orderdate)) AS BIGINT)) AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT 'o_orderpriority', count(*),
                  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                  count(DISTINCT o_orderpriority),
                  min(o_orderpriority), max(o_orderpriority)
           FROM orders)
         ORDER BY "column"""",

    "q_m4_downsample" ->
      """WITH ev AS (
           SELECT CAST(floor(epoch(ts)) AS BIGINT)
                  - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS bucket,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_id AS tb,
                  CAST(round(value*100) AS BIGINT) AS v
           FROM events)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                min(v) AS v_min, max(v) AS v_max,
                min(struct_pack(t := t, tb := tb, v := v)).v AS v_first,
                max(struct_pack(t := t, tb := tb, v := v)).v AS v_last
         FROM ev GROUP BY bucket ORDER BY bucket""",

    "q_event_paths" ->
      """WITH ev AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_id AS tb, event_type AS y
           FROM events),
         seqs AS (
           SELECT user_id,
                  list_transform(
                    list_sort(list(struct_pack(t := t, tb := tb, y := y))),
                    e -> e.y) AS ys
           FROM ev GROUP BY user_id),
         paths AS (
           SELECT array_to_string(ys[i:i+2], ' -> ') AS path
           FROM (SELECT ys, unnest(range(1, len(ys) - 1)) AS i
                 FROM seqs WHERE len(ys) >= 3) t0)
         SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
         FROM paths GROUP BY path
         ORDER BY n_occurrences DESC, path LIMIT 15""",

    "q_spearman" ->
      """WITH base AS (
           SELECT l_returnflag AS g,
                  l_orderkey * 10 + l_linenumber AS k,
                  CAST(round(l_quantity*100) AS BIGINT) AS x,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS y
           FROM lineitem),
         ranked AS (
           SELECT g,
                  CAST(row_number() OVER (PARTITION BY g ORDER BY x, k) AS BIGINT) AS rx,
                  CAST(row_number() OVER (PARTITION BY g ORDER BY y, k) AS BIGINT) AS ry
           FROM base)
         SELECT g AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
                CAST(10000 - (60000 * CAST(sum((rx-ry)*(rx-ry)) AS HUGEINT))
                     // (CAST(count(*) AS HUGEINT) * (count(*)*count(*) - 1)) AS BIGINT) AS rho_bp
         FROM ranked GROUP BY g
         ORDER BY l_returnflag""",

    "q_changepoint" ->
      """WITH daily AS (
           SELECT CAST(floor(epoch(ts)) AS BIGINT)
                  - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         walk AS (
           SELECT day, x,
                  sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pref,
                  sum(x) OVER () AS total,
                  count(*) OVER () AS n,
                  row_number() OVER (ORDER BY day) AS kk
           FROM daily)
         SELECT day, x, CAST(n * pref - kk * total AS BIGINT) AS s
         FROM walk ORDER BY abs(n * pref - kk * total) DESC, day LIMIT 5""",

    "q_salted_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_user_sample" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 4) < '3333'
         ORDER BY event_id""",

    "q_concurrency" ->
      """WITH e AS (
           SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
         m AS (
           SELECT user_id, t,
                  CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 3600
                         OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                       THEN 1 ELSE 0 END AS new_s
           FROM e),
         s AS (
           SELECT user_id, t,
                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM m),
         iv AS (SELECT min(t) AS s0, max(t) AS e0
                FROM s GROUP BY user_id, sid),
         deltas AS (
           SELECT t, SUM(d) AS d FROM (
             SELECT s0 AS t, 1 AS d FROM iv
             UNION ALL SELECT e0 + 1, -1 FROM iv)
           GROUP BY t HAVING SUM(d) <> 0),
         lv AS (
           SELECT t,
                  SUM(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS level,
                  lead(t) OVER (ORDER BY t) - t AS dur
           FROM deltas)
         SELECT CAST(level AS BIGINT) AS level,
                CAST(SUM(dur) AS BIGINT) AS seconds
         FROM lv WHERE dur IS NOT NULL AND level > 0
         GROUP BY level ORDER BY level""",

    "q_outliers_mad" ->
      """WITH vals AS (
           SELECT event_type AS g, event_id AS k,
                  CAST(round(value*100) AS BIGINT) AS v
           FROM events),
         h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY g, v),
         cum AS (
           SELECT g, v,
                  sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(c) OVER (PARTITION BY g) AS n
           FROM h),
         med AS (SELECT g, min(v) AS med_c FROM cum
                 WHERE cum >= (5000 * n + 9999) // 10000 GROUP BY g),
         dev AS (SELECT vals.g, k, v, med_c, abs(v - med_c) AS ad
                 FROM vals JOIN med ON vals.g = med.g),
         h2 AS (SELECT g, ad, CAST(count(*) AS BIGINT) AS c FROM dev GROUP BY g, ad),
         cum2 AS (
           SELECT g, ad,
                  sum(c) OVER (PARTITION BY g ORDER BY ad ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(c) OVER (PARTITION BY g) AS n
           FROM h2),
         mad AS (SELECT g, min(ad) AS mad_c FROM cum2
                 WHERE cum >= (5000 * n + 9999) // 10000 GROUP BY g)
         SELECT dev.g AS event_type, k AS event_id, v AS v_c,
                dev.med_c, mad.mad_c
         FROM dev JOIN mad ON dev.g = mad.g
         WHERE ad > 3 * mad_c
         ORDER BY event_type, event_id""",

    // Independent formulation on purpose: the oracle materializes the
    // inequality join + rank that the union-merge operator avoids.
    "q_asof_join" ->
      """WITH c AS (
           SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
           FROM events WHERE event_type = 'click'),
         p AS (
           SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  CAST(round(value*100) AS BIGINT) AS v_c
           FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT c.event_id AS click_id, c.user_id, c.t AS click_t,
                  p.event_id AS purchase_id, p.v_c AS purchase_c,
                  c.t - p.t AS lag_sec,
                  row_number() OVER (PARTITION BY c.event_id
                    ORDER BY p.t DESC, p.event_id DESC) AS rn
           FROM c LEFT JOIN p
             ON c.user_id = p.user_id AND p.t <= c.t AND c.t - p.t <= 86400)
         SELECT click_id, user_id, click_t, purchase_id, purchase_c, lag_sec
         FROM j WHERE rn = 1 ORDER BY click_id""",

    "q_range_join" ->
      """WITH c AS (
           SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
           FROM events WHERE event_type = 'click'),
         p AS (
           SELECT event_id AS purchase_id, user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t
           FROM events WHERE event_type = 'purchase')
         SELECT p.purchase_id, c.event_id AS click_id, c.user_id,
                p.t - c.t AS gap_sec
         FROM p JOIN c ON p.user_id = c.user_id
           AND c.t >= p.t - 3600 AND c.t <= p.t
         ORDER BY purchase_id, click_id""",

    "q_funnel" ->
      """WITH ev AS (
           SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_type AS ty
           FROM events),
         s1 AS (SELECT u, min(t) AS t1 FROM ev WHERE ty = 'view' GROUP BY u),
         s2 AS (SELECT e.u, min(t) AS t2 FROM ev e JOIN s1 USING (u)
                WHERE ty = 'click' AND t > t1 GROUP BY e.u),
         s3 AS (SELECT e.u, min(t) AS t3 FROM ev e JOIN s2 USING (u)
                WHERE ty = 'purchase' AND t > t2 GROUP BY e.u)
         SELECT s1.u AS user_id, t1, t2, t3,
                CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS stage
         FROM s1 LEFT JOIN s2 USING (u) LEFT JOIN s3 USING (u)
         ORDER BY user_id""",

    "q_retention" ->
      """WITH ev AS (
           SELECT DISTINCT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT)
                    - (CAST(floor(epoch(ts)) AS BIGINT) % 604800) AS per
           FROM events),
         f AS (SELECT u, min(per) AS cohort FROM ev GROUP BY u)
         SELECT cohort, (per - cohort) // 604800 AS "offset",
                CAST(count(*) AS BIGINT) AS n_users
         FROM ev JOIN f USING (u)
         GROUP BY cohort, "offset"
         ORDER BY cohort, "offset" """,

    "q_markov" -> markovOracle(iters = 10, scale = 1000000000L),

    "q_bootstrap" ->
      """WITH base AS (
           SELECT event_id AS id, CAST(round(value * 100) AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase'),
         reps AS (
           SELECT rep, CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
           FROM (SELECT id, v, unnest(range(0, 32)) AS rep FROM base) r
           WHERE (strpos('0123456789abcdef',
                    substr(md5('bs:' || CAST(rep AS VARCHAR) || ':'
                               || CAST(id AS VARCHAR)), 1, 1)) - 1) % 2 = 0
           GROUP BY rep),
         ranked AS (
           SELECT m, row_number() OVER (ORDER BY m, rep) AS rk FROM reps),
         ci AS (
           SELECT max(CASE WHEN rk = 2 THEN m END) AS ci_lo_c,
                  max(CASE WHEN rk = 31 THEN m END) AS ci_hi_c,
                  CAST(count(*) AS BIGINT) AS n_reps
           FROM ranked),
         pop AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_c
           FROM base)
         SELECT n, mean_c, ci_lo_c, ci_hi_c, n_reps
         FROM pop CROSS JOIN ci""",

    // CAUTION (measured, DuckDB 1.0): list_reduce evaluates the result
    // struct's fields SEQUENTIALLY against an in-place accumulator, so
    // a field written before another is already visible to it. The
    // alert field must therefore come FIRST to read the pre-update 'e'
    // (the functional-fold semantics Spark's aggregate() has natively);
    // with 'e' first the alert test silently used the new average.
    "q_ewma" ->
      """WITH pv AS (
           SELECT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_id AS tb,
                  CAST(round(value * 100) AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase'),
         per AS (
           SELECT u, list(v ORDER BY t, tb) AS vals
           FROM pv GROUP BY u),
         folded AS (
           SELECT u, CAST(len(vals) AS BIGINT) AS n,
                  list_reduce(
                    list_transform(vals, v -> {'a': CAST(0 AS BIGINT), 'e': v}),
                    (acc, x) -> {
                      'a': acc.a + CASE WHEN abs(x.e - acc.e) > 3000
                                        THEN 1 ELSE 0 END,
                      'e': (acc.e + x.e) // 2}) AS f
           FROM per WHERE len(vals) > 0)
         SELECT u AS user_id, n, f.e AS ewma_c, f.a AS n_alerts
         FROM folded ORDER BY user_id""",

    "q_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(k) AS BIGINT) AS sum_k,
                CAST(min(k) AS BIGINT) AS min_k,
                CAST(max(k) AS BIGINT) AS max_k,
                CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
         FROM (SELECT event_type,
                      CAST(json_extract(props, '$.k') AS BIGINT) AS k
               FROM events)
         WHERE k IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "q_mwu" ->
      """WITH hist AS (
           SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1v,
                  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n2v
           FROM events WHERE event_type = 'purchase'
           GROUP BY 1),
         scored AS (
           SELECT v, n1v, n2v,
                  coalesce(sum(n1v + n2v) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cprev
           FROM hist),
         agg AS (
           SELECT CAST(sum(n1v) AS BIGINT) AS n1,
                  CAST(sum(n2v) AS BIGINT) AS n2,
                  CAST(sum(n1v * (2 * cprev + n1v + n2v + 1)) AS BIGINT) AS r2
           FROM scored)
         SELECT n1, n2, r2 - n1 * (n1 + 1) AS u2,
                CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0
                     ELSE ((r2 - n1 * (n1 + 1) - n1 * n2) * 10000) // (n1 * n2)
                     END AS BIGINT) AS rb_bp
         FROM agg""",

    "q_survival" ->
      """WITH ev AS (
           SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  (event_type = 'purchase' AND value >= 90) AS hit
           FROM events),
         subj AS (
           SELECT u, min(t) AS t0, max(t) AS tl,
                  min(CASE WHEN hit THEN t END) AS te
           FROM ev GROUP BY u),
         life AS (
           SELECT (coalesce(te, tl) - t0) // 86400 AS k,
                  CAST(sum(CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_event,
                  CAST(sum(CASE WHEN te IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_censored
           FROM subj GROUP BY 1),
         risk AS (
           SELECT k, n_event, n_censored,
                  sum(n_event + n_censored) OVER (ORDER BY k
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
           FROM life),
         terms AS (
           SELECT k, CAST(n_risk AS BIGINT) AS n_risk, n_event, n_censored,
                  CASE WHEN n_risk > n_event THEN
                    CAST(floor(ln(CAST(n_risk - n_event AS DOUBLE)) * 10000) AS BIGINT)
                    - CAST(floor(ln(CAST(n_risk AS DOUBLE)) * 10000) AS BIGINT)
                  END AS term,
                  max(CASE WHEN n_risk = n_event THEN 1 ELSE 0 END)
                    OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS ext
           FROM risk)
         SELECT k AS duration, n_risk, n_event, n_censored,
                CAST(((n_risk - n_event) * 10000) // n_risk AS BIGINT) AS factor_bp,
                CASE WHEN ext = 1 THEN NULL
                     ELSE CAST(sum(term) OVER (ORDER BY k
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                END AS log_surv_bp
         FROM terms ORDER BY duration""",

    "q_forecast" ->
      """WITH daily AS (
           SELECT event_type AS g,
                  CAST(floor(epoch(ts)) AS BIGINT)
                    - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day,
                  CAST(count(*) AS BIGINT) AS actual
           FROM events GROUP BY 1, 2),
         scored AS (
           SELECT a.g, abs(a.actual - f.actual) AS ae
           FROM daily a JOIN daily f
             ON a.g = f.g AND a.day = f.day + 604800)
         SELECT g AS event_type, CAST(count(*) AS BIGINT) AS n_scored,
                CAST((sum(ae) * 1000) // count(*) AS BIGINT) AS mae_milli,
                CAST(max(ae) AS BIGINT) AS max_abs_err
         FROM scored GROUP BY g ORDER BY event_type""",

    "q_trend" ->
      """WITH daily AS (
           SELECT event_type AS g,
                  CAST(floor(epoch(ts)) AS BIGINT)
                    - (CAST(floor(epoch(ts)) AS BIGINT) % 86400) AS day,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         based AS (
           SELECT g, (day - min(day) OVER (PARTITION BY g)) // 86400 AS x, y
           FROM daily),
         agg AS (
           SELECT g, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x * x) AS BIGINT) AS sxx,
                  CAST(sum(x * y) AS BIGINT) AS sxy
           FROM based GROUP BY g)
         SELECT g AS event_type, n AS n_days, sy AS sum_y_c,
                CAST(((n * sxy - sx * sy) * 10000)
                     // (n * sxx - sx * sx) AS BIGINT) AS slope_bp
         FROM agg WHERE n >= 2 ORDER BY event_type""",

    "q_ab_test" ->
      """WITH users AS (
           SELECT user_id AS u,
                  bool_or(user_id % 2 = 0) AS va,
                  bool_or(event_type = 'purchase' AND value >= 75) AS conv
           FROM events GROUP BY user_id),
         cells AS (
           SELECT CAST(sum(CASE WHEN va AND conv THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(sum(CASE WHEN va AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS b,
                  CAST(sum(CASE WHEN NOT va AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c,
                  CAST(sum(CASE WHEN NOT va AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM users)
         SELECT a, b, c, d,
                CAST(CASE WHEN (a + b) = 0 OR (c + d) = 0 THEN 0
                     ELSE (a * 10000) // (a + b) - (c * 10000) // (c + d)
                     END AS BIGINT) AS lift_bp,
                CAST(CASE WHEN (a + b) = 0 OR (c + d) = 0 OR (a + c) = 0
                            OR (b + d) = 0 THEN 0
                     ELSE (((a + b + c + d) * (a * d - b * c) * 1000)
                             // ((a + b) * (c + d)) * (a * d - b * c))
                          // ((a + c) * (b + d))
                     END AS BIGINT) AS chi2_milli
         FROM cells""",

    "q_dp_histogram" ->
      """WITH counted AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY event_type),
         hx8 AS (
           SELECT event_type, n,
                  substr(md5('dp:' || event_type), 1, 8) AS hx
           FROM counted),
         hv AS (
           SELECT event_type, n,
                  (strpos('0123456789abcdef', hx[1]) - 1) * 268435456 +
                  (strpos('0123456789abcdef', hx[2]) - 1) * 16777216 +
                  (strpos('0123456789abcdef', hx[3]) - 1) * 1048576 +
                  (strpos('0123456789abcdef', hx[4]) - 1) * 65536 +
                  (strpos('0123456789abcdef', hx[5]) - 1) * 4096 +
                  (strpos('0123456789abcdef', hx[6]) - 1) * 256 +
                  (strpos('0123456789abcdef', hx[7]) - 1) * 16 +
                  (strpos('0123456789abcdef', hx[8]) - 1) AS h
           FROM hx8),
         noise AS (
           SELECT event_type, n,
                  CAST(floor(-2000 *
                    (CASE WHEN h >= 2147483648 THEN 1 ELSE -1 END) *
                    ln(CASE WHEN h >= 2147483648
                            THEN 2 - (h * 2 + 1) / 4294967296.0
                            ELSE (h * 2 + 1) / 4294967296.0 END))
                       AS BIGINT) AS noise_milli
           FROM hv)
         SELECT event_type, n, noise_milli,
                n * 1000 + noise_milli AS released_milli
         FROM noise ORDER BY event_type""",

    "q_attribution" ->
      """WITH ev AS (
           SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  event_type AS ty, event_id AS id
           FROM events),
         tc AS (
           SELECT t.ty, c.id AS cid, t.t AS tt, t.id AS tid
           FROM ev t JOIN ev c
             ON t.u = c.u AND c.ty = 'purchase'
            AND t.ty IN ('view', 'click')
            AND t.t < c.t AND c.t - t.t <= 604800),
         ranked AS (
           SELECT ty,
                  row_number() OVER (PARTITION BY cid
                    ORDER BY tt ASC, tid ASC) AS ra,
                  row_number() OVER (PARTITION BY cid
                    ORDER BY tt DESC, tid DESC) AS rd,
                  count(*) OVER (PARTITION BY cid) AS n
           FROM tc)
         SELECT ty AS event_type,
                CAST(sum(CASE WHEN ra = 1 THEN 10000 ELSE 0 END) AS BIGINT) AS first_bp,
                CAST(sum(CASE WHEN rd = 1 THEN 10000 ELSE 0 END) AS BIGINT) AS last_bp,
                CAST(sum(10000 // n + CASE WHEN rd = 1 THEN 10000 % n ELSE 0 END) AS BIGINT) AS linear_bp,
                CAST(count(*) AS BIGINT) AS n_touch
         FROM ranked GROUP BY ty ORDER BY event_type""",

    // PageRank replay: 10 unrolled AS MATERIALIZED stages (the staged-
    // CTE device); all-integer per-step algebra mirrors the operator.
    "q_pagerank" -> pagerankOracle(iters = 10),

    // Z-order replay: min/max CTE -> DuckDB native integer div bucket
    // ranks -> the SAME generated interleave term list (shared
    // ZOrder.interleaveSql generator — the two forms cannot drift).
    "q_zorder" -> (
      s"""WITH ev AS (
           SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
           FROM events),
         mm AS (SELECT min(user_id) AS amn, max(user_id) AS amx,
                       min(t) AS bmn, max(t) AS bmx FROM ev),
         bk AS (
           SELECT event_id, user_id, t,
                  ((user_id - amn) * 256) // (amx - amn + 1) AS ba,
                  ((t - bmn) * 256) // (bmx - bmn + 1) AS bb
           FROM ev CROSS JOIN mm)
         SELECT event_id, user_id, t,
                CAST(${graft.sources.ZOrder.interleaveSql("ba", "bb", 8)} AS BIGINT) AS zval
         FROM bk ORDER BY event_id"""),

    // 3-column Z-order replay: same min/max CTE device, three bucket
    // ranks, and the SAME generated n-way interleave term list
    // (ZOrder.interleaveSqlN — the two forms cannot drift)
    "q_zorder3" -> (
      s"""WITH ev AS (
           SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                  CAST(round(value*100) AS BIGINT) AS value_c
           FROM events),
         mm AS (SELECT min(user_id) AS amn, max(user_id) AS amx,
                       min(t) AS bmn, max(t) AS bmx,
                       min(value_c) AS cmn, max(value_c) AS cmx FROM ev),
         bk AS (
           SELECT event_id, user_id, t, value_c,
                  ((user_id - amn) * 256) // (amx - amn + 1) AS ba,
                  ((t - bmn) * 256) // (bmx - bmn + 1) AS bb,
                  ((value_c - cmn) * 256) // (cmx - cmn + 1) AS bc
           FROM ev CROSS JOIN mm)
         SELECT event_id, user_id, t, value_c,
                CAST(${graft.sources.ZOrder.interleaveSqlN(Seq("ba", "bb", "bc"), 8)} AS BIGINT) AS zval
         FROM bk ORDER BY event_id"""),

    // zone-map pruned scan loses nothing: plain range filter over events
    "q_zonemap_scan" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                CAST(round(value*100) AS BIGINT) AS value_c
         FROM events WHERE user_id BETWEEN 20 AND 39 ORDER BY event_id""",

    // Catalyst-integrated skipping loses nothing either: the pruning
    // range conjunct (<= 59) plus the residual-only OR/!= mix over the
    // zone-mapped layout
    "q_zonemap_auto" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                CAST(round(value*100) AS BIGINT) AS value_c
         FROM events
         WHERE user_id <= 59
           AND (user_id BETWEEN 40 AND 59 OR user_id IN (5, 17))
           AND user_id <> 44
         ORDER BY event_id""",

    // bloom-pruned point/IN lookup loses nothing: plain IN over events
    "q_bloom_skip" ->
      """SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
                CAST(round(value*100) AS BIGINT) AS value_c
         FROM events WHERE event_id IN (7, 123, 4242) ORDER BY event_id""",

    "q_window_agg" ->
      """SELECT CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS w_start,
                event_type, COUNT(*) AS n,
                CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_v_c
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_latest_unaugmented" ->
      """SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS idstr,
                CAST(floor(epoch(l_shipdate)) AS BIGINT) AS created,
                CAST(l_orderkey AS VARCHAR) AS submission
         FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE CAST(o.o_orderkey AS VARCHAR) = CAST(l.l_orderkey AS VARCHAR)
                             AND o.o_orderstatus = 'F')
         ORDER BY created DESC, idstr DESC LIMIT 1""",

    // Re-reads the file q_ingest_file wrote (Verify runs first, at sf0.01).
    // CSV ground truth: DuckDB's OWN RFC 4180 parser over the identical
    // bytes — the agreement of two independent implementations IS the
    // semantics being gated (field bytes md5'd, newline-in-field kept)
    "q_csv_ingest" ->
      """SELECT doc_id, md5(body) AS digest,
                CAST(length(body) AS BIGINT) AS n_chars, tag
         FROM read_csv('/tmp/graft_csv/__INGEST_SF__/*.txt', header=false,
           columns={'doc_id':'BIGINT','body':'VARCHAR','tag':'VARCHAR'})
         ORDER BY doc_id""",

    // ignore_errors=true surfaces corrupt lines as all-NULL ghost rows, so
    // parsed excludes them structurally (every real line has id or title);
    // quarantine is counted independently from the raw text via json_valid.
    "q_ingest_file" ->
      """WITH lines AS (
           SELECT unnest(string_split(content, chr(10))) AS line
           FROM read_text('/tmp/graft_ingest_file/__INGEST_SF__/*.txt')),
         parsed AS (
           SELECT * FROM read_json('/tmp/graft_ingest_file/__INGEST_SF__/*.txt',
             format='newline_delimited', ignore_errors=true,
             columns={id:'VARCHAR', name:'VARCHAR', created_utc:'DOUBLE',
                      author:'VARCHAR', title:'VARCHAR', url:'VARCHAR',
                      selftext:'VARCHAR', score:'BIGINT', subreddit:'VARCHAR',
                      distinguished:'VARCHAR', over_18:'BOOLEAN',
                      is_self:'BOOLEAN', edited:'VARCHAR', body:'VARCHAR',
                      parent_id:'VARCHAR', link_id:'VARCHAR'})
           WHERE id IS NOT NULL OR title IS NOT NULL),
         cls AS (
           SELECT *,
             (coalesce(starts_with(name, 't3_'), false)
               OR over_18 IS NOT NULL) AS is_sub,
             (coalesce(starts_with(name, 't1_'), false)
               OR coalesce(starts_with(parent_id, 't3_'), false)
               OR coalesce(starts_with(parent_id, 't1_'), false)
               OR coalesce(starts_with(link_id, 't3_'), false)) AS is_com
           FROM parsed),
         counts AS (
           SELECT
             (SELECT count(*) FROM lines
              WHERE trim(line) <> '' AND NOT json_valid(line)) AS n_quarantined,
             count(*) FILTER (WHERE NOT is_sub AND is_com) AS n_comment_rows,
             count(*) FILTER (WHERE NOT is_sub AND NOT is_com) AS n_unclassified
           FROM cls),
         u AS (
           SELECT c.*, o.o_orderkey AS k,
             replace(replace(replace(replace(replace(coalesce(c.selftext, ''),
               '&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),'&amp;','&') AS sel,
             coalesce(c.is_self, false) AS self0
           FROM cls c JOIN orders o ON c.id = lower(to_base(o.o_orderkey, 36))
           WHERE c.is_sub)
         SELECT
           k AS idint,
           coalesce(name, 't3_' || id) AS idstr,
           CAST(created_utc AS BIGINT) AS created,
           self0 AS self,
           coalesce(over_18, false) AS nsfw,
           coalesce(author, '[DELETED]') AS author,
           title,
           CASE WHEN self0 THEN NULL
                WHEN starts_with(url, '/r/') THEN 'https://reddit.com' || url
                ELSE url END AS url,
           sel AS selftext,
           coalesce(score, 0) AS score,
           subreddit,
           distinguished AS distinguish,
           CAST(length(sel) AS BIGINT) AS textlen,
           CAST(0 AS BIGINT) AS num_comments,
           CAST(NULL AS VARCHAR) AS flair_text,
           CAST(NULL AS VARCHAR) AS flair_css_class,
           CAST(NULL AS BIGINT) AS augmented_at,
           CAST(NULL AS BIGINT) AS augmented_count,
           CASE WHEN regexp_matches(edited, '^[0-9]+(\.[0-9]+)?$')
                THEN CAST(CAST(edited AS DOUBLE) AS BIGINT) END AS _edited,
           counts.n_quarantined, counts.n_comment_rows, counts.n_unclassified
         FROM u CROSS JOIN counts
         ORDER BY idstr"""
  )

  /** Repo root for `__REPO__`: explicit override (`GRAFT_REPO_ROOT` as
    * system property or env var — needed when the JVM is launched from
    * outside the checkout, e.g. spark-submit from another directory),
    * else `user.dir` (sbt runs from the project root). */
  private def repoRoot: String = {
    val dir = sys.props.get("GRAFT_REPO_ROOT")
      .orElse(sys.env.get("GRAFT_REPO_ROOT"))
      .getOrElse(sys.props("user.dir"))
    new java.io.File(dir).getCanonicalPath
  }

  /** Oracle SQL with fixture paths bound to `sfName` (e.g. "sf0.01") and
    * the repo root bound per [[repoRoot]]. */
  def oraclesAt(sfName: String): Map[String, String] =
    oraclesRaw.map { case (k, v) => k -> v
      .replace(IngestSfToken, sfName)
      .replace(RepoToken, repoRoot) }

  /** Default binding, kept for direct readers of the static contract. */
  val oracles: Map[String, String] = oraclesAt("sf0.01")
}
