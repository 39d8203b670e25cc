package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Merge, Trees}

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

  /** events.ts (nanos-as-long) → epoch seconds; integer division, because a
    * double round-trip at 1e18 magnitude can cross second boundaries. */
  private val tsSec: Column = expr("ts div 1000000000")

  /** events → comment-shaped "old" store (the archive before a batch). */
  private def oldComments(s: SparkSession, dir: String): DataFrame =
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
  private def newComments(s: SparkSession, dir: String): DataFrame =
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
      val subs = Tables.load(s, dir, "orders").select(
        col("o_orderkey").cast("string").as("idstr"),
        epochSec(col("o_orderdate")).as("created"),
        cents(col("o_totalprice")).as("score"),
        col("o_orderpriority").as("title"),
        col("o_custkey").cast("string").as("author"),
        col("o_orderstatus").as("subreddit"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("flair_text"))
      Analytics.indexListing(subs, 30000000L, "flair")
        .select(col("idstr"), col("flair_text"), col("created"),
          format_string("%s: [%s] %s",
            graft.functions.indexTime(col("created")),
            col("idstr"),
            graft.functions.stripNewlines(col("title"))).as("line"))
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

    // S3/S5 — page-overlap/live-enrichment dedupe: newest wins per key.
    "q_dedupe_latest" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
      Merge.dedupeLatest(ev, "user_id", "event_id")
        .orderBy("user_id")
    }),

    // A3 — incremental lower bound: max(created) − 1 overlap.
    "q_incremental_bound" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events").select(tsSec.as("created"))
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

  val oracles: Map[String, String] = Map(
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

    "q_merge_upsert" ->
      """WITH old AS (
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
           FROM events WHERE event_id % 2 = 0)
         SELECT COALESCE(o.idint, n.idint) AS idint,
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
         FROM old o FULL OUTER JOIN new n ON o.idstr = n.idstr
         ORDER BY idstr""",

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

    "q_latest_unaugmented" ->
      """SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS idstr,
                CAST(floor(epoch(l_shipdate)) AS BIGINT) AS created,
                CAST(l_orderkey AS VARCHAR) AS submission
         FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE CAST(o.o_orderkey AS VARCHAR) = CAST(l.l_orderkey AS VARCHAR)
                             AND o.o_orderstatus = 'F')
         ORDER BY created DESC, idstr DESC LIMIT 1"""
  )
}
