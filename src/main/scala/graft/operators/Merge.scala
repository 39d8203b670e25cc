package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert/merge engine (SURVEY §2.3 J1/J2, §2.4 A5, §2.2 P5, §2.9 T8).
  *
  * The reference mutates SQLite row-by-row (tsdb.py:389-509): probe by
  * `idstr`, INSERT if absent, else per-column `coalesce` UPDATE, with a
  * tombstone guard on the text column (tsdb.py:527-545) and an edit-history
  * CDC append (tsdb.py:303-324, 361-387). We re-express the *final state* of
  * that sequential process as one declarative plan:
  *
  *   union(existing tagged seq=-1, incoming tagged seq=0..n)
  *     → single window partitioned by idstr ordered by seq
  *     → last-non-null per updatable column, first per frozen column,
  *       running "stored text" fold for the tombstone chain
  *     → keep the last row per key (the final state)
  *
  * ONE shuffle on the unique key `idstr` — no skew (keys are unique), no
  * second exchange for the edits stream (it reuses the same window), and
  * both outputs come off the same shuffled scan. This is the plan shape that
  * survives 100 TB: the alternative full-outer-join design shuffles twice.
  *
  * Within-batch order: the reference applies rows sequentially in input
  * order (dummy-then-live precedence, pushshift.py:224-243); callers encode
  * that precedence in `seqCol` (e.g. file offset, retrieval time, batch id).
  */
object Merge {

  /** The merge key column. Every entity table carries it: the upsert
    * window (below), [[graft.streaming.Livestream.keyBucket]], and the
    * versioned store's compaction salt all key on this one name — it is
    * a structural invariant of the layer, not per-entity config. */
  val KeyCol = "idstr"

  /** Column roles for one entity table. */
  final case class Entity(
      textCol: String,              // selftext | body
      editTextCol: String,          // previous_selftext | previous_body
      updatable: Seq[String],       // coalesce(new, old) on UPDATE
      frozen: Seq[String])          // set at INSERT, never updated

  /** submissions — UPDATE list tsdb.py:438-451. `textlen` is intentionally
    * frozen: the reference never refreshes it after insert, so it can go
    * stale relative to an edited selftext; we reproduce that contract. */
  val submissions: Entity = Entity(
    textCol = "selftext", editTextCol = "previous_selftext",
    updatable = Seq("nsfw", "score", "distinguish", "num_comments",
      "flair_text", "flair_css_class"),
    frozen = Seq("idint", "created", "self", "author", "title", "url",
      "subreddit", "textlen", "augmented_at", "augmented_count"))

  /** comments — UPDATE list tsdb.py:494-501. */
  val comments: Entity = Entity(
    textCol = "body", editTextCol = "previous_body",
    updatable = Seq("score", "distinguish"),
    frozen = Seq("idint", "created", "author", "parent", "submission",
      "subreddit", "textlen"))

  /** @param staged the shared windowed intermediate both outputs derive
    *        from. A caller that executes BOTH `table` and `edits` (e.g. a
    *        versioned-store publish) can persist it so the union + exchange
    *        + window stack runs once instead of per output; single-output
    *        consumers ignore it (no cost — it is a lazy plan). */
  final case class MergeResult(table: DataFrame, edits: DataFrame,
      staged: DataFrame)

  /** Tombstone guard (tsdb.py:527-545 should_keep_existing_text): deleted
    * rows and greasy overwrite bots must not clobber archived text. */
  def keepExistingText(author: Column, text: Column): Column =
    (author.isNull || (author === "[DELETED]")) && text.isin("[removed]", "[deleted]") ||
      text.contains("has been overwritten") ||
      text.contains("pastebin.com/64GuVi2F")

  /** Upsert `incoming` into `existing`.
    *
    * @param incoming normalized rows; must carry `seqCol` (within-batch
    *                 precedence) and may carry `_edited` (epoch of the edit,
    *                 tsdb.py:374-377) which times the CDC record.
    * @param nowEpoch timestamp for CDC rows whose `_edited` is unknown.
    * @param storeEdits the reference's `store_edits` config (tsdb.py:204-215).
    * @param clusterCol a column (present in both frames, constant within
    *                 each key group — the versioned store's key-stable
    *                 partition value) to pre-partition the union by: the
    *                 window then partitions by (cluster, key), which
    *                 `HashPartitioning(cluster)` already satisfies
    *                 (ClusteredDistribution subset rule), so the ONE
    *                 exchange both feeds the merge fold AND leaves the
    *                 output aligned for a partitioned write — the second
    *                 per-publish exchange (write alignment) disappears.
    */
  def upsert(
      existing: DataFrame,
      incoming: DataFrame,
      entity: Entity,
      seqCol: String,
      nowEpoch: Column = unix_timestamp(current_timestamp()),
      storeEdits: Boolean = true,
      clusterCol: Option[String] = None): MergeResult = {

    val text = entity.textCol
    val hasEdited = incoming.columns.contains("_edited")
    val in = (if (hasEdited) incoming else incoming.withColumn("_edited", lit(null).cast("long")))
      .withColumn("_seq", col(seqCol).cast("long"))
    val ex = existing
      .withColumn("_edited", lit(null).cast("long"))
      .withColumn("_seq", lit(-1L))

    val cols = existing.columns.toSeq
    val unioned = ex.select((cols.map(col) :+ col("_edited") :+ col("_seq")): _*)
      .unionByName(in.select((cols.map(col) :+ col("_edited") :+ col("_seq")): _*))
    val all = clusterCol.map(c => unioned.repartition(col(c))).getOrElse(unioned)

    val w = Window.partitionBy((clusterCol.toSeq :+ KeyCol).map(col): _*)
      .orderBy("_seq")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wEnd = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    // Window functions may not nest, so the fold is staged across chained
    // projections — all over the SAME partitioning, so Catalyst plans one
    // exchange and consecutive Window nodes on top of it.
    val staged = all
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wEnd))
      .withColumn("_tomb", keepExistingText(col("author"), col(text)))
      // Stored text after each row: the newest text that was allowed to
      // land. The first row (insert) always lands, tombstones never do
      // (tsdb.py:303-324).
      .withColumn("_stored_text",
        last(when(col("_rn") === 1 || !col("_tomb"), col(text)),
          ignoreNulls = true).over(wAll))
      .withColumn("_prev_stored", lag(col("_stored_text"), 1).over(w))
      .withColumn("_is_first", col("_rn") === 1)
      .withColumn("_rn_desc", (col("_n") - col("_rn") + 1).cast("int"))

    // Final state: one row per key; frozen cols from the first row, updatable
    // cols as last-non-null (≡ the chain of coalesce(new, old) UPDATEs).
    val firstVals = entity.frozen.map(c => first(col(c)).over(wEnd).as(c))
    val lastVals = entity.updatable.map(c =>
      last(col(c), ignoreNulls = true).over(wEnd).as(c))
    val finalText = last(col("_stored_text"), ignoreNulls = true).over(wEnd).as(text)

    val merged = staged
      .select((col(KeyCol) +: col("_rn_desc") +: firstVals) ++ lastVals :+ finalText: _*)
      .filter(col("_rn_desc") === 1)
      .select(cols.map(col): _*)   // restore canonical column order

    // Edit-CDC (T8): a non-first, non-tombstone row whose text differs from
    // the previously stored text archives that previous text.
    val spark = existing.sparkSession
    val emptyEdits = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.model.Schemas.edits(entity.editTextCol))
    val edits =
      if (!storeEdits) emptyEdits
      else staged
        .filter(!col("_is_first") && !col("_tomb") && !(col(text) <=> col("_prev_stored")))
        .select(
          col(KeyCol),
          col("_prev_stored").as(entity.editTextCol),
          coalesce(col("_edited"), nowEpoch).cast("long").as("replaced_at"))

    MergeResult(merged, edits, staged)
  }

  /** J1 — merge_db.py:7-23: copy rows absent from `mine`; never update
    * existing rows. Broadcast the anti-join when `other` is small; at scale
    * both sides are large → AQE picks shuffled hash join on the unique key. */
  def mergeDb(mine: DataFrame, other: DataFrame): DataFrame =
    mine.unionByName(other.join(mine.select("idint"), Seq("idint"), "left_anti"))

  /** S3/S5 batch dedupe: newest version per id wins (page-overlap refetch +
    * dummy-then-live interleave both collapse here). */
  def dedupeLatest(df: DataFrame, key: String, seqCol: String): DataFrame =
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(key).orderBy(col(seqCol).desc)))
      .filter(col("_rn") === 1).drop("_rn")
}
