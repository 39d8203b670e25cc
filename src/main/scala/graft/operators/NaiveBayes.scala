package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes — the engine TRAINS and SERVES a classifier
  * entirely relationally, in the quantized-ln house style:
  *
  *   score(d, c) = [ln_bp(n_c) − ln_bp(N)]                (class prior)
  *               + Σ_{t∈d} tf·ln_bp(cnt(t,c) + 1)          (likelihood)
  *               − |d|·ln_bp(tot_c + V)                    (smoothing denom)
  *
  * — add-one smoothing with the log split so an unseen (t, c) pair
  * contributes exactly ln_bp(0 + 1) = 0 through the likelihood term and
  * its full smoothed mass through the per-class denominator; every ln
  * is floored ONCE per distinct argument (the quantized-ln device), so
  * scores are exact integers and the argmax replays relationally. Ties
  * break to the lexicographically smallest class.
  *
  * Scale shape: training is two grouped passes over the token stream
  * ((t, c) counts + per-class totals — vocab·|classes|-bounded) plus
  * scalar corpus constants; scoring joins doc postings to the model on
  * the token (model broadcast at vocab·|classes| scale) and the argmax
  * window partitions per doc over |classes| rows. The corpus shuffles
  * once for postings; nothing downstream is corpus-sized except the
  * per-doc prediction rows.
  */
object NaiveBayes {

  private def lnBp(c: org.apache.spark.sql.Column) =
    floor(log(c.cast("double")) * 10000).cast("long")

  private def toks(text: String) =
    filter(split(lower(col(text)), "[^a-z0-9]+"), t => length(t) > 0)

  /** The scoring core over a GIVEN model — (tok, c, cnt) token counts
    * and (c, nc) class doc counts — applied to the postings/doc-level
    * frames of the frame being scored. The serving entry point for the
    * incrementally-maintained model table ([[graft.streaming.StreamNb]]
    * keeps exactly these two row classes as additive counters). */
  private def score(postings: DataFrame, docLevel: DataFrame,
      cnt: DataFrame, classDocs: DataFrame): DataFrame = {
    val totc = cnt.groupBy("c").agg(sum("cnt").as("tot"))
    val vocabN = cnt.select("tok").distinct()
      .agg(count(lit(1)).as("v"))
    val nAll = classDocs.agg(sum("nc").as("n"))
    val consts = classDocs.crossJoin(broadcast(nAll))
      .join(totc, "c").crossJoin(broadcast(vocabN))
      .select(col("c"), (lnBp(col("nc")) - lnBp(col("n"))).as("prior"),
        lnBp(col("tot") + col("v")).as("denom"))
    val model = cnt.select(col("tok"), col("c"),
      lnBp(col("cnt") + 1L).as("lsc"))
    val matched = postings
      .join(model, "tok")
      .groupBy("doc", "c").agg(sum(col("tf") * col("lsc")).as("m"))
    val scored = docLevel.crossJoin(broadcast(consts))
      .join(matched, Seq("doc", "c"), "left")
      .select(col("doc"), col("lbl"), col("c"),
        (col("prior") + coalesce(col("m"), lit(0L))
          - col("nd") * col("denom")).as("score"))
    val w = Window.partitionBy("doc")
      .orderBy(col("score").desc, col("c").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc"), col("lbl").as("label"),
        col("c").as("predicted"), col("score"))
  }

  private def postingsOf(df: DataFrame, id: String, text: String,
      label: String): DataFrame =
    df.select(col(id).as("doc"), col(label).as("lbl"), toks(text).as("_t"))
      .select(col("doc"), col("lbl"), explode(col("_t")).as("tok"))
      .groupBy("doc", "lbl", "tok").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)

  /** Per-document predictions: (doc, label, predicted, score). Trains
    * on the full frame and scores the same frame (resubstitution — the
    * gate's framing; production holds out, same plan). */
  def classify(df: DataFrame, id: String, text: String,
      label: String): DataFrame = {
    val postings = postingsOf(df, id, text, label)
    val docLevel = postings.groupBy("doc", "lbl").agg(sum("tf").as("nd"))
    val cnt = postings.groupBy(col("tok"), col("lbl").as("c"))
      .agg(sum("tf").as("cnt"))
    val classDocs = docLevel.groupBy(col("lbl").as("c"))
      .agg(count(lit(1)).as("nc"))
    score(postings, docLevel, cnt, classDocs)
  }

  /** [[classify]] against a PREBUILT model (the trained-artifact /
    * maintained-table serving split): token counts (tok, c, cnt) and
    * class doc counts (c, nc) come from the model; only the scored
    * frame's postings are computed here. */
  def classifyFromModel(df: DataFrame, id: String, text: String,
      label: String, cnt: DataFrame, classDocs: DataFrame): DataFrame = {
    val postings = postingsOf(df, id, text, label)
    val docLevel = postings.groupBy("doc", "lbl").agg(sum("tf").as("nd"))
    score(postings, docLevel, cnt, classDocs)
  }

  /** Confusion matrix of the resubstitution classification:
    * (label, predicted, n). */
  def confusion(df: DataFrame, id: String, text: String,
      label: String): DataFrame =
    classify(df, id, text, label)
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))

  /** Confusion matrix served from a maintained/prebuilt model. */
  def confusionFromModel(df: DataFrame, id: String, text: String,
      label: String, cnt: DataFrame, classDocs: DataFrame): DataFrame =
    classifyFromModel(df, id, text, label, cnt, classDocs)
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))
}
