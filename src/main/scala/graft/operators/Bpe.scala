package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed operator
  * (Sennrich, Haddow, Birch 2016, arXiv:1508.07909) — the missing third
  * of the tokenizer family next to counting (`TextAnalysis.tokenCount` /
  * `subwordCount`) and vocabulary building (`topTokens`): learn the merge
  * table itself, on-cluster.
  *
  * ==Scale shape==
  *
  * The corpus is touched EXACTLY ONCE — the word-frequency aggregation
  * (map-side combined, one exchange bounded by |distinct words|). Every
  * merge iteration then runs on the distinct-WORD table (vocabulary-sized
  * — ~10⁷ rows for a 100 TB web corpus, trivially distributed), never on
  * corpus bytes: one adjacent-pair count (exchange bounded by |distinct
  * symbol pairs|), a 1-ROW collect of the winning pair (argmax by count,
  * ties to the lexicographically smallest pair — deterministic in any
  * engine), and a map-only rewrite of the symbol column
  * ([[graft.functions.BpeMergeApply]], rule as plan-time constant). The
  * symbol table is locally checkpointed per iteration so lineage stays
  * flat across many merges.
  *
  * All arithmetic is integer and all comparisons byte-exact, so the
  * whole training loop replays relationally — the oracle runs the same
  * count → argmax → greedy-rewrite chain per step in SQL.
  */
object Bpe {

  /** (word, freq) over whitespace words of the lowercased corpus — the
    * one corpus-sized pass; everything downstream is vocabulary-sized. */
  def wordFreq(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(split(trim(lower(col(text))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Learn `merges` BPE merge rules. Initial symbols = the word's
    * characters plus a `</w>` end-of-word sentinel (the published
    * formulation: merges never cross word boundaries, and a final
    * subword is distinguishable from a prefix).
    *
    * Output: (step, lhs, rhs, merged, pair_count) — the merge table, the
    * tokenizer's trained artifact, in learning order. The per-step
    * collect is ONE row (the argmax pair); the merge table itself is
    * ≤ merges rows — driver-trivial at any corpus size, the same
    * contract as the codebook collects in [[Similarity]]. */
  def learn(docs: DataFrame, text: String, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = docs.sparkSession
    var syms = wordFreq(docs, text)
      .select(col("freq"), concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      // guard size >= 2 BEFORE sequence(): Spark's sequence infers a
      // descending step for start > stop, so a 1-symbol word would emit
      // [0, -1] instead of no pairs
      val win = syms.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(
            sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (win.isEmpty) exhausted = true   // every word fully merged
      else {
        val l = win.head.getString(0)
        val r = win.head.getString(1)
        rules += ((step, l, r, l + r, win.head.getLong(2)))
        syms = syms.select(col("freq"),
          graft.functions.bpeMerge(col("syms"), l, r).as("syms")).localCheckpoint()
        step += 1
      }
    }
    import spark.implicits._
    rules.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** Tokenize with an ALREADY-LEARNED merge table: apply the rules in
    * learning order to each word's symbols — the serving path (training
    * artifact fixed, tokenization map-only, zero shuffles, zero
    * iteration). One fused [[graft.functions.BpeApplyRules]] call per
    * word carries the whole rule table as a codegen reference object —
    * the form that survives real merge budgets (a 30k-rule chained
    * unroll would blow the expression tree); [[tokenizeUnrolled]] keeps
    * the chained shape for the equality spec. Output: input columns +
    * `tokens` (array<string>). */
  def tokenize(docs: DataFrame, text: String,
      rules: Seq[(String, String)]): DataFrame = {
    val words = filter(split(trim(lower(col(text))), "\\s+"), w => length(w) > 0)
    val base = transform(words, w => concat(split(w, ""), array(lit("</w>"))))
    val mergedCol =
      if (rules.isEmpty) base
      else transform(base, w => graft.functions.bpeApplyRules(w, rules))
    docs.withColumn("tokens", flatten(mergedCol))
  }

  /** The |rules|-chained form of [[tokenize]] — one [[graft.functions
    * .BpeMergeApply]] per rule. Semantically identical (spec-asserted);
    * kept as the reference shape for small budgets. */
  def tokenizeUnrolled(docs: DataFrame, text: String,
      rules: Seq[(String, String)]): DataFrame = {
    val words = filter(split(trim(lower(col(text))), "\\s+"), w => length(w) > 0)
    val base = transform(words, w => concat(split(w, ""), array(lit("</w>"))))
    val mergedCol = rules.foldLeft(base)((acc, rule) =>
      transform(acc, s => graft.functions.bpeMerge(s, rule._1, rule._2)))
    docs.withColumn("tokens", flatten(mergedCol))
  }
}
