package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity-resolution building block): edit-distance
  * lookup of a probe set against a name corpus.
  *
  * Scale shape: the probe set broadcasts (it is query input, not corpus);
  * the corpus NEVER shuffles — candidate generation is a broadcast
  * nested-loop with a length-band residual (|len(a)−len(b)| ≤ maxDist is
  * a lossless Levenshtein prefilter), the codegen'd `levenshtein`
  * verifies, and the only exchange is the probe-bounded top-1 aggregate.
  * Spark's `levenshtein(l, r, threshold)` form abandons a row early once
  * the distance provably exceeds the bound — the banded O(maxDist·n) DP,
  * not the full matrix.
  */
object Fuzzy {

  /** Best corpus match per probe: minimum edit distance ≤ `maxDist`,
    * ties to the smallest corpus key. Probes with no candidate within
    * the bound are absent. Output: (probe_key, probe_name, match_key,
    * match_name, dist).
    */
  def fuzzyLookup(corpus: DataFrame, key: String, name: String,
      probes: DataFrame, probeKey: String, probeName: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val cand = corpus.select(col(key).as("_mk"), col(name).as("_mn"))
      .join(broadcast(probes.select(col(probeKey).as("probe_key"),
        col(probeName).as("probe_name"))),
        abs(length(col("_mn")) - length(col("probe_name"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("probe_name"), col("_mn"), maxDist))
      // the thresholded form returns -1 once the bound is exceeded
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
    cand
      .groupBy("probe_key", "probe_name")
      .agg(min(struct(col("dist"), col("_mk"), col("_mn"))).as("m"))
      .select(col("probe_key"), col("probe_name"),
        col("m._mk").as("match_key"), col("m._mn").as("match_name"),
        col("m.dist").cast("long").as("dist"))
  }

  /** Norvig-style spell correction against a frequency-weighted
    * vocabulary: each misspelling takes the vocab word minimizing
    * (edit distance, −frequency, word) within `maxDist` — distance
    * first, then the LANGUAGE-MODEL prior (corpus frequency), then a
    * lexicographic tiebreak; no candidate in range ⇒ absent. Same plan
    * shape as [[fuzzyLookup]]: misspellings broadcast, the vocabulary
    * never shuffles, candidate generation is length-banded +
    * threshold-banded levenshtein fused into the scan, and the only
    * exchange is the probe-bounded argmin. Output (typo, corrected,
    * dist, freq). */
  def spellCorrect(vocab: DataFrame, word: String, freq: String,
      typos: DataFrame, typoCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val cand = vocab.select(col(word).as("_w"), col(freq).as("_f"))
      .join(broadcast(typos.select(col(typoCol).as("typo")).distinct()),
        abs(length(col("_w")) - length(col("typo"))) <= maxDist)
      .withColumn("dist", levenshtein(col("typo"), col("_w"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
    cand
      .groupBy("typo")
      .agg(min(struct(col("dist"), (-col("_f")).as("nf"), col("_w")))
        .as("m"))
      .select(col("typo"), col("m._w").as("corrected"),
        col("m.dist").cast("long").as("dist"),
        (-col("m.nf")).cast("long").as("freq"))
  }
}
