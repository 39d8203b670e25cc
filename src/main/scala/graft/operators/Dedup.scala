package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. All operators are pure DataFrame plans
  * (codegen'd built-ins, no UDFs) designed so the candidate-generation
  * stage — the only quadratic danger at 100 TB — is blocked/banded and
  * frequency-capped.
  */
object Dedup {

  /** Whitespace/case-normalized text (dedup canonical form). */
  def normText(c: Column): Column = lower(regexp_replace(trim(c), "\\s+", " "))

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word n-gram shingles: (id, shingle) rows.
    * `transform(sequence(...))` keeps shingling inside codegen; `explode`
    * then `distinct` gives the set semantics Jaccard needs.
    *
    * Docs with fewer than n words have an empty shingle set and emit no
    * rows (the `when` guard matters: `sequence(0, size-n)` with size<n
    * would produce a DESCENDING sequence and crash `slice`; short docs are
    * guaranteed in any real corpus). */
  def shingles(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val w = words(col(text))
    df.select(col(id).as("doc"),
        explode(when(size(w) >= n,
          transform(sequence(lit(0), size(w) - n),
            i => concat_ws(" ", slice(w, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("s"))
      .distinct()
  }

  /** Exact dedup: group by normalized text; canonical row = min id.
    * One hash-agg shuffle; at 100 TB group instead by a 128-bit text hash
    * (`md5`) so the exchange carries 16 bytes, not document bodies —
    * `byHash=true` does exactly that. */
  def exact(df: DataFrame, id: String, text: String, byHash: Boolean = true): DataFrame = {
    val key = if (byHash) md5(normText(col(text))) else normText(col(text))
    df.select(col(id).as("doc_id"), key.as("k"))
      .groupBy("k")
      .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")
  }

  /** All pairs with shingle-set Jaccard ≥ threshold, exactly.
    *
    * Candidate generation is a self-equi-join on shingle — the classic
    * inverted-index block join. `freqCap` drops shingles occurring in more
    * than that many documents first: a stop-shingle in f docs would emit
    * f² join rows, and capping bounds the blowup while provably never
    * losing a pair at high thresholds (dropping a shared shingle lowers
    * measured J for both candidate generation AND the exact verify below
    * only if the cap is too tight — so cap ≫ expected duplicate-group
    * size; it exists to shed pathological hot keys, the join-skew story
    * at scale).
    *
    * Output: (i, j, jac_bp) with i < j, Jaccard in basis points.
    */
  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int,
      thresholdBp: Int, freqCap: Long = 1000000L): DataFrame = {
    val sh = shingles(df, id, text, n)
    // Heavy-hitter shedding: shingles above the cap are by definition FEW
    // (heavy hitters), so they broadcast — the anti-join is a map-side
    // filter on the big side, no extra shuffle and no per-key sort (a
    // count-over-window formulation would shuffle AND sort every shingle).
    val hot = sh.groupBy("s").agg(count(lit(1)).as("_f"))
      .filter(col("_f") > freqCap).select("s")
    val capped = sh.join(broadcast(hot), Seq("s"), "left_anti")
    val sizes = capped.groupBy("doc").agg(count(lit(1)).as("n"))
    val a = capped.as("a"); val b = capped.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("i"), col("b.doc").as("j"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc", "i").withColumnRenamed("n", "ni"), "i")
      .join(sizes.withColumnRenamed("doc", "j").withColumnRenamed("n", "nj"), "j")
      .withColumn("jac_bp",
        floor(col("c") * 10000.0 / (col("ni") + col("nj") - col("c"))).cast("long"))
      .filter(col("jac_bp") >= thresholdBp)
      .select("i", "j", "jac_bp")
  }

  /** MinHash signatures: k minimums of independent hashes over the shingle
    * set. Hash family: xxhash64 seeded by the function index (prepending
    * the index column changes the hash). One groupBy produces all k mins —
    * map-side partial agg collapses each document locally. */
  def minhash(sh: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    sh.groupBy("doc").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding + exact verification.
    *
    * Pipeline: shingle → k-wide signature → b bands of r rows hashed to a
    * bucket → docs sharing a (band, bucket) become candidate pairs →
    * candidates are verified with exact Jaccard and filtered to the
    * threshold. Verification makes the output exact (no false positives);
    * the banding parameters put the false-negative knee well below the
    * threshold: P(miss | J) = (1 − J^r)^b — with r=4, b=32 a true pair at
    * J=0.9 is missed with p ≈ 1e−15.
    *
    * Scale: candidate join is on (band, bucket) — inverted-index blocking
    * again, never all-pairs; signatures are 8k bytes per doc.
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String, n: Int,
      thresholdBp: Int, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val sh = shingles(df, id, text, n)
    val sig = minhash(sh, numHashes)
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        xxhash64((bnd * r until (bnd + 1) * r).map(i => col(s"h$i")): _*).as("bucket"))
    }
    val buckets = sig.select(col("doc"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc"), col("bb.band"), col("bb.bucket"))
    val x = buckets.as("x"); val y = buckets.as("y")
    val candidates = x.join(y,
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("i"), col("y.doc").as("j"))
      .distinct()
    // Exact verify: intersect shingle sets of candidate pairs only. The
    // second join is keyed on BOTH (j, s) — joining on j alone and
    // filtering s afterwards would cross every i-shingle with every
    // j-shingle per pair (|sh_i|×|sh_j| intermediate rows instead of
    // |sh_i| + matches).
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sh.withColumnRenamed("doc", "i"), "i")
      .join(sh.withColumnRenamed("doc", "j"), Seq("j", "s"))
      .groupBy("i", "j").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc", "i").withColumnRenamed("n", "ni"), "i")
      .join(sizes.withColumnRenamed("doc", "j").withColumnRenamed("n", "nj"), "j")
      .withColumn("jac_bp",
        floor(col("c") * 10000.0 / (col("ni") + col("nj") - col("c"))).cast("long"))
      .filter(col("jac_bp") >= thresholdBp)
      .select("i", "j", "jac_bp")
  }

  /** 64-bit SimHash over word unigrams: per bit, majority vote of the
    * word-hash bits (weight 1). All 64 votes are one hash-agg pass. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id).as("doc"), explode(words(normText(col(text)))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val agg = tok.groupBy("doc").agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Banding: the 64-bit hash splits into (maxHamming+1) chunks; by
    * pigeonhole, any pair within the distance agrees on at least one full
    * chunk — so an equi-join per chunk finds ALL such pairs (no false
    * negatives, unlike probabilistic LSH), then `bit_count(xor)` verifies.
    */
  def simhashPairs(df: DataFrame, id: String, text: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val s = simhash(df, id, text)
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1).as("key"))
    }
    val blocked = s.select(col("doc"), col("simhash"),
      explode(array(chunkCols: _*)).as("ck"))
      .select(col("doc"), col("simhash"), col("ck.chunk"), col("ck.key"))
    val x = blocked.as("x"); val y = blocked.as("y")
    x.join(y, col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("i"), col("y.doc").as("j"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
