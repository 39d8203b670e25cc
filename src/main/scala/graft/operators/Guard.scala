package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime boundedness guard for the HISTOGRAM-CUMULATIVE device family.
  *
  * The engine's quantile/rank/threshold devices aggregate the corpus
  * into a domain-bounded frame (value histogram, duration life table,
  * day series, source inventory) and run their cumulative windows over
  * THAT — never the corpus. The soundness of the single-partition
  * `Window.orderBy` in those devices rests entirely on the frame being
  * small; SCALE.md documents the contract ("for unbounded/continuous
  * columns, bucket first"). This guard moves the contract from prose
  * into the plan: a frame that exceeds its documented bound fails the
  * JOB with an error naming the device and the fix, instead of silently
  * serializing a corpus through one window task until it OOMs.
  *
  * Shape: the frame is lazily localCheckpoint'd (it is small BY
  * CONTRACT — that is what the guard enforces; a misuse materializes
  * through the spill-backed block store and then fails the assert), a
  * single-row count aggregate runs over the checkpoint, and that row
  * broadcasts back onto the checkpointed rows where a codegen
  * `assert_true` rides them (no UDF). The checkpoint is what keeps the
  * corpus pass SINGLE: without it, the count side's column pruning
  * builds a different aggregation subtree than the window side and
  * ReuseExchange misses — the plan pins caught exactly that re-read.
  * Zero hash exchanges added.
  */
object Guard {

  /** Default row ceiling for a single-partition cumulative frame: 4M
    * (key, count) rows ≈ 100 MB through one window task — an order of
    * magnitude past every bounded domain the engine emits (hex buckets
    * 65536, bp scores 10⁴, duration bins, day series, inventories) and
    * well under task-memory trouble. */
  val MaxFrameRows = 4000000L

  /** Monotonic metric-name allocator for the cap-shed observers
    * ([[graft.operators.Dedup.groupPairs]] and friends): observation
    * names must be unique within one query plan, and one query may
    * instantiate several capped devices (found + truth sides, multiple
    * gram passes). The prefix is stable so monitoring (and the shed
    * specs) can find every shed metric of a run by scanning
    * `queryExecution.observedMetrics` keys for `graft_shed_`. */
  private val shedSeq = new java.util.concurrent.atomic.AtomicLong()
  val ShedMetricPrefix = "graft_shed_"
  def shedMetricName(device: String): String =
    s"$ShedMetricPrefix${device}_${shedSeq.incrementAndGet()}"

  /** `frame`, unchanged, with a loud job-failing assertion that it holds
    * at most `maxRows` rows. `what` names the device in the error. */
  def domainBounded(frame: DataFrame, what: String,
      maxRows: Long = MaxFrameRows): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive: $maxRows")
    val pinned = frame.localCheckpoint(eager = false)
    val n = pinned.agg(count(lit(1)).as("_guardN"))
    pinned.crossJoin(broadcast(n))
      .filter(assert_true(col("_guardN") <= maxRows,
        concat(lit(s"$what: frame exceeds its domain bound ($maxRows rows; got "),
          col("_guardN"),
          lit(") — bucket the domain first (SCALE.md histogram-device contract)")))
        .isNull)
      .drop("_guardN")
  }
}
