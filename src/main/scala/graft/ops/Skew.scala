package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling (BASELINE.json north rule: "partitioning /
  * shuffle / skew handled explicitly — salting for skewed hosts").
  *
  * A web corpus's host distribution is Zipf: a handful of hosts hold a
  * large fraction of all pages. Any shuffle keyed on host alone sends a
  * hot host's entire row set to ONE reducer — at 10^12 rows that is the
  * job-killing straggler. The salting pattern splits a hot key into
  * `saltBuckets` deterministic sub-keys for the heavy phase and merges the
  * partials in a second, tiny phase keyed by the original key:
  *
  *   phase 1: groupBy(key, salt)  — rows of one hot key spread over
  *            saltBuckets reducers (salt = hash of a row-unique column,
  *            deterministic, no RNG state)
  *   phase 2: groupBy(key)        — at most saltBuckets rows per key
  *
  * The result is IDENTICAL to the unsalted aggregation (the oracle-checked
  * property); only the shuffle layout changes. For algebraic aggregates
  * Spark's own partial aggregation already does much of this within map
  * tasks — salting matters for the cases partial aggregation cannot
  * bound: per-key DISTINCT counting (partial state is the distinct set
  * itself) and per-key collections.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets) from a row-unique column. */
  def saltCol(rowCol: Column, saltBuckets: Int): Column =
    pmod(xxhash64(rowCol), lit(saltBuckets.toLong)).cast("int")

  /** Salted per-key row count: two-phase, byte-identical to
    * groupBy(key).count(). Returns (key, n_rows).
    */
  def saltedCount(
      df: DataFrame, keyCol: String, rowCol: String,
      saltBuckets: Int = 32): DataFrame = {
    require(saltBuckets >= 1)
    df.withColumn("_salt", saltCol(col(rowCol), saltBuckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("n_rows"))
  }

  /** Salted per-key distinct count — the case partial aggregation cannot
    * bound (the partial state IS the distinct set). Phase 1 dedups
    * (key, value) within salt buckets; because `valueCol` itself drives
    * the salt, equal values land in the SAME bucket, so cross-bucket
    * double counting is impossible and phase 2 can sum plain counts.
    * Returns (key, n_distinct) — identical to countDistinct.
    */
  def saltedDistinctCount(
      df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    require(saltBuckets >= 1)
    df.withColumn("_salt", saltCol(col(valueCol), saltBuckets))
      .select(col(keyCol), col("_salt"), col(valueCol))
      .distinct() // shuffles on (key, salt, value) — spread + deduped
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as("n_distinct"))
  }
}
