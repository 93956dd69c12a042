package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search over an `array<float>` column.
  *
  * Baseline: brute-force cosine top-k (cross join, codegen'd zip_with dot
  * product — exact, O(Q·N)). Scale path: LSH sign-bucketing / IVF-style
  * coarse quantization so the join key becomes a bucket id and AQE prunes
  * the candidate space; brute force then runs within buckets only.
  */
object Similarity {

  /** Sequential-fold dot product (deterministic accumulation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), _ + _)

  def l2norm(v: Column): Column =
    sqrt(aggregate(v.cast("array<double>"), lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force top-k by dot product (cosine for normalized vecs).
    * `queries`/`corpus`: (id, vec) frames. Rank ties broken by corpus id —
    * fully deterministic output.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "qid", qVec: String = "qv",
      cId: String = "vec_id", cVec: String = "dv"): DataFrame = {
    val scored = queries.join(corpus, col(cId) =!= col(qId))
      .withColumn("score", round(dot(col(qVec), col(cVec)), 6))
    val w = Window.partitionBy(qId).orderBy(desc("score"), asc(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col("rn"), col(cId), col("score"))
  }

  /** Deterministic pseudo-random hyperplane weight for dim i, plane j
    * (no RNG state: pure function of (i, j), same on every executor).
    */
  private def planeWeight(pos: Column, j: Int): Column =
    ((pos * 37 + lit(j * 17)) % 13 - 6).cast("double")

  /** LSH sign bucket id from `nPlanes` fixed hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int = 8): Column = {
    val dv = vec.cast("array<double>")
    val bits = (0 until nPlanes).map { j =>
      val d = aggregate(zip_with(dv, sequence(lit(0), size(dv) - 1),
        (x, i) => x * planeWeight(i, j)), lit(0.0), _ + _)
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate pairs — the embedding-space member of
    * the dedup family: pairs with cosine >= threshold, candidate space
    * limited to matching LSH sign buckets (the 100 TB shape; recall traded
    * via nPlanes exactly as in [[bucketedTopK]]). Cosine is rounded to 6
    * decimals BEFORE thresholding so any engine reproducing the arithmetic
    * lands on the same pair set.
    */
  def cosineNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 2): DataFrame = {
    val b = corpus.withColumn("bucket", lshBucket(col(vecCol), nPlanes))
    val l = b.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("_va"))
    val r = b.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("_vb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("_va"), col("_vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Bucketed ANN: exact search within matching LSH buckets — the 100 TB
    * shape (bucket equi-join instead of cross join; candidate set shrinks
    * ~2^planes-fold; recall traded via nPlanes).
    */
  def bucketedTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 4,
      qId: String = "qid", qVec: String = "qv",
      cId: String = "vec_id", cVec: String = "dv"): DataFrame = {
    val qb = queries.withColumn("bucket", lshBucket(col(qVec), nPlanes))
    val cb = corpus.withColumn("bucket", lshBucket(col(cVec), nPlanes))
    val scored = qb.join(cb, Seq("bucket")).filter(col(cId) =!= col(qId))
      .withColumn("score", round(dot(col(qVec), col(cVec)), 6))
    val w = Window.partitionBy(qId).orderBy(desc("score"), asc(cId))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(qId), col("rn"), col(cId), col("score"))
  }
}
