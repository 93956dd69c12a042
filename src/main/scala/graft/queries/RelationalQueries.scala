package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Oracle-checkable operator-demonstration queries (SURVEY.md §2 inventory).
  *
  * Each query expresses one transplanted reference operator as a relational
  * query over the driver's testdata tables (`documents` standing in for the
  * block sequence: PARTITION BY source ORDER BY doc_id is the in-document
  * block order; `n_chars` is the signal). The paired DuckDB SQL in
  * [[oracles]] is the independent ground truth for the driver's
  * CORRECTNESS gate.
  *
  * Determinism rules (hash-compare survives engine differences):
  *  - every float output rounded (4 dp; dot products 3 dp);
  *  - thresholds compared AFTER rounding so keep-flags agree;
  *  - every query globally ordered by a unique key;
  *  - sums restricted to integers (exact in double) where totals matter.
  */
object RelationalQueries {

  // r6: one `spark.read.parquet(path)` costs ~80 ms WARM — schema inference
  // re-reads the footer on every call, and every query pays it 1-2×.
  // Memoize the INFERRED SCHEMA per (session, path) and hand it back via
  // `.schema(...)`, which skips inference entirely. This caches metadata
  // only — every action still scans the parquet data; the schema is read
  // from the same file on first touch per JVM, so results cannot drift.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  private[queries] def tbl(spark: SparkSession, path: String): DataFrame = {
    val sch = schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(sch).parquet(path)
  }
  private def docs(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, s"$dir/embeddings.parquet")

  // ---------------------------------------------------------------------
  // Final deterministic ORDER BY, minus the range exchange (r6, guide §2.4:
  // "an orderBy used only to make output deterministic" is a removable
  // shuffle). Every query here ends in a global sort on a UNIQUE key purely
  // so the oracle hash-compare is order-stable; `orderBy` plans that as a
  // RangePartitioning exchange whose bounds come from a SAMPLING pass over
  // the child RDD — when the child is a narrow scan/generate chain (not a
  // materialized shuffle stage) the whole chain executes TWICE per action
  // (measured: q_extract ran fixture-gen + extraction once for sampling and
  // once for the shuffle, ~2× CPU). The output is tiny (bounded by the SF
  // table), so the global sort is a single-task job:
  //  - `orderedFused` (plan already ends in an agg/window exchange): fuse
  //    the tiny post-shuffle stage into ONE task via coalesce(1) and sort
  //    there — removes BOTH the range exchange and the sampling job.
  //  - `orderedExchanged` (narrow chain from scan/generator): one
  //    single-partition exchange (numPartitions=1 ⇒ no sampling) keeps the
  //    upstream compute parallel, then sorts in the single reduce task.
  // Rows and global order are IDENTICAL to orderBy (keys are unique).
  // ---------------------------------------------------------------------
  private[queries] implicit final class OrderedOps(private val df: DataFrame) {
    /** Plan already ends in an agg/window exchange: fuse the tiny
      * post-shuffle stage to ONE task and sort there.
      */
    def orderedFused(keys: String*): DataFrame =
      df.coalesce(1).sortWithinPartitions(keys.map(col): _*)
    /** Narrow scan/generator chain: one single-partition exchange
      * (no sampling) keeps upstream compute parallel; sort in the single
      * reduce task.
      */
    def orderedExchanged(keys: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(keys.map(col): _*)
  }

  // shared window: the "block sequence" ±5 (integral-image scaffold §2.2)
  private val seqW = Window.partitionBy("source").orderBy("doc_id")
  private val winW = seqW.rowsBetween(-5, 5)
  private val srcW = Window.partitionBy("source")

  // r6: ONE select instead of two withColumns — every DataFrame
  // transformation runs the analyzer eagerly over the whole accumulated
  // plan, and chain-building measured 120-150 ms per window query (PlanCost
  // probe); identical logical result (CollapseProject produces the same
  // optimized plan either way).
  private def withStats(d: DataFrame): DataFrame =
    d.select(col("*"),
      avg($c("n_chars")).over(winW).as("m"),
      coalesce(stddev_pop($c("n_chars")).over(winW), lit(0.0)).as("s"))
  private def $c(n: String) = col(n)

  // ---------------------------------------------------------- §2.2 windows

  def qWindowStats(spark: SparkSession, dir: String): DataFrame =
    withStats(docs(spark, dir))
      .select($c("doc_id"), round($c("m"), 4).as("wmean"), round($c("s"), 4).as("wstd"))
      .orderedFused("doc_id")

  // ------------------------------------------------- §2.3 classifier family

  def qSauvola(spark: SparkSession, dir: String): DataFrame = {
    val thr = round($c("m") * (lit(1.0) + lit(0.2) * ($c("s") / lit(128.0) - lit(1.0))), 4)
    withStats(docs(spark, dir))
      .select($c("doc_id"), thr.as("thr"),
        when($c("n_chars") > thr, 1).otherwise(0).as("keep"))
      .orderedFused("doc_id")
  }

  def qNiblack(spark: SparkSession, dir: String): DataFrame = {
    val thr = round($c("m") + lit(0.2) * $c("s"), 4)
    withStats(docs(spark, dir))
      .select($c("doc_id"), thr.as("thr"),
        when($c("n_chars") > thr, 1).otherwise(0).as("keep"))
      .orderedFused("doc_id")
  }

  def qNick(spark: SparkSession, dir: String): DataFrame = {
    val thr = round($c("m") - lit(0.1) * sqrt($c("m") * $c("m") + $c("s") * $c("s")), 4)
    withStats(docs(spark, dir))
      .select($c("doc_id"), thr.as("thr"),
        when($c("n_chars") > thr, 1).otherwise(0).as("keep"))
      .orderedFused("doc_id")
  }

  def qWolfJolion(spark: SparkSession, dir: String): DataFrame = {
    val smax = greatest(max($c("s")).over(srcW), lit(1e-9))
    val mn = min($c("n_chars")).over(srcW)
    withStats(docs(spark, dir))
      .select($c("doc_id"),
        round($c("m") + lit(0.5) * ($c("s") / smax - lit(1.0)) * ($c("m") - mn), 4).as("thr"))
      .orderedFused("doc_id")
  }

  def qFeng(spark: SparkSession, dir: String): DataFrame = {
    val d = withStats(docs(spark, dir))
      .withColumn("rs", greatest(max($c("s")).over(srcW), lit(1e-9)))
      .withColumn("mn", min($c("n_chars")).over(srcW))
      .withColumn("sr", $c("s") / $c("rs"))
      .withColumn("a2", lit(0.2) * pow($c("sr"), 2.0))
      .withColumn("a3", lit(0.03) * pow($c("sr"), 2.0))
    d.withColumn("thr",
      round(lit(0.25) * $c("m") + $c("a2") * $c("sr") * ($c("m") - $c("mn")) + $c("a3") * $c("mn"), 4))
      .select($c("doc_id"), $c("thr"))
      .orderedFused("doc_id")
  }

  def qMeanAdaptive(spark: SparkSession, dir: String): DataFrame = {
    val thr = round($c("m") - lit(10.0), 4)
    withStats(docs(spark, dir))
      .select($c("doc_id"), thr.as("thr"),
        when($c("n_chars") > thr, 1).otherwise(0).as("keep"))
      .orderedFused("doc_id")
  }

  def qGaussAdaptive(spark: SparkSession, dir: String): DataFrame = {
    // 5-tap gaussian [.0545,.2442,.4026,.2442,.0545], border-replicate
    val d = docs(spark, dir)
      .withColumn("l1", coalesce(lag($c("n_chars"), 1).over(seqW), $c("n_chars")))
      .withColumn("l2", coalesce(lag($c("n_chars"), 2).over(seqW), $c("n_chars")))
      .withColumn("r1", coalesce(lead($c("n_chars"), 1).over(seqW), $c("n_chars")))
      .withColumn("r2", coalesce(lead($c("n_chars"), 2).over(seqW), $c("n_chars")))
    d.withColumn("gm",
      lit(0.0545) * ($c("l2") + $c("r2")) + lit(0.2442) * ($c("l1") + $c("r1")) + lit(0.4026) * $c("n_chars"))
      .withColumn("thr", round($c("gm") - lit(10.0), 4))
      .select($c("doc_id"), $c("thr"))
      .orderedFused("doc_id")
  }

  def qMedianMean(spark: SparkSession, dir: String): DataFrame = {
    // median-of-3 signal smoothing (binarizeAT medianBlur), then MEAN_C
    val d = docs(spark, dir)
      .withColumn("a", coalesce(lag($c("n_chars"), 1).over(seqW), $c("n_chars")))
      .withColumn("c2", coalesce(lead($c("n_chars"), 1).over(seqW), $c("n_chars")))
      .withColumn("med3", greatest(least($c("a"), $c("n_chars")),
        least(greatest($c("a"), $c("n_chars")), $c("c2"))))
    d.withColumn("mm", avg($c("med3")).over(winW))
      .withColumn("thr", round($c("mm") - lit(10.0), 4))
      .select($c("doc_id"), $c("med3"), $c("thr"))
      .orderedFused("doc_id")
  }

  def qMokji(spark: SparkSession, dir: String): DataFrame = {
    // per-source global threshold from (neighbor-max, value) co-occurrence
    val d = docs(spark, dir)
      .withColumn("mx", greatest(
        coalesce(lag($c("n_chars"), 1).over(seqW), $c("n_chars")),
        $c("n_chars"),
        coalesce(lead($c("n_chars"), 1).over(seqW), $c("n_chars"))))
    d.groupBy($c("source"))
      .agg(
        sum(when($c("mx") - $c("n_chars") >= 20, $c("mx") + $c("n_chars")).otherwise(0)).as("num"),
        (sum(when($c("mx") - $c("n_chars") >= 20, 2).otherwise(0))).as("den"))
      .select($c("source"), round(coalesce(
        $c("num") / when($c("den") === 0, lit(null)).otherwise($c("den")), lit(-1.0)), 4).as("thr"))
      .orderedFused("source")
  }

  def qOtsu(spark: SparkSession, dir: String): DataFrame = {
    // per-source Otsu over a 32-bin histogram (binarizeLocalOtsu per-region
    // THRESH_OTSU, here region = source group)
    val d = docs(spark, dir)
      .select(col("*"),
        min($c("n_chars")).over(srcW).as("mn"),
        max($c("n_chars")).over(srcW).as("mx"))
      .withColumn("bin", least(
        floor(($c("n_chars") - $c("mn")) * lit(32.0) / greatest($c("mx") - $c("mn"), lit(1))).cast("int"),
        lit(31)))
    val h = d.groupBy($c("source"), $c("bin")).agg(count(lit(1)).as("c"))
      .select(col("*"),
        sum($c("c")).over(srcW).as("tot"),
        sum($c("bin") * $c("c")).over(srcW).as("sumAll"))
    val binW = Window.partitionBy("source").orderBy("bin")
    val cum = h
      .select(col("*"),
        sum($c("c")).over(binW.rowsBetween(Window.unboundedPreceding, 0)).as("wB"),
        sum($c("bin") * $c("c")).over(binW.rowsBetween(Window.unboundedPreceding, 0)).as("sumB"))
      .filter($c("wB") > 0 && $c("wB") < $c("tot"))
      .withColumn("diff",
        $c("sumB") * lit(1.0) / $c("wB") -
          ($c("sumAll") - $c("sumB")) * lit(1.0) / ($c("tot") - $c("wB")))
      // association pinned to (wB*(tot-wB)) * (diff*diff) — must match oracle
      .withColumn("between", ($c("wB") * ($c("tot") - $c("wB"))) * ($c("diff") * $c("diff")))
    val pick = Window.partitionBy("source").orderBy(desc("between"), asc("bin"))
    cum.withColumn("rn", row_number().over(pick))
      .filter($c("rn") === 1)
      .select($c("source"), $c("bin").as("otsu_bin"))
      .orderedFused("source")
  }

  // --------------------------------------------- §2.3 post-pass / smoothing

  def qMedianSmooth(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("lab", when($c("n_chars") > 300, 1).otherwise(0))
      .withColumn("a", coalesce(lag($c("lab"), 1).over(seqW), $c("lab")))
      .withColumn("c2", coalesce(lead($c("lab"), 1).over(seqW), $c("lab")))
    d.withColumn("sm", greatest(least($c("a"), $c("lab")),
      least(greatest($c("a"), $c("lab")), $c("c2"))))
      .select($c("doc_id"), $c("lab"), $c("sm"))
      .orderedFused("doc_id")
  }

  def qDilateErode(spark: SparkSession, dir: String): DataFrame = {
    val w1 = seqW.rowsBetween(-1, 1)
    docs(spark, dir)
      .withColumn("lab", when($c("n_chars") > 300, 1).otherwise(0))
      .withColumn("dil", max($c("lab")).over(w1))
      .withColumn("ero", min($c("lab")).over(w1))
      .select($c("doc_id"), $c("lab"), $c("dil"), $c("ero"))
      .orderedFused("doc_id")
  }

  // ------------------------------------------------------ §2.5 artifacts

  def qRemoveMargins(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("rn", row_number().over(seqW))
      .withColumn("cnt", count(lit(1)).over(srcW))
      .withColumn("dropped",
        when((($c("rn") <= $c("cnt") * 0.1) || ($c("rn") > $c("cnt") - $c("cnt") * 0.1)) &&
          $c("n_chars") < 150, 1).otherwise(0))
      .select($c("doc_id"), $c("dropped"))
      .orderedFused("doc_id")

  def qRemoveRepeats(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("bucket", floor($c("n_chars") / lit(50.0)))
      .withColumn("chg",
        when(lag($c("bucket"), 1).over(seqW).isNull ||
          $c("bucket") =!= lag($c("bucket"), 1).over(seqW), 1).otherwise(0))
      .withColumn("run_id", sum($c("chg")).over(seqW.rowsBetween(Window.unboundedPreceding, 0)))
    d.withColumn("runlen", count(lit(1)).over(Window.partitionBy("source", "run_id")))
      .withColumn("kept", when($c("runlen") < 3, 1).otherwise(0))
      .select($c("doc_id"), $c("kept"))
      .orderedFused("doc_id")
  }

  def qTinyIsolated(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("small", when($c("n_chars") < 150, 1).otherwise(0))
      .withColumn("ln", coalesce(lag($c("small"), 1).over(seqW), lit(0)))
      .withColumn("rn2", coalesce(lead($c("small"), 1).over(seqW), lit(0)))
      .withColumn("dropped",
        when($c("small") === 1 && $c("ln") === 0 && $c("rn2") === 0, 1).otherwise(0))
      .select($c("doc_id"), $c("dropped"))
      .orderedFused("doc_id")

  // ----------------------------------------------------- §2.1 photometric

  def qGammaLut(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($c("doc_id"),
        round(pow($c("n_chars") / lit(600.0), 2.2) * lit(255.0), 4).as("gamma_out"))
      .orderedExchanged("doc_id")

  def qWhiteBalance(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("p05", expr("percentile(n_chars, 0.05)").over(srcW))
      .withColumn("p95", expr("percentile(n_chars, 0.95)").over(srcW))
    d.withColumn("clipped", least(greatest($c("n_chars").cast("double"), $c("p05")), $c("p95")))
      .select($c("doc_id"),
        round(($c("clipped") - $c("p05")) / ($c("p95") - $c("p05")), 4).as("wb"))
      .orderedFused("doc_id")
  }

  /** colorBalance (balanceColor.cpp:35-91; VERDICT r2 §2.1 partial row):
    * per-channel gamma on the B and R channels — B brightened by pow(1/γ),
    * R darkened by pow(γ), G untouched (:58-65) — then a saturation gamma
    * in HSV space (:71-88). Channels here are the document's three density
    * fields normalized per source: B = tokens, G = chars, R = distinct
    * tokens. γ = 2 so the gammas are sqrt/square and the saturation factor
    * pow(s,2)/s collapses to s — every op (sqrt, *, /, -) is a single
    * correctly-rounded IEEE operation, bit-identical across engines. The
    * HSV round-trip is exact for fixed hue/value: scaling S by f scales
    * (V - c) by f for every channel, so c' = v - (v - c)·s.
    */
  def qColorBalance(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("toks", size(split($c("text"), " ")).cast("double"))
      .withColumn("dtoks", size(array_distinct(split($c("text"), " "))).cast("double"))
      .withColumn("b", $c("toks") / max($c("toks")).over(srcW))
      .withColumn("g", $c("n_chars").cast("double") / max($c("n_chars")).over(srcW))
      .withColumn("r", $c("dtoks") / max($c("dtoks")).over(srcW))
      .withColumn("bb", sqrt($c("b")))
      .withColumn("rb", $c("r") * $c("r"))
      .withColumn("v", greatest($c("bb"), $c("g"), $c("rb")))
      .withColumn("mn", least($c("bb"), $c("g"), $c("rb")))
      .withColumn("s", when($c("v") > 0, ($c("v") - $c("mn")) / $c("v")).otherwise(lit(0.0)))
    d.select($c("doc_id"),
      round($c("v") - ($c("v") - $c("bb")) * $c("s"), 4).as("b_bal"),
      round($c("v") - ($c("v") - $c("g")) * $c("s"), 4).as("g_bal"),
      round($c("v") - ($c("v") - $c("rb")) * $c("s"), 4).as("r_bal"))
      .orderedFused("doc_id")
  }

  /** Salted distinct count (graft.ops.Skew — the north rule's "salting for
    * skewed hosts"): two-phase (source, salt, text) spread + merge, output
    * IDENTICAL to count(DISTINCT text) — which is exactly what the DuckDB
    * oracle computes, proving the salted plan changes the shuffle layout
    * and nothing else.
    */
  def qSaltedDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedDistinctCount(docs(spark, dir), "source", "text", saltBuckets = 8)
      .orderedFused("source")

  def qGrayWorld(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("rms", sqrt(avg($c("n_chars") * $c("n_chars")).over(srcW)))
    d.select($c("doc_id"), round($c("n_chars") / $c("rms"), 4).as("gw"))
      .orderedFused("doc_id")
  }

  def qScaleRange(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("mn", min($c("n_chars")).over(srcW))
      .withColumn("mx", max($c("n_chars")).over(srcW))
      .select($c("doc_id"),
        round(($c("n_chars") - $c("mn")) / greatest($c("mx") - $c("mn"), lit(1)).cast("double"), 4).as("scaled"))
      .orderedFused("doc_id")

  def qEqualizeHist(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("pr", percent_rank().over(
        Window.partitionBy("source").orderBy($c("n_chars"), $c("doc_id"))))
      .select($c("doc_id"), round($c("pr"), 4).as("rank_norm"))
      .orderedFused("doc_id")

  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("bucket", floor($c("n_chars") / lit(50.0)).cast("int"))
      .groupBy($c("source"), $c("bucket"))
      .agg(count(lit(1)).as("c"))
      .orderedFused("source", "bucket")

  // -------------------------------------------------- §2.1/§2.6 text canon

  def qCanon(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("canon", trim(regexp_replace($c("text"), "[ \\t\\n\\r]+", " ")))
      .select($c("doc_id"),
        size(split($c("canon"), " ")).as("n_tokens"),
        substring($c("canon"), 1, 60).as("head"))
      .orderedExchanged("doc_id")

  // ----------------------------------------------------- §2.7 detectors

  def qQualityScores(spark: SparkSession, dir: String): DataFrame = {
    // fused one-pass native counters (graft.functions.TextQualityCounts)
    // instead of three regexp_replace full passes per document
    graft.functions.GraftFunctions.register(spark)
    docs(spark, dir)
      .withColumn("_qc", expr("graft_quality_counts(text)"))
      .withColumn("len", element_at($c("_qc"), 1).cast("double"))
      .select($c("doc_id"),
        round(element_at($c("_qc"), 3) / $c("len"), 4).as("punct_ratio"),
        round(element_at($c("_qc"), 4) / $c("len"), 4).as("digit_ratio"),
        round(element_at($c("_qc"), 6) / $c("len"), 4).as("ws_ratio"))
      .orderedExchanged("doc_id")
  }

  def qLangGate(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy($c("lang")).agg(count(lit(1)).as("n")).orderedFused("lang")

  // ------------------------------------------------ §2.9 joins / agg / topk

  def qGoldenJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = tbl(spark, s"$dir/orders.parquet")
    val c = tbl(spark, s"$dir/customer.parquet")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($c("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"), min($c("o_orderkey")).as("min_ok"), max($c("o_orderkey")).as("max_ok"))
      .orderedFused("seg")
  }

  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = tbl(spark, s"$dir/orders.parquet")
    val c = tbl(spark, s"$dir/customer.parquet")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($c("c_custkey")).orderedExchanged("c_custkey")
  }

  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = tbl(spark, s"$dir/orders.parquet")
    val c = tbl(spark, s"$dir/customer.parquet")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy($c("c_mktsegment").as("seg")).agg(count(lit(1)).as("n"))
      .orderedFused("seg")
  }

  def qLineageAgg(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy($c("source"))
      .agg(count(lit(1)).as("doc_count"), sum($c("n_chars")).as("chars"),
        min($c("doc_id")).as("mn"), max($c("doc_id")).as("mx"))
      .orderedFused("source")

  def qTopK(spark: SparkSession, dir: String): DataFrame = {
    val pick = Window.partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))
    docs(spark, dir)
      .withColumn("rn", row_number().over(pick))
      .filter($c("rn") <= 3)
      .select($c("source"), $c("rn"), $c("doc_id"), $c("n_chars"))
      .orderedFused("source", "rn")
  }

  def qDistinctSources(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy($c("lang"))
      .agg(countDistinct($c("source")).as("n_sources"))
      .orderedFused("lang")

  // --------------------------------------------- training-pipeline: dedup

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select($c("doc_id"), md5($c("text").cast("binary")).as("h"))
      .groupBy($c("h"))
      .agg(count(lit(1)).as("c"), min($c("doc_id")).as("keeper"))
      .orderedFused("h")

  def qMinHash(spark: SparkSession, dir: String): DataFrame = {
    // r6 note: a per-row array_min(transform(md5…)) rewrite (removing the
    // explode + groupBy) was tried and MEASURED SLOWER (+30% CPU): Spark
    // higher-order-function lambdas evaluate interpreted, while explode +
    // min() partial aggregation runs whole-stage-codegen'd and map-side —
    // the exchange carries only 4 digests/doc. Kept the codegen shape; only
    // the final ORDER BY is restructured (orderedFused), and the whole
    // explode + 4-way min() aggregation runs as ONE native codegen pass
    // (graft.functions.MinHash4): min over the token multiset == min over
    // the distinct set, digest/scratch buffers are thread-local, and only
    // the four final minima are hex-encoded. Semantically identical —
    // R6QueryEquivSpec pins it against the explode+groupBy formulation
    // (incl. empty/duplicate/multi-space token corners) and the DuckDB
    // oracle replays the aggregation form. The isNotNull filter mirrors
    // explode's null-array row-drop; the scan shape becomes a pure narrow
    // map with no exchange at all (the 100 TB signature shape —
    // Dedup.minhashSignature's plan, now at native speed).
    //
    // Also tried and REJECTED by measurement (r6): repartitioning after the
    // single-row-group scan to parallelize the md5 work (guide §2.5) —
    // round-robin inflated summed task CPU 6-8x for no wall gain;
    // hash-by-key doubled wall via the extra exchange.
    graft.functions.GraftFunctions.register(spark)
    docs(spark, dir)
      .filter($c("text").isNotNull)
      .select($c("doc_id"), call_function("graft_minhash4", $c("text")).as("_mh"))
      .select($c("doc_id"),
        element_at($c("_mh"), 1).as("m0"), element_at($c("_mh"), 2).as("m1"),
        element_at($c("_mh"), 3).as("m2"), element_at($c("_mh"), 4).as("m3"))
      .withColumn("band", concat(substring($c("m0"), 1, 4), substring($c("m1"), 1, 4)))
      .orderedExchanged("doc_id")
  }

  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // r6: the self-join partner (same source, doc_id+1) is — when it exists
    // — necessarily the IMMEDIATE successor in (source, doc_id) order, since
    // doc_id is unique within a source. So the equi-join (which shuffled the
    // token arrays on BOTH sides and sort-merged them) collapses to one
    // lead() window over a single hash exchange + a filter. Row set and
    // values are identical (R6EquivSpec proves it query-for-query).
    val d = docs(spark, dir)
      .select($c("doc_id"), $c("source"), array_distinct(split($c("text"), " ")).as("toks"))
      .withColumn("doc_id2", lead($c("doc_id"), 1).over(seqW))
      .withColumn("toks2", lead($c("toks"), 1).over(seqW))
      .filter($c("doc_id2") === $c("doc_id") + 1)
    d.withColumn("i", size(array_intersect($c("toks"), $c("toks2"))).cast("double"))
      .withColumn("u", (size($c("toks")) + size($c("toks2"))).cast("double") - $c("i"))
      .select($c("doc_id"), round($c("i") / $c("u"), 4).as("jaccard"))
      .orderedFused("doc_id")
  }

  // ------------------------------------- training-pipeline: similarity/ANN

  def qEmbedNorm(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .withColumn("dv", $c("embedding").cast("array<double>"))
      .select($c("vec_id"),
        round(sqrt(aggregate($c("dv"), lit(0.0), (acc, v) => acc + v * v)), 3).as("l2"))
      .orderedExchanged("vec_id")

  def qAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val e = emb(spark, dir).withColumn("dv", $c("embedding").cast("array<double>"))
      .select($c("vec_id"), $c("dv"))
    val q = e.filter($c("vec_id") % 50 === 0)
      .select($c("vec_id").as("qid"), $c("dv").as("qv"))
    val scored = q.join(e, e("vec_id") =!= q("qid"))
      .withColumn("dot", round(call_function("graft_dot", $c("qv"), $c("dv")), 3))
    val pick = Window.partitionBy("qid").orderBy(desc("dot"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(pick))
      .filter($c("rn") <= 3)
      .select($c("qid"), $c("rn"), $c("vec_id"), $c("dot"))
      .orderedFused("qid", "rn")
  }

  def qLshBucket(spark: SparkSession, dir: String): DataFrame = {
    // 2 fixed pseudo-random hyperplanes: w(i,j) = ((i*37 + j*17) % 13) - 6.
    // ZERO-SHUFFLE: per-row zip_with/aggregate dot products (the library's
    // Similarity.lshBucket plan shape) — the earlier posexplode+groupBy
    // variant shuffled N×dim rows to compute the same per-row value
    // (VERDICT r1 "what's wrong" #5); the oracle query must demonstrate the
    // plan a 100 TB run would use.
    // r6: the plane dot runs as the native codegen expression
    // (graft.functions.LshPlaneDot) — identical left fold to the HOF
    // zip_with/aggregate form it replaces (pinned by R6QueryEquivSpec);
    // interpreted lambda evaluation was the whole cost of this query's
    // single compute job.
    graft.functions.GraftFunctions.register(spark)
    val e = emb(spark, dir).withColumn("dv", $c("embedding").cast("array<double>"))
    def planeDot(off: Int) =
      round(call_function("graft_lsh_dot", $c("dv"), lit(off)), 3)
    e.select($c("vec_id"), planeDot(0).as("d0"), planeDot(17).as("d1"))
      .select($c("vec_id"),
        (when($c("d0") > 0, 2).otherwise(0) + when($c("d1") > 0, 1).otherwise(0)).as("bucket"))
      .orderedExchanged("vec_id")
  }

  /** FULL 1-D anisotropic Kuwahara (kuwaharaFilter.cpp:34-125,174-234 via
    * graft.classify.Kuwahara, r4) replayed relationally at half=4: 3-tap
    * replicate smooth → gradient coherence A → hEff = max(2, ⌊4/(1+A)⌋) →
    * four integer-Epanechnikov-weighted sectors (two sides × two scales) →
    * min-variance sector's weighted mean. Every intermediate sum is an
    * integer (the float-parity recipe), so the DuckDB oracle is
    * bit-identical. Emits hEff (the measured anisotropy shrink) and the
    * smoothed level.
    */
  def qKuwaharaAniso(spark: SparkSession, dir: String): DataFrame = {
    // Epanechnikov radial weights w(len, d) = len^2 + 1 - d^2
    def wgt(len: Int, dd: Int): Int = len * len + 1 - dd * dd
    var d = docs(spark, dir)
    for (k <- 1 to 4)
      d = d.withColumn(s"l$k", lag($c("n_chars"), k).over(seqW))
        .withColumn(s"r$k", lead($c("n_chars"), k).over(seqW))
    d = d.withColumn("s3",
      coalesce($c("l1"), $c("n_chars")) + $c("n_chars") + coalesce($c("r1"), $c("n_chars")))
    d = d.withColumn("g",
      coalesce(lead($c("s3"), 1).over(seqW), $c("s3")) -
        coalesce(lag($c("s3"), 1).over(seqW), $c("s3")))
    val w4 = seqW.rowsBetween(-4, 4)
    d = d.withColumn("gs", sum($c("g")).over(w4))
      .withColumn("ga", sum(abs($c("g"))).over(w4))
      .withColumn("a",
        when($c("ga") > 0, abs($c("gs")).cast("double") / $c("ga")).otherwise(lit(0.0)))
      .withColumn("heff",
        greatest(lit(2), floor(lit(4.0) / (lit(1.0) + $c("a"))).cast("int")))
      .withColumn("hnear", when($c("heff") >= 4, lit(2)).otherwise(lit(1)))
    // per-side, per-length integer sector sums (missing neighbors skipped)
    def nb(side: String, k: Int) = $c(s"$side$k")
    for (side <- Seq("l", "r"); len <- 1 to 4) {
      def term(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        (1 to len).map(k =>
          when(nb(side, k).isNull, lit(0L)).otherwise(f(nb(side, k)).cast("long") * wgt(len, k)))
          .reduce(_ + _)
      d = d
        .withColumn(s"ws_$side$len",
          lit(wgt(len, 0).toLong) + term(c => lit(1)).cast("long"))
        .withColumn(s"wx_$side$len",
          $c("n_chars").cast("long") * wgt(len, 0) + term(c => c))
        .withColumn(s"wq_$side$len",
          $c("n_chars").cast("long") * $c("n_chars") * wgt(len, 0) + term(c => c * c))
    }
    def pickLen(side: String, pre: String, lenCol: org.apache.spark.sql.Column) =
      when(lenCol === 4, $c(s"${pre}_$side" + "4"))
        .when(lenCol === 3, $c(s"${pre}_$side" + "3"))
        .when(lenCol === 2, $c(s"${pre}_$side" + "2"))
        .otherwise($c(s"${pre}_$side" + "1"))
    // sector stats in reference scan order: farL, nearL, nearR, farR
    val sectors = Seq(
      ("fl", "l", $c("heff")), ("nl", "l", $c("hnear")),
      ("nr", "r", $c("hnear")), ("fr", "r", $c("heff")))
    for ((tag, side, lenCol) <- sectors) {
      val ws = pickLen(side, "ws", lenCol)
      val wx = pickLen(side, "wx", lenCol)
      val wq = pickLen(side, "wq", lenCol)
      d = d.withColumn(s"m_$tag", wx.cast("double") / ws)
        .withColumn(s"v_$tag",
          wq.cast("double") / ws - ($c(s"m_$tag") * $c(s"m_$tag")))
    }
    d = d.withColumn("kwa",
      when($c("v_fl") <= $c("v_nl") && $c("v_fl") <= $c("v_nr") && $c("v_fl") <= $c("v_fr"), $c("m_fl"))
        .when($c("v_nl") <= $c("v_nr") && $c("v_nl") <= $c("v_fr"), $c("m_nl"))
        .when($c("v_nr") <= $c("v_fr"), $c("m_nr"))
        .otherwise($c("m_fr")))
    d.select($c("doc_id"), $c("heff"), round($c("kwa"), 4).as("kwa"))
      .orderedFused("doc_id")
  }

  /** Two-sector Kuwahara baseline (kuwaharaFilter.cpp:138-172 reduced to
    * left/right halves — the r3 simplification, kept as `kuwahara2`): mean
    * of the lower-variance sector — edge-preserving.
    */
  def qKuwahara(spark: SparkSession, dir: String): DataFrame = {
    val lw = seqW.rowsBetween(-4, 0)
    val rw = seqW.rowsBetween(0, 4)
    docs(spark, dir)
      .withColumn("lm", avg($c("n_chars")).over(lw))
      .withColumn("ls", coalesce(stddev_pop($c("n_chars")).over(lw), lit(0.0)))
      .withColumn("rm", avg($c("n_chars")).over(rw))
      .withColumn("rs", coalesce(stddev_pop($c("n_chars")).over(rw), lit(0.0)))
      .select($c("doc_id"),
        round(when($c("ls") <= $c("rs"), $c("lm")).otherwise($c("rm")), 4).as("kw"))
      .orderedFused("doc_id")
  }

  /** basicDeblur unsharp mask (basicDeblur.cpp:33-70): x + λ(x - wmean). */
  def qSharpen(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("m", avg($c("n_chars")).over(winW))
      .select($c("doc_id"),
        round($c("n_chars") + lit(0.5) * ($c("n_chars") - $c("m")), 4).as("sharp"))
      .orderedFused("doc_id")

  /** MatToLocalVarianceMap (imageLibCommon.cpp:397-466): local variance map. */
  def qVarianceMap(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("v", coalesce(var_pop($c("n_chars")).over(winW), lit(0.0)))
      .select($c("doc_id"), round(greatest($c("v"), lit(0.01)), 4).as("varmap"))
      .orderedFused("doc_id")

  /** Guo-Hall-profile skeleton normalization (thinGuoHall.cpp:56-108). */
  def qSkeleton(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("skel", trim(regexp_replace(
        regexp_replace(lower($c("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .select($c("doc_id"), length($c("skel")).as("skel_len"),
        substring($c("skel"), 1, 40).as("skel_head"))
      .orderedExchanged("doc_id")

  /** SimHash (16-bit) over word md5s — near-dup fingerprinting. */
  def qSimHash(spark: SparkSession, dir: String): DataFrame = {
    val words = docs(spark, dir)
      .select($c("doc_id"), explode(array_distinct(split($c("text"), " "))).as("w"))
      .withColumn("h", conv(substring(md5($c("w").cast("binary")), 1, 4), 16, 10).cast("int"))
    val bits = (0 until 16).map { b =>
      sum(shiftright($c("h"), b).bitwiseAND(lit(1)) * 2 - 1).as(s"s$b")
    }
    val agg = words.groupBy($c("doc_id")).agg(bits.head, bits.tail: _*)
    val sim = (0 until 16).map { b =>
      when($c(s"s$b") > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    agg.select($c("doc_id"), sim.as("simhash")).orderedFused("doc_id")
  }

  /** Rolling polynomial fingerprint of the first 40 chars
    * (document fingerprinting; exact integer math in both engines).
    */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("chars",
        filter(split(substring($c("text"), 1, 40), ""), c => c =!= ""))
      .select($c("doc_id"),
        aggregate($c("chars"), lit(7L),
          (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L).as("fp"))
      .orderedExchanged("doc_id")

  /** Cross-document template chrome (cleanBackgroundToWhite.cpp:40-65
    * analogue, graft.ops.TemplateChrome): units recurring in >= 80% of a
    * source's documents. Units here are tokens (the documents table is
    * single-line); for extraction output the same op runs on text lines.
    */
  def qTemplateChrome(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TemplateChrome.recurringUnits(
      docs(spark, dir).withColumn("units", split($c("text"), " ")),
      "source", "doc_id", "units", minDocs = 2, minFrac = 0.8)
      .select($c("source"), $c("unit"), $c("n_docs").cast("long").as("n_docs"))
      .orderedFused("source", "unit")

  /** Strip pass of the same operator: per-doc token counts before/after
    * chrome removal (zero-shuffle HOF filter against the broadcast set).
    */
  def qTemplateStrip(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TemplateChrome.strip(
      docs(spark, dir).withColumn("units", split($c("text"), " ")),
      "source", "doc_id", "units")
      .select($c("doc_id"),
        size($c("units")).cast("long").as("n_before"),
        size($c("units_clean")).cast("long").as("n_after"))
      .orderedExchanged("doc_id")

  /** Sessionization over the events stream (gaps-and-islands, 30-min gap) —
    * the batch twin of a session window.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy($c("ts"), $c("event_id"))
    val e = tbl(spark, s"$dir/events.parquet")
      .withColumn("prev", lag(unix_timestamp($c("ts")), 1).over(uw))
      .withColumn("newsess",
        when($c("prev").isNull || unix_timestamp($c("ts")) - $c("prev") > 1800, 1).otherwise(0))
    e.withColumn("sess", sum($c("newsess")).over(uw.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($c("user_id"))
      .agg(max($c("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderedFused("user_id")
  }

  /** Canonicalization via the NATIVE Catalyst expression (codegen'd,
    * graft.functions.CanonicalizeText) — same oracle as the SQL-regex canon
    * because documents text is ASCII.
    */
  def qCanonExpr(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs(spark, dir).createOrReplaceTempView("graft_docs_tmp")
    spark.sql(
      """SELECT doc_id,
        |  size(split(graft_canon(text), ' ')) AS n_tokens,
        |  substring(graft_canon(text), 1, 60) AS head
        |FROM graft_docs_tmp""".stripMargin)
      .orderedExchanged("doc_id")
  }

  /** findAngle's mode computation demonstrated relationally (deskew.cpp:
    * 139-206 via graft.detect.Deskew): per source, "lines" are rows long
    * enough to be structure evidence (n_chars·8 >= source max — the
    * HoughLinesP minLineLength = width/8 gate), the delta clustering
    * becomes 64-wide buckets, and the mode wins with the reference's
    * first-encountered tie-break (earliest doc_id, then bucket).
    */
  def qAngle(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .withColumn("mx", max($c("n_chars")).over(srcW))
      .filter($c("n_chars") * 8 >= $c("mx"))
      .withColumn("bucket", floor($c("n_chars") / lit(64.0)).cast("int"))
    val w = Window.partitionBy("source")
      .orderBy(desc("c"), asc("first_id"), asc("bucket"))
    d.groupBy($c("source"), $c("bucket"))
      .agg(count(lit(1)).as("c"), min($c("doc_id")).as("first_id"))
      .withColumn("rn", row_number().over(w))
      .filter($c("rn") === 1)
      .select($c("source"), $c("bucket").as("angle_bucket"), $c("c").as("n_lines"))
      .orderedFused("source")
  }

  /** rotate's 90° exact path demonstrated relationally (rotate.cpp:38-57
    * via graft.boundary.Rotate): each source's row sequence is a row-major
    * grid with 4 columns; the output position is the column-major
    * (transposed) reading order — new_pos = c·R0 + min(c, rem) + r for
    * 0-based rn with c = rn%4, r = rn/4, R0 = cnt/4, rem = cnt%4 (the
    * closed form of Rotate.permutation(n, 90, 4), pinned by RotateSpec).
    */
  def qRotate(spark: SparkSession, dir: String): DataFrame = {
    val rnW = Window.partitionBy("source").orderBy("doc_id")
    docs(spark, dir)
      .withColumn("rn0", row_number().over(rnW) - 1)
      .withColumn("cnt", count(lit(1)).over(srcW))
      .withColumn("c", $c("rn0") % 4)
      .withColumn("r", (($c("rn0") - $c("c")) / 4).cast("int"))
      .withColumn("r0", (($c("cnt") - $c("cnt") % 4) / 4).cast("int"))
      .withColumn("new_pos",
        ($c("c") * $c("r0") + least($c("c"), $c("cnt") % 4) + $c("r")).cast("int"))
      .select($c("source"), $c("doc_id"), $c("new_pos"))
      .orderedFused("source", "new_pos")
  }

  /** Language-ID by char-trigram profile over the frozen 25-language table
    * (graft.ops.TextStats.langId, native one-pass LangIdExpr).
    */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    docs(spark, dir)
      .select($c("doc_id"), graft.ops.TextStats.langId($c("text")).as("lang_pred"))
      .orderedExchanged("doc_id")
  }

  /** Exact dedup via the library API (graft.ops.Dedup.exact). */
  def qDedupApi(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.exact(docs(spark, dir), "doc_id", "text")
      .select($c("doc_id"), when($c("is_canonical"), 1).otherwise(0).as("canonical"))
      .orderedExchanged("doc_id")

  /** MinHash-LSH candidate pairs (graft.ops.Dedup.lshCandidates). */
  def qLshPairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.lshCandidates(docs(spark, dir).withColumnRenamed("doc_id", "id"),
      "id", "text", bands = 4, rowsPerBand = 2)
      // r6 NOTE: deliberately NOT orderedFused — the candidate-pair output
      // grows superlinearly with the corpus (9.3M rows at sf0.1), so the
      // single-task fused sort would serialize a real sort. The orderBy's
      // sampling child here is the materialized distinct exchange (no
      // narrow-chain double-execution), so the parallel range sort is the
      // right plan at every scale.
      .orderBy("id_a", "id_b")

  /** IVF-Flat-style ANN (graft.ops.Similarity.ivfTopK): deterministic
    * anchor codebook, HOF cell assignment, probe-cell equi-join.
    */
  def qIvfTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select($c("vec_id"), $c("embedding").cast("array<double>").as("dv"))
    val q = e.filter($c("vec_id") % 50 === 0)
      .select($c("vec_id").as("qid"), $c("dv").as("qv"))
    graft.ops.Similarity.ivfTopK(q, e, k = 3, anchorEvery = 37, nProbe = 2)
      .orderedFused("qid", "rn")
  }

  /** Embedding-cosine near-dup pairs (graft.ops.Similarity.cosineNearDupPairs)
    * — the embedding member of the dedup family, LSH-bucketed.
    */
  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.cosineNearDupPairs(
      emb(spark, dir).select($c("vec_id"), $c("embedding").cast("array<double>").as("dv")),
      "vec_id", "dv", threshold = 0.35, nPlanes = 2)
      .orderedExchanged("id_a", "id_b")

  /** Bucketed ANN via the library API (LSH sign buckets, exact within
    * bucket) — the 100 TB similarity-search shape.
    */
  def qAnnBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select($c("vec_id"), $c("embedding").cast("array<double>").as("dv"))
    val q = e.filter($c("vec_id") % 50 === 0)
      .select($c("vec_id").as("qid"), $c("dv").as("qv"))
    // r6: broadcast the probe side (tiny by construction — the 2% query
    // sample) so neither side shuffles for the bucket join (guide §3.1).
    // A corpus-side repartition off the single-row-group scan was tried
    // (guide §2.5) and rejected by measurement: at 5k vectors the extra
    // exchange cost more than the 270 ms serial bucket+score task it
    // parallelized, and round-robin inflated summed task CPU ~10x.
    graft.ops.Similarity.bucketedTopK(broadcast(q), e, k = 3, nPlanes = 2)
      .orderedFused("qid", "rn")
  }

  // ------------------------------------------------ events (time windows)

  def qEventWindows(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, s"$dir/events.parquet")
      .withColumn("hour_bucket", floor(unix_timestamp($c("ts")) / 3600).cast("long"))
      .groupBy($c("event_type"), $c("hour_bucket"))
      .agg(count(lit(1)).as("n"), round(sum($c("value")), 2).as("sum_value"))
      .orderedFused("event_type", "hour_bucket")
}
