package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, PageSource}
import graft.pipeline.Extract
import graft.classify.Classifiers

/** Extraction-pipeline queries over the deterministic fixture corpus —
  * the non-SQL-expressible operators of SURVEY.md §2 (html decode, tokenize,
  * full classifier family on real block sequences, boundary, artifacts).
  * The driver records rows-only checks for these; their real correctness
  * gate is the golden suite (`sbt -batch test`).
  */
object PipelineQueries {

  private val N = 400L // fixture docs per query — small but covers all corpora

  private def docs(spark: SparkSession, cfg: Extract.Config = Extract.Default): DataFrame = {
    val pages = PageSource.pages(spark, N)
    ExtractJob.extract(pages, cfg).toDF()
  }

  /** Full default pipeline: url → extracted text + status + stats. */
  def qExtract(spark: SparkSession, dir: String): DataFrame =
    docs(spark)
      .select(col("url"), col("status"), col("extracted_text"),
        col("stats.nBlocks").as("n_blocks"), col("stats.nKept").as("n_kept"),
        col("stats.charset").as("charset"))
      .orderBy("url")

  /** Charset-detection distribution (formatConvert edge). */
  def qDecodeCharsets(spark: SparkSession, dir: String): DataFrame =
    docs(spark).groupBy(col("stats.charset").as("charset"))
      .agg(count(lit(1)).as("n")).orderBy("charset")

  /** Quarantine routing (guards §2.1). */
  def qQuarantine(spark: SparkSession, dir: String): DataFrame =
    docs(spark).groupBy(col("status")).agg(count(lit(1)).as("n")).orderBy("status")

  /** Tokenizer features: per-doc block counts + signal stats (html → blocks,
    * the pixel-grid analogue).
    */
  def qBlocks(spark: SparkSession, dir: String): DataFrame = {
    val pages = PageSource.pages(spark, 100L)
    import pages.sparkSession.implicits._
    pages.map { p =>
      val dec = graft.html.Decode(p.html)
      val toks = graft.html.HtmlTokenizer(dec.text)
      val sig = Classifiers.signal(toks.blocks)
      (p.url, toks.blocks.length,
        if (sig.isEmpty) 0.0 else sig.max,
        sig.count(_ >= 255.0),
        toks.blocks.count(b => Classifiers.linkDensity(b) > 0.66))
    }.toDF("url", "n_blocks", "max_signal", "n_saturated", "n_linkdense")
      .orderBy("url")
  }

  /** One query per classifier kind — the 16-algorithm family breadth
    * (§2.3) exercised on real block sequences.
    */
  def classifierVariant(kind: String)(spark: SparkSession, dir: String): DataFrame = {
    val cfg = Extract.Config(classifier = Classifiers.Config(kind = kind))
    docs(spark, cfg)
      .select(col("url"), col("stats.nKept").as("n_kept"), col("stats.nBlocks").as("n_blocks"))
      .orderBy("url")
  }

  /** Boundary regions found per doc (autoCrop analogue §2.4). */
  def qBoundary(spark: SparkSession, dir: String): DataFrame = {
    val pages = PageSource.pages(spark, 200L)
    import pages.sparkSession.implicits._
    pages.map { p =>
      val dec = graft.html.Decode(p.html)
      val toks = graft.html.HtmlTokenizer(dec.text)
      val labels = Classifiers.classify(toks.blocks)
      graft.boundary.Boundary.find(toks.blocks, labels) match {
        case Some(r) => (p.url, r.lo, r.hi, true)
        case None => (p.url, -1, -1, false)
      }
    }.toDF("url", "lo", "hi", "found").orderBy("url")
  }

  /** Resume anti-join shape (north-rule checkpoint-resume): pretend the
    * first half is committed, extract only the remainder.
    */
  /** Multimodal binary-column plumbing (graft.ops.Multimodal): synthesize a
    * deterministic PNG container per doc, parse its header back in a typed
    * map — real bytes, real parser, real schema; pixel decode stays a
    * documented stub. Oracle = the closed-form arithmetic of the fixture.
    */
  def qMultimodal(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    import spark.implicits._
    d.as[Long].map { id =>
      val png = graft.ops.Multimodal.fakePng(
        seed = id, width = (64 + id % 64).toInt, height = (32 + id % 32).toInt,
        payloadBytes = (256 + id % 256).toInt)
      val m = graft.ops.Multimodal.parseMeta(png)
      val feat = graft.ops.Multimodal.decodePixelsStub(png)
      (id, m.format, m.width.toLong, m.height.toLong, m.bytes,
        math.round(feat.sum * 10000).toLong)
    }.toDF("doc_id", "format", "width", "height", "bytes", "feat_sum_e4")
      .orderBy("doc_id")
  }

  def qResumeAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = PageSource.pages(spark, N)
    // "committed" snapshot = docs 0..199 (url suffix is the doc id)
    val doneUrls = all.toDF()
      .filter(expr("cast(substring_index(url, '/', -1) as long) < 200"))
      .select(col("url").as("done_url"))
    val remaining = all.toDF()
      .join(doneUrls, all("url") === doneUrls("done_url"), "left_anti")
    ExtractJob.extract(remaining.as[graft.core.PageRow]).toDF()
      .select(col("url"), col("status")).orderBy("url")
  }
}
