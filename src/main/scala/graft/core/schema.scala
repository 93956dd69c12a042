package graft.core

import java.sql.Timestamp

/** Core row types of the extraction engine.
  *
  * The unit of work is one web page (one row), mirroring the reference's
  * one-`cv::Mat`-per-call model (/root/reference/src: every public function is
  * `f(const cv::Mat& in, cv::Mat& out, ...)`, e.g. binarizeSauvola.h:44-48).
  * Schema fixed by BASELINE.json `input_hint`.
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One DOM block — the per-row analogue of a pixel row in the reference's
  * image grid (SURVEY.md §1.2). Offsets are Java char offsets into the
  * *decoded* html string.
  */
final case class Block(
    tagPath: String,
    text: String, // canonicalized block text (entity-decoded, ws-collapsed, NFC)
    startOff: Int, // first char of block content in decoded html
    endOff: Int, // one past last char of block content in decoded html
    nChars: Int, // length of canonicalized text
    nTokens: Int, // whitespace-token count of canonicalized text
    nLinkChars: Int, // canonicalized chars contributed from inside <a>
    nLinkTokens: Int, // tokens fully inside <a>
    depth: Int, // element-stack depth at block start
    idx: Int // block index in document order
)

/** Character span into the decoded html (Java char offsets, [start, end)). */
final case class Span(start: Int, end: Int)

/** Per-document extraction stats (the reference's detector outputs +
  * bookkeeping; SURVEY.md §2.7).
  */
final case class DocStats(
    nBlocks: Int,
    nKept: Int,
    htmlBytes: Long,
    decodedChars: Int,
    charset: String,
    truncated: Boolean,
    qualityScore: Double, // §2.7 composite detector score
    garbageRatio: Double, // fraction of replacement/control chars post-decode
    angle: Int = 0 // structural skew: findAngle wrapper-nesting mode (Deskew)
)

/** Pipeline output row (SURVEY.md §1.2 output schema). `status` is OK or a
  * quarantine reason code — per-row failures never throw on a big job
  * (reference throws on empty Mat, binarizeSauvola.cpp:38-41; we route).
  */
final case class ExtractedDoc(
    url: String,
    extracted_text: String,
    spans: Array[Span],
    status: String,
    stats: DocStats
)

object Status {
  val Ok = "OK"
  val EmptyHtml = "QUARANTINE_EMPTY"
  val Garbage = "QUARANTINE_GARBAGE"
  val NoBlocks = "QUARANTINE_NO_BLOCKS"
}

/** Per-partition lineage row checkpointed to the metrics table
  * (BASELINE.json north_rule; FIXTURES.md §4).
  */
final case class LineageRow(
    run_id: String,
    snapshot_id: Long,
    partition_id: Int,
    attempt: Int, // task attempt number — retries/speculation dedupe key
    doc_count: Long,
    html_bytes: Long,
    text_bytes: Long,
    quarantined: Long,
    stage_timings: Map[String, Long], // stage -> nanos
    committed_at: Timestamp
)
