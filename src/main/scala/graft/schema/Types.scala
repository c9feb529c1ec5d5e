package graft.schema

import java.sql.Timestamp

/** Input row — the transcript table from BASELINE.json `input_hint`:
  * (conv_id string, turn_idx int32, role string, text string, tool string,
  * ts timestamp). The analog of the reference's page record
  * (tesseract_engine.py:136-142): conv=document, turn=page.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Extracted field span (FIXTURES.md §2; templates.py:69-97 position). */
final case class Span(
    name: String,
    value: String,
    confidence: Double,
    start: Int,
    end: Int,
    raw: String)

/** Per-turn extraction output (FIXTURES.md §2). `success=false` rows carry
  * the reference's error-row semantics (ocr/base.py:134-183): bad input
  * yields a row, not an exception.
  */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    text_clean: String,
    doc_type: String,
    template: Option[String],
    spans: Seq[Span],
    patterns: Map[String, Seq[String]],
    conf_delta: Double,
    original_length: Int,
    processed_length: Int,
    words_corrected: Int,
    patterns_detected: Int,
    success: Boolean,
    error_message: Option[String])
