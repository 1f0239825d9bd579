package graft.model

import java.sql.Timestamp

/** Canonical decoded change event (cf. SURVEY.md §1.1; the reference's record
  * abstraction is a fixed-length binary record described by a copybook,
  * /root/reference/mf_spark/parsers/copybook_parser.py:30-83 — ours is a typed
  * case class with a Spark product Encoder).
  *
  * @param op    "I" | "U" | "D" (REDEFINES-style tag byte dispatch, cf.
  *              /root/reference/input/CVEXPORT.cpy EXPORT-REC-TYPE)
  * @param seq   monotone binlog position (global, unique)
  * @param url   page key
  * @param warcTs crawl timestamp — LWW version, ties broken by seq
  * @param html  raw page bytes (null for deletes)
  * @param text  extracted text, byte-identical-per-version invariant target
  * @param lang  ISO-ish code
  * @param schemaVersion feed schema version (2+ carries evolved columns)
  * @param fetch_status / @param content_len — v2 evolved columns, None for v1
  *              records (additive schema evolution, cf.
  *              schema_validator.py:116-128 "missing_in_target"). Typed
  *              Option fields instead of a Map[String,String]: the Catalyst
  *              map encoder allocates two arrays + per-entry UTF8Strings per
  *              row and was the dominant GC source in the decode hot path.
  */
final case class ChangeEvent(
    op: String,
    seq: Long,
    url: String,
    warcTs: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    schemaVersion: Int,
    fetch_status: Option[Int],
    content_len: Option[Long])

object ChangeEvent {
  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"
}

/** Current state of one page in the lake table (v1 schema; evolved columns are
  * handled dynamically as DataFrame columns, not here). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)
