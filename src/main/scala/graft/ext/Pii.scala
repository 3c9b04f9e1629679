package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass a training-data pipeline
  * runs before a corpus ships (emails, IPv4 addresses, phone-shaped digit
  * runs masked to typed placeholders).
  *
  * Deliberately regex-only and engine-portable: every pattern uses the
  * common subset of java.util.regex and RE2 (character classes, bounded
  * quantifiers, `\b` word boundaries — no lookaround, no backreferences),
  * so the DuckDB oracle replays the exact match semantics. Counting and
  * replacement are built-in codegen'd functions (`regexp_count`,
  * `regexp_replace`) — a narrow map with no shuffle, which is the whole
  * scale story: PII scrubbing at 100 TB is embarrassingly parallel and
  * must stay inside whole-stage codegen.
  *
  * Redaction order matters and is fixed: emails first (their local parts
  * contain digits and dots that the looser patterns could clip), then
  * IPv4 dotted quads, then phone-shaped runs. Placeholders contain no
  * digits, so later passes cannot re-match inside an earlier mask.
  */
object Pii {

  /** Email: local part + '@' + dotted domain with an alphabetic TLD. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 dotted quad (syntactic — no octet-range check, same as the
    * standard scrubbers; the false-positive cost of `999.0.0.1` is nil
    * next to a missed address).
    */
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Phone-shaped NNN-NNNN run (word-bounded so it never clips a longer
    * identifier).
    */
  val PhonePat = "\\b\\d{3}-\\d{4}\\b"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPat)).cast("long")

  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Pat)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePat)).cast("long")

  /** Masked text: email -> `<EMAIL>`, IPv4 -> `<IP>`, phone -> `<PHONE>`,
    * applied in that order.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"),
        Ipv4Pat, "<IP>"),
      PhonePat, "<PHONE>")
}
