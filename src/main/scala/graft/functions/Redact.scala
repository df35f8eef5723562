package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: replace emails, IPv4
  * addresses, and phone-like digit runs with stable placeholder
  * tokens, and count what was redacted (the audit signal every
  * compliance pass wants next to the rewrite).
  *
  * Built entirely from `regexp_replace`/`regexp_count` — codegen'd,
  * no UDF, linear in corpus bytes. The patterns stay inside the
  * regex subset Java's engine and RE2 (DuckDB) interpret
  * identically — no lookbehind, no backreferences — so the DuckDB
  * oracle replays the exact same rewrites with the 'g' flag.
  *
  * Replacement order is fixed (email → IPv4 → phone) and counts are
  * taken on the ORIGINAL text per pattern, so a string matching two
  * patterns counts under both — deterministic, and independent of
  * the rewrite sequence. The phone pattern is deliberately a
  * heuristic (international/spaced/dashed digit runs of 9+ digits);
  * precision tuning belongs to the caller's pattern set, not this
  * operator's mechanics.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d{2,3}([- ]\\d{3,6}){2,3}"

  val EmailToken = "[EMAIL]"
  val Ipv4Token = "[IP]"
  val PhoneToken = "[PHONE]"

  /** The full rewrite: email → IPv4 → phone. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit(EmailToken)),
        lit(Ipv4Re), lit(Ipv4Token)),
      lit(PhoneRe), lit(PhoneToken))

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
}
