package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: find and
  * mask emails, IPv4 addresses, and US-style phone/SSN numbers before
  * text reaches a training corpus.
  *
  * Pure codegen'd column expressions (`regexp_count` /
  * `regexp_replace`) — the scrub pass over 100 TB is one scan, no
  * shuffle, and the patterns push through column pruning untouched.
  *
  * Pattern dialect note: every pattern below restricts itself to
  * constructs with IDENTICAL semantics in Java regex (Spark codegen)
  * and RE2 (the DuckDB oracle): character classes, bounded repetition,
  * alternation — no lookarounds, no backreferences, no \b.
  */
object Pii {

  /** user@host.tld — deliberately permissive local/domain classes (the
    * cost of a false positive is one masked token). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Dotted-quad IPv4 (no octet-range validation — scrubbing, not
    * parsing). */
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** NNN-NNN-NNNN US phone shape. */
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** NNN-NN-NNNN SSN shape. Checked BEFORE phone during redaction
    * (phone's 3-3-4 grouping cannot match an SSN's 3-2-4). */
  val ssnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern)).cast("long")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Pattern)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern)).cast("long")
  def ssnCount(text: Column): Column = regexp_count(text, lit(ssnPattern)).cast("long")

  /** Total PII hits of any kind (emails counted once even though the
    * host part also resembles nothing else; patterns are disjoint by
    * construction except SSN⊂phone-adjacent shapes, which differ in
    * grouping). */
  def piiCount(text: Column): Column =
    emailCount(text) + ipv4Count(text) + phoneCount(text) + ssnCount(text)

  /** Masked text: each PII span replaced by a typed placeholder. Order
    * matters — email first (so a host octet isn't half-eaten by the
    * IPv4 rule), then IPv4, SSN, phone. */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val i = regexp_replace(e, ipv4Pattern, "<IP>")
    val s = regexp_replace(i, ssnPattern, "<SSN>")
    regexp_replace(s, phonePattern, "<PHONE>")
  }
}
