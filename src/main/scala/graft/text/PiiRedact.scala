package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus cleaning — the scrubbing pass
  * every public-web pipeline runs before anything else sees the text
  * (C4/Dolma-style). Pure `regexp_replace` chains over built-in
  * functions: codegen'd, shuffle-free, pushdown-transparent — a 100 TB
  * redaction is exactly one map-only scan-and-rewrite pass.
  *
  * The patterns deliberately use only constructs with IDENTICAL
  * semantics in java.util.regex and RE2 (character classes, bounded
  * quantifiers, alternation-free groups, `\b`, `\d`) — no lookaround,
  * no backrefs — so an external system (or the DuckDB oracle) applying
  * the same pattern strings reproduces the output byte-for-byte.
  *
  * Precision-leaning by design: a redactor that over-matches eats
  * training signal (every "3.14.15.92" in a math text is not an IP);
  * these patterns anchor on word boundaries and fixed shapes. Recall
  * beyond the fixed shapes (names, addresses) is a model problem, not
  * a regex problem, and out of scope.
  */
object PiiRedact {

  /** RFC-5322-lite: local part, @, dotted domain, 2+ letter TLD. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; does not validate octet <= 255 —
    * uniform behavior beats partial redaction of "999.1.1.1").
    */
  val ipv4Pattern: String = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** US SSN shape `ddd-dd-dddd`, word-bounded. */
  val ssnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** NANP-ish phone: optional parenthesized area code, 3-3-4 digits
    * with ` `, `.` or `-` separators. Separators are REQUIRED (a bare
    * 10-digit number is left alone — too many false positives).
    */
  val phonePattern: String = "\\(?\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}\\b"

  /** Ordered (pattern, replacement token) passes. Email first (its
    * local part may contain digits a later pass would mangle), then
    * IP (needs its dots intact), then SSN before the looser phone
    * shape.
    */
  val passes: Seq[(String, String)] = Seq(
    emailPattern -> "<EMAIL>",
    ipv4Pattern -> "<IP>",
    ssnPattern -> "<SSN>",
    phonePattern -> "<PHONE>")

  /** `text` with every PII match replaced by its `<TOKEN>`. */
  def redact(text: Column): Column =
    passes.foldLeft(text) { case (c, (p, tok)) =>
      regexp_replace(c, p, tok)
    }

  /** Card-shaped candidates: 13-19 digits with single space/dash
    * separators — RE2-safe, shared verbatim by the kernel, the counts,
    * and the external oracle.
    */
  val cardPattern: String = "\\d(?:[ -]?\\d){12,18}"

  /** Payment-card redaction with CHECKSUM validation (the precision
    * upgrade shape-only patterns can't give): card-shaped digit runs
    * ([[cardPattern]]) that pass the Luhn check become `<CARD>`;
    * shaped-but-invalid runs (order ids, timestamps — 90% of random
    * digit runs) survive untouched. One codegen'd pass
    * ([[graft.plans.expressions.luhn_redact]]), map-only like
    * [[redact]].
    */
  def redactCards(text: Column): Column =
    graft.plans.expressions.luhn_redact(text)

  /** Per-category match counts (taken BEFORE redaction), for corpus
    * audit dashboards and doc-level filtering (`n_email + n_ip + … >
    * k` → route to quarantine).
    */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(emailPattern)).cast("long"),
    "n_ip" -> regexp_count(text, lit(ipv4Pattern)).cast("long"),
    "n_ssn" -> regexp_count(text, lit(ssnPattern)).cast("long"),
    "n_phone" -> regexp_count(text, lit(phonePattern)).cast("long"))
}
