package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: regex-based redaction of
  * emails, SSNs, phone numbers, and IPv4 addresses, plus per-category match
  * counts for corpus auditing. Pure `Column` expressions (codegen'd
  * `regexp_replace`/`regexp_count`) — one pass fused into the scan, zero
  * shuffles, so redacting a 100 TB corpus costs exactly one read+write.
  *
  * Patterns deliberately stay inside the regex subset with identical
  * semantics across Java regex and RE2-family engines (character classes,
  * bounded repetition, alternation-free), so results are oracle-checkable.
  *
  * COVERAGE LIMITS — heuristic scrubber, NOT a compliance tool. Shapes
  * that pass through unredacted include: undashed 10-digit phones
  * (5551234567), parenthesized area codes ((555) 123-4567),
  * international formats (+44 20 7946 0958), IPv6 addresses, and SSNs
  * without dashes. Treat the output as a benchmark-grade reduction in
  * PII density; a production scrubber needs NER-class models plus
  * locale-specific rule sets layered on this same one-pass plan shape.
  */
object Redaction {

  /** (category, pattern, replacement) applied in this order — email first so
    * its digit runs can't be half-eaten by the phone rule, phone before IP
    * so dot-separated phone numbers aren't truncated into IP matches. */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** Text with every rule applied (fixed order, global replacement). */
  def redactPii(text: Column): Column =
    Rules.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Match count for one category, measured on the text as it looks when
    * that rule runs (i.e. after the preceding rules replaced their hits —
    * identical to how many placeholders the rule inserts). */
  def piiCount(text: Column, category: String): Column = {
    val idx = Rules.indexWhere(_._1 == category)
    require(idx >= 0, s"unknown PII category '$category'")
    val pre = Rules.take(idx).foldLeft(text) { case (c, (_, p, r)) =>
      regexp_replace(c, p, r)
    }
    regexp_count(pre, lit(Rules(idx)._2))
  }
}
