package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (tokenize,
  * normalize, shingle, fingerprint). All built-ins / higher-order
  * functions — codegen-friendly, no UDFs, fully distributed.
  */
object TextOps {
  /** Whitespace tokenization (testdata uses single-space separators). */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical form for normalized-text dedup: lowercase, trim, collapse
    * runs of whitespace. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Word n-gram shingles over a token array. Documents shorter than n
    * collapse to a single whole-document shingle so every doc has at
    * least one. Native one-pass expression (graft.plans.ShingleArray);
    * the composed transform/slice/concat_ws form pays an interpreted
    * lambda + a slice allocation per shingle and measured ~3× slower
    * on the shingle-heavy operators. */
  def shingles(toks: Column, n: Int): Column =
    graft.plans.SetExprs.shingleArray(toks, n)

  /** 128-bit content fingerprint (hex) of the normalized text; stable
    * across engines (MD5 of UTF-8 bytes). */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Occurrence count of marker tokens in a token array — the scoring
    * primitive for n-gram/stopword language ID. Counts occurrences (not
    * distinct membership) via the native hash-set expression
    * (graft.plans.MarkerCount) — the size(filter(...)) form evaluates
    * an interpreted lambda with a linear IN-list per element. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    graft.plans.SetExprs.markerCount(toks, markers)
}
