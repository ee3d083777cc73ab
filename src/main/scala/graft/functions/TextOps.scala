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
    * least one. `sequence(0, size-n)` is guarded — sequence() with
    * stop < start would count DOWN, not return empty. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

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
