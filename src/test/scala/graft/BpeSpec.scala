package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** BPE merge learning (t30's operator): reference counting (all
  * adjacent occurrences, frequency-weighted), deterministic argmax
  * tiebreak, greedy non-overlapping left-to-right re-segmentation,
  * and the dry-out short-circuit. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merges(texts: String*): Seq[(Long, String, String, String, Long)] =
    TextAnalysis.bpeMerges(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "text", rounds = 6)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("pair counts weight by word frequency; ties break on (x, y); dry-out stops early") {
    // words: aa x2, ab, aaa, b
    // r1: (a,a) = 2(from "aa"x2) + 2(two overlapping in "aaa") = 4 > (a,b) = 1
    // r2: (a,b) and (aa,a) tie at 1 -> "a" < "aa" wins
    // r3: (aa,a) is the only pair left; r4+: none -> 3 rows, not 6
    assert(merges("aa aa ab", "aaa b") == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 1L),
      (3L, "aa", "a", "aaa", 1L)))
  }

  test("greedy non-overlapping merge inside a run; merged symbols pair in later rounds") {
    // "aaaa": r1 (a,a) counted at all 3 overlapping positions, merge
    // applies greedily -> [aa, aa]; r2 merges (aa, aa) -> [aaaa]
    assert(merges("aaaa") == Seq(
      (1L, "a", "a", "aa", 3L),
      (2L, "aa", "aa", "aaaa", 1L)))
  }

  private def byteMerges(texts: String*): Seq[(Long, String, String, String, Long)] =
    TextAnalysis.byteBpeMerges(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "text", rounds = 6)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("byte BPE: UTF-8 bytes are the symbols — a multi-byte char merges from its own bytes; regex pre-tokens split punctuation runs") {
    // "ééé" = 0xC3A9 ×3: r1 merges (c3, a9) at all 3 positions →
    // [c3a9 ×3], r2 (c3a9, c3a9) → greedy leaves [c3a9c3a9, c3a9],
    // r3 merges those. Proves the alphabet is BYTES, not chars.
    assert(byteMerges("ééé") == Seq(
      (1L, "c3", "a9", "c3a9", 3L),
      (2L, "c3a9", "c3a9", "c3a9c3a9", 2L),
      (3L, "c3a9c3a9", "c3a9", "c3a9c3a9c3a9", 1L)))
    // pre-tokenization: "ab, ab," splits into [ab][,][ab][,] — the
    // punctuation run is its own pre-token, so (a,b) counts twice
    // (0x61 0x62) and ',' (0x2c, single byte) never pairs with a
    val m = byteMerges("ab, ab,")
    assert(m.head == ((1L, "61", "62", "6162", 2L)), m.toString)
    assert(!m.exists(r => r._2.contains("2c") || r._3.contains("2c")),
      s"',' is a separate pre-token and single-byte — never merged: $m")
  }

  test("byte BPE apply is total over novel content: merges learned on A apply to B with unseen multi-byte chars, byte counts exact") {
    import org.apache.spark.sql.functions._
    val trainDocs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val rules = TextAnalysis.byteBpeMerges(trainDocs, "text", rounds = 3)
      .orderBy("round").select("x", "y")
      .as[(String, String)].collect().toSeq
    // corpus B: emoji (4 UTF-8 bytes), é (2 bytes) — all unseen; no
    // throw, unseen bytes stay single-byte symbols
    val owl = new String(Character.toChars(0x1F989))
    val out = TextAnalysis.byteBpeApply(
        Seq((9L, s"abab ${owl}é")).toDF("doc_id", "text"),
        "doc_id", "text", rules)
      .as[(Long, Long, Long, Long)].collect().head
    // pre-tokens: [abab, 🦉é]; bytes: 4 + (4 + 2) = 10; tokens:
    // abab folds to 1 under the learned rules, 🦉é stays 6 single
    // bytes (nothing learned about them)
    assert(out == ((9L, 2L, 10L, 7L)), out.toString)
  }
}
