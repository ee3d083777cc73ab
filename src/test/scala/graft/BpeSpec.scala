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
}
