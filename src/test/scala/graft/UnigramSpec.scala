package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.plans.TextHash

/** Unigram-LM tokenizer (t37 learn / t38 apply): canonical Viterbi
  * semantics, hard-EM recount/prune/floor invariants, determinism. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def segment(word: String, vocab: Map[String, Long],
                      maxPieceLen: Int = 4): Seq[String] =
    Seq(word).toDF("w")
      .select(TextHash.unigramSegment(col("w"), vocab, maxPieceLen).as("p"))
      .as[Seq[String]].head()

  test("Viterbi picks the max-score segmentation; integer scores make it exact") {
    // "abab": pieces ab(-1), a(-3), b(-3), abab(-2)
    // abab = -2 beats ab|ab = -2? no: ab|ab = -2 equals abab = -2 ->
    // tie broken by fewer tokens: abab (1 token) wins
    val v = Map("a" -> -3L, "b" -> -3L, "ab" -> -1L, "abab" -> -2L)
    assert(segment("abab", v) == Seq("abab"))
    // without the 4-char piece the best is ab|ab (-2) over a|b|a|b (-12)
    assert(segment("abab", v - "abab") == Seq("ab", "ab"))
    // score dominates token count: aa|b (-2-3) beats a|ab? wait:
    // "aab" under {a:-1, aa:-5, ab:-5, b:-1}: a|a|b = -3 beats
    // aa|b = -6 and a|ab = -6 — more tokens but higher score wins
    val v2 = Map("a" -> -1L, "aa" -> -5L, "ab" -> -5L, "b" -> -1L)
    assert(segment("aab", v2) == Seq("a", "a", "b"))
  }

  test("full tie (score and ntok) resolves to the shortest last piece at every cell") {
    // "ab" under {a:-1, b:-1, ab:-2}: a|b = -2 (2 tok) vs ab = -2
    // (1 tok) -> ntok tiebreak picks ab. Force a FULL tie with equal
    // ntok via a 3-char word: "abc" under {a:-1,bc:-1,ab:-1,c:-1}:
    // a|bc = -2 (2 tok) vs ab|c = -2 (2 tok). Cell dp[3] candidates:
    // l=1 (c after ab) and l=2 (bc after a) tie on (score, ntok) ->
    // bp ASC keeps l=1: ab|c.
    val v = Map("a" -> -1L, "b" -> -1L, "c" -> -1L,
      "ab" -> -1L, "bc" -> -1L)
    assert(segment("abc", v) == Seq("ab", "c"))
  }

  test("Viterbi indexes by CODE POINTS: a supplementary-plane char costs one position, matching the oracle's substr/len") {
    // U+1D54F (𝕏) is 2 UTF-16 units but ONE code point; the vocab and
    // the DuckDB oracle measure pieces in code points, so a piece
    // containing it must match and cost 1 of the piece-length budget
    val x = new String(Character.toChars(0x1D54F))
    val v = Map("a" -> -5L, "b" -> -5L, x -> -5L,
      s"a${x}b" -> -1L) // 3 code points — legal at maxPieceLen 3
    assert(segment(s"a${x}b", v, maxPieceLen = 3) == Seq(s"a${x}b"),
      "the 3-code-point piece must match despite being 4 UTF-16 units")
    assert(segment(s"${x}${x}", v, maxPieceLen = 3) == Seq(x, x))
  }

  test("TOTAL segmentation: an out-of-alphabet code point becomes its own unk piece at the floor score, never a crash") {
    // 'z' is outside the alphabet: the SentencePiece-style unk
    // transition covers it as a single-char piece — applying a trained
    // tokenizer to new ingest must never throw on content
    assert(segment("axz", Map("a" -> -1L, "x" -> -1L)) ==
      Seq("a", "x", "z"))
    // the unk floor never outcompetes an in-vocab path: 'x' is in the
    // alphabet, so even a terrible real score beats unk
    assert(segment("ax", Map("a" -> -1L, "x" -> -9999999L)) ==
      Seq("a", "x"))
    // an ALL-unk word (supplementary-plane, the code-point discipline)
    val owl = new String(Character.toChars(0x1F989))
    assert(segment(owl + owl, Map("a" -> -1L)) == Seq(owl, owl))
    // a multi-char vocab piece still wins around an embedded unk char
    assert(segment(s"ab${owl}ab", Map("a" -> -9L, "b" -> -9L, "ab" -> -1L)) ==
      Seq("ab", owl, "ab"))
  }

  test("cross-corpus apply: train on A, apply to B with novel characters — no throw, unk counts pinned") {
    val trainDocs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val vmap = TextAnalysis.unigramVocab(trainDocs, "text",
        vocabSize = 16, rounds = 2, maxPieceLen = 4)
      .as[(String, Long, Long)].collect().map(v => v._1 -> v._3).toMap
    // corpus B: one BMP novel char (§), one supplementary (🦜), and 'c'
    // — also novel to the tiny alpha/beta/gamma alphabet
    val parrot = new String(Character.toChars(0x1F99C))
    val newDocs = Seq(
      (10L, s"alpha a${parrot}b§c"), // 3 novel cps in one word: 🦜 § c
      (11L, s"beta $parrot$parrot"),      // all-unk word: 2 novel cps
      (12L, "gamma alpha")                // no novel content
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramApply(newDocs, "doc_id", "text", vmap)
      .select("doc_id", "n_unk")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 3L, 11L -> 2L, 12L -> 0L), out.toString)
  }

  test("learner invariants: alphabet never pruned and floored at 1; unused multi-char pieces pruned; scores are round(ln(p)*1e6)") {
    // corpus where "zz" dominates: the z-pieces absorb everything and
    // some seeded multi-char candidates go unused after round 1
    val docs = Seq((1L, "zzzz zzzz zzzz zzzz q"), (2L, "zzzz zzzz zzzz"))
      .toDF("doc_id", "text")
    val vocab = TextAnalysis.unigramVocab(docs, "text",
        vocabSize = 8, rounds = 2, maxPieceLen = 4)
      .as[(String, Long, Long)].collect()
    val byPiece = vocab.map(v => v._1 -> v).toMap
    // alphabet present regardless of use ('q' used once, 'z' possibly
    // unused once zzzz wins — floor keeps it alive with cnt >= 1)
    assert(byPiece.contains("z") && byPiece.contains("q"))
    assert(vocab.forall(_._2 >= 1L), "every count floored at >= 1")
    // the dominant word's whole-word piece survives with the top count
    assert(byPiece.contains("zzzz"))
    assert(byPiece("zzzz")._2 == 7L, s"zzzz used by all 7 occurrences: ${byPiece("zzzz")}")
    // every score is the integer-scaled log-prob of cnt/total
    val total = vocab.map(_._2).sum.toDouble
    vocab.foreach { case (p, cnt, score) =>
      val expect = math.round(math.log(cnt / total) * 1e6)
      assert(score == expect, s"$p: $score != $expect")
    }
    // multi-char candidates that the Viterbi never uses are gone:
    // seeds like "zzz" lose to zzzz and must be pruned
    assert(!byPiece.contains("zzz"),
      s"unused multi-char seed must prune: ${vocab.mkString(", ")}")
  }

  test("learn + apply are deterministic and apply counts match per-word segmentation") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    def learn() = TextAnalysis.unigramVocab(docs, "text",
      vocabSize = 16, rounds = 2, maxPieceLen = 4)
    val v1 = learn().as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val v2 = learn().as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(v1 == v2, "the learner must be run-to-run deterministic")
    val vmap = v1.map(v => v._1 -> v._3).toMap
    val applied = TextAnalysis.unigramApply(docs, "doc_id", "text", vmap)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: 3 words, 14 chars; token count = per-word ntoks summed;
    // in-corpus application has zero unk mass by construction
    val ntokOf = Map(
      "alpha" -> segment("alpha", vmap).size,
      "beta" -> segment("beta", vmap).size,
      "gamma" -> segment("gamma", vmap).size)
    assert(applied(1L) == ((1L, 3L, 14L,
      (2 * ntokOf("alpha") + ntokOf("beta")).toLong, 0L)))
    assert(applied(2L) == ((2L, 2L, 9L,
      (ntokOf("beta") + ntokOf("gamma")).toLong, 0L)))
  }

  test("a word longer than the oracle's unrolled DP bound fails the learner loudly") {
    val docs = Seq((1L, "a" * (TextAnalysis.UnigramMaxWordLen + 1)))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.unigramVocab(docs, "text", vocabSize = 8, rounds = 1)
    }
    assert(e.getMessage.contains("unrolled"), e.getMessage)
  }

  test("apply over the trainer's word frame == apply from docs (r19 frame reuse, the t38/p11 path)") {
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "gamma gamma delta"))
      .toDF("doc_id", "text")
    val (words, vocabDf) = TextAnalysis.unigramVocabFrames(docs, "text",
      vocabSize = 12, rounds = 2, maxPieceLen = 3)
    val vocab = vocabDf.select(col("piece"), col("score"))
      .as[(String, Long)].collect().toMap
    val direct = TextAnalysis.unigramApply(docs, "doc_id", "text", vocab,
      maxPieceLen = 3).orderBy("doc_id").collect()
    val framed = TextAnalysis.unigramApplyFrames(docs, "doc_id", "text",
      words, vocab, maxPieceLen = 3).orderBy("doc_id").collect()
    assert(direct.sameElements(framed),
      "frame-based apply must equal the re-derive-from-docs twin row for row")
  }
}
