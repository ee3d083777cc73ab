package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the bench artifact contract without running a bench.
  *
  * The driver keeps only a 2000-char stdout TAIL of the bench run, so the
  * JSON field ORDER is load-bearing: calibration / total_sec /
  * wall_end_ms must come after the (long) queries dict or they vanish
  * from the round artifact — the rounds 4-6 failure mode this spec
  * prevents from regressing. Numbers must be Locale.ROOT-formatted: a
  * comma decimal separator under e.g. de_DE would corrupt the line.
  */
class BenchFormatSpec extends AnyFunSuite {
  private val line = Bench.renderJson(
    results = Seq("q01" -> 1.23456789, "q02" -> 0.5),
    failed = Seq("q99"),
    reps = 3, sfDir = "/data/sf0.1",
    calPre = 0.31, calPost = 0.42, wallEndMs = 1755120000000L,
    skipped = Seq("q68", "q05"))

  test("emits one parseable JSON object") {
    // no JSON lib on the classpath; structural checks pin the grammar
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(!line.contains("\n"))
    assert(line.count(_ == '{') == line.count(_ == '}'))
    // all doubles 4-decimal with a '.' separator, never a locale comma
    assert("\"q01\":1.2346".r.findFirstIn(line).isDefined, line)
    assert(!line.matches(""".*\d,\d{4}[,}].*"""), s"locale comma in: $line")
  }

  test("truncation-surviving fields come after the queries dict") {
    val order = Seq("\"queries\"", "\"failed\"", "\"skipped\"",
      "\"calibration\"", "\"total_sec\"", "\"wall_end_ms\"").map(line.indexOf)
    assert(order.forall(_ >= 0), line)
    assert(order == order.sorted,
      s"field order must keep calibration/total_sec/wall_end_ms last: $line")
    // the last 200 chars — what a harsh truncation retains — still carry
    // the co-load evidence and the headline total
    val tail = line.takeRight(200)
    assert(tail.contains("\"calibration\"") && tail.contains("\"total_sec\""))
  }

  test("value equals the sum of per-query medians and failed list is verbatim") {
    assert(line.contains("\"value\":1.7346"))
    assert(line.contains("\"total_sec\":1.7346"))
    assert(line.contains("\"failed\":[\"q99\"]"))
    // skipped list is sorted so the artifact is diffable run-to-run
    assert(line.contains("\"skipped\":[\"q05\",\"q68\"]"))
    assert(line.contains("\"reps\":3"))
    assert(line.contains("\"sf\":\"/data/sf0.1\""))
    assert(line.contains("\"wall_end_ms\":1755120000000"))
  }

  test("empty surface still renders a valid line") {
    val empty = Bench.renderJson(Nil, Nil, 1, "/x", 0.1, 0.1, 0L)
    assert(empty.contains("\"queries\":{}") && empty.contains("\"failed\":[]"))
    assert(empty.contains("\"skipped\":[]"))
    assert(empty.contains("\"value\":0.0000"))
  }
}
