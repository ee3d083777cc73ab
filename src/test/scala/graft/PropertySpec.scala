package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Exact, TextOps, VectorOps}
import graft.operators.{AsOfJoin, Relational, TextAnalysis}

/** Property-based checks (plain scalacheck) of the determinism and
  * algebra the engine's oracle parity depends on: randomized inputs,
  * invariants that must hold for every partitioning and distribution. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(name: String, prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"$name: $res")
  }

  test("dsumM equals the BigDecimal reference sum regardless of partitioning") {
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.chooseNum(-99999.99, 99999.99)
        .map(v => math.rint(v * 100) / 100))
      parts <- Gen.chooseNum(1, 8)
    } yield (xs.take(60), parts)
    check("dsumM", Prop.forAll(gen) { case (xs, parts) =>
      val expect = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val got = xs.toDF("v").repartition(parts)
        .agg(Exact.dsumM(col("v"))).as[Double].head()
      got == expect
    })
  }

  test("bloomPruneJoin equals the plain join on random fact/dim key sets") {
    val gen = for {
      factKeys <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
      dimKeys <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
    } yield (factKeys.take(80), dimKeys.distinct.take(30))
    check("bloomPruneJoin", Prop.forAll(gen) { case (fk, dk) =>
      val fact = fk.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("fk", "row_id")
      val dim = dk.map(k => (k, s"d$k")).toDF("dk", "attr")
      val got = Relational.bloomPruneJoin(fact, dim, "fk", "dk",
          expectedDimKeys = dk.size.toLong.max(1L))
        .select("row_id", "attr").as[(Long, String)].collect().sorted.toSeq
      val plain = fact.join(dim, col("fk") === col("dk"))
        .select("row_id", "attr").as[(Long, String)].collect().sorted.toSeq
      got == plain
    }, n = 10)
  }

  test("shingle count is max(1, n - 2) and every shingle has <= 3 words") {
    val gen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "ddd")))
    check("shingles", Prop.forAll(gen) { toks =>
      val got = Seq(Tuple1(toks.mkString(" "))).toDF("t")
        .select(TextOps.shingles(TextOps.tokens(col("t")), 3))
        .as[Seq[String]].head()
      got.size == math.max(1, toks.size - 2) &&
        got.forall(_.split(" ").length <= 3)
    })
  }

  test("stratifiedSample is a subset, monotone in rate, and repartition-stable") {
    val df = spark.range(0, 400).select(col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("lang"))
    def ids(rate: Double, parts: Int) =
      TextAnalysis.stratifiedSample(df.repartition(parts), "doc_id", "lang",
        Map.empty, defaultRate = rate).select("doc_id").as[Long].collect().toSet
    val r25 = ids(0.25, 3)
    val r50 = ids(0.5, 5)
    val all = ids(1.0, 2)
    assert(r25.subsetOf(r50) && r50.subsetOf(all), "rate monotonicity")
    assert(all.size == 400)
    assert(ids(0.5, 1) == r50, "partitioning independence")
    // rates are 1/256-granular; uniform hashes land near the target
    assert(math.abs(r50.size - 200) < 60, s"rate 0.5 kept ${r50.size}/400")
    // regression: round(0.999*256)=256 once formatted as 3-char "100",
    // which sorts below most hex pairs and silently kept ~6%
    assert(ids(0.999, 1).size >= 380, "rates just below 1.0 must keep ~all")
  }

  test("native as-of join equals a naive per-row scan on random data") {
    val gen = for {
      trades <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0L, 50L)))
      quotes <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0L, 50L)))
    } yield (trades, quotes.distinctBy { case (k, ts) => (k, ts) })
    check("asof", Prop.forAll(gen) { case (trades, quotes) =>
      // quotes are unique per (key, ts): the as-of match is well-defined
      val t = trades.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("trade_id", "k", "ts")
      val qv = quotes.zipWithIndex.map { case ((k, ts), i) => (i.toLong * 7, k, ts) }
        .toDF("qid", "k", "ts")
      val got = AsOfJoin.asOfNative(t, qv, Seq("k"), "ts", "ts",
          Map("qid" -> "qid"))
        .select("trade_id", "qid").as[(Long, Option[Long])].collect().toMap
      val naive = trades.zipWithIndex.map { case ((k, ts), i) =>
        val c = quotes.zipWithIndex
          .filter { case ((qk, qts), _) => qk == k && qts <= ts }
        i.toLong -> (if (c.isEmpty) None
          else Some(c.maxBy { case ((_, qts), _) => qts }._2.toLong * 7))
      }.toMap
      got == naive
    }, n = 10)
  }

  test("native interval join equals a naive per-row scan on random data") {
    val gen = for {
      events <- Gen.listOfN(30, Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0L, 60L)))
      ivals <- Gen.listOfN(15, for {
        k <- Gen.chooseNum(1, 3)
        s <- Gen.chooseNum(0L, 60L)
        len <- Gen.chooseNum(0L, 30L)  // zero-length and nested intervals
      } yield (k, s, s + len))
    } yield (events, ivals)
    check("interval", Prop.forAll(gen) { case (events, ivals) =>
      val e = events.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
        .toDF("event_id", "k", "ts")
      val iv = ivals.zipWithIndex.map { case ((k, s, en), i) => (i.toLong, k, s, en) }
        .toDF("iid", "k", "s", "e")
      val got = Relational.rangeJoinNative(e, iv, Seq("k"), "ts", "s", "e",
          Map("iid" -> "iid"))
        .select("event_id", "iid").as[(Long, Long)].collect().toList.sorted
      val naive = (for {
        ((k, ts), i) <- events.zipWithIndex
        ((ik, s, en), j) <- ivals.zipWithIndex
        if ik == k && s <= ts && ts < en
      } yield (i.toLong, j.toLong)).sorted
      got == naive
    }, n = 10)
  }

  test("sessionize assigns gap-split ids that match a sequential scan") {
    val gen = for {
      events <- Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0L, 4000L)))
      gap <- Gen.chooseNum(1L, 900L)
    } yield (events.take(40).distinctBy(identity), gap)
    check("sessionize", Prop.forAll(gen) { case (events, gap) =>
      val df = events.zipWithIndex.map { case ((k, sec), i) =>
        (i.toLong, k, new java.sql.Timestamp(sec * 1000L)) }
        .toDF("event_id", "k", "ts")
      val got = Relational.sessionize(df, Seq("k"), "ts",
          Seq(col("event_id")), gap)
        .select("event_id", "session_id").as[(Long, Long)].collect().toMap
      // sequential reference: per key, sorted by (sec, event_id),
      // increment on first row or gap > threshold
      val naive = events.zipWithIndex
        .map { case ((k, sec), i) => (k, sec, i.toLong) }
        .groupBy(_._1).values.flatMap { grp =>
          val sorted = grp.sortBy(r => (r._2, r._3))
          var sid = 0L
          var prev = Option.empty[Long]
          sorted.map { case (_, sec, id) =>
            if (prev.isEmpty || sec - prev.get > gap) sid += 1
            prev = Some(sec)
            id -> sid
          }
        }.toMap
      got == naive
    }, n = 10)
  }

  test("gapFill equals a sequential densify-and-ffill scan on random series") {
    val gen = for {
      events <- Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0L, 3000L), Gen.chooseNum(1, 50)))
      step <- Gen.oneOf(60L, 300L)
    } yield (events.take(40), step)
    check("gapFill", Prop.forAll(gen) { case (events, step) =>
      val df = events.zipWithIndex.map { case ((k, sec, v), i) =>
        (k, new java.sql.Timestamp(sec * 1000L), v.toDouble) }
        .toDF("k", "ts", "value")
      val got = Relational.gapFill(df, Seq("k"), "ts",
          round(avg(col("value")), 6), step)
        .select(col("k"), unix_timestamp(col("bucket")).as("b"),
          col("value"), col("observed"))
        .as[(Int, Long, Double, Boolean)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      // sequential reference: per key, bucket means on the step grid,
      // dense range lo..hi, carry last mean forward
      val naive = events.groupBy(_._1).flatMap { case (k, rs) =>
        val byBucket = rs.groupBy(r => r._2 / step * step).map { case (b, g) =>
          b -> BigDecimal(g.map(_._3).sum.toDouble / g.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val lo = byBucket.keys.min; val hi = byBucket.keys.max
        var lastV = 0.0
        (lo to hi by step).map { b =>
          val obs = byBucket.contains(b)
          if (obs) lastV = byBucket(b)
          (k, b) -> ((lastV, obs))
        }
      }.toMap
      got == naive
    }, n = 10)
  }

  test("compact keeps exactly the change-log rows of a sequential scan, nulls included") {
    // random per-key event streams with timestamp TIES (broken by
    // event_id) and NULL values: prev-null vs null must compact away
    // (null-safe equality), a first row must always survive
    val gen = for {
      events <- Gen.nonEmptyListOf(Gen.zip(
        Gen.chooseNum(1, 3),                        // key
        Gen.chooseNum(0L, 5L),                      // ts second (ties!)
        Gen.option(Gen.chooseNum(0, 2))))           // value incl. None
      parts <- Gen.chooseNum(1, 6)
    } yield (events.take(40), parts)
    check("compact", Prop.forAll(gen) { case (events, parts) =>
      val rows = events.zipWithIndex.map { case ((k, sec, v), i) =>
        (i.toLong, k, new java.sql.Timestamp(sec * 1000L),
          v.map(x => Double.box(x.toDouble)).orNull: java.lang.Double)
      }
      val df = rows.toDF("event_id", "k", "ts", "value").repartition(parts)
      val got = Relational.compact(df, Seq(col("k")),
          Seq(col("ts"), col("event_id")), col("value"))
        .select("event_id").as[Long].collect().toSet
      // sequential reference: per key sorted by (ts, event_id), keep a
      // row iff it's first or its value differs under null-safe equality
      val naive = rows.groupBy(_._2).values.flatMap { grp =>
        val sorted = grp.sortBy(r => (r._3.getTime, r._1))
        var prev = Option.empty[Option[Double]]
        sorted.flatMap { case (id, _, _, v) =>
          val cur = Option(v).map(_.doubleValue)
          val keep = !prev.contains(cur)
          prev = Some(cur)
          if (keep) Some(id) else None
        }
      }.toSet
      got == naive
    }, n = 12)
  }

  test("dot and norm match plain scala arithmetic") {
    // 1/16-granular components: products and sums are exact in binary,
    // so argument order cannot matter and equality is legitimate
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-64, 64).map(_ / 16.0))
    check("dot/norm", Prop.forAll(vecGen, vecGen) { (a, b) =>
      val row = Seq((a, b)).toDF("a", "b")
        .select(VectorOps.dot(col("a"), col("b")).as("d"),
          VectorOps.norm(col("a")).as("n"))
        .as[(Double, Double)].head()
      row._1 == a.zip(b).map { case (x, y) => x * y }.sum &&
        row._2 == math.sqrt(a.map(x => x * x).sum)
    })
  }

  test("firstAgreeIndex and agreeCount match naive references for any group size") {
    // small value domain so agreements actually occur
    val gen = for {
      groups <- Gen.chooseNum(1, 6)
      k <- Gen.chooseNum(1, 4)
      a <- Gen.listOfN(groups * k, Gen.chooseNum(0L, 3L))
      b <- Gen.listOfN(groups * k, Gen.chooseNum(0L, 3L))
    } yield (a, b, k)
    check("firstAgree/agreeCount", Prop.forAll(gen) { case (a, b, k) =>
      val expectFirst = (0 until a.size / k)
        .find(g => (g * k until (g + 1) * k).forall(i => a(i) == b(i)))
        .getOrElse(-1)
      val expectCount = a.zip(b).count { case (x, y) => x == y }
      val row = Seq((a, b)).toDF("a", "b")
        .select(graft.plans.VectorExprs.firstAgreeIndex(col("a"), col("b"), k).as("f"),
          graft.plans.VectorExprs.agreeCount(col("a"), col("b")).as("c"))
        .as[(Int, Int)].head()
      row == ((expectFirst, expectCount))
    })
  }

  test("weightedMix replicates floor-or-ceil per row, densely indexed, repartition-stable") {
    val gen = for {
      wTenths <- Gen.chooseNum(0, 35)
      parts <- Gen.chooseNum(1, 8)
    } yield (wTenths / 10.0, parts)
    val df = spark.range(0, 300).select(col("id").as("doc_id"), lit("a").as("s"))
    check("weightedMix", Prop.forAll(gen) { case (w, parts) =>
      val out = TextAnalysis.weightedMix(df.repartition(parts), "doc_id", "s",
          Map("a" -> w), defaultWeight = 1.0)
        .select("doc_id", "copy").as[(Long, Long)].collect()
      val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      val copiesOk = perDoc.values.forall(cs =>
        cs == (0L until cs.size).toSeq &&
          (cs.size == math.floor(w).toLong || cs.size == math.ceil(w).toLong))
      // fraction of docs getting the extra copy tracks frac(w) (1/256 grid ± slack)
      val extra = perDoc.values.count(_.size == math.floor(w).toLong + 1)
      val fracOk = w == math.floor(w) ||
        math.abs(extra.toDouble / 300 - (w - math.floor(w))) < 0.15
      val again = TextAnalysis.weightedMix(df.repartition(3), "doc_id", "s",
          Map("a" -> w), defaultWeight = 1.0)
        .select("doc_id", "copy").as[(Long, Long)].collect()
      copiesOk && fracOk && out.sorted.toSeq == again.sorted.toSeq
    }, n = 8)
  }

  test("banded pair generation emits each colliding pair exactly once") {
    // random near-dup corpus: pairs from the one-shuffle first-agree path
    // must equal the set of pairs sharing >= 1 band in the signatures
    val docGen = Gen.listOfN(14, Gen.chooseNum(0, 2).map {
      case 0 => "alpha beta gamma delta epsilon zeta eta theta"
      case 1 => "alpha beta gamma delta epsilon zeta eta iota"
      case _ => "one two three four five six seven eight"
    })
    check("bandedPairs", Prop.forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pairs = graft.operators.Dedup
        .minhashCandidatePairs(docs, "doc_id", "text", numHashes = 8, bands = 4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
      val sigs = graft.operators.Dedup
        .signatures(docs, "doc_id", "text", numHashes = 8)
        .as[(Long, Seq[Long])].collect().toMap
      val expect = (for {
        x <- sigs.keys; y <- sigs.keys if x < y
        if (0 until 4).exists(bnd =>
          sigs(x).slice(bnd * 2, bnd * 2 + 2) == sigs(y).slice(bnd * 2, bnd * 2 + 2))
      } yield (x, y)).toSet
      pairs.size == pairs.toSet.size && pairs.toSet == expect
    }, n = 8)
  }

  /** A structurally valid RIFF/AVI + LIST/hdrl/avih header followed by
    * a top-level chunk whose declared u32 size is Int.MaxValue-8: the
    * shape that made videoChunks' Int cursor wrap negative and throw
    * (see Avi.videoChunks' remaining-buffer guard). */
  private lazy val hostileAvi: Array[Byte] = {
    def le(n: Long) = Array[Byte]((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    def s(x: String) = x.getBytes("US-ASCII")
    val avih = new Array[Byte](56)
    Array(le(2L), le(4L), le(2L)).zip(Seq(16, 32, 36)).foreach {
      case (v, off) => System.arraycopy(v, 0, avih, off, 4) // frames/w/h
    }
    s("RIFF") ++ le(0xffffL) ++ s("AVI ") ++
      s("LIST") ++ le(4L + 8L + 56L) ++ s("hdrl") ++
      s("avih") ++ le(56L) ++ avih ++
      s("JUNK") ++ le(Int.MaxValue.toLong - 8) // no body: lies about size
  }

  test("Avi.videoChunks rejects a top-level chunk size that overflows the cursor") {
    assert(graft.operators.Multimodal.Avi.videoChunks(hostileAvi).isEmpty)
    // header metadata is still honestly parseable
    assert(graft.operators.Multimodal.Avi.info(hostileAvi)
      .contains(graft.operators.Multimodal.Avi.Info(4, 2, 2)))
  }

  test("JvmCodec.decode is total on arbitrary bytes: never throws, falls back deterministically") {
    // the mixed/corrupt-corpus claim: one total function per partition.
    // Random payloads — including ones starting with real magic bytes
    // (RIFF/Y4M prefixes grafted onto junk) — must produce a row, and
    // an undecodable payload must produce exactly the FakeCodec row.
    val magic = Gen.oneOf(
      Array.emptyByteArray,
      "RIFF".getBytes("US-ASCII"),
      "RIFF    AVI ".getBytes("US-ASCII"),
      "YUV4MPEG2 ".getBytes("US-ASCII"),
      "YUV4MPEG2 W4 H2 C420\n".getBytes("US-ASCII"),
      hostileAvi, // valid hdrl + u32-overflow top-level chunk size
      Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII"), // MP4
      Array(0xFF.toByte, 0xD8.toByte)) // JPEG SOI
    val gen = for {
      pfx <- magic
      kind <- Gen.oneOf("image", "audio", "video", "other")
      n <- Gen.chooseNum(0, 200)
      body <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (kind, pfx ++ body.toArray)
    check("decode total", Prop.forAll(gen) { case (kind, payload) =>
      val f = graft.operators.Multimodal.MediaFile(1L, kind, payload)
      val row = graft.operators.Multimodal.JvmCodec.decode(f) // must not throw
      row.n_bytes == payload.length.toLong && row.sha.length == 64
    }, n = 60)
  }

  test("graftlog delivers every line exactly once in order under random " +
      "append/trigger/restart interleavings") {
    // drives the REAL admission-control arithmetic (latestOffset under
    // ReadMaxRows), range planning, offset serialization, and range
    // reads — the parts LineLogSourceSpec pins only with examples
    import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl}
    import graft.sources.{LineLogInputPartition, LineLogOffset, LineLogScan, LineLogSource}
    sealed trait Op
    case class Append(file: Int, lines: List[String]) extends Op
    case class Fire(maxRows: Option[Int]) extends Op
    case object Restart extends Op
    val genOp: Gen[Op] = Gen.frequency(
      4 -> (for {
        f <- Gen.chooseNum(0, 2)
        n <- Gen.chooseNum(1, 4)
        ls <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(6)))
      } yield Append(f, ls)),
      4 -> Gen.option(Gen.chooseNum(1, 3)).map(Fire(_)),
      1 -> Gen.const(Restart))
    check("graftlog exactly-once", Prop.forAll(Gen.listOfN(14, genOp)) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("graftlog_prop")
      val appended = Array.fill(3)(scala.collection.mutable.ArrayBuffer.empty[String])
      val delivered = Array.fill(3)(scala.collection.mutable.ArrayBuffer.empty[(Long, String)])
      def newStream() = new LineLogScan(dir.toString, "earliest", None)
        .toMicroBatchStream("unused").asInstanceOf[SupportsAdmissionControl]
      var stream = newStream()
      var start = LineLogOffset(Map.empty)
      def fire(maxRows: Option[Int]): Unit = {
        val limit = maxRows.map(n => ReadLimit.maxRows(n.toLong))
          .getOrElse(ReadLimit.allAvailable())
        val end = stream.latestOffset(start, limit).asInstanceOf[LineLogOffset]
        stream.asInstanceOf[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]
          .planInputPartitions(start, end).foreach { p =>
            val ip = p.asInstanceOf[LineLogInputPartition]
            val it = LineLogSource.readRange(ip.dir, ip.log, ip.start, ip.end)
            try it.foreach { case (off, v) =>
              delivered(ip.log.charAt(1) - '0') += ((off, v))
            } finally it.close()
          }
        start = end
      }
      ops.foreach {
        case Append(f, lines) =>
          java.nio.file.Files.write(dir.resolve(s"f$f.log"),
            lines.map(_ + "\n").mkString.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
          appended(f) ++= lines
        case Fire(maxRows) => fire(maxRows)
        case Restart =>
          // new planner instance resuming from the serialized offset —
          // the checkpoint restart path
          stream = newStream()
          start = LineLogOffset.parse(start.json())
      }
      fire(None) // drain
      (0 until 3).forall { f =>
        delivered(f).map(_._2).toSeq == appended(f).toSeq &&
          delivered(f).map(_._1).toSeq == appended(f).indices.map(_.toLong)
      }
    }, n = 12)
  }

  test("funnelTimes equals the sequential per-user reference walk") {
    val evGen = for {
      u <- Gen.chooseNum(1L, 4L)
      t <- Gen.chooseNum(1L, 50L)
      e <- Gen.oneOf("signup", "purchase", "error", "view")
    } yield (u, t, e)
    val gen = Gen.nonEmptyListOf(evGen).map(_.take(60))
    check("funnelTimes", Prop.forAll(gen) { evs =>
      val stages = Seq("signup", "purchase", "error")
      // reference: per user, scan events in (ts, insertion) order? No —
      // the operator is order-free (window MIN per stage), so the
      // reference recomputes each stage time as min{ts : pred ∧ ts > prev}
      def ref(rows: Seq[(Long, String)]): Seq[Option[Long]] = {
        var prev = Long.MinValue
        stages.map { st =>
          val hit = rows.collect {
            case (t, e) if e == st && t > prev && prev != Long.MaxValue => t
          }.sorted.headOption
          prev = hit.getOrElse(Long.MaxValue)
          hit
        }
      }
      val expect = evs.groupBy(_._1).view.mapValues(rs =>
        ref(rs.map(r => (r._2, r._3)))).toMap
      val df = evs.map { case (u, t, e) =>
        (u, new java.sql.Timestamp(t * 1000L), e) }
        .toDF("user_id", "ts", "event_type")
      val got = Relational.funnelTimes(df, col("user_id"), col("ts"), Seq(
          "signup" -> (col("event_type") === "signup"),
          "purchase" -> (col("event_type") === "purchase"),
          "error" -> (col("event_type") === "error")))
        .collect().map { r =>
          r.getLong(0) -> (1 to 3).map(i =>
            Option(r.getTimestamp(i)).map(_.getTime / 1000L)).toSeq
        }.toMap
      got == expect
    })
  }

  test("TWAP lies within the per-type value envelope (weighted-mean bound)") {
    val evGen = for {
      u <- Gen.chooseNum(1L, 3L)
      t <- Gen.chooseNum(1L, 1000L)
      v <- Gen.chooseNum(1, 9999).map(_ / 100.0)
    } yield (u, t, v)
    val gen = Gen.listOfN(30, evGen).map(_.distinctBy(e => (e._1, e._2)))
      .suchThat(_.nonEmpty)
    check("twapEnvelope", Prop.forAll(gen) { evs =>
      // single event type: the q76 shape reduced to its invariant —
      // a duration-weighted mean can never leave [min, max] of the
      // values that carry nonzero weight
      val df = evs.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, new java.sql.Timestamp(t * 1000L), u, "click", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val seg = df.withColumn("next_ts", lead(col("ts"), 1).over(w))
        .filter(col("next_ts").isNotNull)
        .withColumn("dur_us",
          unix_micros(col("next_ts")) - unix_micros(col("ts")))
      if (seg.isEmpty) true
      else {
        val twap = seg
          .withColumn("cd", (round(col("value") * 100).cast("long") *
            col("dur_us")).cast("decimal(38,0)"))
          .agg((sum(col("cd")).cast("double") /
            sum(col("dur_us")).cast("double") / lit(100.0)).as("twap"))
          .as[Double].head()
        val vals = seg.select("value").as[Double].collect()
        twap >= vals.min - 1e-9 && twap <= vals.max + 1e-9
      }
    }, n = 12)
  }

  test("SymbolCount equals the regex spelling on random unicode strings") {
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      2 -> Gen.oneOf('!', ',', '.', '#', '%', '\t', '\n', '\u00e9',
        '\u00fc', '\u4e2d', '\u6587'))
    val gen = Gen.listOf(charGen).map(_.mkString)
    check("symbolCount", Prop.forAll(gen) { text =>
      val Array(n, r) = Seq(text).toDF("t").select(
          graft.plans.SetExprs.symbolCount(col("t")),
          (length(col("t")) -
            length(regexp_replace(col("t"), "[^A-Za-z0-9 ]", "")))
            .cast("long"))
        .as[(Long, Long)].head() match { case (a, b) => Array(a, b) }
      n == r
    }, n = 20)
  }

  test("incrementalAgg equals the from-scratch GROUP BY for any data and any split") {
    import graft.operators.Skew
    val rowGen = Gen.zip(Gen.choose(0, 6), Gen.choose(-1000L, 1000L))
    val gen = Gen.zip(Gen.listOf(rowGen).map(_.take(60)), Gen.long)
    val aggs = Seq(
      Skew.Agg("n", lit(1), "count"), Skew.Agg("s", col("v"), "sum"),
      Skew.Agg("mn", col("v"), "min"), Skew.Agg("mx", col("v"), "max"))
    check("incrementalAgg", Prop.forAll(gen) { case (rows, seed) =>
      rows.isEmpty || {
        // split membership from a hash of (seed, index): arbitrary,
        // including all-base and all-delta at the extremes
        val (baseRows, deltaRows) = rows.zipWithIndex.partition {
          case (_, i) => ((seed ^ i) & 3) != 0
        }
        val df = rows.map { case (k, v) => (s"k$k", v) }.toDF("k", "v")
        val base = baseRows.map { case ((k, v), _) => (s"k$k", v) }.toDF("k", "v")
        val delta = deltaRows.map { case ((k, v), _) => (s"k$k", v) }.toDF("k", "v")
        val full = Skew.partialAgg(df, Seq("k"), aggs)
          .as[(String, Long, Long, Long, Long)].collect().toSet
        val incr = Skew.incrementalAgg(
            Skew.partialAgg(base, Seq("k"), aggs), delta, Seq("k"), aggs)
          .as[(String, Long, Long, Long, Long)].collect().toSet
        incr == full
      }
    }, n = 10)
  }

  test("incrementalClusters equals from-scratch clustering on random graphs and splits") {
    import graft.operators.Dedup
    val gen = for {
      edges <- Gen.nonEmptyListOf(
        Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)))
      splitBit <- Gen.chooseNum(2, 5)
    } yield (edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct.take(40), splitBit)
    check("incrementalClusters", Prop.forAll(gen) { case (edges, splitBit) =>
      edges.isEmpty || {
        // "old" edges = both endpoints land old under a modular split;
        // every other edge is the delta (mixed + new×new) — the shape
        // of a real ingest's pair decomposition
        val isOld = (x: Long) => x % splitBit != 0
        val (oldE, deltaE) = edges.partition { case (a, b) => isOld(a) && isOld(b) }
        val all = edges.toDF("doc_a", "doc_b")
        val full = Dedup.clusters(all)
          .as[(Long, Long)].collect().toSet
        val incr =
          if (oldE.isEmpty)
            Dedup.clusters(deltaE.toDF("doc_a", "doc_b"))
              .as[(Long, Long)].collect().toSet
          else Dedup.incrementalClusters(
              Dedup.clusters(oldE.toDF("doc_a", "doc_b")),
              deltaE.toDF("doc_a", "doc_b"))
            .as[(Long, Long)].collect().toSet
        // nodes only touched by old edges keep their labels; the rest
        // must match from-scratch exactly (deltaE empty ⇒ incr == full
        // trivially via the star edges)
        incr == full
      }
    }, n = 10)
  }

  test("packSequences offsets are the exact running sum in doc_id order") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(1, 12)).map(_.take(25))
    check("packSequences", Prop.forAll(gen) { lens =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" ")) }.toDF("doc_id", "text")
      val got = TextAnalysis.packSequences(docs, "doc_id", "text",
          contextLen = 7, partitions = 3)
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      val starts = lens.scanLeft(0L)(_ + _).init
      got.zipWithIndex.forall { case ((id, nTok, start, fc, lc, nc), i) =>
        id == i.toLong && nTok == lens(i).toLong && start == starts(i) &&
          fc == start / 7 && lc == (start + nTok - 1) / 7 &&
          nc == lc - fc + 1
      }
    }, n = 10)
  }

  test("native classifierScore equals the interpreted HOF spelling on random token arrays") {
    val tokGen = Gen.frequency(
      5 -> Gen.alphaNumStr.map(_.take(8)),
      1 -> Gen.const(""),
      1 -> Gen.oneOf("\u00e9\u00fc", "\u4e2d\u6587", "a b"))
    val gen = Gen.listOf(tokGen).map(_.take(30))
    check("classifierScore", Prop.forAll(gen) { toks =>
      val Array(n, i) = Seq(Tuple1(toks)).toDF("toks").select(
          graft.plans.TextHash.classifierScore(col("toks")),
          TextAnalysis.hashedScoreOf(TextAnalysis.ngramFeatures(col("toks"))))
        .as[(Long, Long)].head() match { case (a, b) => Array(a, b) }
      n == i
    }, n = 20)
  }
}
