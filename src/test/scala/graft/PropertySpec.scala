package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHashImpl
import graft.sources.{BeamOffset, BeamSource}

/** Property-style fuzz over the invariants the engine's cursors, codegen
  * expressions, and stream offsets depend on — cheap JVM-only checks (no
  * SparkSession) that hit edge-space the example specs can't enumerate.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    Iterator.iterate(Seed(42L))(_.next)
      .flatMap(s => g.apply(Gen.Parameters.default, s))
      .take(n).toSeq

  /** Oracle twin of the codegen byte-loop: regex split with empties kept,
    * md5 hex, ascii-parity vote — the HOF/DuckDB formulation in plain Scala.
    */
  private def simhashReference(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](32)
    text.split(" ", -1).foreach { w =>
      md.reset()
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      var i = 0
      while (i < 32) {
        acc(i) += (if (hex.charAt(i).toInt % 2 == 1) 1 else -1)
        i += 1
      }
    }
    (0 until 32).map(j => if (acc(j) > 0) 1L << j else 0L).sum
  }

  test("simhash32 byte-loop equals the regex-split/hex reference on random unicode") {
    val word = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("é", "ü", "ß", "中", "文", "🚀", "a", " "))
        .map(_.mkString), // incl. a surrogate-pair emoji and embedded spaces
      Gen.const(""))
    val text = Gen.listOf(word).map(_.mkString(" "))
    samples(text, 300).foreach { t =>
      assert(
        SimHashImpl.simhash32(org.apache.spark.unsafe.types.UTF8String.fromString(t)) ==
          simhashReference(t), s"mismatch for ${t.take(60).toList}")
    }
  }

  /** Codepoint-windowed reference for the fingerprint: Spark substr is
    * character (codepoint) indexed, so windows must be codepoint windows —
    * a UTF-16 `String.substring` reference would split surrogate pairs.
    */
  private def fingerprintReference(text: String): String = {
    val md  = java.security.MessageDigest.getInstance("MD5")
    val cps = text.codePoints().toArray
    val end = math.max(cps.length - 7, 1)
    (0 until end)
      .map { i =>
        val w = new String(cps, i, math.min(8, cps.length - i).max(0))
        md.reset()
        md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      .distinct.sorted.take(4).mkString("|")
  }

  test("x91 band split guarantees recall: every Hamming<=2 pair shares a band (pigeonhole)") {
    // Mirror of the query's band arithmetic: bits [0,11) / [11,22) / [22,32).
    def bands(s: Long): Seq[Long] = Seq(s & 2047L, (s >> 11) & 2047L, (s >> 22) & 1023L)
    // Random 32-bit signatures, biased toward near-pairs: base signatures
    // plus <=2-bit perturbations of earlier ones (pure random longs almost
    // never land within Hamming 2 of each other).
    val sigs = {
      val base = samples(Gen.choose(0L, (1L << 32) - 1), 120)
      val perturbed = base.zip(samples(Gen.choose(0, 31), 120))
        .zip(samples(Gen.choose(0, 31), 120))
        .map { case ((s, b1), b2) => (s ^ (1L << b1) ^ (1L << b2)) & 0xFFFFFFFFL }
      (base ++ perturbed).distinct
    }
    for {
      (a, i) <- sigs.zipWithIndex
      b <- sigs.drop(i + 1)
      if java.lang.Long.bitCount(a ^ b) <= 2
    } assert(
      bands(a).zip(bands(b)).exists { case (x, y) => x == y },
      f"Hamming<=2 pair 0x$a%08x / 0x$b%08x shares no band — pigeonhole violated")
  }

  test("doc_fingerprint byte-loop equals the codepoint-window reference on random unicode") {
    val word = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("é", "中", "🚀", "a", " ", "xyzw")).map(_.mkString),
      Gen.const(""))
    val text = Gen.listOf(word).map(_.mkString(" "))
    samples(text, 300).foreach { t =>
      val got = graft.functions.DocFingerprintImpl
        .bottom4(org.apache.spark.unsafe.types.UTF8String.fromString(t)).toString
      assert(got == fingerprintReference(t), s"mismatch for ${t.take(60).toList}")
    }
  }

  test("padded messageId string order equals numeric order for random components") {
    val comp = for {
      ms  <- Gen.chooseNum(0L, 9999999999999L)     // 13-digit unix millis
      par <- Gen.chooseNum(0, Int.MaxValue)         // partition id
      mono <- Gen.chooseNum(0L, Long.MaxValue / 2)  // monotonic id
    } yield (ms, par, mono)
    val ids = samples(comp, 400)
    val formatted = ids.map { case (ms, p, m) => f"$ms%013d:$p%010d:$m%020d" -> (ms, p, m) }
    val byString  = formatted.sortBy(_._1).map(_._2)
    val byNumber  = formatted.map(_._2).sortBy(identity)
    assert(byString == byNumber)
  }

  test("beam offset JSON round-trips for random counts") {
    val stream = new graft.sources.BeamMicroBatchStream("/nonexistent", BeamSource.schema)
    samples(Gen.chooseNum(0L, Long.MaxValue), 100).foreach { n =>
      val off = BeamOffset(n)
      assert(stream.deserializeOffset(off.json()) == off)
    }
  }

  test("poll prefix is always sufficient: polling the prefix equals polling everything") {
    // Random topic layouts: monotone per-ingest stamps, 1-3 segments per
    // ingest, globally increasing message ids (name order == (pt, mid)
    // order, the writer's invariant). Some segments lose their stats
    // (stat-less footers) and some layouts start with a compacted segment
    // spanning many stamps — both must stay conservative, never starving
    // a batch.
    final case class SegSim(rows: Seq[(Long, Long)], stats: Option[BeamSource.SegmentStats])
    val layoutGen = for {
      nIngests  <- Gen.chooseNum(1, 10)
      rowsPer   <- Gen.listOfN(nIngests, Gen.chooseNum(1, 8))
      splits    <- Gen.listOfN(nIngests, Gen.chooseNum(1, 3))
      statless  <- Gen.listOfN(nIngests * 3, Gen.prob(0.15))
      compactK  <- Gen.chooseNum(0, nIngests) // first K ingests pre-merged
    } yield {
      var mid  = 0L
      val segs = scala.collection.mutable.ArrayBuffer.empty[SegSim]
      val compactedRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (i <- 0 until nIngests) {
        val stamp = (i + 1) * 1000L
        val rows  = (0 until rowsPer(i)).map { _ => mid += 1; (stamp, mid) }
        if (i < compactK) compactedRows ++= rows
        else {
          val parts = rows.grouped(math.max(1, rows.size / splits(i))).toSeq
          parts.foreach { p =>
            val lossy = statless((segs.size + compactedRows.size.toInt) % statless.size)
            segs += SegSim(p, if (lossy) None
              else Some(BeamSource.SegmentStats(p.size.toLong, Some(p.head._1), Some(p.last._1))))
          }
        }
      }
      val head =
        if (compactedRows.isEmpty) Seq.empty
        else Seq(SegSim(compactedRows.toSeq, Some(BeamSource.SegmentStats(
          compactedRows.size.toLong, Some(compactedRows.head._1), Some(compactedRows.last._1)))))
      head ++ segs.toSeq
    }
    val caseGen = for {
      layout <- layoutGen
      total   = layout.map(_.rows.size).sum
      cursorI <- Gen.chooseNum(0, total) // 0 = fresh subscription
      limit   <- Gen.chooseNum(1, 12)
    } yield (layout, cursorI, limit)

    samples(caseGen, 300).foreach { case (layout, cursorI, limit) =>
      val allRows = layout.flatMap(_.rows).sorted
      val cursor  = if (cursorI == 0) None else Some(allRows(cursorI - 1))
      def fresh(rows: Seq[(Long, Long)]) = cursor match {
        case None           => rows
        case Some((ct, cm)) => rows.filter { case (pt, m) => pt > ct || (pt == ct && m > cm) }
      }
      val prefix = graft.topics.TopicTable.pollPrefix(
        layout.map(s => s -> s.stats), cursor.map(_._1), limit)
      val viaPrefix = fresh(prefix.flatMap(_.rows).sorted).take(limit)
      val viaAll    = fresh(allRows).take(limit)
      assert(viaPrefix == viaAll,
        s"prefix starved the batch: layout=${layout.map(_.rows.size)} cursor=$cursor limit=$limit")
      // and the selection preserves listing order (a prefix of the fresh
      // subsequence — stale segments may be skipped, order never reshuffled)
      val idx = prefix.map(layout.indexOf(_))
      assert(idx == idx.sorted)
    }
  }

  test("TopKAgg reduce/merge equal the sort-based reference on random streams") {
    val agg = new graft.functions.TopKAgg(5)
    val streamGen = Gen.listOf(Gen.chooseNum(-1000.0, 1000.0))
    samples(Gen.zip(streamGen, streamGen), 200).foreach { case (xs, ys) =>
      val bufA = xs.foldLeft(agg.zero)(agg.reduce)
      val bufB = ys.foldLeft(agg.zero)(agg.reduce)
      val got  = agg.finish(agg.merge(bufA, bufB)).toSeq
      val want = (xs ++ ys).sorted(Ordering[Double].reverse).take(5)
      assert(got == want, s"xs=$xs ys=$ys")
      assert(got.sorted(Ordering[Double].reverse) == got, "buffer stays descending")
    }
  }

  test("BottomKAgg reduce/merge equal the sort-based reference on random streams") {
    val agg = new graft.functions.BottomKAgg(10)
    val streamGen = Gen.listOf(Gen.chooseNum(-1000L, 1000L))
    samples(Gen.zip(streamGen, streamGen), 200).foreach { case (xs, ys) =>
      val bufA = xs.foldLeft(agg.zero)(agg.reduce)
      val bufB = ys.foldLeft(agg.zero)(agg.reduce)
      val got  = agg.finish(agg.merge(bufA, bufB)).toSeq
      val want = (xs ++ ys).sorted.take(10)
      assert(got == want, s"xs=$xs ys=$ys")
      assert(got.sorted == got, "buffer stays ascending")
      assert(got.length <= 10, "buffer stays bounded")
    }
  }

  test("BottomKPairAgg reduce/merge equal the sort-based reference on random pair streams") {
    val agg = new graft.functions.BottomKPairAgg(8)
    val pairGen = Gen.zip(Gen.oneOf("a", "b", "ab", "ba", "c", ""), Gen.chooseNum(-50L, 50L))
    val streamGen = Gen.listOf(pairGen)
    samples(Gen.zip(streamGen, streamGen), 200).foreach { case (xs, ys) =>
      val bufA = xs.foldLeft(agg.zero)(agg.reduce)
      val bufB = ys.foldLeft(agg.zero)(agg.reduce)
      val got  = agg.finish(agg.merge(bufA, bufB)).toSeq
      val want = (xs ++ ys).sorted.take(8)
      assert(got == want, s"xs=$xs ys=$ys")
      assert(got.length <= 8, "buffer stays bounded")
    }
  }

  test("nfc normalize equals java.text.Normalizer on random unicode, identity on ASCII") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.NfcNormalizeImpl
    // bias toward decomposable sequences: combining marks after base letters
    // (o/a/n + U+0308/030A/0303, a bare U+0301, precomposed é, a
    // surrogate-pair emoji, and a halfwidth katakana NFKC would change but
    // NFC must NOT)
    val piece = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("é", "ö", "å", "ñ",
        "é", "中", "🚀", "́", "ｱ", " "))
        .map(_.mkString),
      Gen.const(""))
    samples(Gen.listOf(piece).map(_.mkString), 300).foreach { t =>
      val got  = NfcNormalizeImpl.nfc(UTF8String.fromString(t)).toString
      val want = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got == want, s"mismatch for ${t.take(40).toList}")
    }
    // ASCII fast path must return the SAME instance (no allocation)
    val ascii = UTF8String.fromString("plain ascii text 123!")
    assert(NfcNormalizeImpl.nfc(ascii) eq ascii)
  }

  test("char_ngrams equals the substring formulation on random unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.CharNgramsImpl
    val piece = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf("é", "中", "🚀", "ｱ", " ", "ab"))
        .map(_.mkString),
      Gen.const(""))
    for (n <- Seq(1, 2, 3, 5)) {
      samples(Gen.listOf(piece).map(_.mkString), 200).foreach { t =>
        val got = CharNgramsImpl.ngrams(UTF8String.fromString(t), n)
          .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
        // reference: code-point substrings (what substr(i, n) computes)
        val cps  = t.codePoints().toArray
        val want =
          if (cps.length < n) Seq.empty
          else (0 to cps.length - n).map(i => new String(cps, i, n))
        assert(got == want, s"n=$n mismatch for ${t.take(40).toList}")
      }
    }
  }

  test("char_ngrams does not crash on malformed UTF-8 (parquet doesn't validate)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.CharNgramsImpl
    // truncated multibyte lead (0xC2 followed by ASCII): numChars skips 2
    // bytes for the lead while every non-continuation byte is a char start,
    // so a numChars-sized offset array would overflow — the ADVICE r4 crash
    val cases = Seq[Array[Byte]](
      Array(0xc2.toByte, 'a'.toByte, 'b'.toByte, 'c'.toByte),
      Array(0xe0.toByte, 'x'.toByte),                         // truncated 3-byte lead
      Array(0xf0.toByte, 0x90.toByte, 'q'.toByte, 'r'.toByte, 's'.toByte), // truncated 4-byte
      Array(0x80.toByte, 0x80.toByte),                        // bare continuations
      Array.fill(10)(0xc2.toByte))                            // all leads
    for (bytes <- cases; n <- Seq(1, 2, 3)) {
      val s   = UTF8String.fromBytes(bytes)
      val out = CharNgramsImpl.ngrams(s, n) // must not throw
      assert(out.numElements() >= 0)
    }
    // and a gen sweep over random byte soup for good measure
    samples(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)), 200).foreach { bs =>
      CharNgramsImpl.ngrams(UTF8String.fromBytes(bs.toArray), 3)
    }
  }

  test("media codec round-trips real PNG/JPEG/WAV containers over random bodies") {
    import graft.ops.MediaCodec
    val bodies = samples(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray), 120) ++
      Seq(Array.emptyByteArray, Array.fill(70000)('x'.toByte)) // empty + >64k body
    for (body <- bodies; (fmt, docId) <- Seq(("jpg", 0L), ("png", 4L), ("png", 7L), ("wav", 2L))) {
      val payload = MediaCodec.encode(fmt, docId, body)
      val d       = MediaCodec.decode(payload) // sniffed, never told the fmt
      assert(d.fmt == fmt)
      assert(MediaCodec.body(payload, d).sameElements(body), s"$fmt body mismatch")
      val (w, h) = MediaCodec.dimsFor(body.length)
      if (fmt == "wav") { assert(d.w == 16000 && d.h == body.length / 2 && d.channels == 1) }
      else { assert(d.w == w && d.h == h) }
      if (fmt == "jpg") assert(d.channels == 3)
      if (fmt == "png") assert(d.channels == (if (docId % 2 == 0) 3 else 4))
    }
    // container overhead constants are part of the x12 oracle contract
    assert(MediaCodec.encode("jpg", 0, new Array[Byte](10)).length == 65)
    assert(MediaCodec.encode("png", 0, new Array[Byte](10)).length == 67)
    assert(MediaCodec.encode("wav", 0, new Array[Byte](10)).length == 54)
  }

  test("media codec rejects corrupt and truncated containers with named errors") {
    import graft.ops.MediaCodec
    val body = "some body bytes here".getBytes("UTF-8")
    for (fmt <- Seq("jpg", "png", "wav")) {
      val good = MediaCodec.encode(fmt, 1L, body)
      // truncation anywhere in the header region must raise, not crash
      for (cut <- Seq(2, 10, good.length - 1))
        assertThrows[IllegalArgumentException](MediaCodec.decode(good.take(cut)))
    }
    // PNG IHDR corruption must trip the CRC check
    val png = MediaCodec.encode("png", 0L, body)
    png(16) = (png(16) ^ 0x01).toByte // a width byte inside IHDR data
    assertThrows[IllegalArgumentException](MediaCodec.decode(png))
    // unknown magic
    assertThrows[IllegalArgumentException](MediaCodec.decode("not a container".getBytes))
  }

  test("startingPosition parser accepts the documented forms and rejects everything else") {
    assert(BeamSource.parseStartingPosition("earliest").contains(0L))
    assert(BeamSource.parseStartingPosition("latest").isEmpty)
    samples(Gen.chooseNum(0L, Long.MaxValue), 50).foreach { n =>
      assert(BeamSource.parseStartingPosition(s"offset:$n").contains(n))
    }
    for (bad <- Seq("Latest", "EARLIEST", "offset:", "offset:-1", "offset:1e3",
        "offset: 5", "beginning", ""))
      assertThrows[IllegalArgumentException](BeamSource.parseStartingPosition(bad))
  }

  test("staged global replace equals priority-queue BPE on random merge tables") {
    // the x106 equivalence theorem, fuzzed: for ANY rank-ordered merge
    // table whose patterns reference only symbols that already exist
    // (letters or earlier sentinels — the shape every learned merges.txt
    // has), applying each merge exhaustively in rank order equals the
    // classic lowest-rank-first single-merge loop
    val sentinels = "12345"
    val tableGen: Gen[Seq[(Char, Char)]] = for {
      k <- Gen.chooseNum(1, 5)
      pairs <- Gen.sequence[Seq[(Char, Char)], (Char, Char)]((0 until k).map { i =>
        val syms = "abcdef" + sentinels.take(i) // letters + earlier sentinels
        for {
          l <- Gen.oneOf(syms.toSeq)
          r <- Gen.oneOf(syms.toSeq)
        } yield (l, r)
      })
    } yield pairs
    val wordGen = Gen.listOf(Gen.oneOf("abcdef".toSeq)).map(_.mkString).suchThat(_.length <= 14)
    def staged(w: String, merges: Seq[(Char, Char)]): String =
      merges.zipWithIndex.foldLeft(w) { case (acc, ((l, r), i)) =>
        acc.replace(s"$l$r", sentinels(i).toString) // literal, global, L→R
      }
    def priority(w: String, merges: Seq[(Char, Char)]): String = {
      var syms = w.toVector
      var go = true
      while (go) {
        val hit = merges.zipWithIndex.iterator.flatMap { case ((l, r), k) =>
          syms.indices.dropRight(1).find(i => syms(i) == l && syms(i + 1) == r)
            .map(i => (k, i))
        }.toSeq.sortBy(_._1).headOption
        hit match {
          case Some((k, i)) => syms = (syms.take(i) :+ sentinels(k)) ++ syms.drop(i + 2)
          case None         => go = false
        }
      }
      syms.mkString
    }
    val caseGen = for { t <- tableGen; w <- wordGen } yield (t, w)
    samples(caseGen, 500).foreach { case (t, w) =>
      assert(staged(w, t) == priority(w, t),
        s"divergence for word '$w' under table $t")
    }
  }
}
