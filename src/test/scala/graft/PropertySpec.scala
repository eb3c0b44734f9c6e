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
}
