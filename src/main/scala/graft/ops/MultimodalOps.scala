package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata — the multimodal
  * column pattern (builder mandate; SURVEY.md §1.4 binary-payload schema,
  * ref `PulsarMessage.Payload []byte` src/model/message.go:11-18).
  */
final case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

/** Header-decoded features: dims/channels PARSED from the real container
  * bytes ([[MediaCodec.decode]]), probes and histogram over the located
  * body stream.
  */
final case class MediaFeatures(
    doc_id: Long, fmt: String, w: Long, h: Long, channels: Long, body_bytes: Long,
    b1: Int, b2: Int, b3: Int, b4: Int, n_a: Long)

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction pass implemented
  * as a typed `Dataset.mapPartitions` — the batch-iterator shape a codec
  * plugs into (one decoder/digest init per partition, streamed rows).
  *
  * The payloads are REAL containers: the fixture encoder wraps each
  * document's utf-8 bytes in a genuine PNG / JFIF-JPEG / RIFF-WAVE stream
  * ([[MediaCodec]]), and the decode side sniffs the magic and walks the
  * actual chunk/marker structure to the IHDR / SOF0 / fmt fields. Only the
  * body stays opaque (no pixel/DCT decode — media libs aren't shipped),
  * which is the honest boundary for a metadata-driven curation pass.
  */
object MultimodalOps {

  /** Real header decode: sniff + parse the container, probe the body.
    * Runs inside the typed mapPartitions pipeline.
    */
  def decodeFeatures(r: MediaRow): MediaFeatures = {
    val d    = MediaCodec.decode(r.payload)
    val body = MediaCodec.body(r.payload, d)
    val n    = body.length
    def probe(pos0: Int): Int = if (pos0 < n) body(pos0) & 0xff else 0
    MediaFeatures(
      r.doc_id, d.fmt,
      w = d.w.toLong, h = d.h.toLong, channels = d.channels.toLong, body_bytes = n.toLong,
      b1 = probe(0), b2 = probe(8), b3 = probe(16), b4 = probe(24),
      n_a = body.count(_ == 'a'.toByte).toLong)
  }

  /** documents → media rows: each document's utf-8 bytes wrapped in a real
    * container by the fixture encoder — fmt round-robins jpg/png/wav by
    * doc_id, PNG color type alternates RGB/RGBA by parity.
    */
  private def media(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[MediaRow] = {
    val sp = s
    import sp.implicits._
    // null text ⇒ no media object (a crawl row without content has nothing
    // to wrap) — every mm oracle mirrors this with `WHERE text IS NOT NULL`
    Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      .where(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val fmt = (id % 3) match { case 0 => "jpg"; case 1 => "png"; case _ => "wav" }
        MediaRow(id, fmt, MediaCodec.encode(fmt, id, text.getBytes("UTF-8")))
      })
  }

  /** Metadata-level aggregation over the binary column: per-format counts
    * and byte totals (SURVEY.md §2.B "multimodal columns … metadata-only
    * checks"). `length()` on binary is byte length — no payload decode.
    */
  val mmMetadata: Q = Q(
    "x12_mm_metadata",
    """SELECT fmt, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes, min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
      |FROM (SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
      |             strlen(text) + CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 55 WHEN 1 THEN 57 ELSE 44 END AS n_bytes
      |      FROM documents WHERE text IS NOT NULL)
      |GROUP BY fmt ORDER BY fmt""".stripMargin
  ) { (s, dir) =>
    // n_bytes as long on the Spark side too: DuckDB strlen is BIGINT, so
    // min/max must agree on int64 for the driver's dtype-sensitive hash.
    media(s, dir)
      .select(col("fmt"), length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("fmt")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        min("n_bytes").as("min_bytes"), max("n_bytes").as("max_bytes"))
      .orderBy("fmt")
  }

  /** Typed decode pipeline: Dataset[MediaRow] → mapPartitions(header parse)
    * → Dataset[MediaFeatures]. The partition iterator is where the decoder
    * amortizes its init; rows never collect to the driver. The oracle
    * recomputes every field from the fixture generation rule, so a hash
    * match proves the REAL byte-level parse (PNG IHDR with CRC check, JPEG
    * SOF0 height-before-width, WAVE fmt chunk) round-trips the encoder.
    */
  val mmFeatures: Q = Q(
    "x13_mm_features",
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
      |  CASE WHEN doc_id % 3 = 2 THEN 16000 ELSE strlen(text) % 640 + 1 END AS w,
      |  CASE WHEN doc_id % 3 = 2 THEN strlen(text) // 2 ELSE (strlen(text) * 7) % 480 + 1 END AS h,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 WHEN doc_id % 3 = 2 THEN 1
      |            WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS BIGINT) AS channels,
      |  strlen(text) AS body_bytes,
      |  ascii(substr(text, 1, 1)) AS b1, ascii(substr(text, 9, 1)) AS b2,
      |  ascii(substr(text, 17, 1)) AS b3, ascii(substr(text, 25, 1)) AS b4,
      |  strlen(text) - strlen(replace(text, 'a', '')) AS n_a
      |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val sp = s
    import sp.implicits._
    media(s, dir)
      .mapPartitions(_.map(decodeFeatures))
      .select(col("doc_id"), col("fmt"), col("w"), col("h"), col("channels"), col("body_bytes"),
        col("b1"), col("b2"), col("b3"), col("b4"), col("n_a"))
      .orderBy("doc_id")
  }

  /** One sampled frame emitted by the decode pipeline. */
  final case class FrameRow(doc_id: Long, frame_idx: Long, fdigest: String)

  private def md5Hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    md.digest(bytes).map(b => f"$b%02x").mkString
  }

  /** Frame sampling — the video-pipeline batch shape: the typed
    * mapPartitions "codec" splits each payload into fixed 64-byte frames,
    * keeps every 4th, and emits one row per sampled frame (doc →
    * frame fan-out, digest instead of pixels). The MessageDigest is
    * initialized once per PARTITION — the amortized-decoder-init pattern a
    * real codec needs — and frames stream out of the iterator without
    * materializing a doc's frame list.
    */
  val mmFrames: Q = Q(
    "x45_mm_frames",
    """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |       md5(substr(text, CAST(64*i+1 AS INT), 64)) AS fdigest
      |FROM (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0 AND text IS NOT NULL),
      |     LATERAL (SELECT unnest(generate_series(0, CAST(CASE WHEN strlen(text) = 0 THEN -1
      |              ELSE (strlen(text)-1)//64 END AS BIGINT))) AS i) g
      |WHERE i % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin
  ) { (s, dir) =>
    val sp = s
    import sp.implicits._
    media(s, dir).where(col("doc_id") % 25 === 0)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          // frames sample the DECODED stream: parse the container, frame
          // over the located body (headers are never part of a frame)
          val body    = MediaCodec.body(r.payload, MediaCodec.decode(r.payload))
          val n       = body.length
          // floorDiv: for n = 0 truncating division would yield 1 phantom
          // frame where the oracle's floor division yields none
          val nFrames = Math.floorDiv(n - 1, 64) + 1
          (0 until nFrames).iterator.filter(_ % 4 == 0).map { i =>
            val frame = java.util.Arrays.copyOfRange(body, i * 64, math.min(i * 64 + 64, n))
            FrameRow(r.doc_id, i.toLong, md5Hex(md, frame))
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** The subsampled-frame fingerprint SQL twin (every-4th-frame digests,
    * concatenated in order, hashed again) — shared by x46 and x81 so the
    * two oracles can never drift apart.
    */
  // the series bound must FLOOR-divide: DuckDB's // truncates toward zero,
  // so an EMPTY body ((0-1)//64 = 0, not -1) would grow a phantom frame the
  // floorDiv-based decode pipeline correctly never emits (hostile sweep)
  // coalesce: DuckDB's array_to_string over an EMPTY list is NULL, not ''
  private val fingerprintSql: String =
    """md5(coalesce(array_to_string(list_transform(
      |          list_filter(generate_series(0, CAST(CASE WHEN strlen(text) = 0 THEN -1
      |                        ELSE (strlen(text)-1)//64 END AS BIGINT)), i -> i % 4 = 0),
      |          i -> md5(substr(text, CAST(64*i+1 AS INT), 64))), ''), ''))""".stripMargin

  /** Per-media subsampled-frame fingerprints (doc_id, fmt, fingerprint),
    * computed ROW-LOCALLY in the typed decode pipeline — one copy of the
    * nFrames/every-4th-frame logic (incl. the x45 floorDiv empty-payload
    * edge) serving both x46 and x81.
    */
  private def fingerprints(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    media(s, dir)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          // same decode-then-frame contract as x45: the fingerprint covers
          // the parsed body stream, never the container headers
          val body    = MediaCodec.body(r.payload, MediaCodec.decode(r.payload))
          val n       = body.length
          val nFrames = Math.floorDiv(n - 1, 64) + 1 // see x45 floorDiv note
          val joined = (0 until nFrames).filter(_ % 4 == 0).map { i =>
            md5Hex(md, java.util.Arrays.copyOfRange(body, i * 64, math.min(i * 64 + 64, n)))
          }.mkString
          (r.doc_id, r.fmt, md5Hex(md, joined.getBytes("UTF-8")))
        }
      }
      .toDF("doc_id", "fmt", "fingerprint")
  }

  /** Media near-dup via subsampled-frame fingerprints: hashing only every
    * 4th frame makes the fingerprint cheap AND tolerant of content that
    * differs in skipped frames — the standard video-dedup trick. The
    * fingerprint is computed ROW-LOCALLY in the same typed pipeline,
    * so the only shuffle is the final per-format aggregate.
    */
  val mmDedup: Q = Q(
    "x46_mm_dedup",
    s"""SELECT fmt, count(*) AS n_media,
       |       CAST(count(DISTINCT fingerprint) AS BIGINT) AS n_fp,
       |       CAST(count(*) - count(DISTINCT fingerprint) AS BIGINT) AS n_dup
       |FROM (SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
       |        $fingerprintSql AS fingerprint
       |      FROM documents WHERE text IS NOT NULL)
       |GROUP BY fmt ORDER BY fmt""".stripMargin
  ) { (s, dir) =>
    fingerprints(s, dir)
      .groupBy("fmt")
      .agg(count(lit(1)).as("n_media"),
        countDistinct(col("fingerprint")).as("n_fp"),
        (count(lit(1)) - countDistinct(col("fingerprint"))).as("n_dup"))
      .orderBy("fmt")
  }

  /** Contrastive training-pair construction (the CLIP-style dataloader
    * shape): each document yields a POSITIVE (its own media fingerprint)
    * and a deterministic HARD NEGATIVE — the next same-format document's
    * fingerprint in doc_id order (same modality and format makes the
    * negative non-trivial; `lead` over the format partition keeps the
    * choice reproducible across runs and engines, no RNG). The last doc
    * per format has no successor and is dropped, stated by the oracle.
    *
    * Scale shape: fingerprints come from the same per-partition typed
    * decode pipeline as x46 (decoder init amortized per partition); the
    * only exchange after decode is the per-format window — and `pair_ok`
    * audits that no positive collides with its negative.
    */
  val mmContrastivePairs: Q = Q(
    "x81_mm_contrastive_pairs",
    s"""WITH fp AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
       |         $fingerprintSql AS pos_fp
       |  FROM documents WHERE text IS NOT NULL),
       |p AS (SELECT doc_id, fmt, pos_fp,
       |             lead(pos_fp) OVER (PARTITION BY fmt ORDER BY doc_id) AS neg_fp
       |      FROM fp)
       |SELECT doc_id, fmt, pos_fp, neg_fp, (pos_fp <> neg_fp) AS pair_ok
       |FROM p WHERE neg_fp IS NOT NULL ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val fp = fingerprints(s, dir).withColumnRenamed("fingerprint", "pos_fp")
    val w = Window.partitionBy("fmt").orderBy("doc_id")
    fp.withColumn("neg_fp", lead(col("pos_fp"), 1).over(w))
      .where(col("neg_fp").isNotNull)
      .select(col("doc_id"), col("fmt"), col("pos_fp"), col("neg_fp"),
        (col("pos_fp") =!= col("neg_fp")).as("pair_ok"))
      .orderBy("doc_id")
  }

  /** Frame-level PCM features: the WAVE body parsed as little-endian
    * signed-int16 samples, framed at 64 samples, per-file sample count,
    * total |amplitude| energy, and peak frame energy — the audio-curation
    * signal (silence/clipping detection) computed where it belongs: in the
    * partition iterator, on the REAL container's located body bytes, exact
    * integer arithmetic end to end. The oracle recomputes the same sample
    * stream from the fixture rule (body = utf-8 text), so a hash match
    * proves the byte-pair decode, sign handling, and framing.
    */
  val mmAudioEnergy: Q = Q(
    "x96_mm_audio_energy",
    """WITH wav AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL),
      |samp AS (SELECT doc_id, (i + 63) // 64 AS frame,
      |                ascii(substr(text, CAST(2*i-1 AS INT), 1)) +
      |                  256 * ascii(substr(text, CAST(2*i AS INT), 1)) AS raw
      |         FROM wav, LATERAL (SELECT unnest(generate_series(1, strlen(text) // 2)) AS i) s),
      |sv AS (SELECT doc_id, frame,
      |              CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v FROM samp),
      |fr AS (SELECT doc_id, frame, CAST(sum(abs(v)) AS BIGINT) AS fe,
      |              CAST(count(*) AS BIGINT) AS ns FROM sv GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(ns) AS BIGINT) AS n_samples,
      |       CAST(count(*) AS BIGINT) AS n_frames,
      |       CAST(sum(fe) AS BIGINT) AS energy,
      |       CAST(max(fe) AS BIGINT) AS peak_energy
      |FROM fr GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val sp = s
    import sp.implicits._
    media(s, dir)
      .filter(col("fmt") === "wav")
      .mapPartitions(_.flatMap { r =>
        val d    = MediaCodec.decode(r.payload)
        val body = MediaCodec.body(r.payload, d)
        val n    = body.length / 2
        if (n == 0) None // oracle's generate_series emits no sample rows
        else {
          var energy = 0L; var peak = 0L; var frameE = 0L
          var k = 0
          while (k < n) {
            // little-endian signed int16
            val v = (((body(2 * k) & 0xff) | (body(2 * k + 1) << 8)).toShort).toLong
            frameE += math.abs(v)
            k += 1
            if (k % 64 == 0 || k == n) { if (frameE > peak) peak = frameE; energy += frameE; frameE = 0L }
          }
          Some((r.doc_id, n.toLong, ((n + 63) / 64).toLong, energy, peak))
        }
      })
      .toDF("doc_id", "n_samples", "n_frames", "energy", "peak_energy")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(mmMetadata, mmFeatures, mmFrames, mmDedup, mmContrastivePairs,
    mmAudioEnergy)
}
