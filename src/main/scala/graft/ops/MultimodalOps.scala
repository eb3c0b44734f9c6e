package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: opaque binary payload + typed metadata — the multimodal
  * column pattern (builder mandate; SURVEY.md §1.4 binary-payload schema,
  * ref `PulsarMessage.Payload []byte` src/model/message.go:11-18).
  */
final case class MediaRow(doc_id: Long, fmt: String, payload: Array[Byte])

/** Deterministic fake "decoded" features — stands in for a real image/audio
  * decoder (the decode libs are not in this container; see [[MultimodalOps.decodeReal]]).
  */
final case class MediaFeatures(
    doc_id: Long, fmt: String, w: Long, h: Long,
    b1: Int, b2: Int, b3: Int, b4: Int, n_a: Long)

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a feature-extraction pass implemented
  * as a typed `Dataset.mapPartitions` — the batch-iterator shape a real
  * decoder plugs into (one decoder init per partition, streamed rows).
  *
  * The decode step itself is STUBBED deterministically (payload bytes are
  * utf-8 of `documents.text`, "features" are byte probes) so the Spark-side
  * plumbing — binary schema, partitioning, batch iteration, typed Encoders —
  * is real and oracle-checked while no media library is required.
  */
object MultimodalOps {

  /** Real decoder entry point — intentionally unimplemented in this
    * container (no image/audio libs). A production deployment swaps this in
    * for [[fakeDecode]] inside the same mapPartitions pipeline.
    */
  def decodeReal(payload: Array[Byte], fmt: String): MediaFeatures =
    throw new NotImplementedError("media codecs unavailable in this environment")

  /** Deterministic fake decode: dimension fields derived from payload size,
    * "frame samples" = bytes at fixed offsets, histogram = count of 'a'.
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    def probe(pos0: Int): Int = if (pos0 < n) r.payload(pos0) & 0xff else 0
    MediaFeatures(
      r.doc_id, r.fmt,
      w = n % 640, h = (n.toLong * 7) % 480,
      b1 = probe(0), b2 = probe(8), b3 = probe(16), b4 = probe(24),
      n_a = r.payload.count(_ == 'a'.toByte).toLong)
  }

  /** documents → media rows: payload = utf-8 bytes (the opaque binary stand-
    * in), fmt assigned deterministically (jpg/png/wav by doc_id).
    */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      element_at(array(lit("jpg"), lit("png"), lit("wav")), (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** Metadata-level aggregation over the binary column: per-format counts
    * and byte totals (SURVEY.md §2.B "multimodal columns … metadata-only
    * checks"). `length()` on binary is byte length — no payload decode.
    */
  val mmMetadata: Q = Q(
    "x12_mm_metadata",
    """SELECT fmt, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes, min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
      |FROM (SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'jpg' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
      |             strlen(text) AS n_bytes FROM documents)
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

  /** Typed decode pipeline: Dataset[MediaRow] → mapPartitions(fakeDecode) →
    * Dataset[MediaFeatures]. The partition iterator is where a real decoder
    * would amortize its init; rows never collect to the driver.
    */
  val mmFeatures: Q = Q(
    "x13_mm_features",
    """SELECT doc_id,
      |  strlen(text) % 640 AS w, (strlen(text) * 7) % 480 AS h,
      |  ascii(substr(text, 1, 1)) AS b1, ascii(substr(text, 9, 1)) AS b2,
      |  ascii(substr(text, 17, 1)) AS b3, ascii(substr(text, 25, 1)) AS b4,
      |  strlen(text) - strlen(replace(text, 'a', '')) AS n_a
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val sp = s
    import sp.implicits._
    media(s, dir).as[MediaRow]
      .mapPartitions(_.map(fakeDecode))
      .select(col("doc_id"), col("w"), col("h"), col("b1"), col("b2"), col("b3"), col("b4"), col("n_a"))
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
      |FROM (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0),
      |     LATERAL (SELECT unnest(generate_series(0, CAST((strlen(text)-1)//64 AS BIGINT))) AS i) g
      |WHERE i % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin
  ) { (s, dir) =>
    val sp = s
    import sp.implicits._
    media(s, dir).where(col("doc_id") % 25 === 0).as[MediaRow]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val n       = r.payload.length
          // floorDiv: for n = 0 truncating division would yield 1 phantom
          // frame where the oracle's floor division yields none
          val nFrames = Math.floorDiv(n - 1, 64) + 1
          (0 until nFrames).iterator.filter(_ % 4 == 0).map { i =>
            val frame = java.util.Arrays.copyOfRange(r.payload, i * 64, math.min(i * 64 + 64, n))
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
  private val fingerprintSql: String =
    """md5(array_to_string(list_transform(
      |          list_filter(generate_series(0, CAST((strlen(text)-1)//64 AS BIGINT)), i -> i % 4 = 0),
      |          i -> md5(substr(text, CAST(64*i+1 AS INT), 64))), ''))""".stripMargin

  /** Per-media subsampled-frame fingerprints (doc_id, fmt, fingerprint),
    * computed ROW-LOCALLY in the typed decode pipeline — one copy of the
    * nFrames/every-4th-frame logic (incl. the x45 floorDiv empty-payload
    * edge) serving both x46 and x81.
    */
  private def fingerprints(s: SparkSession, dir: String): DataFrame = {
    val sp = s
    import sp.implicits._
    media(s, dir).as[MediaRow]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val n       = r.payload.length
          val nFrames = Math.floorDiv(n - 1, 64) + 1 // see x45 floorDiv note
          val joined = (0 until nFrames).filter(_ % 4 == 0).map { i =>
            md5Hex(md, java.util.Arrays.copyOfRange(r.payload, i * 64, math.min(i * 64 + 64, n)))
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
       |      FROM documents)
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
       |  FROM documents),
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

  val all: Seq[Q] = Seq(mmMetadata, mmFeatures, mmFrames, mmDedup, mmContrastivePairs)
}
