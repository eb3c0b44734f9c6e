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

  val all: Seq[Q] = Seq(mmMetadata, mmFeatures)
}
