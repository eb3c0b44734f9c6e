package graft.ops

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Real media-container codec over the fixture corpus — builds and parses
  * genuine PNG / JFIF-JPEG / RIFF-WAVE byte streams per the public specs
  * (PNG: ISO/IEC 15948 §5 signature + chunk layout, IHDR CRC-checked;
  * JPEG: ITU T.81 §B.2 marker segments + JFIF 1.02 APP0; WAVE: RIFF with
  * canonical 44-byte PCM header). The decode side SNIFFS the magic bytes —
  * it is never told the format — then walks the container structure to the
  * width/height/channel (or sample-rate) fields and the payload body.
  *
  * Scope, honestly stated: this is a HEADER codec. Dimensions, channel
  * count, sample rate, and body location are parsed from real container
  * bytes; the body itself is carried as an opaque stream (no zlib inflate /
  * DCT — pixel decode needs media libs this container doesn't ship).
  * That is exactly the metadata a corpus-curation pass reads, and the
  * fixture encoder writes containers any external tool can open.
  *
  * Fixture generation rule (encode side): image dims derive from the body
  * length — w = n%640+1, h = (n·7)%480+1 — PNG color type alternates RGB /
  * RGBA by doc parity, JPEG is 3-component YCbCr, WAV is 16 kHz mono PCM16.
  * The DuckDB oracles recompute these from `strlen(text)`, so a correctness
  * pass proves parse(encode(body)) recovers every field — a genuine
  * round-trip through real container bytes.
  */
object MediaCodec {

  /** Parsed container header + body locator. `w`/`h` are image dims for
    * png/jpg; for wav, `w` = sample rate and `h` = PCM sample count (the
    * natural "extent" analog a duration filter needs).
    */
  final case class Decoded(
      fmt: String, w: Int, h: Int, channels: Int, bodyOffset: Int, bodyLen: Int)

  /** Fixture dimension rule: dims from body length (+1 keeps them nonzero —
    * a 0-wide image is invalid in both specs).
    */
  def dimsFor(bodyLen: Int): (Int, Int) =
    (bodyLen % 640 + 1, ((bodyLen.toLong * 7) % 480).toInt + 1)

  // ------------------------------ encode ------------------------------

  def encode(fmt: String, docId: Long, body: Array[Byte]): Array[Byte] = fmt match {
    case "png" => encodePng(body, colorType = if (docId % 2 == 0) 2 else 6)
    case "jpg" => encodeJpeg(body)
    case "wav" => encodeWav(body)
    case other => throw new IllegalArgumentException(s"unknown media format: $other")
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t  = typ.getBytes("US-ASCII")
    val bb = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length).put(t).put(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** 8-byte signature + IHDR + one IDAT carrying the body + IEND.
    * Constant 57 bytes of container overhead (8 + 25 + 12 + 12).
    */
  def encodePng(body: Array[Byte], colorType: Int): Array[Byte] = {
    val (w, h) = dimsFor(body.length)
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(w).putInt(h)
      .put(8.toByte)              // bit depth
      .put(colorType.toByte)      // 2 = truecolor RGB, 6 = RGBA
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    PngSig ++ pngChunk("IHDR", ihdr.array()) ++ pngChunk("IDAT", body) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** SOI + JFIF APP0 + SOF0 (precision 8, HEIGHT then width — T.81 field
    * order) + SOS + body + EOI. Constant 55 bytes of overhead
    * (2 + 18 + 19 + 14 + 2) at the fixed 3 components.
    */
  def encodeJpeg(body: Array[Byte]): Array[Byte] = {
    val (w, h) = dimsFor(body.length)
    val bb = ByteBuffer.allocate(55 + body.length).order(ByteOrder.BIG_ENDIAN)
    bb.putShort(0xffd8.toShort)                             // SOI
    bb.putShort(0xffe0.toShort).putShort(16)                // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte)                          // version 1.1
      .put(0.toByte)                                        // density units
      .putShort(1).putShort(1)                              // x/y density
      .put(0.toByte).put(0.toByte)                          // no thumbnail
    bb.putShort(0xffc0.toShort).putShort(17)                // SOF0, len 8+3·3
      .put(8.toByte)                                        // precision
      .putShort(h.toShort).putShort(w.toShort)              // height FIRST
      .put(3.toByte)                                        // components
    for (c <- 1 to 3)                                       // id, sampling, q-table
      bb.put(c.toByte).put(0x11.toByte).put((if (c == 1) 0 else 1).toByte)
    bb.putShort(0xffda.toShort).putShort(12).put(3.toByte)  // SOS, len 6+2·3
    for (c <- 1 to 3) bb.put(c.toByte).put((if (c == 1) 0x00 else 0x11).toByte)
    bb.put(0.toByte).put(63.toByte).put(0.toByte)           // spectral sel/approx
    bb.put(body)
    bb.putShort(0xffd9.toShort)                             // EOI
    bb.array()
  }

  /** Canonical 44-byte RIFF/WAVE PCM header (little-endian): 16 kHz mono,
    * 16-bit — then the body as the data chunk.
    */
  def encodeWav(body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                                          // PCM
      .putShort(1)                                          // channels
      .putInt(16000)                                        // sample rate
      .putInt(32000)                                        // byte rate
      .putShort(2)                                          // block align
      .putShort(16)                                         // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  // ------------------------------ decode ------------------------------

  /** Sniff the magic bytes and parse the matching container. Malformed
    * input raises IllegalArgumentException with the failing structure named
    * — a curation pass routes those rows to a quarantine column, never a
    * crash-the-stage exception.
    */
  def decode(payload: Array[Byte]): Decoded = {
    require(payload.length >= 4, s"payload too short to sniff: ${payload.length} bytes")
    if (payload.take(8).sameElements(PngSig)) decodePng(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) decodeJpeg(payload)
    else if (payload.take(4).sameElements("RIFF".getBytes("US-ASCII"))) decodeWav(payload)
    else throw new IllegalArgumentException("unrecognized container magic")
  }

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
  private def be16(b: Array[Byte], p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  /** Chunk walk: IHDR (CRC-verified) for dims + color type → channels;
    * first IDAT is the body.
    */
  private def decodePng(b: Array[Byte]): Decoded = {
    var w = -1; var h = -1; var channels = -1
    var bodyOffset = -1; var bodyLen = -1
    var p = 8
    var done = false
    while (!done) {
      require(p + 8 <= b.length, "truncated PNG chunk header")
      val len = be32(b, p)
      val typ = new String(b, p + 4, 4, "US-ASCII")
      require(len >= 0 && p + 12 + len <= b.length, s"truncated PNG $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR must be 13 bytes, got $len")
          val crc = new CRC32
          crc.update(b, p + 4, 4 + len)
          require(crc.getValue.toInt == be32(b, p + 8 + len), "IHDR CRC mismatch")
          w = be32(b, p + 8); h = be32(b, p + 12)
          channels = (b(p + 17) & 0xff) match {
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
            case ct => throw new IllegalArgumentException(s"bad PNG color type $ct")
          }
        case "IDAT" if bodyOffset < 0 =>
          bodyOffset = p + 8; bodyLen = len
        case "IEND" => done = true
        case _      => ()
      }
      p += 12 + len
    }
    require(w > 0 && bodyOffset >= 0, "PNG missing IHDR or IDAT")
    Decoded("png", w, h, channels, bodyOffset, bodyLen)
  }

  /** Marker-segment walk to SOF0 (dims + component count) and SOS; the
    * entropy-coded stream between SOS and the trailing EOI is the body.
    */
  private def decodeJpeg(b: Array[Byte]): Decoded = {
    var w = -1; var h = -1; var channels = -1
    var p = 2
    while (true) {
      require(p + 4 <= b.length && (b(p) & 0xff) == 0xff, "bad JPEG marker")
      val marker = b(p + 1) & 0xff
      val len    = be16(b, p + 2)
      require(len >= 2 && p + 2 + len <= b.length, f"truncated JPEG segment ff$marker%02x")
      if (marker == 0xc0) {                       // SOF0: precision, H, W, ncomp
        h = be16(b, p + 5); w = be16(b, p + 7); channels = b(p + 9) & 0xff
      } else if (marker == 0xda) {                // SOS: body runs to EOI
        require(w > 0, "JPEG SOS before SOF0")
        val bodyOffset = p + 2 + len
        require(b.length >= bodyOffset + 2 &&
          (b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9,
          "JPEG missing trailing EOI")
        return Decoded("jpg", w, h, channels, bodyOffset, b.length - 2 - bodyOffset)
      }
      p += 2 + len
    }
    throw new IllegalStateException("unreachable")
  }

  /** RIFF chunk walk: `fmt ` for channels/sample-rate/block-align, `data`
    * for the body; `h` reports the PCM sample count (dataLen / blockAlign).
    */
  private def decodeWav(b: Array[Byte]): Decoded = {
    require(b.length >= 12 && new String(b, 8, 4, "US-ASCII") == "WAVE", "RIFF without WAVE")
    var channels = -1; var rate = -1; var blockAlign = -1
    var bodyOffset = -1; var bodyLen = -1
    var p = 12
    while (p + 8 <= b.length && (bodyOffset < 0 || channels < 0)) {
      val id  = new String(b, p, 4, "US-ASCII")
      val len = le32(b, p + 4)
      require(len >= 0 && p + 8 + len <= b.length, s"truncated RIFF chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          channels = le16(b, p + 10); rate = le32(b, p + 12); blockAlign = le16(b, p + 20)
        case "data" => bodyOffset = p + 8; bodyLen = len
        case _      => ()
      }
      p += 8 + len + (len & 1)                    // RIFF chunks are word-aligned
    }
    require(channels > 0 && bodyOffset >= 0, "WAVE missing fmt or data chunk")
    Decoded("wav", rate, bodyLen / blockAlign, channels, bodyOffset, bodyLen)
  }

  /** The decoded body as its own array (the frame-sampling input). */
  def body(payload: Array[Byte], d: Decoded): Array[Byte] =
    java.util.Arrays.copyOfRange(payload, d.bodyOffset, d.bodyOffset + d.bodyLen)
}
