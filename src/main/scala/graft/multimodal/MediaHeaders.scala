package graft.multimodal

/** Pure-JVM media header parsing — PNG, JPEG, GIF, WebP — by fixed-offset
  * byte arithmetic over the opaque `binary` column. No codec dependency:
  * this is exactly what a curation pipeline reads to filter by
  * resolution/format before paying for a real decode (the brief's
  * multimodal-columns ask; reference sibling is the batch boundary in
  * chroma_helpers.py:62-81 — metadata first, heavy decode later).
  *
  * Contract: NEVER throws. Garbage/empty bytes → ("unknown", -1, -1).
  * A recognized magic with a truncated/unparsable dimension region keeps
  * the format name but reports -1×-1 (honest partial knowledge — a
  * filter on format still works, a filter on resolution drops the row).
  *
  * Format facts used (all public specs):
  *  - PNG (RFC 2083): 8-byte signature 89 50 4E 47 0D 0A 1A 0A; first
  *    chunk must be IHDR (4-byte BE length = 13, type "IHDR" at 12..15),
  *    width = BE32 at 16, height = BE32 at 20.
  *  - JPEG (ITU T.81): SOI FF D8, then marker segments FF xx with BE16
  *    payload length (inclusive of the 2 length bytes); frame dimensions
  *    live in any SOFn marker (C0-C3, C5-C7, C9-CB, CD-CF — NOT C4/C8/CC
  *    which are DHT/JPG/DAC): payload = precision(1), height BE16,
  *    width BE16.
  *  - GIF (GIF87a/89a spec): 6-byte version magic, then the Logical
  *    Screen Descriptor: width LE16 at 6, height LE16 at 8.
  *  - WebP (RIFF container spec): "RIFF" + LE32 size + "WEBP", then one
  *    of three bitstream chunks at 12:
  *      VP8X: canvas = 24-bit LE (width-1) at 24, (height-1) at 27;
  *      "VP8 " (lossy): 3-byte frame tag at 20, start code 9D 01 2A at
  *        23, then 14-bit dims in LE16 at 26 (width) and 28 (height);
  *      VP8L (lossless): signature 2F at 20, then a LE32 bit-field at
  *        21: bits 0-13 = width-1, bits 14-27 = height-1.
  */
object MediaHeaders {

  /** (format, width, height); ("unknown", -1, -1) for unrecognized
    * bytes; recognized-format-but-unreadable-dims keeps the name with
    * -1×-1. Total function — never throws, any input. */
  def decodeHeader(b: Array[Byte]): (String, Int, Int) = {
    if (b == null || b.length < 4) ("unknown", -1, -1)
    else if (isPng(b)) decodePng(b)
    else if (isJpeg(b)) decodeJpeg(b)
    else if (isGif(b)) decodeGif(b)
    else if (isWebp(b)) decodeWebp(b)
    else ("unknown", -1, -1)
  }

  @inline private def u(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u(b, i) << 8) | u(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u(b, i).toLong << 24) | (u(b, i + 1) << 16) | (u(b, i + 2) << 8) | u(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u(b, i) | (u(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u(b, i) | (u(b, i + 1) << 8) | (u(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Long =
    u(b, i).toLong | (u(b, i + 1).toLong << 8) |
      (u(b, i + 2).toLong << 16) | (u(b, i + 3).toLong << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(k => u(b, i + k) == s.charAt(k).toInt)

  private val PngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && PngMagic.indices.forall(i => u(b, i) == PngMagic(i))
  private def decodePng(b: Array[Byte]): (String, Int, Int) = {
    // IHDR must be the first chunk; its 13-byte payload starts at 16.
    if (b.length >= 24 && be32(b, 8) == 13L && ascii(b, 12, "IHDR")) {
      val w = be32(b, 16); val h = be32(b, 20)
      // PNG dims are 31-bit positive; 0 or >2^31-1 is spec-invalid
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        ("png", w.toInt, h.toInt)
      else ("png", -1, -1)
    } else ("png", -1, -1)
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && u(b, 0) == 0xFF && u(b, 1) == 0xD8
  private def isSofMarker(m: Int): Boolean =
    (m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 && m != 0xCC
  private def decodeJpeg(b: Array[Byte]): (String, Int, Int) = {
    var i = 2
    while (i + 1 < b.length) {
      if (u(b, i) != 0xFF) return ("jpeg", -1, -1) // desynced stream
      // fill bytes: any number of FF may pad before a marker
      var j = i
      while (j + 1 < b.length && u(b, j + 1) == 0xFF) j += 1
      if (j + 1 >= b.length) return ("jpeg", -1, -1)
      val m = u(b, j + 1)
      if (isSofMarker(m)) {
        // payload: len(2) precision(1) height(2) width(2) ...
        if (j + 8 < b.length) {
          val h = be16(b, j + 5); val w = be16(b, j + 7)
          return if (w > 0 && h > 0) ("jpeg", w, h) else ("jpeg", -1, -1)
        } else return ("jpeg", -1, -1)
      } else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        i = j + 2 // standalone marker, no payload
      } else if (m == 0xD9 || m == 0xDA) {
        // EOI, or SOS before any SOF (nonstandard): dims unreadable
        return ("jpeg", -1, -1)
      } else {
        if (j + 3 >= b.length) return ("jpeg", -1, -1)
        val segLen = be16(b, j + 2)
        if (segLen < 2) return ("jpeg", -1, -1)
        i = j + 2 + segLen
      }
    }
    ("jpeg", -1, -1)
  }

  private def isGif(b: Array[Byte]): Boolean =
    ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")
  private def decodeGif(b: Array[Byte]): (String, Int, Int) =
    if (b.length >= 10) {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) ("gif", w, h) else ("gif", -1, -1)
    } else ("gif", -1, -1)

  private def isWebp(b: Array[Byte]): Boolean =
    b.length >= 12 && ascii(b, 0, "RIFF") && ascii(b, 8, "WEBP")
  private def decodeWebp(b: Array[Byte]): (String, Int, Int) = {
    if (b.length < 16) return ("webp", -1, -1)
    if (ascii(b, 12, "VP8X")) {
      if (b.length >= 30) {
        val w = le24(b, 24) + 1; val h = le24(b, 27) + 1
        ("webp", w, h)
      } else ("webp", -1, -1)
    } else if (ascii(b, 12, "VP8 ")) {
      // key-frame start code must follow the 3-byte frame tag
      if (b.length >= 30 && u(b, 23) == 0x9D && u(b, 24) == 0x01 &&
          u(b, 25) == 0x2A) {
        val w = le16(b, 26) & 0x3FFF; val h = le16(b, 28) & 0x3FFF
        if (w > 0 && h > 0) ("webp", w, h) else ("webp", -1, -1)
      } else ("webp", -1, -1)
    } else if (ascii(b, 12, "VP8L")) {
      if (b.length >= 25 && u(b, 20) == 0x2F) {
        val bits = le32(b, 21)
        val w = (bits & 0x3FFF).toInt + 1
        val h = ((bits >> 14) & 0x3FFF).toInt + 1
        ("webp", w, h)
      } else ("webp", -1, -1)
    } else ("webp", -1, -1)
  }

  // ---------------------------------------------------------------------
  // Header SYNTHESIS — spec-valid minimal files for the oracle-checked
  // queries and specs. The parser above is validated against REAL files
  // (CPython's imghdrdata 16×16 logo in all four formats + libxslt's
  // dimension-named GIFs) so the pair can't share a private wrong layout.
  // ---------------------------------------------------------------------

  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n; var k = 0
      while (k < 8) { c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1; k += 1 }
      t(n) = c; n += 1
    }
    t
  }
  private def crc32(b: Array[Byte], from: Int, until: Int): Long = {
    var c = 0xFFFFFFFF
    var i = from
    while (i < until) { c = crcTable((c ^ b(i)) & 0xFF) ^ (c >>> 8); i += 1 }
    (~c).toLong & 0xFFFFFFFFL
  }
  private def putBe32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }
  private def putLe16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
  }
  private def putLe24(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte; b(i + 2) = (v >>> 16).toByte
  }
  private def putLe32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >>> 8).toByte
    b(i + 2) = (v >>> 16).toByte; b(i + 3) = (v >>> 24).toByte
  }
  private def putAscii(b: Array[Byte], i: Int, s: String): Unit = {
    var k = 0
    while (k < s.length) { b(i + k) = s.charAt(k).toByte; k += 1 }
  }

  /** Fixed synthesized-header lengths per format/variant — the oracle's
    * n_bytes arithmetic depends on these being stable constants. */
  val PngHeaderLen = 33   // 8 magic + 4 len + 4 "IHDR" + 13 payload + 4 CRC
  val JpegHeaderLen = 17  // 2 SOI + 13 SOF0 segment + 2 EOI
  val GifHeaderLen = 13   // 6 magic + 7 logical screen descriptor
  val WebpVp8HeaderLen = 30   // 12 RIFF + 8 chunk hdr + 10 payload
  val WebpVp8xHeaderLen = 30  // 12 RIFF + 8 chunk hdr + 10 payload
  val WebpVp8lHeaderLen = 25  // 12 RIFF + 8 chunk hdr + 5 payload

  /** Minimal valid PNG prefix: signature + IHDR (8-bit RGBA, real CRC),
    * followed by `payload` (stands in for the IDAT/IEND body a real
    * encoder writes — the header parse never reads past IHDR). */
  def synthPng(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"png dims must be positive: ${w}x$h")
    val b = new Array[Byte](PngHeaderLen + payload.length)
    PngMagic.indices.foreach(i => b(i) = PngMagic(i).toByte)
    putBe32(b, 8, 13L)
    putAscii(b, 12, "IHDR")
    putBe32(b, 16, w.toLong); putBe32(b, 20, h.toLong)
    b(24) = 8; b(25) = 6; b(26) = 0; b(27) = 0; b(28) = 0
    putBe32(b, 29, crc32(b, 12, 29)) // CRC over type + payload
    System.arraycopy(payload, 0, b, PngHeaderLen, payload.length)
    b
  }

  /** Minimal valid JPEG: SOI + one SOF0 (8-bit, 1 component) + EOI, then
    * `payload` as trailing bytes (readers stop at EOI). */
  def synthJpeg(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF,
      s"jpeg dims must fit 16 bits: ${w}x$h")
    val b = new Array[Byte](JpegHeaderLen + payload.length)
    b(0) = 0xFF.toByte; b(1) = 0xD8.toByte      // SOI
    b(2) = 0xFF.toByte; b(3) = 0xC0.toByte      // SOF0
    b(4) = 0; b(5) = 11                          // segment length
    b(6) = 8                                     // precision
    b(7) = (h >>> 8).toByte; b(8) = h.toByte     // height BE16
    b(9) = (w >>> 8).toByte; b(10) = w.toByte    // width BE16
    b(11) = 1                                    // 1 component
    b(12) = 1; b(13) = 0x11; b(14) = 0           // comp id, 1x1, qtable 0
    b(15) = 0xFF.toByte; b(16) = 0xD9.toByte     // EOI
    System.arraycopy(payload, 0, b, JpegHeaderLen, payload.length)
    b
  }

  /** Minimal valid GIF89a prefix: version + logical screen descriptor
    * (no global color table), then `payload`. */
  def synthGif(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF,
      s"gif dims must fit 16 bits: ${w}x$h")
    val b = new Array[Byte](GifHeaderLen + payload.length)
    putAscii(b, 0, "GIF89a")
    putLe16(b, 6, w); putLe16(b, 8, h)
    b(10) = 0; b(11) = 0; b(12) = 0 // packed, bg index, aspect
    System.arraycopy(payload, 0, b, GifHeaderLen, payload.length)
    b
  }

  /** Minimal valid WebP in one of the three bitstream variants
    * ("vp8" lossy / "vp8l" lossless / "vp8x" extended). The RIFF size
    * field covers the payload so the container stays self-consistent. */
  def synthWebp(variant: String, w: Int, h: Int,
      payload: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"webp dims must be positive: ${w}x$h")
    variant match {
      case "vp8" =>
        require(w <= 0x3FFF && h <= 0x3FFF,
          s"vp8 dims must fit 14 bits: ${w}x$h")
        val b = new Array[Byte](WebpVp8HeaderLen + payload.length)
        riff(b, "VP8 ", 10 + payload.length)
        // 3-byte frame tag (key frame, version 0, show_frame): zeros are
        // a valid tag shape; the parser keys on the start code after it
        b(20) = 0; b(21) = 0; b(22) = 0
        b(23) = 0x9D.toByte; b(24) = 0x01; b(25) = 0x2A
        putLe16(b, 26, w); putLe16(b, 28, h)
        System.arraycopy(payload, 0, b, WebpVp8HeaderLen, payload.length)
        b
      case "vp8l" =>
        require(w <= 0x4000 && h <= 0x4000,
          s"vp8l dims must fit 14 bits + 1: ${w}x$h")
        val b = new Array[Byte](WebpVp8lHeaderLen + payload.length)
        riff(b, "VP8L", 5 + payload.length)
        b(20) = 0x2F
        putLe32(b, 21, ((w - 1).toLong & 0x3FFF) | (((h - 1).toLong & 0x3FFF) << 14))
        System.arraycopy(payload, 0, b, WebpVp8lHeaderLen, payload.length)
        b
      case "vp8x" =>
        require(w <= 0x1000000 && h <= 0x1000000,
          s"vp8x dims must fit 24 bits: ${w}x$h")
        val b = new Array[Byte](WebpVp8xHeaderLen + payload.length)
        riff(b, "VP8X", 10 + payload.length)
        b(20) = 0 // flags; 21..23 reserved zeros
        putLe24(b, 24, w - 1); putLe24(b, 27, h - 1)
        System.arraycopy(payload, 0, b, WebpVp8xHeaderLen, payload.length)
        b
      case other =>
        throw new IllegalArgumentException(s"unknown webp variant: $other")
    }
  }

  private def riff(b: Array[Byte], chunk: String, chunkLen: Int): Unit = {
    putAscii(b, 0, "RIFF")
    putLe32(b, 4, 4L + 8L + chunkLen) // "WEBP" + chunk header + payload
    putAscii(b, 8, "WEBP")
    putAscii(b, 12, chunk)
    putLe32(b, 16, chunkLen.toLong)
  }
}
