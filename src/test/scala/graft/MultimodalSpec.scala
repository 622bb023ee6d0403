package graft

import graft.multimodal.{MediaHeaders, Multimodal}

/** Header-parse correctness. The load-bearing design point: the parser is
  * validated against REAL image files with INDEPENDENT ground truth — not
  * just our own synthesizer — so a shared wrong offset/endianness in
  * synth+parse cannot survive:
  *   - CPython's `Lib/test/imghdrdata` logo (PSF-licensed public test
  *     data) ships the SAME image in png/jpg/gif/webp: all four parses
  *     must agree with each other (and equal its known 16×16).
  *   - libxslt's doc logo `Libxslt-Logo-90x34.gif` states its dimensions
  *     in the filename chosen by its authors (the 180-wide sibling's
  *     filename height is an upstream typo — its LSD bytes say 68 — so
  *     only its width is asserted).
  */
class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/media/$name")
    assert(in != null, s"missing test fixture /media/$name")
    try in.readAllBytes() finally in.close()
  }

  test("real fixtures: cross-format agreement + filename-stated dims") {
    val png = MediaHeaders.decodeHeader(fixture("python.png"))
    val jpg = MediaHeaders.decodeHeader(fixture("python.jpg"))
    val gif = MediaHeaders.decodeHeader(fixture("python.gif"))
    val webp = MediaHeaders.decodeHeader(fixture("python.webp"))
    assert(png._1 == "png" && jpg._1 == "jpeg" && gif._1 == "gif" &&
      webp._1 == "webp")
    // same source image in four formats: four independent encoders wrote
    // these headers, so agreement here validates all four offset layouts
    val dims = Seq(png, jpg, gif, webp).map(t => (t._2, t._3))
    assert(dims.distinct == Seq((16, 16)), s"dims disagree: $dims")
    assert(MediaHeaders.decodeHeader(fixture("Libxslt-Logo-90x34.gif")) ==
      ("gif", 90, 34))
    val wide = MediaHeaders.decodeHeader(fixture("Libxslt-Logo-180x168.gif"))
    assert(wide._1 == "gif" && wide._2 == 180)
  }

  test("synth → decode roundtrip across the dim range of every variant") {
    val payload = "body-bytes".getBytes("UTF-8")
    val dims = Seq((1, 1), (7, 3000), (640, 480), (16383, 1),
      (12000, 9000), (65535, 65535))
    for ((w, h) <- dims) {
      assert(MediaHeaders.decodeHeader(MediaHeaders.synthPng(w, h, payload))
        == ("png", w, h), s"png ${w}x$h")
      assert(MediaHeaders.decodeHeader(MediaHeaders.synthJpeg(w, h, payload))
        == ("jpeg", w, h), s"jpeg ${w}x$h")
      assert(MediaHeaders.decodeHeader(MediaHeaders.synthGif(w, h, payload))
        == ("gif", w, h), s"gif ${w}x$h")
      if (w <= 0x3FFF && h <= 0x3FFF) {
        assert(MediaHeaders.decodeHeader(
          MediaHeaders.synthWebp("vp8", w, h, payload)) == ("webp", w, h))
        assert(MediaHeaders.decodeHeader(
          MediaHeaders.synthWebp("vp8l", w, h, payload)) == ("webp", w, h))
      }
      assert(MediaHeaders.decodeHeader(
        MediaHeaders.synthWebp("vp8x", w, h, payload)) == ("webp", w, h))
    }
    // header-length constants the q46/q182 oracles hardcode
    val empty = Array.empty[Byte]
    assert(MediaHeaders.synthPng(2, 2, empty).length == MediaHeaders.PngHeaderLen)
    assert(MediaHeaders.synthJpeg(2, 2, empty).length == MediaHeaders.JpegHeaderLen)
    assert(MediaHeaders.synthGif(2, 2, empty).length == MediaHeaders.GifHeaderLen)
    assert(MediaHeaders.synthWebp("vp8", 2, 2, empty).length ==
      MediaHeaders.WebpVp8HeaderLen)
    assert(MediaHeaders.synthWebp("vp8l", 2, 2, empty).length ==
      MediaHeaders.WebpVp8lHeaderLen)
    assert(MediaHeaders.synthWebp("vp8x", 2, 2, empty).length ==
      MediaHeaders.WebpVp8xHeaderLen)
  }

  test("jpeg: SOF behind APP0/DQT/COM segments and RST/fill bytes") {
    // real encoders put APPn/DQT (+ comments) before SOFn — python.jpg
    // covers JFIF+DQT; this adds a COM segment, a fill byte, and SOF2
    // (progressive) to pin the general marker scan
    val com = "a comment".getBytes("UTF-8")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def bytes(xs: Int*): Unit = xs.foreach(x => buf += x.toByte)
    bytes(0xFF, 0xD8)                       // SOI
    bytes(0xFF, 0xFE, 0x00, com.length + 2) // COM
    buf ++= com
    bytes(0xFF, 0xFF, 0xC2)                 // fill byte, then SOF2
    bytes(0x00, 0x0B, 0x08)                 // len=11, precision 8
    bytes(0x01, 0x00)                       // height 256
    bytes(0x02, 0x80)                       // width 640
    bytes(0x01, 0x01, 0x11, 0x00)           // 1 component
    assert(MediaHeaders.decodeHeader(buf.toArray) == ("jpeg", 640, 256))
  }

  test("degrade, never throw: every truncation prefix + garbage bytes") {
    val payload = "xyz".getBytes("UTF-8")
    val full = Seq(
      MediaHeaders.synthPng(800, 600, payload),
      MediaHeaders.synthJpeg(800, 600, payload),
      MediaHeaders.synthGif(800, 600, payload),
      MediaHeaders.synthWebp("vp8", 800, 600, payload),
      MediaHeaders.synthWebp("vp8l", 800, 600, payload),
      MediaHeaders.synthWebp("vp8x", 800, 600, payload))
    for (f <- full; n <- 0 to f.length) {
      val (fmt, w, h) = MediaHeaders.decodeHeader(java.util.Arrays.copyOf(f, n))
      // a prefix may be too short to even name the format; once named,
      // dims are either unreadable (-1) or the true value — never junk
      assert(fmt == "unknown" || "png jpeg gif webp".contains(fmt))
      assert((w == -1 && h == -1) || (w == 800 && h == 600),
        s"prefix $n of ${f.length}: got ${w}x$h")
    }
    assert(MediaHeaders.decodeHeader(null) == ("unknown", -1, -1))
    assert(MediaHeaders.decodeHeader(Array.empty[Byte]) == ("unknown", -1, -1))
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val g = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(g)
      val (fmt, w, h) = MediaHeaders.decodeHeader(g) // must not throw
      assert(fmt.nonEmpty && w >= -1 && h >= -1)
    }
    // magic present, dimension region corrupt → format kept, dims -1
    val badPng = MediaHeaders.synthPng(1, 1, payload)
    badPng(12) = 'X'.toByte // not IHDR
    assert(MediaHeaders.decodeHeader(badPng) == ("png", -1, -1))
    val badVp8 = MediaHeaders.synthWebp("vp8", 9, 9, payload)
    badVp8(23) = 0 // start code broken
    assert(MediaHeaders.decodeHeader(badVp8) == ("webp", -1, -1))
  }

  test("extractMeta over a mixed batch: valid media + garbage coexist") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.BinaryDoc(1L, MediaHeaders.synthGif(320, 200, Array[Byte](9))),
      Multimodal.BinaryDoc(2L, "plain text, not media".getBytes("UTF-8")),
      Multimodal.BinaryDoc(3L, MediaHeaders.synthWebp("vp8x", 4096, 2160,
        Array.empty[Byte])))
    val out = Multimodal.extractMeta(spark.createDataset(rows))
      .collect().sortBy(_.doc_id)
    assert(out(0).format == "gif" && out(0).width == 320 && out(0).height == 200)
    assert(out(1).format == "unknown" && out(1).width == -1)
    assert(out(2).format == "webp" && out(2).width == 4096 && out(2).height == 2160)
  }
}
