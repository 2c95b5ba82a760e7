package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** GIF89a decoder contracts (r13 — the 87a path is covered by the m12
  * round trips and corruption sweeps): extension blocks, Graphic
  * Control transparency, interlace row reordering, local color tables,
  * animated-file first-frame semantics. Fixtures are hand-built from
  * the 87a encoder's pieces (we control the LZW coder), and the
  * variants ImageIO can read are cross-validated against it. */
class GifSpec extends AnyFunSuite {
  import MultiModalOps.{gifDecodeOf, gifEncode, GrayPalette}

  private def px(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (i * 7 + 3) % 16)

  /** Rebuild an 87a fixture as 89a with extra parts: optional leading
    * extensions, interlace re-rowing, extra frames. Works on the known
    * gifEncode layout (13-byte header + 48-byte GCT + frame). */
  private def as89a(base: Array[Byte], pre: Array[Byte] = Array.emptyByteArray,
                    extraFrames: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ASCII"))
    out.write(base, 6, 7 + 48) // screen descriptor + GCT
    out.write(pre)
    val frame = java.util.Arrays.copyOfRange(base, 13 + 48, base.length - 1)
    out.write(frame)
    (0 until extraFrames).foreach(_ => out.write(frame))
    out.write(0x3B)
    out.toByteArray
  }

  test("GIF89a with comment + NETSCAPE + graphic-control extensions decodes like the 87a twin") {
    val (w, h) = (10, 6)
    val plain = gifEncode(w, h, GrayPalette, px(w, h))
    val ref = gifDecodeOf(plain)
    val gce = Array[Byte](0x21.toByte, 0xF9.toByte, 4, 0x00, 0, 0, 0, 0)
    val comment = Array[Byte](0x21.toByte, 0xFE.toByte, 5) ++
      "hello".getBytes("ASCII") ++ Array[Byte](0)
    val netscape = Array[Byte](0x21.toByte, 0xFF.toByte, 11) ++
      "NETSCAPE2.0".getBytes("ASCII") ++ Array[Byte](3, 1, 0, 0, 0)
    val v = gifDecodeOf(as89a(plain, comment ++ netscape ++ gce))
    assert(v.width == w && v.height == h && v.nFrames == 1)
    assert(java.util.Arrays.equals(v.indices, ref.indices))
    assert(java.util.Arrays.equals(v.palette, ref.palette))
    // ImageIO reads the decorated 89a file to the same pixels
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      as89a(plain, comment ++ netscape ++ gce)))
    for (y <- 0 until h; x <- 0 until w) {
      val idx = v.indices(y * w + x) & 0xff
      assert((bi.getRGB(x, y) & 0xff) == (v.palette(idx * 3 + 2) & 0xff),
        s"ImageIO blue at ($x,$y)")
    }
  }

  test("graphic-control TRANSPARENCY renders the flagged index white") {
    val (w, h) = (8, 4)
    val plain = gifEncode(w, h, GrayPalette, px(w, h))
    // transparency flag set, transparent index 5
    val gce = Array[Byte](0x21.toByte, 0xF9.toByte, 4, 0x01, 0, 0, 5, 0)
    val v = gifDecodeOf(as89a(plain, gce))
    val idx5 = (0 until w * h).filter(i => (v.indices(i) & 0xff) == 5)
    assert(idx5.nonEmpty, "fixture vacuous: index 5 never used")
    assert(v.palette(15) == -1 && v.palette(16) == -1 && v.palette(17) == -1,
      "transparent palette entry not white")
    // the other entries keep their gray values
    assert(v.palette(3 * 3) == GrayPalette(9))
  }

  test("animated GIF decodes its FIRST frame and reports the frame count") {
    val (w, h) = (6, 5)
    val plain = gifEncode(w, h, GrayPalette, px(w, h))
    val v = gifDecodeOf(as89a(plain, extraFrames = 2))
    assert(v.nFrames == 3, s"frames ${v.nFrames}")
    assert(java.util.Arrays.equals(v.indices, gifDecodeOf(plain).indices))
  }

  test("interlaced frames reorder rows to natural order") {
    val (w, h) = (5, 11) // odd height: all four passes ragged
    val pixels = px(w, h)
    // build the interlaced fixture: encode rows in pass order, set the
    // interlace flag in the image descriptor
    val starts = Array(0, 4, 2, 1); val steps = Array(8, 8, 4, 2)
    val passOrder = (0 until 4).flatMap(p =>
      Iterator.iterate(starts(p))(_ + steps(p)).takeWhile(_ < h))
    val reordered = passOrder.toArray.flatMap(y =>
      (0 until w).map(x => pixels(y * w + x)))
    val enc = gifEncode(w, h, GrayPalette, reordered)
    enc(6) = '9'.toByte // GIF89a (either magic decodes; exercise 89a)
    enc(13 + 48 + 9) = (enc(13 + 48 + 9) | 0x40).toByte // interlace flag
    val v = gifDecodeOf(enc)
    assert((0 until w * h).forall(i => (v.indices(i) & 0xff) == pixels(i)),
      "interlaced rows not re-ordered to natural order")
    // ImageIO reads the interlaced file to the same pixels
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    for (y <- 0 until h; x <- 0 until w)
      assert((bi.getRGB(x, y) & 0xff) ==
        (v.palette((v.indices(y * w + x) & 0xff) * 3 + 2) & 0xff),
        s"ImageIO interlaced at ($x,$y)")
  }

  test("a frame-local color table overrides the global one") {
    val (w, h) = (4, 3)
    val plain = gifEncode(w, h, GrayPalette, px(w, h))
    // rebuild frame with an LCT: flip the local-table flag and insert a
    // 16-entry REVERSED gray table after the descriptor
    val out = new java.io.ByteArrayOutputStream()
    out.write(plain, 0, 13 + 48) // header + (ignored) global table
    val frameAt = 13 + 48
    out.write(plain, frameAt, 9) // descriptor through packed-1
    out.write((plain(frameAt + 9) | 0x80 | 0x03)) // LCT present, 16 entries
    out.write(Array.tabulate(48)(b => ((15 - b / 3) * 17).toByte))
    out.write(plain, frameAt + 10, plain.length - (frameAt + 10))
    val v = gifDecodeOf(out.toByteArray)
    assert(v.palette(0) == (15 * 17).toByte && v.palette(45) == 0,
      "local color table not used")
    assert(java.util.Arrays.equals(v.indices, gifDecodeOf(plain).indices))
  }

  test("corrupt 89a block introducers and unterminated extensions fail by name") {
    val plain = gifEncode(6, 4, GrayPalette, px(6, 4))
    // unknown block introducer where a frame/extension/trailer must be
    val bad = as89a(plain)
    bad(13 + 48) = 0x7E
    val e = intercept[IllegalArgumentException](gifDecodeOf(bad))
    assert(e.getMessage.contains("block introducer"), e.getMessage)
    // an extension whose sub-blocks run off the file
    val cut = as89a(plain,
      Array[Byte](0x21.toByte, 0xFE.toByte, 60)).take(13 + 48 + 3 + 10)
    val e2 = intercept[IllegalArgumentException](gifDecodeOf(cut))
    assert(e2.getMessage.contains("corrupt GIF"), e2.getMessage)
  }
}
