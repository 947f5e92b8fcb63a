package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.Row

/** Pure-JDK baseline-JPEG codec — the last multimodal seam (PNG and GIF
  * pixel decodes landed in round 7; reference parity target is a training
  * pipeline's image feature-extraction stage).
  *
  * Decoder: full baseline sequential DCT (SOF0/1) AND progressive DCT
  * (SOF2 — spectral selection + successive approximation, DC and AC
  * first/refinement passes, EOB runs, per T.81 G.2; web crawls are full
  * of progressive JPEGs), 8-bit, 1-3 components, per-component sampling
  * factors 1-2 (box chroma upsampling), multiple DQT/DHT segments,
  * restart markers, byte stuffing, separable double-precision IDCT,
  * BT.601 YCbCr→RGB. Anything else (arithmetic coding, hierarchical,
  * 12-bit, 4-component CMYK) — or any truncation the stream checks
  * catch — returns null: honest, never fabricated.
  *
  * Encoder (fixture-grade, the PNG/GIF pattern: the writer exists to
  * prove the reader): grayscale baseline with ALL-ONES quantization
  * tables and canonical fixed-length Huffman tables built
  * programmatically (12 DC categories at 4 bits, 162 AC symbols at
  * 9 bits — valid canonical codes with the all-ones codeword unused, as
  * T.81 requires). All-ones quantization makes block-CONSTANT images
  * survive the FDCT→quantize→IDCT round-trip bit-exactly (a constant
  * block is DC-only, and the DC coefficient 8·(v-128) is an integer that
  * unit quantization preserves), which is what lets a SQL oracle replay
  * decoded pixel stats as a closed form even though JPEG is lossy in
  * general.
  */
object Jpeg {

  /** Zigzag scan order: position k in the scan → raster index in the 8×8
    * block (ITU T.81 figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // =================== encoder ===================

  /** Encoder Huffman tables: canonical codes built from (lengths, values)
    * exactly like the decoder reads them from DHT — one code generator,
    * zero chance of asymmetry. DC: categories 0-11, all 4 bits
    * (12 ≤ 2⁴-1). AC: EOB, (run 0-15 × size 1-10), ZRL = 162 symbols,
    * all 9 bits (162 ≤ 2⁹-1). */
  private val DcBits: Array[Int] = { val b = new Array[Int](17); b(4) = 12; b }
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] = { val b = new Array[Int](17); b(9) = 162; b }
  private val AcVals: Array[Int] = {
    val vals = mutable.ArrayBuffer[Int](0x00) // EOB
    for (run <- 0 to 15; size <- 1 to 10) vals += ((run << 4) | size)
    vals.insert(vals.indexWhere(_ > 0xf0), 0xf0) // ZRL in ascending order
    vals.toArray
  }

  /** Canonical code assignment (T.81 C.2): symbols in listed order get
    * consecutive codes, shifting left at each length step. Returns
    * symbol → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = bits(len)
      while (n > 0) {
        out(vals(vi)) = (code, len)
        code += 1; vi += 1; n -= 1
      }
      code <<= 1
    }
    out.toMap
  }

  private lazy val DcCodes = canonicalCodes(DcBits, DcVals)
  private lazy val AcCodes = canonicalCodes(AcBits, AcVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Forward DCT (T.81 A.3.3), double precision, on a level-shifted
    * block; output rounded to int (unit quantization). */
  private def fdct(block: Array[Double]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) *
              math.cos((2 * x + 1) * u * math.Pi / 16) *
              math.cos((2 * y + 1) * v * math.Pi / 16)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        out(v * 8 + u) = math.round(0.25 * cu * cv * s).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  /** Encode an 8-bit GRAYSCALE baseline JPEG from a pixel function
    * (values clamped to 0-255). Edge blocks replicate the border pixel,
    * so block-constant images stay constant through padding. */
  def encode(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT, 8-bit table 0
    (0 until 64).foreach(_ => u8(1)) // all-ones: lossless for integer coefs
    marker(0xc0); u16(8 + 3) // SOF0, 1 component
    u8(8); u16(h); u16(w); u8(1)
    u8(1); u8(0x11); u8(0) // component 1, 1x1 sampling, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(cls << 4)
      (1 to 16).foreach(l => u8(bits(l)))
      vals.foreach(u8)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00) // SOS
    u8(0); u8(63); u8(0) // Ss, Se, AhAl

    val bw = new BitWriter(out)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var pred = 0
    val block = new Array[Double](64)
    var by = 0
    while (by < mcusY) {
      var bx = 0
      while (bx < mcusX) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val px = math.min(bx * 8 + x, w - 1)
            val py = math.min(by * 8 + y, h - 1)
            block(y * 8 + x) = math.max(0, math.min(255, pixel(px, py))) - 128.0
            x += 1
          }
          y += 1
        }
        val coef = fdct(block)
        // DC: category + amplitude bits of the prediction difference
        val diff = coef(0) - pred
        pred = coef(0)
        val s = bitSize(diff)
        val (dcCode, dcLen) = DcCodes(s)
        bw.put(dcCode, dcLen)
        if (s > 0) bw.put(if (diff < 0) diff - 1 + (1 << s) else diff, s)
        // AC: run-length of zeros in zigzag order
        var run = 0
        var k = 1
        var lastNz = 0
        while (k < 64) { if (coef(Zigzag(k)) != 0) lastNz = k; k += 1 }
        k = 1
        while (k <= lastNz) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = AcCodes(0xf0); bw.put(c, l); run -= 16 }
            val size = bitSize(v)
            val (c, l) = AcCodes((run << 4) | size)
            bw.put(c, l)
            bw.put(if (v < 0) v - 1 + (1 << size) else v, size)
            run = 0
          }
          k += 1
        }
        if (lastNz < 63) { val (c, l) = AcCodes(0x00); bw.put(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Deterministic fixture: a block-CONSTANT grayscale image whose value
    * per 8×8 block is a closed form of (blockX, blockY, id) —
    * `v = ((5·⌊x/8⌋ + 9·⌊y/8⌋ + 7·id) mod 200) + 28` — with
    * non-multiple-of-8 dimensions so MCU padding and cropping are
    * exercised. Unit quantization makes the decode EXACT, so the SQL
    * oracle replays the same closed form (`q_multimodal_jpeg`). */
  def fixture(id: Long): Array[Byte] = {
    val w = (8 * (2 + id % 3) - id % 5).toInt
    val h = (8 * (2 + id % 2) - id % 3).toInt
    encode(w, h, (x, y) => (((5L * (x / 8) + 9L * (y / 8) + 7L * id) % 200L) + 28L).toInt)
  }

  /** Progressive AC Huffman table: the baseline symbols PLUS the EOBn
    * run-length codes (r<<4 for r = 1..14) progressive AC scans need —
    * 176 symbols, all 9 bits, ascending (canonical, all-ones unused). */
  private val AcProgBits: Array[Int] = { val b = new Array[Int](17); b(9) = 176; b }
  private val AcProgVals: Array[Int] =
    (for (run <- 0 to 15; size <- 0 to 10) yield (run << 4) | size).toArray
  private lazy val AcProgCodes = canonicalCodes(AcProgBits, AcProgVals)

  /** Encode an 8-bit GRAYSCALE PROGRESSIVE JPEG (SOF2) with the scan
    * script DC-first(Al=1) → DC-refine(Al=0) → AC 1..63 (spectral
    * selection at Al=0, REAL pooled EOB runs — the code path every
    * web progressive file exercises). Same all-ones quantization as
    * [[encode]]: the DC point transform at Al=1 discards only bit 0,
    * which the refinement scan restores, so block-constant images
    * still decode bit-exactly and the closed-form oracle carries over
    * unchanged. */
  def encodeProgressive(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00)
    (0 until 64).foreach(_ => u8(1))
    marker(0xc2); u16(8 + 3) // SOF2, 1 component
    u8(8); u16(h); u16(w); u8(1)
    u8(1); u8(0x11); u8(0)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(cls << 4)
      (1 to 16).foreach(l => u8(bits(l)))
      vals.foreach(u8)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcProgBits, AcProgVals)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00)
      u8(ss); u8(se); u8((ah << 4) | al)
    }

    // all blocks' coefficients up front (natural order)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val blocks = new Array[Array[Int]](mcusX * mcusY)
    val buf = new Array[Double](64)
    var by = 0
    while (by < mcusY) {
      var bx = 0
      while (bx < mcusX) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val px = math.min(bx * 8 + x, w - 1)
            val py = math.min(by * 8 + y, h - 1)
            buf(y * 8 + x) = math.max(0, math.min(255, pixel(px, py))) - 128.0
            x += 1
          }
          y += 1
        }
        blocks(by * mcusX + bx) = fdct(buf)
        bx += 1
      }
      by += 1
    }

    // scan 1: DC first, point transform Al=1
    sos(0, 0, 0, 1)
    var bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { coef =>
      val v = coef(0) >> 1
      val diff = v - pred
      pred = v
      val s = bitSize(diff)
      val (c, l) = DcCodes(s)
      bw.put(c, l)
      if (s > 0) bw.put(if (diff < 0) diff - 1 + (1 << s) else diff, s)
    }
    bw.flush()

    // scan 2: DC refinement — bit 0, raw (no entropy coding)
    sos(0, 0, 1, 0)
    bw = new BitWriter(out)
    blocks.foreach(coef => bw.put(coef(0) & 1, 1))
    bw.flush()

    // scan 3: full AC band, first pass, pooled EOB runs
    sos(1, 63, 0, 0)
    bw = new BitWriter(out)
    var pendingEob = 0
    def flushEob(): Unit = if (pendingEob > 0) {
      val r = 31 - Integer.numberOfLeadingZeros(pendingEob) // floor log2
      val (c, l) = AcProgCodes(r << 4)
      bw.put(c, l)
      if (r > 0) bw.put(pendingEob - (1 << r), r)
      pendingEob = 0
    }
    blocks.foreach { coef =>
      var lastNz = 0
      var k = 1
      while (k < 64) { if (coef(Zigzag(k)) != 0) lastNz = k; k += 1 }
      if (lastNz == 0) {
        pendingEob += 1
        if (pendingEob == 32767) flushEob() // (1<<14) + max 14 bits
      } else {
        flushEob()
        var run = 0
        k = 1
        while (k <= lastNz) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              val (c, l) = AcProgCodes(0xf0); bw.put(c, l); run -= 16
            }
            val size = bitSize(v)
            val (c, l) = AcProgCodes((run << 4) | size)
            bw.put(c, l)
            bw.put(if (v < 0) v - 1 + (1 << size) else v, size)
            run = 0
          }
          k += 1
        }
        if (lastNz < 63) pendingEob = 1 // EOB for THIS block, poolable
      }
    }
    flushEob()
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** [[fixture]]'s progressive twin: the same block-constant closed form
    * and dimensions, encoded as SOF2 — `q_multimodal_jpeg_prog` shares
    * q_multimodal_jpeg's oracle by reference, and only a correct
    * multi-scan progressive decode reproduces it. */
  def fixtureProgressive(id: Long): Array[Byte] = {
    val w = (8 * (2 + id % 3) - id % 5).toInt
    val h = (8 * (2 + id % 2) - id % 3).toInt
    encodeProgressive(w, h,
      (x, y) => (((5L * (x / 8) + 9L * (y / 8) + 7L * id) % 200L) + 28L).toInt)
  }

  // =================== decoder ===================

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3 decode tables: per length, smallest/largest code and
    // index of the first value
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var vi = 0
      for (len <- 1 to 16) {
        if (bits(len) > 0) {
          valPtr(len) = vi
          minCode(len) = code
          code += bits(len); vi += bits(len)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var len = 1
      while (len <= 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | br.bit()
        len += 1
      }
      if (len > 16) throw new IllegalArgumentException("bad huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def align(): Unit = { acc = 0; nBits = 0 }
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("truncated stream")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          if (next == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException("marker inside entropy data")
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Inverse DCT (T.81 A.3.3), double precision, into an int block with
    * level shift and clamp. */
  private def idct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coef(v * 8 + u)
            if (c != 0) {
              val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
              val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
              s += cu * cv * c *
                math.cos((2 * x + 1) * u * math.Pi / 16) *
                math.cos((2 * y + 1) * v * math.Pi / 16)
            }
            v += 1
          }
          u += 1
        }
        val px = math.round(0.25 * s + 128.0).toInt
        out(y * 8 + x) = math.max(0, math.min(255, px))
        x += 1
      }
      y += 1
    }
    out
  }

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, qId: Int) {
    var frameIx: Int = 0 // position in the frame's component list
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0
    var plane: Array[Int] = _
    var planeW: Int = 0
    var planeH: Int = 0
  }

  /** Decode a baseline JPEG payload into the [[Multimodal.PixelSchema]]
    * stats row (width, height, channels, n_px, per-channel sum/min/max),
    * or null for anything outside the supported envelope. */
  def decodePixels(payload: Array[Byte]): Row = {
    if (payload == null || payload.length < 4) return null
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return null
    try {
      val (w, h, comps, maxH, maxV) = decodeCore(payload)
      statsRow(w, h, comps, maxH, maxV)
    } catch { case _: Exception => null }
  }

  /** Decode to the GRAYSCALE pixel grid (the Y plane — luma needs no
    * color convert for YCbCr JPEGs; single-component images are already
    * gray), cropped to (w, h) row-major — the perceptual-hash input.
    * Null outside the decode envelope, like [[decodePixels]]. */
  def decodeGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    if (payload == null || payload.length < 4) return null
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return null
    try {
      val (w, h, comps, maxH, maxV) = decodeCore(payload)
      val c = comps(0)
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) =
            c.plane((y * c.vSamp / maxV) * c.planeW + (x * c.hSamp / maxH))
          x += 1
        }
        y += 1
      }
      (w, h, out)
    } catch { case _: Exception => null }
  }

  private def decodeCore(
      data: Array[Byte]): (Int, Int, Array[Component], Int, Int) = {
    def u8(i: Int): Int = data(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val quant = mutable.Map.empty[Int, Array[Int]] // id -> 64 values (zigzag order)
    val dcTables = mutable.Map.empty[Int, HuffTable]
    val acTables = mutable.Map.empty[Int, HuffTable]
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    var prog: ProgState = null // allocated at the first progressive SOS

    var i = 2
    while (i + 2 <= data.length) {
      if (u8(i) != 0xff) throw new IllegalArgumentException("lost marker sync")
      // legal encoders may pad with 0xFF fill bytes between segments
      // (ITU T.81 B.1.1.2) — skip them before reading the marker id
      while (i + 2 <= data.length && u8(i + 1) == 0xff) i += 1
      if (i + 2 > data.length)
        throw new IllegalArgumentException("truncated after fill bytes")
      val m = u8(i + 1)
      if (m == 0xd9) { // EOI: progressive images finish here
        if (prog == null)
          throw new IllegalArgumentException("EOI before any scan")
        finishProgressive(comps, quant.toMap, prog)
        return (w, h, comps, prog.maxH, prog.maxV)
      }
      // length-less markers (TEM 0x01, stray RSTn 0xD0-0xD7) carry no
      // 2-byte length — reading u16(i+2) would misparse the next marker
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (i + 4 > data.length) {
        throw new IllegalArgumentException("truncated marker segment")
      } else {
      val len = u16(i + 2)
      val seg = i + 4
      var nextI = i + 2 + len
      m match {
        case 0xdb => // DQT: one or more tables
          var p = seg
          while (p < seg + len - 2) {
            val pq = u8(p) >> 4; val tq = u8(p) & 0x0f
            val tbl = new Array[Int](64)
            var k = 0
            if (pq == 0) { while (k < 64) { tbl(k) = u8(p + 1 + k); k += 1 }; p += 65 }
            else { while (k < 64) { tbl(k) = u16(p + 1 + 2 * k); k += 1 }; p += 129 }
            quant(tq) = tbl
          }
        case 0xc4 => // DHT: one or more tables
          var p = seg
          while (p < seg + len - 2) {
            val tc = u8(p) >> 4; val th = u8(p) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            (1 to 16).foreach { l => bits(l) = u8(p + l); total += bits(l) }
            val vals = new Array[Int](total)
            (0 until total).foreach(k => vals(k) = u8(p + 17 + k))
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + total
          }
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline, SOF2 progressive
          progressive = m == 0xc2
          if (u8(seg) != 8) throw new IllegalArgumentException("only 8-bit")
          h = u16(seg + 1); w = u16(seg + 3)
          // sanity-cap BEFORE any plane allocation: a corrupt/hostile SOF
          // can declare 65535×65535 and an OutOfMemoryError is NOT caught
          // by decodePixels' Exception guard — reject, don't allocate
          if (w < 1 || h < 1 || w.toLong * h > (1L << 24))
            throw new IllegalArgumentException(s"implausible dimensions ${w}x$h")
          val n = u8(seg + 5)
          if (n != 1 && n != 3) throw new IllegalArgumentException("1 or 3 components")
          comps = (0 until n).map { c =>
            val base = seg + 6 + 3 * c
            val hs = u8(base + 1) >> 4; val vs = u8(base + 1) & 0x0f
            if (hs < 1 || hs > 2 || vs < 1 || vs > 2)
              throw new IllegalArgumentException("sampling 1-2 only")
            val comp = Component(u8(base), hs, vs, u8(base + 2))
            comp.frameIx = c
            comp
          }.toArray
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          throw new IllegalArgumentException("unsupported SOF")
        case 0xdd => restartInterval = u16(seg)
        case 0xda => // SOS
          if (comps == null) throw new IllegalArgumentException("SOS before SOF")
          val ns = u8(seg)
          val scanComps = (0 until ns).map { c =>
            val cid = u8(seg + 1 + 2 * c)
            val comp = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException("unknown component in scan"))
            comp.dcTable = u8(seg + 2 + 2 * c) >> 4
            comp.acTable = u8(seg + 2 + 2 * c) & 0x0f
            comp
          }.toArray
          if (!progressive) {
            if (ns != comps.length)
              throw new IllegalArgumentException("partial scan")
            val (maxH, maxV) = scan(data, i + 4 + len - 2, w, h, comps,
              quant.toMap, dcTables.toMap, acTables.toMap, restartInterval)
            return (w, h, comps, maxH, maxV)
          } else {
            val ss = u8(seg + 1 + 2 * ns)
            val se = u8(seg + 2 + 2 * ns)
            val ahal = u8(seg + 3 + 2 * ns)
            if (prog == null) prog = ProgState.alloc(w, h, comps)
            nextI = progressiveScan(data, i + 4 + len - 2, scanComps, prog,
              ss, se, ahal >> 4, ahal & 0x0f,
              dcTables.toMap, acTables.toMap, restartInterval)
          }
        case _ => // APPn / COM / others: skip
      }
      i = nextI
      }
    }
    throw new IllegalArgumentException("no scan found")
  }

  /** Progressive-decode state: per component, the full MCU-padded block
    * grid of UNDEQUANTIZED coefficients in ZIGZAG index order (block at
    * (bx, by) occupies indices (by·blocksW + bx)·64 .. +63), accumulated
    * across scans. */
  private final class ProgState(
      val mcusX: Int, val mcusY: Int, val maxH: Int, val maxV: Int,
      val blocksW: Array[Int], val blocksH: Array[Int], // full padded grid
      val compBlocksW: Array[Int], val compBlocksH: Array[Int], // ceil dims
      val coefs: Array[Array[Int]])

  private object ProgState {
    def alloc(w: Int, h: Int, comps: Array[Component]): ProgState = {
      val maxH = comps.map(_.hSamp).max
      val maxV = comps.map(_.vSamp).max
      val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
      val bw = comps.map(c => mcusX * c.hSamp)
      val bh = comps.map(c => mcusY * c.vSamp)
      // non-interleaved scans walk the component's OWN ceil-dims grid
      val cbw = comps.map(c => ((w * c.hSamp + maxH - 1) / maxH + 7) / 8)
      val cbh = comps.map(c => ((h * c.vSamp + maxV - 1) / maxV + 7) / 8)
      new ProgState(mcusX, mcusY, maxH, maxV, bw, bh, cbw, cbh,
        comps.indices.map(ci => new Array[Int](bw(ci) * bh(ci) * 64)).toArray)
    }
  }

  /** Decode ONE progressive scan (T.81 G.2) into the coefficient store;
    * returns the offset of the next marker after the entropy data. */
  private def progressiveScan(
      data: Array[Byte], start: Int, scanComps: Array[Component],
      st: ProgState, ss: Int, se: Int, ah: Int, al: Int,
      dcTables: Map[Int, HuffTable], acTables: Map[Int, HuffTable],
      restartInterval: Int): Int = {
    var br = new BitReader(data, start)
    var eobrun = 0
    scanComps.foreach(_.pred = 0)

    def restartIfDue(mcu: Int): Unit =
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.align()
        var p = br.pos
        while (p + 1 < data.length && ((data(p) & 0xff) != 0xff ||
          ((data(p + 1) & 0xff) & 0xf8) != 0xd0)) p += 1
        if (p + 1 >= data.length)
          throw new IllegalArgumentException("missing RST")
        br = new BitReader(data, p + 2)
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }

    def dcFirst(coefs: Array[Int], base: Int, c: Component): Unit = {
      val t = dcTables.getOrElse(c.dcTable,
        throw new IllegalArgumentException("missing DC table"))
      val s = t.decode(br)
      val diff = extend(br.receive(s), s)
      c.pred += diff
      coefs(base) = c.pred << al
    }
    def dcRefine(coefs: Array[Int], base: Int): Unit =
      if (br.bit() != 0) coefs(base) |= (1 << al)

    def acFirst(coefs: Array[Int], base: Int, t: HuffTable): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = t.decode(br)
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r < 15) {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.receive(r)
            k = se + 1 // EOB: band done
          } else k += 16 // ZRL
        } else {
          k += r
          if (k > se) throw new IllegalArgumentException("AC overflow")
          coefs(base + k) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }

    def acRefine(coefs: Array[Int], base: Int, t: HuffTable): Unit = {
      // T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine control flow
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(ix: Int): Unit =
        if (br.bit() != 0 && (coefs(ix) & p1) == 0)
          coefs(ix) += (if (coefs(ix) >= 0) p1 else m1)
      var k = ss
      if (eobrun == 0) {
        var break = false
        while (k <= se && !break) {
          val rs = t.decode(br)
          var r = rs >> 4; val s = rs & 0x0f
          var newVal = 0
          if (s == 0) {
            if (r < 15) { // EOB run begins; rest of band gets corrections
              eobrun = 1 << r
              if (r > 0) eobrun += br.receive(r)
              break = true
            } // r == 15: ZRL — skip 16 zero-history coefs
          } else {
            if (s != 1)
              throw new IllegalArgumentException("bad refinement size")
            newVal = if (br.bit() != 0) p1 else m1
          }
          if (!break) {
            var placed = false
            while (!placed && k <= se) {
              val ix = base + k
              if (coefs(ix) != 0) correct(ix)
              else if (r == 0) {
                if (s != 0) coefs(ix) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) { // EOB run covers the rest of this band
        while (k <= se) {
          val ix = base + k
          if (coefs(ix) != 0) correct(ix)
          k += 1
        }
        eobrun -= 1
      }
    }

    if (ss == 0) {
      // DC scan (first or refinement); interleaved when ns > 1
      if (scanComps.length > 1) {
        var mcu = 0
        var my = 0
        while (my < st.mcusY) {
          var mx = 0
          while (mx < st.mcusX) {
            restartIfDue(mcu)
            scanComps.foreach { c =>
              val ci = c.frameIx
              var v = 0
              while (v < c.vSamp) {
                var hh = 0
                while (hh < c.hSamp) {
                  val bx = mx * c.hSamp + hh
                  val by = my * c.vSamp + v
                  val base = (by * st.blocksW(ci) + bx) * 64
                  if (ah == 0) dcFirst(st.coefs(ci), base, c)
                  else dcRefine(st.coefs(ci), base)
                  hh += 1
                }
                v += 1
              }
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val c = scanComps(0)
        val ci = c.frameIx
        var mcu = 0
        var by = 0
        while (by < st.compBlocksH(ci)) {
          var bx = 0
          while (bx < st.compBlocksW(ci)) {
            restartIfDue(mcu)
            val base = (by * st.blocksW(ci) + bx) * 64
            if (ah == 0) dcFirst(st.coefs(ci), base, c)
            else dcRefine(st.coefs(ci), base)
            mcu += 1
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // AC scan: T.81 requires exactly one component, non-interleaved
      if (scanComps.length != 1)
        throw new IllegalArgumentException("interleaved AC scan")
      val c = scanComps(0)
      val ci = c.frameIx
      val t = acTables.getOrElse(c.acTable,
        throw new IllegalArgumentException("missing AC table"))
      var mcu = 0
      var by = 0
      while (by < st.compBlocksH(ci)) {
        var bx = 0
        while (bx < st.compBlocksW(ci)) {
          restartIfDue(mcu)
          val base = (by * st.blocksW(ci) + bx) * 64
          if (ah == 0) acFirst(st.coefs(ci), base, t)
          else acRefine(st.coefs(ci), base, t)
          mcu += 1
          bx += 1
        }
        by += 1
      }
    }

    // entropy data ends here; skip padding/stuffing/RST to the next marker
    var p = br.pos
    while (p + 1 < data.length && ((data(p) & 0xff) != 0xff ||
      (data(p + 1) & 0xff) == 0x00 ||
      ((data(p + 1) & 0xff) & 0xf8) == 0xd0)) p += 1
    if (p + 1 >= data.length)
      throw new IllegalArgumentException("truncated after scan")
    p
  }

  /** Dequantize + IDCT every accumulated block into component planes,
    * then the shared crop/upsample/stats tail. */
  private def finishProgressive(
      comps: Array[Component],
      quant: Map[Int, Array[Int]], st: ProgState): Unit = {
    val nat = new Array[Int](64)
    comps.zipWithIndex.foreach { case (c, ci) =>
      c.planeW = st.blocksW(ci) * 8
      c.planeH = st.blocksH(ci) * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      val q = quant.getOrElse(c.qId,
        throw new IllegalArgumentException("missing quant table"))
      val coefs = st.coefs(ci)
      var by = 0
      while (by < st.blocksH(ci)) {
        var bx = 0
        while (bx < st.blocksW(ci)) {
          val base = (by * st.blocksW(ci) + bx) * 64
          var k = 0
          while (k < 64) { nat(Zigzag(k)) = coefs(base + k) * q(k); k += 1 }
          val px = idct(nat)
          val ox = bx * 8
          val oy = by * 8
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              c.plane((oy + yy) * c.planeW + (ox + xx)) = px(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
    }
  }

  private def scan(
      data: Array[Byte], start: Int, w: Int, h: Int, comps: Array[Component],
      quant: Map[Int, Array[Int]], dcTables: Map[Int, HuffTable],
      acTables: Map[Int, HuffTable], restartInterval: Int): (Int, Int) = {
    val maxH = comps.map(_.hSamp).max
    val maxV = comps.map(_.vSamp).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.hSamp
      c.planeH = mcusY * 8 * c.vSamp
      c.plane = new Array[Int](c.planeW * c.planeH)
      c.pred = 0
    }
    var br = new BitReader(data, start)
    val coef = new Array[Int](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align, consume RSTn, reset DC predictions
          br.align()
          var p = br.pos
          while (p + 1 < data.length && ((data(p) & 0xff) != 0xff ||
            ((data(p + 1) & 0xff) & 0xf8) != 0xd0)) p += 1
          if (p + 1 >= data.length) throw new IllegalArgumentException("missing RST")
          br = new BitReader(data, p + 2)
          comps.foreach(_.pred = 0)
        }
        comps.foreach { c =>
          val q = quant.getOrElse(c.qId,
            throw new IllegalArgumentException("missing quant table"))
          val dcT = dcTables.getOrElse(c.dcTable,
            throw new IllegalArgumentException("missing DC table"))
          val acT = acTables.getOrElse(c.acTable,
            throw new IllegalArgumentException("missing AC table"))
          var v = 0
          while (v < c.vSamp) {
            var hh = 0
            while (hh < c.hSamp) {
              java.util.Arrays.fill(coef, 0)
              val s = dcT.decode(br)
              val diff = extend(br.receive(s), s)
              c.pred += diff
              coef(0) = c.pred * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = acT.decode(br)
                val r = rs >> 4; val sz = rs & 0x0f
                if (sz == 0) { if (r == 15) k += 16 else eob = true }
                else {
                  k += r
                  if (k > 63) throw new IllegalArgumentException("AC overflow")
                  coef(Zigzag(k)) = extend(br.receive(sz), sz) * q(k)
                  k += 1
                }
              }
              val px = idct(coef)
              val ox = (mx * c.hSamp + hh) * 8
              val oy = (my * c.vSamp + v) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  c.plane((oy + yy) * c.planeW + (ox + xx)) = px(yy * 8 + xx)
                  xx += 1
                }
                yy += 1
              }
              hh += 1
            }
            v += 1
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    (maxH, maxV)
  }

  /** Crop + upsample + color-convert the decoded component planes into
    * the per-channel stats row (shared by the baseline and progressive
    * paths). */
  private def statsRow(
      w: Int, h: Int, comps: Array[Component], maxH: Int, maxV: Int): Row = {
    val channels = comps.length
    val sums = new Array[Long](channels)
    val mins = Array.fill(channels)(Long.MaxValue)
    val maxs = Array.fill(channels)(Long.MinValue)
    def sample(c: Component, x: Int, y: Int): Int =
      c.plane((y * c.vSamp / maxV) * c.planeW + (x * c.hSamp / maxH))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (channels == 1) {
          val v = sample(comps(0), x, y).toLong
          sums(0) += v
          if (v < mins(0)) mins(0) = v
          if (v > maxs(0)) maxs(0) = v
        } else {
          val yv = sample(comps(0), x, y)
          val cb = sample(comps(1), x, y) - 128
          val cr = sample(comps(2), x, y) - 128
          val rgb = Array(
            math.round(yv + 1.402 * cr),
            math.round(yv - 0.344136 * cb - 0.714136 * cr),
            math.round(yv + 1.772 * cb))
          var c = 0
          while (c < 3) {
            val v = math.max(0L, math.min(255L, rgb(c)))
            sums(c) += v
            if (v < mins(c)) mins(c) = v
            if (v > maxs(c)) maxs(c) = v
            c += 1
          }
        }
        x += 1
      }
      y += 1
    }
    Row(w, h, channels, w.toLong * h,
      sums.toSeq, mins.toSeq, maxs.toSeq)
  }
}
