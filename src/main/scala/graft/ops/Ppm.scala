package graft.ops

/** Binary PPM (P6) codec — a REAL image decoder in pure JVM code, no
  * native deps. P6 is the netpbm raw-RGB format: an ASCII header
  * (`P6`, width, height, maxval — tokens separated by whitespace, with
  * `#`-to-end-of-line comments allowed anywhere between them), one
  * single whitespace byte, then `width*height*3` raw sample bytes.
  *
  * This is the decode stage of the multimodal lane ([[Multimodal]]):
  * payloads are genuine encoded images, the feature/resize queries run
  * over genuinely decoded pixels, and a parser bug (mis-read header,
  * off-by-one into the pixel plane) breaks their oracle hashes.
  */
object Ppm {

  /** Encode w×h RGB pixels (row-major, 3 bytes per pixel) as P6. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"bad pixel buffer: ${rgb.length} for ${w}x$h")
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decoded image: dimensions + raw RGB plane (row-major). */
  final case class Image(w: Int, h: Int, rgb: Array[Byte]) {
    /** Sample value of `channel` (0=R,1=G,2=B) at pixel (x, y), 0-255. */
    def sample(x: Int, y: Int, channel: Int): Int =
      rgb((y * w + x) * 3 + channel) & 0xff

    /** Nearest-neighbor resize — real pixel-space resampling: output
      * pixel (x, y) copies source pixel (x*w/tw, y*h/th) (floor).
      */
    def resize(tw: Int, th: Int): Image = {
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = y * h / th
        var x = 0
        while (x < tw) {
          val sx = x * w / tw
          val src = (sy * w + sx) * 3
          val dst = (y * tw + x) * 3
          out(dst) = rgb(src); out(dst + 1) = rgb(src + 1)
          out(dst + 2) = rgb(src + 2)
          x += 1
        }
        y += 1
      }
      Image(tw, th, out)
    }

    /** Per-channel integer pixel sums — exact, order-free. */
    def channelSums: (Long, Long, Long) = {
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < rgb.length) {
        r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
        i += 3
      }
      (r, g, b)
    }
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** Decode a P6 payload. Throws IllegalArgumentException on anything
    * malformed — a decoder that silently mis-reads is worse than one
    * that fails loudly.
    */
  def decode(payload: Array[Byte]): Image = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var moving = true
      while (moving && pos < payload.length) {
        if (isWs(payload(pos))) pos += 1
        else if (payload(pos) == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else moving = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < payload.length && !isWs(payload(pos)) &&
        payload(pos) != '#') pos += 1
      require(pos > start, s"truncated PPM header at byte $start")
      new String(payload, start, pos - start,
        java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    require(magic == "P6", s"not a raw PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxval == 255, s"unsupported maxval $maxval (8-bit only)")
    // exactly ONE whitespace byte separates maxval from the pixel plane
    // (a raster byte may itself look like whitespace — do not skip more)
    require(pos < payload.length && isWs(payload(pos)),
      "missing separator before pixel plane")
    pos += 1
    val n = w * h * 3
    require(payload.length - pos >= n,
      s"pixel plane truncated: need $n, have ${payload.length - pos}")
    Image(w, h, java.util.Arrays.copyOfRange(payload, pos, pos + n))
  }
}
