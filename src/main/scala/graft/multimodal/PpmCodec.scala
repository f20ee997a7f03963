package graft.multimodal

/** REAL image codec for binary PPM (P6) — uncompressed RGB with a tiny
  * ASCII header, decodable in pure JVM code. The media libraries this
  * sandbox lacks are only needed for COMPRESSED formats; carrying one real
  * format end-to-end (encode → bytes → parse → pixel stats → resample)
  * keeps the multimodal pipeline honest: the mapPartitions decode stage
  * (`Multimodal.extractFeatures` shape) runs against actual image bytes,
  * not a checksum stub.
  *
  * Format (netpbm spec): "P6\n<width> <height>\n<maxval>\n" followed by
  * width·height·3 raw bytes, row-major, RGB interleaved (maxval 255). */
object PpmCodec {

  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  def encode(img: PpmImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  def decode(payload: Array[Byte]): PpmImage = {
    // header: magic, then 3 whitespace-separated ints; single whitespace
    // after maxval, then raw pixels
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "not a P6 ppm")
    var pos = 2
    def skipWs(): Unit = {
      while (pos < payload.length &&
        (payload(pos) == ' ' || payload(pos) == '\n' ||
          payload(pos) == '\t' || payload(pos) == '\r')) pos += 1
      // netpbm comments: '#' to end of line
      if (pos < payload.length && payload(pos) == '#') {
        while (pos < payload.length && payload(pos) != '\n') pos += 1
        skipWs()
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); pos += 1
      }
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval == 255, s"only maxval 255 supported, got $maxval")
    pos += 1 // exactly one whitespace byte before the raster
    require(payload.length - pos == w * h * 3,
      s"raster ${payload.length - pos} != $w x $h x 3")
    val px = new Array[Byte](w * h * 3)
    System.arraycopy(payload, pos, px, 0, px.length)
    PpmImage(w, h, px)
  }

  /** Exact per-channel means: integer byte sums divided once — the same
    * arithmetic an SQL oracle can replay. */
  def channelMeans(img: PpmImage): (Double, Double, Double) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    val n = img.width * img.height
    while (i < n) {
      r += img.pixels(3 * i) & 0xff
      g += img.pixels(3 * i + 1) & 0xff
      b += img.pixels(3 * i + 2) & 0xff
      i += 1
    }
    (r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** Nearest-neighbor resample — the real implementation of the
    * previously-stubbed resize: source pixel (x·w/w2, y·h/h2), floor. */
  def resizeNearest(img: PpmImage, w2: Int, h2: Int): PpmImage = {
    require(w2 > 0 && h2 > 0, "target dimensions must be positive")
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val s = 3 * (sy * img.width + sx)
        val t = 3 * (y * w2 + x)
        out(t) = img.pixels(s); out(t + 1) = img.pixels(s + 1); out(t + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(w2, h2, out)
  }
}
