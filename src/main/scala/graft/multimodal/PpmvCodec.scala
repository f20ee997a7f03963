package graft.multimodal

import java.nio.ByteBuffer

/** Minimal REAL video container codec — "PPMV": a frame count followed by
  * length-prefixed P6 (PPM) frames. This is the video sibling of
  * [[PpmCodec]]/[[WavCodec]]: the container layout, frame indexing, and
  * per-frame pixel decode are all real JVM parsing (no image library
  * needed — P6 is pixel-exact by construction), so the Spark-side video
  * pipeline (binary column → frame sample → per-frame features) runs the
  * genuine decode path end-to-end and its stats can be replayed
  * arithmetically by the DuckDB oracle.
  *
  * Layout (big-endian):
  * {{{
  *   magic "PV01" | int32 nFrames | nFrames × (int32 len | len bytes P6)
  * }}}
  *
  * Frame-sampling reads ONLY the sampled frames' byte ranges — the length
  * prefixes let the decoder skip unsampled frames without parsing them,
  * which is the property a real frame-seekable container (MP4 stbl, MKV
  * cues) provides and a 100 TB frame-sampling job depends on. */
object PpmvCodec {

  final val Magic = Array[Byte]('P', 'V', '0', '1')

  def encode(frames: Seq[PpmCodec.PpmImage]): Array[Byte] = {
    val payloads = frames.map(PpmCodec.encode)
    val total = 8 + payloads.map(p => 4 + p.length).sum
    val bb = ByteBuffer.allocate(total)
    bb.put(Magic)
    bb.putInt(payloads.length)
    payloads.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  def frameCount(payload: Array[Byte]): Int = {
    require(payload.length >= 8 &&
      payload(0) == 'P' && payload(1) == 'V' &&
      payload(2) == '0' && payload(3) == '1', "not a PPMV payload")
    ByteBuffer.wrap(payload, 4, 4).getInt
  }

  /** Decode ONLY the frames whose index satisfies `take` — unsampled
    * frames are skipped via their length prefix, never parsed. */
  def decodeFrames(payload: Array[Byte],
                   take: Int => Boolean): Seq[(Int, PpmCodec.PpmImage)] = {
    val n = frameCount(payload)
    val out = Seq.newBuilder[(Int, PpmCodec.PpmImage)]
    var off = 8
    var i = 0
    while (i < n) {
      require(off + 4 <= payload.length,
        s"truncated PPMV payload: frame $i length prefix past end")
      val len = ByteBuffer.wrap(payload, off, 4).getInt
      off += 4
      require(len >= 0 && off + len <= payload.length,
        s"corrupt PPMV payload: frame $i declares $len bytes, " +
          s"${payload.length - off} remain")
      if (take(i)) {
        out += i -> PpmCodec.decode(
          java.util.Arrays.copyOfRange(payload, off, off + len))
      }
      off += len
      i += 1
    }
    out.result()
  }
}
