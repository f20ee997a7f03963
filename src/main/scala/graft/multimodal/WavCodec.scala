package graft.multimodal

/** REAL audio codec for RIFF/WAV PCM-16 — like [[PpmCodec]], uncompressed
  * audio needs no media library, so the audio modality also carries real
  * bytes through the mapPartitions decode stage. Mono 16-bit little-endian
  * PCM: the 44-byte canonical header (RIFF + fmt + data chunks) followed
  * by samples.
  */
object WavCodec {

  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  def encode(a: WavAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * 2)          // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(bb.putShort)
    bb.array()
  }

  def decode(payload: Array[Byte]): WavAudio = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF file"); bb.getInt
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = 0
    var samples: Array[Short] = null
    while (samples == null && bb.remaining() >= 8) {
      val id = tag(); val len = bb.getInt
      id match {
        case "fmt " =>
          val fmt = bb.getShort; val ch = bb.getShort
          require(fmt == 1 && ch == 1, s"only mono PCM supported ($fmt/$ch)")
          sampleRate = bb.getInt
          bb.getInt; bb.getShort
          require(bb.getShort == 16, "only 16-bit supported")
          if (len > 16) bb.position(bb.position() + (len - 16))
        case "data" =>
          samples = Array.fill(len / 2)(bb.getShort)
        case _ => bb.position(bb.position() + len) // skip unknown chunk
      }
    }
    require(samples != null, "no data chunk")
    WavAudio(sampleRate, samples)
  }

  /** Exact stats an SQL oracle can replay: sample count, duration in
    * milliseconds (integer floor), peak absolute amplitude, and mean
    * SQUARED amplitude as an exact integer sum divided once (the rms
    * energy without the cross-engine sqrt). */
  def stats(a: WavAudio): (Long, Long, Long, Double) = {
    var sumSq = 0L
    var peak = 0L
    a.samples.foreach { s =>
      sumSq += s.toLong * s
      val abs = math.abs(s.toLong)
      if (abs > peak) peak = abs
    }
    val n = a.samples.length.toLong
    (n, n * 1000L / a.sampleRate, peak,
      if (n == 0) 0.0 else sumSq.toDouble / n)
  }
}
