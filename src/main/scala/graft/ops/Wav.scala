package graft.ops

/** RIFF/WAVE PCM codec — a REAL audio decoder in pure JVM code, no
  * native deps; the audio twin of [[Ppm]]. The container format is
  * RIFF (little-endian): `RIFF <size> WAVE`, then a sequence of
  * chunks `<id:4><len:4><payload:len>` each padded to an even byte
  * boundary. A PCM file carries a 16-byte `fmt ` chunk (audioFormat=1,
  * channels, sampleRate, byteRate, blockAlign, bitsPerSample) and a
  * `data` chunk of little-endian samples; real files interleave other
  * chunks (`LIST`, `JUNK`, `cue `) that a decoder must skip by walking
  * the chunk table, not by assuming the canonical 44-byte layout.
  *
  * This is the audio decode stage of the multimodal lane
  * ([[Multimodal]]): payloads are genuine encoded WAV files (some with
  * an odd-length junk chunk, exercising the RIFF pad rule), the
  * feature/resample queries compute over genuinely decoded samples,
  * and a parser bug — wrong endianness, mis-walked chunk, missed pad
  * byte — breaks their oracle hashes.
  */
object Wav {

  /** Encode mono 16-bit PCM as a RIFF/WAVE file. `withJunk` inserts an
    * odd-length `JUNK` chunk between `fmt ` and `data` (padded per the
    * RIFF word-alignment rule) so decoders are forced to walk chunks.
    */
  def encode(sampleRate: Int, samples: Array[Short],
    withJunk: Boolean = false): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val junkPayload = 3 // odd on purpose: the pad byte must be honored
    val junkLen = if (withJunk) 8 + junkPayload + 1 else 0
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + junkLen + (8 + dataLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit =
      buf.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    tag("RIFF"); buf.putInt(riffLen); tag("WAVE")
    tag("fmt "); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    if (withJunk) {
      tag("JUNK"); buf.putInt(junkPayload)
      buf.put(Array[Byte]('j', 'n', 'k')); buf.put(0.toByte) // pad
    }
    tag("data"); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decoded audio: sample rate + mono 16-bit samples. */
  final case class Audio(sampleRate: Int, samples: Array[Short]) {
    /** (sum, sum of |s|, max |s|) over the samples — exact, order-free. */
    def stats: (Long, Long, Long) = {
      var sum = 0L; var sumAbs = 0L; var peak = 0L
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toLong
        sum += v
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
        i += 1
      }
      (sum, sumAbs, peak)
    }

    /** Plain decimation by `factor` (every factor-th sample) — the
      * integer-exact resample stage; anti-alias filtering is a codec
      * concern layered on top, not part of the lane's oracle.
      */
    def decimate(factor: Int): Audio = {
      require(factor > 0, s"bad decimation factor $factor")
      val out = new Array[Short]((samples.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = samples(i * factor); i += 1 }
      Audio(sampleRate / factor, out)
    }
  }

  /** Decode a RIFF/WAVE payload (PCM, 16-bit, mono). Walks the chunk
    * table with even-byte padding; throws IllegalArgumentException on
    * anything malformed — a decoder that silently mis-reads is worse
    * than one that fails loudly.
    */
  def decode(payload: Array[Byte]): Audio = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad WAV: $msg")
    def tag(): String = {
      if (buf.remaining() < 4) fail("truncated tag")
      val b = new Array[Byte](4); buf.get(b)
      new String(b, java.nio.charset.StandardCharsets.US_ASCII)
    }
    if (tag() != "RIFF") fail("missing RIFF magic")
    val riffLen = buf.getInt
    if (riffLen < 4 || 8L + riffLen > payload.length) fail("bad RIFF size")
    if (tag() != "WAVE") fail("missing WAVE form type")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag()
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) fail(s"chunk $id overruns")
      id match {
        case "fmt " =>
          if (len < 16) fail("fmt chunk too short")
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort
          val channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          if (audioFormat != 1) fail(s"not PCM: format $audioFormat")
          if (channels != 1) fail(s"not mono: $channels channels")
          if (bits != 16) fail(s"not 16-bit: $bits")
          buf.position(fmtEnd)
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt")
          if (len % 2 != 0) fail("odd data length for 16-bit samples")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
        case _ =>
          buf.position(buf.position() + len)
      }
      // RIFF pads every odd-length chunk with one byte
      if (samples == null && len % 2 != 0) {
        if (buf.remaining() < 1) fail("missing pad byte")
        buf.get
      }
    }
    if (samples == null) fail("no data chunk")
    Audio(sampleRate, samples)
  }
}
