package graft

import graft.ops.{Multimodal, Wav}

/** Audio lane: the WAV codec must be a real RIFF parser (chunk walk,
  * pad bytes, fmt validation, little-endian plane), and the
  * decoded-sample queries must agree with the generator formula
  * computed independently — which only happens if encode → chunk-walk
  * → decode round-trips exactly.
  */
class WavSpec extends SparkTestBase {

  test("wav codec round-trips rate and samples, with and without junk") {
    val s = Array.tabulate(37)(i => ((i * 911 - 9000) % 32768).toShort)
    for (junk <- Seq(false, true)) {
      val a = Wav.decode(Wav.encode(12000, s, withJunk = junk))
      assert(a.sampleRate == 12000)
      assert(a.samples.toSeq == s.toSeq)
    }
  }

  test("wav decode walks unknown chunks and honors the RIFF pad byte") {
    // hand-build: RIFF [fmt ] [XTRA len=5 (odd, padded)] [data]
    val samples = Array[Short](100, -200, 300)
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + 5 + 1) + (8 + dataLen)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(t: String): Unit = buf.put(t.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffLen); tag("WAVE")
    tag("fmt "); buf.putInt(16)
    buf.putShort(1); buf.putShort(1); buf.putInt(8000)
    buf.putInt(16000); buf.putShort(2); buf.putShort(16)
    tag("XTRA"); buf.putInt(5); buf.put(new Array[Byte](5)); buf.put(0.toByte)
    tag("data"); buf.putInt(dataLen); samples.foreach(buf.putShort)
    val a = Wav.decode(buf.array())
    assert(a.sampleRate == 8000 && a.samples.toSeq == samples.toSeq)
    // drop the pad byte -> the walk lands mid-chunk and must fail loudly
    val broken = buf.array().clone()
    val noPad = broken.take(12 + 24 + 8 + 5) ++ broken.drop(12 + 24 + 8 + 6)
    intercept[IllegalArgumentException](Wav.decode(noPad))
  }

  test("wav decode fails loudly on malformed payloads") {
    val ok = Wav.encode(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](Wav.decode(ok.dropRight(1)))
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes ++ ok.drop(4)))
    // stereo fmt rejected
    val stereo = ok.clone()
    stereo(22) = 2 // channels field (little-endian short at offset 22)
    intercept[IllegalArgumentException](Wav.decode(stereo))
    // data before fmt rejected
    val buf = java.nio.ByteBuffer.allocate(8 + 4 + 8 + 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(4 + 8 + 2); buf.put("WAVE".getBytes)
    buf.put("data".getBytes); buf.putInt(2); buf.putShort(7)
    intercept[IllegalArgumentException](Wav.decode(buf.array()))
  }

  test("decimate takes every factor-th sample and divides the rate") {
    val a = Wav.Audio(12000, Array.tabulate(10)(i => i.toShort))
    val d = a.decimate(3)
    assert(d.sampleRate == 4000)
    assert(d.samples.toSeq == Seq[Short](0, 3, 6, 9))
  }

  test("decoded audio features equal the generator formula (round-trip proof)") {
    val got = Multimodal.qMmAudio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      val tb = text.getBytes("US-ASCII")
      val n = (120 + id % 200).toInt
      var sum = 0L; var sumAbs = 0L; var peak = 0L
      var i = 0
      while (i < n) {
        val v = (id * 37 + i.toLong * 13 + (tb(i % tb.length) & 0xff)) % 4001 - 2000
        sum += v; sumAbs += math.abs(v); peak = math.max(peak, math.abs(v))
        i += 1
      }
      val r = got(id)
      assert(r.getLong(1) == 8000 + (id % 3) * 4000, s"sr of doc $id")
      assert(r.getLong(2) == n.toLong, s"n of doc $id")
      assert(r.getLong(3) == sum, s"sum of doc $id")
      assert(r.getLong(4) == sumAbs, s"sumAbs of doc $id")
      assert(r.getLong(5) == peak, s"peak of doc $id")
    }
  }

  test("resampled audio matches stride-3 source samples") {
    val base = Multimodal.qMmAudio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc -> n
    val got = Multimodal.qMmAudioResample(spark, sfDir).collect()
    assert(got.nonEmpty && got.length == base.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val n = base(id)
      assert(r.getLong(2) == (n + 2) / 3, s"n_out of doc $id")
      assert(r.getLong(1) == (8000 + (id % 3) * 4000) / 3, s"sr_out of doc $id")
    }
  }
}
