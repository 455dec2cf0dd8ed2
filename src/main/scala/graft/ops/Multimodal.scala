package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with a feature-extraction stage over `mapPartitions`.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic STUB (see [[FakeDecoder]]); everything
  * Spark-side — binary columns in parquet, metadata structs, batch shape,
  * per-partition extraction, schema of the feature output — is real. A
  * production decoder (JNI/ONNX/whatever) replaces ONE function body
  * without touching the pipeline.
  *
  * Scale: binary payloads ride the same columnar scan as everything else;
  * feature extraction is mapPartitions (no shuffle), so it parallelizes
  * per input split, and the feature table writes back partitioned by the
  * metadata columns for pruning.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
    lang: String, n_chars: Long)
  final case class MediaFeatures(doc_id: Long, byte_len: Long,
    byte_sum_mod: Long, head_hex: String, feat: Array[Float])

  /** documents → (doc_id, payload BINARY, meta struct). In production the
    * payload column would hold encoded image/audio bytes read from parquet;
    * here the utf-8 text bytes stand in, exercising the identical plumbing.
    */
  def binarize(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(col("lang"), col("n_chars"), col("source")).as("meta"))
  }

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio) and emit model features. This fake derives
    * deterministic pseudo-features from the raw bytes so the pipeline is
    * testable end-to-end. Replace the body, keep the signature.
    */
  object FakeDecoder {
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      // ??? <- real decode (e.g. JPEG -> pixels -> CNN features) goes here
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** STUB resize: deterministic down-sample of the payload to `target`
      * bytes by striding (a real implementation resizes decoded pixels;
      * the batch shape — bounded output per row regardless of input
      * size — is what matters to the pipeline).
      */
    def resize(payload: Array[Byte], target: Int = 64): Array[Byte] = {
      if (payload.length <= target) payload
      else {
        val stride = payload.length.toDouble / target
        Array.tabulate(target)(i => payload((i * stride).toInt))
      }
    }
  }

  /** Per-partition feature extraction over the binary payloads — the
    * mapPartitions batch shape a GPU/codec UDF would use (amortized
    * per-partition init, streaming iterator, no per-row setup).
    */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    binarize(spark, dir)
      .select(col("doc_id"), col("payload"),
        col("meta.lang").as("lang"), col("meta.n_chars").as("n_chars"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init of the (stub) decoder happens once here
        rows.map { r =>
          val f = FakeDecoder.features(r.payload)
          val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
          MediaFeatures(r.doc_id, r.payload.length.toLong, sum % 997,
            r.payload.take(4).map(b => f"${b & 0xff}%02x").mkString, f)
        }
      }
  }

  /** Oracle-checkable metadata slice of the multimodal pipeline: byte
    * lengths, first byte, payload digest — everything DuckDB can compute
    * on the same bytes.
    */
  def qMmMeta(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
        md5(col("text").cast("binary")).as("payload_md5"))
      .orderBy("doc_id")
  }

  /** Feature extraction as a driver-checkable query. The mapPartitions
    * output columns are integer byte arithmetic on the payload, so the
    * oracle replays them in SQL (ASCII corpus: ascii(char) == byte);
    * the float feature vector itself stays spec-asserted.
    */
  def qMmFeatures(spark: SparkSession, dir: String): DataFrame = {
    extractFeatures(spark, dir)
      .select(col("doc_id"), col("byte_len"), col("byte_sum_mod"),
        col("head_hex"))
      .orderBy("doc_id")
  }

  /** Resize through the mapPartitions pipeline: every payload strided
    * down to ≤64 bytes (identity when already smaller), digest emitted —
    * bounded output per row regardless of input size, the shape a real
    * image-resize stage has. The stride arithmetic (one double division,
    * then per-index multiply+floor) is replayed exactly by the oracle on
    * the ASCII bytes.
    */
  def qMmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    binarize(spark, dir)
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder/digest init, as a real codec stage would
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, p) =>
          val r = FakeDecoder.resize(p, 64)
          md.reset()
          (id, r.length.toLong, md.digest(r).map(b => f"$b%02x").mkString)
        }
      }
      .toDF("doc_id", "resized_len", "resized_md5")
      .orderBy("doc_id")
  }

  /** Frame sampling over the binary payload: fixed 256-byte "frames",
    * stride-4 sampling (every 4th frame) — the video-frame-sample batch
    * shape with the decode stubbed as byte-slicing. The slicing itself is
    * real (`substring` on BINARY), so frame counts and the digest of the
    * first sampled frame are oracle-checkable on the same bytes.
    */
  def qMmFrames(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.documentsSpread(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("n_frames", expr("length(payload) div 256"))
      .filter(col("n_frames") > 0)
      .select(
        col("doc_id"), col("n_frames"),
        expr("CAST(ceil(n_frames / 4.0) AS BIGINT)").as("n_sampled"),
        md5(expr("substring(payload, 1, 256)")).as("frame0_md5"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    // DuckDB substring() has no BLOB overload; the corpus is ASCII
    // (byte_len == n_chars, MultimodalSpec), so char slices == byte slices
    "q_mm_frames" ->
      """SELECT doc_id, n_frames,
        |  CAST(ceil(n_frames / 4.0) AS BIGINT) AS n_sampled,
        |  md5(substring(text, 1, 256)) AS frame0_md5
        |FROM (SELECT doc_id, text,
        |        octet_length(encode(text)) // 256 AS n_frames
        |      FROM documents)
        |WHERE n_frames > 0 ORDER BY doc_id""".stripMargin,
    "q_mm_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  CAST(CAST(list_sum(list_transform(range(1, length(text)+1),
        |    i -> ascii(substring(text, i, 1)))) AS BIGINT) % 997 AS BIGINT)
        |    AS byte_sum_mod,
        |  lower(hex(substring(text, 1, 4))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_resize" ->
      """SELECT doc_id,
        |  CAST(least(octet_length(encode(text)), 64) AS BIGINT) AS resized_len,
        |  md5(CASE WHEN length(text) <= 64 THEN text
        |       ELSE array_to_string(list_transform(range(0, 64),
        |         i -> substring(text,
        |           CAST(floor(i * (length(text) / 64.0)) AS INT) + 1, 1)), '')
        |       END) AS resized_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
