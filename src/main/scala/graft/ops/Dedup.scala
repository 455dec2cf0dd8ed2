package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents` — exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup (the standard toolbox for
  * training-corpus dedup).
  *
  * Scale design: every pipeline here is "narrow per-doc expansion →
  * aggregate by a bounded key → self-join only within LSH buckets". The
  * candidate-pair join is always on an LSH key (band signature / bucket
  * bits), never all-pairs, so the shuffle volume is O(docs × perms) and the
  * join fan-out is bounded by bucket occupancy — the same shape survives
  * 100 TB with salting on hot buckets if a bucket ever grows pathological.
  *
  * Determinism: permutation hashes are md5 strings (identical in Spark and
  * DuckDB), min-hashing is lexicographic MIN over those strings, so the
  * oracle reproduces signatures exactly — no engine-specific hash function.
  */
object Dedup {

  /** (doc_id, s) — distinct word-3-gram shingles, 1-based positions to
    * mirror the DuckDB oracle exactly.
    */
  private def shingleDf(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("w", split(lower(col("text")), " ", -1))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(w) >= 3 THEN
          |  transform(sequence(1, size(w) - 2),
          |    i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
          |                   element_at(w, i + 2)))
          |ELSE CAST(NULL AS ARRAY<STRING>) END""".stripMargin)).as("s"))
      .distinct()
  }

  /** Exact dedup: count vs distinct-fingerprint count per source
    * (fingerprint = md5 of normalized text, the [[Text.qFingerprint]] key).
    */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("fp",
        md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "").cast("binary")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("fp")).as("n_unique"))
      .orderBy("source")
  }

  /** MinHash + banded LSH candidate pairs.
    * 16 permutations (mh_p = MIN over shingles of md5(p || '|' || shingle)),
    * 4 bands × 4 rows; two docs are candidates iff a whole band matches.
    * Collision probability ≈ 1-(1-j⁴)⁴ for Jaccard j — steep around j≈0.6.
    */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleDf(spark, dir)
    val sigs = sh
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(0), lit(15))).as("p"))
      .groupBy(col("doc_id"), col("p"))
      .agg(min(expr("md5(concat(CAST(p AS STRING), '|', s))")).as("mh"))
    val bands = sigs
      .groupBy(col("doc_id"), expr("CAST(p div 4 AS BIGINT)").as("band"))
      .agg(expr(
        "md5(array_join(transform(array_sort(collect_list(struct(p, mh))), x -> x.mh), ','))")
        .as("band_key"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band")
        && col("a.band_key") === col("b.band_key")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard over shared-shingle candidate pairs.
    * Candidates come from a self-join on the shingle value (inverted-index
    * style) — at scale, hot shingles (stop-phrases) should be dropped by a
    * document-frequency cap before the join; this corpus has no hot
    * shingles so the join stays linear.
    */
  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleDf(spark, dir)
    val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    inter
      .join(card.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(card.as("cb"), col("doc_b") === col("cb.doc_id"))
      .withColumn("jaccard",
        col("shared").cast("double")
          / (col("ca.n") + col("cb.n") - col("shared")))
      .filter(col("jaccard") >= 0.1)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** 16-bit SimHash over distinct word tokens; bit b of md5(word) is
    * extracted from the hex digits so Spark and DuckDB agree bit-for-bit.
    * Docs sharing a full signature are duplicate groups.
    */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ", -1)).as("w"))
      .distinct()
    val bits = toks
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), lit(15))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(expr(
        """CASE WHEN (CAST(instr('0123456789abcdef',
          |  substr(md5(w), CAST(b div 4 AS INT) + 1, 1)) - 1 AS BIGINT)
          |  div CAST(pow(2, 3 - b % 4) AS BIGINT)) % 2 = 1
          |THEN 1 ELSE -1 END""".stripMargin)).as("v"))
    bits
      .groupBy(col("doc_id"))
      .agg(expr(
        """array_join(transform(array_sort(collect_list(struct(b,
          |  CASE WHEN v > 0 THEN '1' ELSE '0' END AS bit))), x -> x.bit), '')"""
          .stripMargin).as("sig"))
      .groupBy(col("sig")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .orderBy("sig")
  }

  /** Embedding-cosine near-dup: sign-bit LSH bucket on dims 1–4 (axis
    * hyperplanes), exact cosine only within buckets, threshold 0.3.
    */
  def qDedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .withColumn("bucket", Sim.bucketExpr)
      .withColumn("nrm", Sim.normExpr(col("embedding")))
    v.as("a").join(v.as("b"), col("a.bucket") === col("b.bucket")
        && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        Sim.cosineFromParts(col("a.embedding"), col("b.embedding"),
          col("a.nrm"), col("b.nrm")))
      .filter(col("cos") > 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(col("cos"), 6).as("cos_sim"))
      .orderBy("va", "vb")
  }

  private val shingleSqlCte =
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM toks))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS n_unique
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_minhash" ->
      (shingleSqlCte +
        """,
          |sigs AS (
          |  SELECT doc_id, p, min(md5(CAST(p AS VARCHAR) || '|' || s)) AS mh
          |  FROM sh, range(0, 16) r(p) GROUP BY doc_id, p),
          |bands AS (
          |  SELECT doc_id, CAST(p // 4 AS BIGINT) AS band,
          |         md5(string_agg(mh, ',' ORDER BY p)) AS band_key
          |  FROM sigs GROUP BY doc_id, p // 4)
          |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          |FROM bands a JOIN bands b ON a.band = b.band
          |  AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          |ORDER BY doc_a, doc_b""".stripMargin),
    "q_dedup_jaccard" ->
      (shingleSqlCte +
        """,
          |card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
          |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          |  GROUP BY a.doc_id, b.doc_id)
          |SELECT doc_a, doc_b,
          |  CAST(shared AS DOUBLE)/(ca.n + cb.n - shared) AS jaccard
          |FROM inter
          |JOIN card ca ON ca.doc_id = doc_a
          |JOIN card cb ON cb.doc_id = doc_b
          |WHERE CAST(shared AS DOUBLE)/(ca.n + cb.n - shared) >= 0.1
          |ORDER BY doc_a, doc_b""".stripMargin),
    "q_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, b,
        |    SUM(CASE WHEN (CAST(strpos('0123456789abcdef',
        |      substr(md5(w), CAST(b//4 AS INT) + 1, 1)) - 1 AS BIGINT)
        |      // CAST(pow(2, 3 - b%4) AS BIGINT)) % 2 = 1
        |    THEN 1 ELSE -1 END) AS v
        |  FROM toks, range(0, 16) r(b) GROUP BY doc_id, b),
        |sigs AS (
        |  SELECT doc_id,
        |    string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sig
        |  FROM bits GROUP BY doc_id)
        |SELECT sig, COUNT(*) AS cnt FROM sigs GROUP BY sig
        |HAVING COUNT(*) > 1 ORDER BY sig""".stripMargin,
    "q_dedup_embed" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    concat(CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END,
        |           CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END,
        |           CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END,
        |           CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bucket,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS va, b.vec_id AS vb,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (a.nrm * b.nrm), 6) AS cos_sim
        |FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (a.nrm * b.nrm) > 0.3
        |ORDER BY va, vb""".stripMargin,
  )
}
