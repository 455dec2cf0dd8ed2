package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end corpus-curation composite — the "main()" of a
  * training-data pipeline, chaining the library's stages over the
  * documents+embeddings pair: quality filter → exact dedup →
  * semantic dedup → split assignment → per-split audit.
  *
  * Every stage is the already-gated operator (same code paths:
  * [[Text.qualityOf]], [[Embed.semanticDedup]],
  * [[Pipeline.withSplit]]), so this query pins that the stages
  * COMPOSE — the filters are all doc_id-keyed semi-joins, so at scale
  * the chain is one co-partitioned join pipeline on the corpus key
  * with no extra exchanges between stages (AQE folds the three
  * filters into successive joins over the same partitioning; the
  * embedding stage's cluster-scoped work happens on the much smaller
  * embeddings frame before its doc_id verdict joins back).
  */
object Curate {

  def qCorpusCurate(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documentsSpread(spark, dir), Tables.embeddings(spark, dir))

  /** Curate any (doc_id, text, source, n_chars) corpus with an aligned
    * (vec_id, label, embedding) frame; returns the per-split audit.
    */
  def curate(docs: DataFrame, emb: DataFrame): DataFrame = {
    val keepQ = Text.qualityOf(docs).filter(col("keep")).select("doc_id")
    val keepExact = docs
      .withColumn("fp", Dedup.exactFp(col("text")))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // ANTI-join against the DROPPED ids, not semi-join against kept
    // ones: a document with no embedding row cannot be a semantic
    // duplicate of anything and must survive this stage (at sf0.1 only
    // 2 000 of 5 000 docs carry embeddings — a semi-join would discard
    // the other 60% for a reason unrelated to quality or duplication).
    val semDropped = Embed.semanticDedup(emb, Embed.SemanticTau)
      .filter(!col("kept")).select(col("vec_id").as("doc_id"))
    // every verdict list is doc-scale by design (a kept/dropped id per
    // document) while the left side carries the corpus text — exactly
    // the join class AQE intermittently broadcast at 100× (r12): pin
    // shuffle_hash building the narrow id lists per partition, keeping
    // the whole chain one co-partitioned doc_id pipeline
    val survivors = docs
      .join(keepQ.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .join(keepExact.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
      .join(semDropped.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
    Pipeline.withSplit(survivors)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(ceil(length(col("text")) / 4.0).cast("long")).as("n_tokens"),
        count_distinct(col("source")).as("n_sources"))
      .orderBy("split")
  }

  val oracles: Map[String, String] = Map(
    "q_corpus_curate" ->
      s"""WITH keep_q AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, n_tokens,
         |      stop_ratio * 0.5 + (1.0 - punct_ratio) * 0.3 +
         |        CASE WHEN n_tokens >= 20 AND n_tokens <= 1000
         |             THEN 0.2 ELSE 0.0 END AS quality_score
         |    FROM (
         |      SELECT doc_id, n_tokens,
         |        CAST(n_stop AS DOUBLE)/n_tokens AS stop_ratio,
         |        CAST(n_punct AS DOUBLE)/n_chars AS punct_ratio
         |      FROM (
         |        SELECT doc_id, n_chars,
         |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |          ${Text.stopEnCountSql} AS n_stop,
         |          CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
         |            AS BIGINT) AS n_punct
         |        FROM documents)))
         |  WHERE quality_score > 0.25 AND n_tokens >= 10),
         |keep_x AS (
         |  SELECT MIN(doc_id) AS doc_id FROM (
         |    SELECT doc_id,
         |      md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
         |    FROM documents)
         |  GROUP BY fp),
         |e AS (
         |  SELECT vec_id, label, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |sem_dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE round(list_sum(list_transform(
         |      list_zip(a.embedding, b.embedding),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |      / (a.nrm * b.nrm), 6) >= ${Embed.SemanticTau}),
         |surv AS (
         |  SELECT d.doc_id, d.text, d.source FROM documents d
         |  JOIN keep_q USING (doc_id)
         |  JOIN keep_x USING (doc_id)
         |  WHERE d.doc_id NOT IN (SELECT vec_id FROM sem_dropped)),
         |spl AS (
         |  SELECT *,
         |    CASE WHEN bucket < 90 THEN 'train'
         |         WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT *,
         |    (${Dedup.hornerH("md5(CAST(doc_id AS VARCHAR))")}) % 100
         |      AS bucket FROM surv))
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(CAST(ceil(length(text)/4.0) AS BIGINT)) AS BIGINT)
         |    AS n_tokens,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
         |FROM spl GROUP BY split ORDER BY split""".stripMargin,
  )
}
