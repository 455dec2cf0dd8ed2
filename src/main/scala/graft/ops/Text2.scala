package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-statistics operators beyond per-document scoring: association
  * measures over the whole token stream. First resident: PMI collocation
  * extraction — the classic vocabulary-induction / tokenizer-merge-rule
  * signal (a BPE-style pipeline ranks exactly these adjacent-pair
  * statistics).
  */
object Text2 {

  /** Pointwise mutual information of adjacent token pairs:
    * pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) over the bigram
    * stream and p(·) over the unigram stream. Emitted for pairs seen ≥ 3
    * times, top 15 by PMI (ties: a asc, b asc).
    *
    * Shape at scale: ONE tokenize pass feeds both count tables (bigrams
    * via an index-sequence transform — no self-join on position);
    * unigram counts are O(vocabulary) and join the bigram table on each
    * side as shuffle joins (vocabularies outgrow broadcasts at corpus
    * scale, same rationale as [[Text.qTfidfTop]]); the two scalar totals
    * broadcast as 1-row frames. The min-count filter runs BEFORE the
    * joins, so the expensive side of the join is the (rare) surviving
    * pairs, not the full bigram distribution.
    *
    * PMI arithmetic is double division/log in oracle-identical operation
    * order, rounded to 6 decimals.
    */
  def qPmiBigrams(spark: SparkSession, dir: String): DataFrame =
    pmiBigramsOf(Tables.documentsSpread(spark, dir), minCount = 3, k = 15)

  /** Same operator over any frame with a `text` column. */
  def pmiBigramsOf(docs: DataFrame, minCount: Int, k: Int): DataFrame = {
    val toks = docs
      .withColumn("w", split(lower(col("text")), " ", -1))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val bg = toks.select(explode(expr(
        """CASE WHEN size(w) >= 2 THEN
          |  transform(sequence(1, size(w) - 1),
          |    i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))
          |ELSE CAST(NULL AS ARRAY<STRUCT<a: STRING, b: STRING>>) END"""
          .stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = bg.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val totU = uni.agg(sum(col("c1")).as("u"))
    val totB = cab.agg(sum(col("cab")).as("nb"))
    cab.filter(col("cab") >= minCount)
      .join(uni.select(col("tok").as("a"), col("c1").as("ca")), "a")
      .join(uni.select(col("tok").as("b"), col("c1").as("cb")), "b")
      .crossJoin(broadcast(totU))
      .crossJoin(broadcast(totB))
      .select(col("a"), col("b"), col("cab"),
        round(log((col("cab").cast("double") / col("nb").cast("double")) /
          ((col("ca").cast("double") / col("u").cast("double")) *
           (col("cb").cast("double") / col("u").cast("double")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  val oracles: Map[String, String] = Map(
    "q_pmi_bigrams" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(w) AS tok,
        |    generate_subscripts(w, 1) AS pos
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |        FROM documents)),
        |uni AS (SELECT tok, COUNT(*) AS c1 FROM t GROUP BY tok),
        |bg AS (
        |  SELECT x.tok AS a, y.tok AS b
        |  FROM t x JOIN t y ON x.doc_id = y.doc_id AND y.pos = x.pos + 1),
        |cab AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b),
        |tot AS (
        |  SELECT (SELECT CAST(SUM(c1) AS BIGINT) FROM uni) AS u,
        |         (SELECT CAST(SUM(cab) AS BIGINT) FROM cab) AS nb)
        |SELECT c.a, c.b, c.cab,
        |  round(ln((CAST(c.cab AS DOUBLE) / CAST(tot.nb AS DOUBLE)) /
        |    ((CAST(ua.c1 AS DOUBLE) / CAST(tot.u AS DOUBLE)) *
        |     (CAST(ub.c1 AS DOUBLE) / CAST(tot.u AS DOUBLE)))), 6) AS pmi
        |FROM cab c
        |JOIN uni ua ON ua.tok = c.a
        |JOIN uni ub ON ub.tok = c.b
        |CROSS JOIN tot
        |WHERE c.cab >= 3
        |ORDER BY pmi DESC, c.a ASC, c.b ASC LIMIT 15""".stripMargin,
  )
}
