package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fuzzy (edit-distance) self-join — the record-linkage / entity-
  * resolution primitive: find all string pairs within Levenshtein
  * distance k without comparing all pairs.
  *
  * Blocking: padded 3-grams (`##name##`). A string of length L yields
  * L+2 grams and one edit destroys at most 3 of them, so two strings
  * within distance k share at least L+2−3k grams — for k=2 and L≥5
  * that is ≥1, making the blocking LOSSLESS here: the oracle is the
  * clean all-pairs formulation, the implementation never materializes
  * it. Exact Levenshtein (integer, engine-identical) verifies only the
  * blocked candidates.
  *
  * Shape at scale: the same inverted-posting-list pattern as the
  * n-gram Jaccard lane — candidates come from per-gram buckets, never
  * a cross join; the name table is DISTINCT names (≪ rows). Hot grams
  * (the padding grams '##x' are shared widely) are the df-skew, the
  * same stop-phrase problem `jaccardPairsOf` caps — at corpus scale
  * wire the identical `dfCap` anti-join before pair emission and
  * lengthen grams/prefix-filter to keep buckets bounded.
  */
object Fuzzy {

  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame =
    fuzzySelfJoin(
      Tables.part(spark, dir).select(col("p_name").as("name")), 2)

  /** All distinct-value pairs of `name` within Levenshtein `maxDist`.
    *
    * Completeness: the gram guarantee (shared ≥ L+2−3k) needs
    * L ≥ 3k−1, so names SHORTER than that can evade the blocking — they
    * are paired against every name directly instead (broadcast: the
    * short-name set is tiny by definition, and at k=2 that is only
    * names under 5 chars). The union keeps the documented all-pairs
    * contract for every input, not just long strings.
    */
  def fuzzySelfJoin(names: DataFrame, maxDist: Int): DataFrame = {
    val n = names.select(col("name")).distinct()
    val minSafeLen = 3 * maxDist - 1
    val grams = n.select(col("name"), explode(expr(
        """transform(sequence(1, length(name) + 2),
          |  i -> substring(concat('##', name, '##'), i, 3))""".stripMargin))
        .as("g"))
      .distinct()
    val blocked = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    val short = n.filter(length(col("name")) < minSafeLen)
    val rescue = broadcast(short.select(col("name").as("s")))
      .join(n, col("s") =!= col("name"))
      .select(least(col("s"), col("name")).as("name_a"),
        greatest(col("s"), col("name")).as("name_b"))
    blocked.union(rescue).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .orderBy("name_a", "name_b")
  }

  val oracles: Map[String, String] = Map(
    "q_fuzzy_join" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM n a JOIN n b
        |  ON a.name < b.name AND levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
  )
}
