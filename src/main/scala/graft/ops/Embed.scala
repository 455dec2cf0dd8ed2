package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-column transforms beyond search: dimensionality reduction
  * and cluster-scoped semantic deduplication — the two operations a
  * 100 TB embedding corpus runs between ingestion and training.
  */
object Embed {

  val Dim = 64
  val ProjDim = 8

  /** Deterministic Rademacher (±1) sign matrix for the random
    * projection, derived once from md5("rp_<i>_<j>") nibble parity —
    * engine-agnostic (the oracle SQL is generated from the SAME
    * matrix), seedable, and free of any RNG state. Tiny (k×d), so at
    * cluster scale it ships inside the closure/codegen constant pool —
    * nothing to broadcast.
    */
  lazy val signs: Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(ProjDim, Dim) { (j, i) =>
      val d = md.digest(s"rp_${i}_$j".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) 1 else -1
    }
  }

  /** The ±chain "x1 - x2 + x3 ..." for output dim j, in `idx` syntax
    * (Spark `element_at(embedding, i)` / DuckDB `embedding[i]`). Both
    * engines evaluate the same left-associated double chain, so the
    * sums are bit-identical before rounding.
    */
  private def chain(j: Int, idx: Int => String): String =
    (0 until Dim).map { i =>
      val t = s"CAST(${idx(i + 1)} AS DOUBLE)"
      if (i == 0) (if (signs(j)(i) > 0) t else s"0.0 - $t")
      else (if (signs(j)(i) > 0) s"+ $t" else s"- $t")
    }.mkString(" ")

  /** Johnson–Lindenstrauss random projection of the 64-dim embedding
    * column to 8 dims via the Rademacher sign matrix (Achlioptas'
    * database-friendly construction: ±1 entries, scale 1/√k — no
    * Gaussians needed for the JL guarantee).
    *
    * Shape at scale: a pure narrow per-row projection — no shuffle, no
    * state, whole-stage-codegen'd arithmetic (the sign matrix is burned
    * into the generated code as literal add/subtract chains; nothing is
    * looked up per row). This is the pre-pass that makes downstream
    * all-pairs work 8× cheaper per vector: run LSH/clustering in the
    * projected space, verify exact cosine in the original space.
    */
  def qRandomProjection(spark: SparkSession, dir: String): DataFrame =
    randomProject(Tables.embeddings(spark, dir))

  /** Same projection over any (vec_id, embedding) frame. */
  def randomProject(emb: DataFrame): DataFrame = {
    val ys = (0 until ProjDim).map { j =>
      expr(s"round((${chain(j, i => s"element_at(embedding, $i)")})" +
        s" / sqrt(${ProjDim}.0D), 6)").as(s"y$j")
    }
    emb.select(col("vec_id") +: ys: _*).orderBy("vec_id")
  }

  /** Cosine threshold for [[qDedupSemantic]] — tuned to the synthetic
    * corpus (intra-label cosines top out near 0.47), the operator takes
    * it as a parameter.
    */
  val SemanticTau = 0.35

  /** SemDeDup-style cluster-scoped semantic dedup: within each cluster
    * (the `label` column stands in for a learned k-means assignment,
    * exactly the role it plays in [[Sim.qSimIvf]]), a vector is DROPPED
    * when a lower-id cluster-mate sits above cosine τ — the keep-lowest
    * rule that makes the output deterministic without a quality model.
    *
    * Shape at scale: the all-pairs join runs ONLY within a cluster —
    * that is the SemDeDup design point: cluster count grows ~linearly
    * with the corpus, so per-cluster occupancy (and the per-cluster
    * quadratic) stays bounded; clusters re-partition independently.
    * For heavy-tailed cluster sizes, pre-prune inside the big clusters
    * with the hyperplane-LSH candidate pass ([[Dedup.embedPairsOf]]) —
    * same verify step, sub-quadratic candidates. Scoring compares the
    * ROUNDED cosine to τ so both engines make identical keep decisions.
    */
  def qDedupSemantic(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables.embeddings(spark, dir), SemanticTau)

  /** Same dedup over any (vec_id, label, embedding) frame. */
  def semanticDedup(emb: DataFrame, tau: Double): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val e = emb.select(col("vec_id"), col("label"), col("embedding"))
    val l = e.select(col("label"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val r = e.select(col("label"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    // the cluster-scoped all-pairs join: both sides are the corpus-scale
    // embedding frame (wide float arrays — highly compressible under 100×
    // replication, the exact map-stat wobble surface r12 diagnosed), so
    // the strategy is pinned. `merge` rather than shuffle_hash: within a
    // label partition every row matches, and SMJ's spillable equal-key
    // buffering survives a mega-cluster where a per-partition hash map of
    // wide vectors would not.
    val dropped = l.join(r.hint("merge"), "label")
      .filter(col("va") < col("vb"))
      .filter(round(expr("cosine_sim(ea, eb)"), 6) >= tau)
      .select(col("vb").as("vec_id"))
      .distinct()
    // verdict list is corpus-scale (one id per dropped vector): pinned,
    // building the narrow id list per partition
    e.join(dropped.withColumn("hit", lit(1)).hint("shuffle_hash"),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        col("hit").isNull.as("kept"))
      .orderBy("vec_id")
  }

  /** Negatives drawn per anchor for contrastive training: k
    * different-label vectors, chosen by deterministic md5 draw so the
    * sample is reproducible across runs, engines, and partitionings
    * (the same property every sampler in this library has).
    *
    * Shape at scale: negatives come from a SHARED hash-thinned pool
    * (md5 first hex char = '0' → 1/16 of the corpus), not from
    * per-anchor scans of the full corpus — the pool is built in one
    * narrow pass, the anchors broadcast against it, and the per-anchor
    * rank runs over O(|pool|) rows. Tune the pool rate to k·oversample
    * / corpus-size; the full-corpus variant would be an O(anchors·n)
    * shuffle for no statistical gain.
    */
  def qNegativeSample(spark: SparkSession, dir: String): DataFrame =
    negativeSample(Tables.embeddings(spark, dir), "vec_id < 20", 5)

  /** Same sampler over any (vec_id, label) frame. */
  def negativeSample(emb: DataFrame, anchorPred: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchors = emb.filter(expr(anchorPred))
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"))
    val pool = emb
      .filter(substring(md5(concat(col("vec_id").cast("string"),
        lit("_pool")).cast("binary")), 1, 1) === "0")
      .select(col("vec_id").as("neg_id"), col("label").as("n_label"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("draw").asc, col("neg_id").asc)
    broadcast(anchors).join(pool,
        col("a_label") =!= col("n_label") &&
          col("anchor_id") =!= col("neg_id"))
      .withColumn("draw", md5(concat(col("anchor_id").cast("string"),
        lit("_"), col("neg_id").cast("string")).cast("binary")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("anchor_id"), col("neg_id"), col("rnk"))
      .orderBy("anchor_id", "rnk")
  }

  val oracles: Map[String, String] = Map(
    "q_negative_sample" ->
      """WITH anchors AS (
        |  SELECT vec_id AS anchor_id, label AS a_label FROM embeddings
        |  WHERE vec_id < 20),
        |pool AS (
        |  SELECT vec_id AS neg_id, label AS n_label FROM embeddings
        |  WHERE substring(md5(CAST(vec_id AS VARCHAR) || '_pool'), 1, 1)
        |    = '0'),
        |ranked AS (
        |  SELECT anchor_id, neg_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id
        |      ORDER BY md5(CAST(anchor_id AS VARCHAR) || '_' ||
        |        CAST(neg_id AS VARCHAR)) ASC, neg_id ASC) AS INT) AS rnk
        |  FROM anchors JOIN pool
        |    ON a_label <> n_label AND anchor_id <> neg_id)
        |SELECT anchor_id, neg_id, rnk FROM ranked
        |WHERE rnk <= 5 ORDER BY anchor_id, rnk""".stripMargin,
    "q_random_projection" -> {
      val ys = (0 until ProjDim).map { j =>
        s"  round((${chain(j, i => s"embedding[$i]")})" +
          s" / sqrt(${ProjDim}.0), 6) AS y$j"
      }.mkString(",\n")
      s"""SELECT vec_id,
         |$ys
         |FROM embeddings ORDER BY vec_id""".stripMargin
    },
    "q_dedup_semantic" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         |  FROM embeddings),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE round(list_sum(list_transform(
         |      list_zip(a.embedding, b.embedding),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |      / (a.nrm * b.nrm), 6) >= $SemanticTau)
         |SELECT e.vec_id, e.label, (d.vec_id IS NULL) AS kept
         |FROM e LEFT JOIN dropped d ON e.vec_id = d.vec_id
         |ORDER BY e.vec_id""".stripMargin,
  )
}
