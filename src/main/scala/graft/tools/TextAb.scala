package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session alternating A/B for the r19 text-lane tokenize-fan-out
  * fix (eager localCheckpoint of the first aggregate so the corpus is
  * tokenized once, not once per consumer subtree): the old shapes are
  * the CURRENT ops functions called with the checkpoint disabled via
  * verbatim inline copies. Results asserted equal every lane.
  * Usage: runMain graft.tools.TextAb <sfDir> [rounds]
  */
object TextAb {

  // ---- OLD shapes (pre-r19), verbatim --------------------------------

  private def oldTfidfTopOf(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ", -1)).as("w"))
      .filter(col("w") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w"))
      .agg(count(lit(1)).as("df"))
    val n = tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w").asc)
    tf.join(df.hint("shuffle_hash"), "w")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") *
        log(col("n").cast("double") / col("df").cast("double")), 6))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("w").as("term"), col("score"))
      .orderBy("doc_id", "rk")
  }

  private def oldPmiBigramsOf(docs: DataFrame, minCount: Int,
    k: Int): DataFrame = {
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
      .join(uni.select(col("tok").as("a"), col("c1").as("ca"))
        .hint("shuffle_hash"), "a")
      .join(uni.select(col("tok").as("b"), col("c1").as("cb"))
        .hint("shuffle_hash"), "b")
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

  private def oldUnigramLmScores(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ", -1)).as("w"))
      .filter(col("w") =!= "")
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("v"))
    val lp = vocab.crossJoin(broadcast(tot))
      .select(col("w"),
        round(log((col("c") + 1).cast("double") /
          (col("n_total") + col("v")).cast("double")), 6)
          .cast("decimal(12,6)").as("lp"))
    toks.join(lp.hint("shuffle_hash"), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lp")) * 1000000).cast("long").as("m"))
      .select(col("doc_id"), col("n_tokens"),
        (expr("CASE WHEN m < 0 THEN -1L ELSE 1L END") *
          expr("(abs(m) * 2 + n_tokens) div (n_tokens * 2)"))
          .cast("double").divide(lit(1000000.0)).as("avg_logp"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs() = graft.Tables.documentsSpread(spark, sfDir)

    case class Lane(name: String, old: () => DataFrame, neu: () => DataFrame)
    val lanes = Seq(
      Lane("tfidf_top",
        () => oldTfidfTopOf(docs(), 3),
        () => graft.ops.Text.tfidfTopOf(docs(), 3)),
      Lane("pmi_bigrams",
        () => oldPmiBigramsOf(docs(), 3, 15),
        () => graft.ops.Text2.pmiBigramsOf(docs(), 3, 15)),
      Lane("unigram_lm",
        () => oldUnigramLmScores(docs()),
        () => graft.ops.Text2.unigramLmScores(docs())))

    lanes.foreach { l => l.old().count(); l.neu().count() } // warm
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    lanes.foreach { l =>
      val eq = l.old().collect().toSeq == l.neu().collect().toSeq
      println(s"[text-ab] ${l.name} results ${if (eq) "==" else "DIFFER!"}")
      (1 to rounds).foreach { r =>
        val o = time(l.old); val n = time(l.neu)
        println(f"[text-ab] ${l.name} round$r old ${o}%.2fs new ${n}%.2fs")
      }
    }
    spark.stop()
  }
}
