package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-behavior probe for the dedup pipelines: union the documents
  * table k times with doc_id offsets (every copy is a near-duplicate of
  * the original corpus, the worst case for candidate generation) and
  * time the MinHash, SimHash, and Jaccard pipelines at 1×, 4×, and 10×.
  * Linear growth here is the evidence that the "narrow expansion →
  * bounded-key aggregate → bucket-limited join" shapes hold as data
  * grows; superlinear growth would flag a pair-explosion.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scaled(k: Int): DataFrame = {
      val base = graft.Tables.documents(spark, sfDir)
      val n = base.count()
      (0 until k).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * n))
      }.reduce(_ union _).repartition(cpus.toInt)
    }

    // same pipeline bodies as Dedup.{qDedupMinhash,qDedupSimhash,
    // qDedupJaccard}, parameterized on the input frame
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale-probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    Seq(1, 4, 10).foreach { k =>
      val docs = scaled(k).cache()
      docs.count() // materialize outside the timed region
      time(s"minhash ${k}x")(graft.ops.Dedup.minhashPairsOf(docs).count())
      time(s"simhash ${k}x")(graft.ops.Dedup.simhashGroupsOf(docs).count())
      time(s"jaccard ${k}x")(graft.ops.Dedup.jaccardPairsOf(docs, 0.1).count())
      docs.unpersist()
    }

    // similarity paths: replicate embeddings k× and score one query
    // vector — brute force is O(n); the LSH probe touches ~n/2^bits
    def scaledEmb(k: Int): DataFrame = {
      val base = graft.Tables.embeddings(spark, sfDir)
      val n = base.count()
      (0 until k).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * n))
      }.reduce(_ union _).repartition(cpus.toInt)
    }
    graft.functions.GraftFunctions.ensureRegistered(spark)
    Seq(1, 4, 10).foreach { k =>
      val e = scaledEmb(k).cache()
      e.count()
      val q = broadcast(e.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb")))
      time(s"sim brute ${k}x")(
        e.filter(col("vec_id") =!= 0).crossJoin(q)
          .select(col("vec_id"),
            expr("cosine_sim(embedding, q_emb)").as("c"))
          .orderBy(col("c").desc, col("vec_id").asc).limit(10).count())
      val bucketed = e.withColumn("bucket", graft.ops.Sim.bucketExpr)
      val qb = broadcast(bucketed.filter(col("vec_id") === 0)
        .select(col("bucket").as("q_bucket"), col("embedding").as("q_emb")))
      time(s"sim lsh ${k}x")(
        bucketed.filter(col("vec_id") =!= 0)
          .join(qb, col("bucket") === col("q_bucket"))
          .select(col("vec_id"),
            expr("cosine_sim(embedding, q_emb)").as("c"))
          .orderBy(col("c").desc, col("vec_id").asc).limit(5).count())
      e.unpersist()
    }
    spark.stop()
  }
}
