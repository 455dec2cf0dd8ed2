package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B of funnelOf's two shapes (lazy stage frames vs
  * eagerly checkpointed) — the r19 evidence for the
  * `checkpointStages` input-size switch.
  * Usage: runMain graft.tools.FunnelAb <sfDir> [rounds]
  */
object FunnelAb {
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
    import org.apache.spark.sql.DataFrame
    def run(ck: Boolean): DataFrame = graft.ops.Events2.funnelOf(
      graft.Tables.events(spark, sfDir), Seq("signup", "view", "purchase"),
      checkpointStages = ck)
    run(false).count(); run(true).count() // warm
    val eq = run(false).collect().toSeq == run(true).collect().toSeq
    println(s"[funnel-ab] results ${if (eq) "==" else "DIFFER!"}")
    def time(ck: Boolean): Double = {
      val t0 = System.nanoTime(); run(ck).count()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to rounds).foreach { r =>
      val o = time(false); val n = time(true)
      println(f"[funnel-ab] round$r lazy ${o}%.2fs checkpointed ${n}%.2fs")
    }
    spark.stop()
  }
}
