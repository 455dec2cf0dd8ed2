package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke: q_stream_first_touch vs the batch MIN on the same table. */
object TwsSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val res = graft.streaming.StateV2.qStreamFirstTouch(spark, sfDir)
    val got = res.collect()
    println(s"[tws-smoke] rows: ${got.length}")
    val batch = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "CAST(floor(unix_timestamp(ts)) AS BIGINT) AS sec")
      .groupBy("user_id", "event_type")
      .agg(org.apache.spark.sql.functions.min("sec").as("first_sec"))
      .orderBy("user_id", "event_type").collect()
    println(s"[tws-smoke] batch rows: ${batch.length}")
    val same = got.zip(batch).forall { case (a, b) => a == b }
    println(s"[tws-smoke] MATCH: ${got.length == batch.length && same}")
    spark.stop()
  }
}
