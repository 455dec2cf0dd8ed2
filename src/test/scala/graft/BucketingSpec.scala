package graft

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at rest: a join of two tables
  * bucketed on the join key by the same bucket count needs NO exchange —
  * the at-rest partitioning strategy that removes the dominant shuffle
  * from repeated 100 TB fact-fact joins.
  */
class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .format("parquet").saveAsTable("b_orders")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .format("parquet").saveAsTable("b_customer")

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not re-shuffle either bucketed side
    val joinSection = plan.split("HashAggregate").head
    assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
      !joinSection.contains("Exchange hashpartitioning(c_custkey"),
      s"bucketed join still exchanges:\n${plan.take(2000)}")

    // result equality vs the plain parquet join
    val want = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("qBucketedJoin: both scans bucketed, SMJ side exchange-free") {
    val df = graft.sources.Sources.qBucketedJoin(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString

    // the gate query's contract: a sort-merge join whose BOTH sides read
    // bucketed files — neither join key may appear in a shuffle exchange
    assert(plan.contains("SortMergeJoin"), s"no SMJ:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed gate join still exchanges a join key:\n${plan.take(3000)}")
    assert(plan.contains("Bucketed: true"),
      s"scan not bucketed:\n${plan.take(3000)}")

    // result equality vs the plain parquet join (same decimal recipe)
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    val one = lit(1).cast(DecimalType(12, 2))
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("seeded sample is deterministic") {
    val a = Tables.lineitem(spark, sfDir).sample(0.1, 42L)
      .select(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    val b = Tables.lineitem(spark, sfDir).sample(0.1, 42L)
      .select(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size < 6000)
  }
}
