package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Join

object PinAuditDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q_dedup_minhash")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan
    plan.collect { case j: Join =>
      println(s"== JOIN ${j.joinType} hint=${j.hint}")
      Seq(("L", j.left), ("R", j.right)).foreach { case (lbl, s) =>
        val paths = s.collectLeaves().map {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.mkString("|")
              case other => s"rel:${other.getClass.getSimpleName}"
            }
          case o => s"leaf:${o.nodeName}"
        }
        println(s"  $lbl maxRows=${s.maxRows} paths=${paths.mkString(";")}")
      }
    }
    println("audit: " + graft.plans.JoinPinAudit.audit(name, df).mkString("; "))
    println(s"total joins: ${plan.collect { case j: Join => j }.size}")
    spark.stop()
  }
}
