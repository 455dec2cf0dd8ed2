package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks. The reference supports exactly one of each — a text
  * directory in (manager/__main__.py:193) and `part-*` text files out
  * (worker/__main__.py:213-216) — reproduced here, plus the formats any
  * real deployment needs (parquet/csv/json, compression, partitioned
  * layout). Spark owns listing/splitting: `maxPartitionBytes` splits big
  * files, small files coalesce into shared tasks — strictly better than
  * the reference's whole-file round-robin at 100 TB.
  */
object Sources {

  /** Reference source parity: read a directory of text files as lines. */
  def readTextDir(spark: SparkSession, dir: String): Dataset[String] =
    spark.read.textFile(dir)

  /** Reference sink parity: `key\tvalue` lines, hash-partitioned by key
    * into R files, sorted within each partition, overwrite semantics —
    * the observable output contract of the reference's reduce stage
    * (sorted `part-{r:05d}` files, dir recreated per job).
    */
  def writeKvText(df: DataFrame, keyCol: String, valCol: String,
    outDir: String, numPartitions: Int): Unit = {
    df.select(concat_ws("\t", col(keyCol), col(valCol)).as("line"),
        col(keyCol).as("k"))
      .repartition(numPartitions, col("k"))
      .sortWithinPartitions("line")
      .select("line")
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** Round-trip helpers for the standard columnar/row formats. */
  def writeParquet(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(out)

  def writeCsv(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(out)

  def readCsv(spark: SparkSession, in: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(in)

  def writeJson(df: DataFrame, out: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(out)

  def readJson(spark: SparkSession, in: String): DataFrame =
    spark.read.json(in)

  /** Partitioned-by-column parquet layout (the at-rest partitioning that
    * makes partition pruning work at scale).
    */
  def writePartitioned(df: DataFrame, out: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(out)
}
