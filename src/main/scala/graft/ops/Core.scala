package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Parity kernels for the reference's concrete "queries" (SURVEY.md §2b).
  *
  * The reference (mehrkau26/485-p4-mapreduce) expresses every computation as
  * a mapper exe + reducer exe over tab-separated KV text
  * (worker/__main__.py:137-151, 202-209). Here each shipped query is
  * re-expressed declaratively so Catalyst plans the scan → flatMap →
  * partial-agg → shuffle → final-agg pipeline that the reference hand-rolled
  * with sort(1) + heapq.merge.
  */
object Core {

  /** Word count with the shell-mapper tokenizer semantics
    * (tests/testdata/exec/wc_map.sh:13: `tr '[ \t]' '\n'` + lowercase).
    * Every space/tab/newline is a separator and **empty tokens are kept**
    * (golden output word_count_correct.txt:1 has key "" with count 9) —
    * hence `split(..., -1)`.
    *
    * Scale: groupBy on the token column is a map-side-combinable hash
    * aggregate — partial counts per partition, one shuffle on the word,
    * final merge. Identical shape at 100 TB; no driver-side state.
    */
  def wordCountTr(spark: SparkSession, dir: String): DataFrame =
    // No spread: the explode feeds a map-side-combining hash aggregate, so
    // per-task work is one pass over its scan split — the extra exchange
    // measurably outweighed it (r2 bench: 0.30 s -> 0.50 s class).
    wordCountTrLines(
      graft.Tables.documents(spark, dir).select(col("text").as("value")))

  /** The shell pipeline over any one-string-column DataFrame. NB:
    * `tr '[ \t]' '\n'` treats the *brackets as literal characters* — the
    * translated set is {'[', ' ', '\t', ']'} — so they are separators too
    * (plus the newline that ends each input line).
    */
  def wordCountTrLines(lines: DataFrame): DataFrame = {
    lines
      .select(explode(split(lower(col("value")), "[\\[\\] \\t\\n]", -1)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  /** Word count with the python-mapper tokenizer semantics
    * (tests/testdata/exec/wc_map.py:6-9: `line.split()` — whitespace
    * collapsing, no empty tokens, no lowercasing). Reducer sums values
    * (wc_reduce.py:13-18) — equivalent to count when every value is 1.
    */
  def wordCountWs(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), "\\s+", -1)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }

  /** Distributed grep (tests/testdata/exec/grep_map.py:14-27): keep records
    * whose lowercased text contains the query; the reference funnels all
    * matches to one reducer under a constant key so output is globally
    * sorted (grep_reduce.py:13-27) — reproduced by the explicit orderBy.
    *
    * The filter is pushed into the scan where possible; the global sort is
    * a range-partitioned exchange, not a single-reducer bottleneck.
    */
  def grep(spark: SparkSession, dir: String, query: String): DataFrame = {
    graft.Tables.documents(spark, dir)
      .filter(lower(col("text")).contains(query.toLowerCase))
      .select(col("doc_id"), col("text"))
      .orderBy("text", "doc_id")
  }

  /** The reference's escape hatch made explicit: any executable as a
    * map phase (worker/__main__.py:137-142 spawns the exe with records on
    * stdin, reads records off stdout). `RDD.pipe` is the exact Spark
    * analogue — one exe per partition, streaming, bounded memory.
    */
  def pipeLines(input: Dataset[String], command: String): Dataset[String] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.rdd.pipe(command).toDS()
  }

  /** Pipe through an explicit argv vector — the reference's mappers take
    * their parameters as command-line arguments (tests/testdata/exec/
    * grep_map.py:14-18 reads the query from sys.argv), so the exe escape
    * hatch must pass arguments through unsplit. The string overload
    * tokenizes on whitespace; this one hands Spark the argv as-is, so an
    * argument may contain spaces or shell metacharacters without any
    * quoting layer. Same execution shape: one process per partition,
    * records streamed over stdin/stdout, bounded memory.
    */
  def pipeArgv(input: Dataset[String], argv: Seq[String]): Dataset[String] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.rdd.pipe(argv).toDS()
  }

  /** End-to-end exe-parity demo used as a verifiable query: stream a
    * column through /bin/cat (the mapper used by the reference's memory
    * test, tests/test_worker_11.py:38) and aggregate the piped output.
    */
  def pipeCatCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val flags = graft.Tables.lineitem(spark, dir)
      .select(col("l_returnflag")).as[String]
    pipeLines(flags, "cat")
      .toDF("flag")
      .groupBy("flag").agg(count(lit(1)).as("cnt"))
      .orderBy("flag")
  }

  /** Exact-parity partition assignment with the reference's
    * `int(md5(key.encode()).hexdigest(), 16) % R`
    * (worker/__main__.py:143-149): the FULL 128-bit digest mod R.
    * Spark's repartition uses murmur3 (contents-per-key identical, file
    * assignment differs); this expression reproduces the reference's
    * file assignment byte-for-byte when a consumer pins which part-file
    * a key lands in.
    *
    * The 128-bit value never fits a BIGINT, so the mod is computed as a
    * Horner fold over the 32 hex digits — `acc = (acc·16 + digit) mod R`
    * — which equals the arbitrary-precision `int(hex, 16) mod R` by the
    * usual modular-arithmetic identity. Long-safe for any practical R
    * (acc < R ≤ 2³¹ ⇒ acc·16 + 15 < 2³⁵), fully codegen'd (a
    * `transform`/`aggregate` HOF chain over built-ins), one md5 per
    * row. CoreSpec checks it against a BigInteger model on generated
    * keys, truncation-sensitive R values included.
    */
  def md5Partition(key: org.apache.spark.sql.Column, numPartitions: Int)
    : org.apache.spark.sql.Column = {
    val digest = md5(key.cast("binary"))
    aggregate(
      transform(sequence(lit(1), lit(32)),
        i => conv(digest.substr(i, lit(1)), 16, 10).cast("long")),
      lit(0L),
      (acc, d) => (acc * 16 + d) % numPartitions)
  }

  /** The reference's KV contract as a reusable transform: key = text before
    * the first tab (worker/__main__.py:144-145), repartitioned by key with
    * sorted partitions — the observable layout of its shuffle files
    * (maptask*-part*, sorted whole-line: worker/__main__.py:161-167).
    */
  def kvPartitionSort(lines: Dataset[String], numPartitions: Int): DataFrame = {
    lines.toDF("line")
      .withColumn("key", split(col("line"), "\t", 2).getItem(0))
      .repartition(numPartitions, col("key"))
      .sortWithinPartitions("key", "line")
  }
}
