package graft

import org.apache.spark.sql.functions._

import graft.ops.Core

/** Golden-output parity with the reference's own integration tests
  * (tests/test_integration_00/01.py): word count and grep over the
  * 8-file corpus must reproduce tests/testdata/correct/ exactly —
  * including the empty-key ""→9 line the shell tokenizer produces.
  */
class RefParitySpec extends SparkTestBase {

  test("shell word count matches word_count_correct.txt byte semantics") {
    val lines = spark.read.textFile(resourcePath("/refcorpus/input")).toDF("value")
    val got = Core.wordCountTrLines(lines)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val golden = scala.io.Source.fromFile(
      resourcePath("/refcorpus/correct/word_count_correct.txt"))
      .getLines().map { l =>
        val i = l.indexOf('\t')
        l.substring(0, i) -> l.substring(i + 1).toLong
      }.toMap

    assert(golden("") == 9L, "golden sanity: empty key has count 9")
    assert(got == golden,
      s"diff: missing=${(golden.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- golden.keySet).take(5)} " +
        s"wrong=${golden.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(5)}")
  }

  test("grep matches grep_correct.txt exactly (sorted, byte-equal lines)") {
    import spark.implicits._
    // reference semantics (grep_map.py:21-27): strip each line, skip
    // empties, keep lines containing "product" lowercased; reducer
    // projects the line; constant key + sorted merge => sorted output.
    val got = spark.read.textFile(resourcePath("/refcorpus/input"))
      .map(_.trim).filter(l => l.nonEmpty && l.toLowerCase.contains("product"))
      .collect().sorted.toSeq

    val golden = scala.io.Source.fromFile(
      resourcePath("/refcorpus/correct/grep_correct.txt")).getLines().toSeq

    assert(got == golden)
  }

  test("python word count tokenizer: whitespace-collapsing, no empties") {
    import spark.implicits._
    val lines = Seq("Hello  World", " lead", "trail ", "", "tab\there").toDF("text")
    val got = lines
      .select(explode(split(col("text"), "\\s+", -1)).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // model: python str.split() per line
    val model = Seq("Hello  World", " lead", "trail ", "", "tab\there")
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == model)
  }

  test("pipe through /bin/cat is identity (exe escape hatch)") {
    import spark.implicits._
    val in = Seq("a\t1", "b\t2", "c\t3").toDS()
    val out = Core.pipeLines(in, "cat").collect().sorted
    assert(out.toSeq == Seq("a\t1", "b\t2", "c\t3"))
  }

  test("kv partition+sort reproduces the shuffle-file contract") {
    import spark.implicits._
    val lines = Seq("b\t2", "a\t1", "a\t0", "c\t9", "b\t1").toDS()
    val df = Core.kvPartitionSort(lines, 2)
    // within every partition, lines are sorted and equal keys contiguous
    val parts = df.select("line").rdd.glom().collect()
    assert(parts.length == 2)
    parts.foreach { p =>
      val ls = p.map(_.getString(0)).toSeq
      assert(ls == ls.sorted, s"partition not sorted: $ls")
    }
    assert(parts.map(_.length).sum == 5)
  }
}
