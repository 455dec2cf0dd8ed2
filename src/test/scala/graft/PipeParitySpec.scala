package graft

import graft.ops.Core

/** Full MapReduce-shape pipeline through REAL external executables —
  * scan → mapper exe → hash-partition by key → sort within partition →
  * reducer exe per partition — must equal the native Spark formulation.
  * This is the reference's entire execution model reproduced end-to-end
  * with `RDD.pipe` (the scripts are this repo's own, obeying the same
  * stdin/stdout `key\tvalue` contract).
  */
class PipeParitySpec extends SparkTestBase {

  test("exe pipeline (map exe -> partition/sort -> reduce exe) == native") {
    import spark.implicits._
    val mapper = s"/bin/sh ${resourcePath("/exec/wc_map_own.sh")}"
    val reducer = s"/bin/sh ${resourcePath("/exec/wc_reduce_own.sh")}"

    val lines = spark.read.textFile(resourcePath("/refcorpus/input"))

    val mapped = Core.pipeLines(lines, mapper)          // "word\t1" lines
    val partitioned = Core.kvPartitionSort(mapped, 2)    // sorted, keyed
    val reduced = partitioned.select("line").as[String].rdd.pipe(reducer)

    val got = reduced.collect().map { l =>
      val i = l.lastIndexOf('\t')
      l.substring(0, i) -> l.substring(i + 1).toLong
    }.toMap

    val want = Core.wordCountTrLines(lines.toDF("value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(got == want,
      s"missing=${(want.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- want.keySet).take(5)}")
    assert(got("") == 9L, "empty-key parity with the reference golden")
  }
}
