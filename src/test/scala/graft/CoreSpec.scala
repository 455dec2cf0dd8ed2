package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.Core

/** Kernel-level properties for Core: the md5 partition expression matches
  * the arbitrary-precision model, and partition assignment is stable.
  */
class CoreSpec extends SparkTestBase {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("md5Partition == BigInt(full md5, 16) % R model (generated keys)") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.resize(20, Gen.alphaNumStr))
    val keys = gen.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(7L)).get.distinct
    // include non-power-of-two R: truncated-digest mod diverges there,
    // so these values would catch a fold that isn't really full-width
    for (r <- Seq(3, 7, 16, 100)) {
      val got = keys.toDF("k")
        .select(col("k"), Core.md5Partition(col("k"), r).as("p"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      keys.foreach { k =>
        val want = (BigInt(md5Hex(k), 16) % r).toLong
        assert(got(k) == want, s"key '$k', R=$r")
        // and at least one generated key must actually expose the old
        // 15-hex-truncation divergence when R doesn't divide a power of 16
      }
      if (r == 7)
        assert(keys.exists(k =>
          (BigInt(md5Hex(k).substring(0, 15), 16) % r).toLong !=
            (BigInt(md5Hex(k), 16) % r).toLong),
          "sample should distinguish truncated from full-digest mod")
    }
  }

  test("partition assignment is deterministic across evaluations") {
    import spark.implicits._
    val df = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string").as("k"))
    val a = df.select(col("k"), Core.md5Partition(col("k"), 8).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = df.select(col("k"), Core.md5Partition(col("k"), 8).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size > 1, "keys spread over multiple partitions")
  }
}
