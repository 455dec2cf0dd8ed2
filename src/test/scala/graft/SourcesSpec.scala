package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Source/sink parity and round-trips. */
class SourcesSpec extends SparkTestBase {

  test("writeKvText reproduces the reference sink contract") {
    import spark.implicits._
    val wc = graft.ops.Core.wordCountTr(spark, sfDir)
    val out = Files.createTempDirectory("graft-kv").toString
    Sources.writeKvText(wc, "word", "cnt", out, 2)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length == 2, s"expected 2 part files, got ${files.map(_.getName).toSeq}")

    // each file sorted; counts reconstruct the original aggregate
    val all = files.flatMap { f =>
      val lines = scala.io.Source.fromFile(f).getLines().toSeq
      assert(lines == lines.sorted, s"${f.getName} not sorted")
      lines
    }
    val parsed = all.map { l =>
      val i = l.lastIndexOf('\t')
      l.substring(0, i) -> l.substring(i + 1).toLong
    }.toMap
    val want = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parsed == want)
  }

  test("writeKvText md5Placement reproduces the reference file assignment") {
    import java.security.MessageDigest
    val wc = graft.ops.Core.wordCountTr(spark, sfDir)
    val out = Files.createTempDirectory("graft-kv-md5").toString
    val r = 4
    Sources.writeKvText(wc, "word", "cnt", out, r, md5Placement = true)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length == r)

    // the reference contract: partition = int(full md5 hex, 16) % R,
    // modeled here independently of the Spark expression
    def expectedPart(key: String): Int = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (BigInt(hex, 16) % r).toInt
    }

    files.zipWithIndex.foreach { case (f, idx) =>
      val lines = scala.io.Source.fromFile(f).getLines().toSeq
      assert(lines == lines.sorted, s"${f.getName} not sorted")
      lines.foreach { l =>
        val key = l.substring(0, l.lastIndexOf('\t'))
        assert(expectedPart(key) == idx,
          s"key '$key' in ${f.getName}, expected part ${expectedPart(key)}")
      }
    }
    // placement on top of the same contents: totals still reconstruct
    val parsed = files.flatMap(f => scala.io.Source.fromFile(f).getLines())
      .map { l =>
        val i = l.lastIndexOf('\t')
        l.substring(0, i) -> l.substring(i + 1).toLong
      }.toMap
    val want = wc.collect().map(r0 => r0.getString(0) -> r0.getLong(1)).toMap
    assert(parsed == want)
  }

  test("md5 path sorts by code point, matching the reference's sort") {
    import spark.implicits._
    // U+1F600 (emoji, surrogate pair D83D DE00) vs U+FF61: Java's
    // natural String order compares UTF-16 code units (D83D < FF61 ->
    // emoji first); code-point / UTF-8-byte order — what C-locale
    // `sort` and Spark's UTF8String use — puts U+FF61 first
    val emoji = new String(Character.toChars(0x1F600))
    val df = Seq((emoji, "1"), ("｡", "2"), ("a", "3")).toDF("k", "v")
    val out = Files.createTempDirectory("graft-kv-cp").toString
    Sources.writeKvText(df, "k", "v", out, 1, md5Placement = true)
    val lines = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).toSeq
    assert(lines.head.startsWith("a\t"))
    assert(lines(1) == "｡\t2" && lines(2) == emoji + "\t1",
      s"expected code-point order, got $lines")
    // the distinction is real: Java's natural order would invert them
    assert(Ordering.String.lt(emoji + "\t1", "｡\t2"))
  }

  test("csv round-trip preserves rows") {
    val df = graft.Tables.nation(spark, sfDir)
    val out = Files.createTempDirectory("graft-csv").toString
    Sources.writeCsv(df, out)
    val back = Sources.readCsv(spark, out)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == df.columns.toSeq)
  }

  test("json round-trip preserves values") {
    val df = graft.Tables.region(spark, sfDir)
    val out = Files.createTempDirectory("graft-json").toString
    Sources.writeJson(df, out)
    val back = Sources.readJson(spark, out)
      .select("r_regionkey", "r_name")
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
  }

  test("compaction shrinks a fragmented landing zone, values intact") {
    val docs = graft.Tables.documents(spark, sfDir)
    val frag = Files.createTempDirectory("graft-frag").toString
    docs.repartition(32).write.mode("overwrite").parquet(frag)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) == 32)
    val out = Files.createTempDirectory("graft-compact").toString
    Sources.compactParquet(spark, frag, out, targetFileBytes = 64L << 20)
    assert(parquetFiles(out) == 1, "tiny table must compact to one file")
    assert(spark.read.parquet(out).collect().map(_.toSeq).toSet ==
      docs.collect().map(_.toSeq).toSet)
  }

  test("orc round-trip preserves values and pushes filters") {
    val df = graft.Tables.orders(spark, sfDir)
    val out = Files.createTempDirectory("graft-orc").toString
    Sources.writeOrc(df, out)
    val back = Sources.readOrc(spark, out)
    assert(back.collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // ORC is a predicate-pushdown source too: the filter must reach it
    val plan = back.filter(org.apache.spark.sql.functions
        .col("o_orderkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)]"),
      s"expected pushed filter in:\n$plan")
  }

  test("permissive json ingestion captures corrupt records") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-badjson")
    Files.writeString(dir.resolve("data.json"),
      """{"id": 1, "v": 10}
        |{"id": 2, "v": 20}
        |{not json at all
        |{"id": 3, "v": 30}
        |""".stripMargin)
    val df = spark.read
      .schema("id LONG, v LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record column can't be queried alone uncached
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("id").isNotNull).count() == 3)
    val dropped = spark.read.schema("id LONG, v LONG")
      .option("mode", "DROPMALFORMED").json(dir.toString)
    assert(dropped.count() == 3)
  }

  test("partitioned parquet layout enables partition pruning") {
    val df = graft.Tables.documents(spark, sfDir)
    val out = Files.createTempDirectory("graft-part").toString
    Sources.writePartitioned(df, out, "lang")
    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      df.filter(col("lang") === "en").count())
    // the scan must carry the partition filter, not a post-scan filter
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition pruning in plan:\n${plan.take(800)}")
  }

  test("binaryFile ingestion: raw media files -> multimodal binary column") {
    val dir = Files.createTempDirectory("graft-media").toFile
    def put(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.FileOutputStream(new java.io.File(dir, name))
      try f.write(bytes) finally f.close()
    }
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3)
    put("a.png", png)
    put("b.png", Array[Byte](0x89.toByte, 'P', 'N', 'G', 9))
    put("notes.txt", "not media".getBytes)
    // glob prunes at listing time: the txt never becomes a row
    val df = Sources.readBinaryFiles(spark, dir.toString, "*.png")
      .select(col("path"), col("length"), col("content"))
    val rows = df.collect().map(r =>
      (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("a.png", "b.png"))
    assert(rows(0)._2 == png.length && rows(0)._3.toSeq == png.toSeq)
    // composes with the multimodal lane: content is a plain BINARY column
    val meta = df.select(col("content"),
        length(col("content")).as("n_bytes"),
        substring(hex(col("content")), 1, 8).as("magic"))
      .collect().map(r => (r.getInt(1), r.getString(2))).sortBy(-_._1)
    assert(meta.head._1 == 7 && meta.head._2 == "89504E47")
  }
}
