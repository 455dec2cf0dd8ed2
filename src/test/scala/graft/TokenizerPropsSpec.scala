package graft

import org.scalacheck.Gen

import graft.ops.Core

/** ScalaCheck-generator-driven properties for the semantic kernels — the
  * tokenizer is the hardest correctness trap in the parity surface
  * (SURVEY.md §7 risk register), so it gets a generative model check,
  * not just goldens. (Generators used directly; no scalatestplus bridge
  * in the offline dependency set.)
  */
class TokenizerPropsSpec extends SparkTestBase {

  /** Plain-Scala model of wc_map.sh: `tr '[ \t]' '\n'` (brackets are
    * literal members of the translated set) → lowercase → one token per
    * line (awk $1 on lines that can no longer contain field separators).
    */
  private def model(text: String): Seq[String] =
    text.map(c => if (c == '[' || c == ']' || c == ' ' || c == '\t') '\n' else c)
      .toLowerCase.split("\n", -1).toSeq

  private val corpusGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    1 -> Gen.const('\t'),
    1 -> Gen.const('['),
    1 -> Gen.const(']'),
    1 -> Gen.const('.'))).map(_.mkString)

  test("engine tr-tokenizer counts == reference model counts (generated)") {
    import spark.implicits._
    val gen = Gen.listOfN(8, corpusGen)
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    (1 to 20).foreach { i =>
      val texts = gen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      val got = Core.wordCountTrLines(texts.toDF("value"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = texts.flatMap(model)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want, s"iteration $i diverged for inputs: ${texts.take(2)}")
    }
  }

  test("tr-tokenizer keeps empty tokens; ws-tokenizer drops them") {
    import spark.implicits._
    val df = Seq(" x  y ").toDF("value")
    val tr = Core.wordCountTrLines(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tr("") == 3L) // leading, double-space, trailing
    assert(tr("x") == 1L && tr("y") == 1L)
  }
}
