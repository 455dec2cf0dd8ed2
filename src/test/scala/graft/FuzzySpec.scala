package graft

import org.apache.spark.sql.functions._

import graft.ops.Fuzzy

/** Fuzzy-join semantics: the gram-blocked result must equal the brute
  * all-pairs answer (blocking losslessness for k=2, len>=5), with known
  * pairs present.
  */
class FuzzySpec extends SparkTestBase {

  test("gram blocking loses no pair vs brute-force all-pairs") {
    val names = Tables.part(spark, sfDir).select(col("p_name").as("name"))
    val got = Fuzzy.fuzzySelfJoin(names, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val n = names.distinct().as("a")
    val brute = n.join(names.distinct().as("b"),
        col("a.name") < col("b.name"))
      .select(col("a.name"), col("b.name"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(got.nonEmpty, "corpus should contain near-duplicate names")
    got.foreach { case (_, _, d) => assert(d >= 1 && d <= 2) }
  }

  test("ad-hoc frame: finds the planted typo pair only") {
    import spark.implicits._
    val df = Seq("spark engine", "spark enjine", "wholly different")
      .toDF("name")
    val got = Fuzzy.fuzzySelfJoin(df, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.toList == List(("spark engine", "spark enjine", 1)))
  }

  test("short strings below the gram guarantee still pair (rescue path)") {
    import spark.implicits._
    // 'ab' vs 'ba': distance 2, but the padded 3-gram sets are disjoint
    val df = Seq("ab", "ba", "unrelated words").toDF("name")
    val got = Fuzzy.fuzzySelfJoin(df, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.toList == List(("ab", "ba", 2)))
  }

  test("df-cap is lossless: capped result equals uncapped on part names") {
    val names = Tables.part(spark, sfDir).select(col("p_name").as("name"))
    def run(cap: Long) = Fuzzy.fuzzySelfJoin(names, 2, dfCap = cap).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val exact = run(Long.MaxValue)
    assert(exact.nonEmpty)
    // gate cap (8): fires on the hottest grams, all names stay safe
    assert(run(Fuzzy.FuzzyDfCap) == exact)
    // adversarial cap (2): most grams hot, names go unsafe -> rescue;
    // the result must STILL be identical (rescue is exhaustive)
    assert(run(2L) == exact)
  }

  test("df-cap keeps planted pairs that share only boilerplate heads") {
    import spark.implicits._
    // every name starts with the same hot head 'common prefix '; the
    // planted pair differs by one tail char. With cap = 3 the head
    // grams (df = 12) are all hot, so the pair can only survive via
    // cold tail grams or the unsafe rescue — either way it must appear.
    val tails = (0 until 10).map(i => f"common prefix aa$i%02d")
    val df = (tails ++ Seq("common prefix zz99", "common prefix zz98"))
      .toDF("name")
    val got = Fuzzy.fuzzySelfJoin(df, 2, dfCap = 3L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val brute = Fuzzy.fuzzySelfJoin(df, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == brute)
    assert(got.contains(("common prefix zz98", "common prefix zz99", 1)))
  }
}
