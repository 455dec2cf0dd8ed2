package graft

/** Every SparkEntry query executes at sf0.001 with a sane schema; every
  * oracle key refers to an existing query. Correctness-vs-DuckDB is the
  * driver's t2 gate (tools/check.py locally) — this spec guards
  * executability and the queries↔oracle wiring.
  */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes with non-degenerate schema") {
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty)
      assert(df.schema.forall(_.dataType.typeName != "null"),
        s"NullType column in ${df.schema.map(f => s"${f.name}:${f.dataType.typeName}")}")
      val n = df.count()
      // only the anti-join and near-dup pair queries may legitimately be
      // empty at this scale
      val mayBeEmpty = Set("q_join_anti")
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
