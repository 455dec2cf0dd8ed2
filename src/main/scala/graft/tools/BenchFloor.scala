package graft.tools

/** Per-query drift normalization for bench artifacts (r16 verdict #7).
  *
  * Given the committed same-tree noise floor (`BENCH_NOISE.json`) and a
  * pass's per-query seconds, emits a `"floor"` JSON block with each
  * query's ratio to its floor entry — min across the floor artifact's
  * passes, the best the tree has done, unlike the cliff SLO's
  * worst-pass-based thresholds ([[BenchTrace.parseBaseline]]). A mover
  * table then self-labels: a uniform ~1.2–1.4× band across trivial
  * scans and heavy lanes alike is host drift; a lone large mover is a
  * code regression.
  *
  * Pure functions so the parse/ratio arithmetic is unit-testable
  * without running a bench; `graft.Bench` wires in the file IO.
  */
object BenchFloor {

  /** Per-query floor: min across every pass map in the artifact text.
    * The floor artifact may itself carry a `"floor"` block from the
    * run that produced it (ratios keyed by query name) — stripped
    * first, or a ratio below the query's seconds would masquerade as
    * the floor value. Non-query keys (probe fields, totals) parse too
    * but are only ever looked up by query name.
    */
  /** Drops the artifact's trailing `"floor"` block — shared by this
    * parser and [[BenchTrace.parseArtifact]] so the two can't diverge
    * on what "the floor block" is.
    */
  private[tools] def stripFloorBlock(text: String): String =
    text.replaceAll("(?s)\"floor\":\\{.*", "")

  def floorMin(floorText: String): Map[String, Double] = {
    val stripped = stripFloorBlock(floorText)
    val pair = """"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)""".r
    pair.findAllMatchIn(stripped).toSeq
      .map(m => m.group(1) -> m.group(2).toDouble)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
  }

  private def f2(v: Double): String =
    "%.2f".formatLocal(java.util.Locale.ROOT, v)
  private def f3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** The `"floor"` artifact block (leading comma included), or None if
    * the floor shares no queries with `results` or totals to zero —
    * an absent block is honest; a ratio against nothing is not.
    * `results` should be the artifact's own per-query minima across
    * its passes (steady state vs the floor's steady state — pass-1
    * ratios false-flag warm-state queries like the BPE apply's
    * memoized merge table at 12× when their steady ratio is 1.2).
    * `total` covers ALL of `results` (it may include queries the
    * floor lacks); `total_ratio` compares it to the floor summed over
    * the INTERSECTION, so a query new to this tree inflates the ratio
    * visibly rather than vanishing from the denominator silently.
    */
  def block(floorPath: String, floorText: String,
      results: Seq[(String, Double)], total: Double): Option[String] = {
    val fm = floorMin(floorText)
    val ratios = results.sortBy(_._1).flatMap { case (k, v) =>
      fm.get(k).filter(_ > 0).map(fl => s"""  "$k": ${f2(v / fl)}""")
    }
    val floorTotal = results.flatMap(r => fm.get(r._1).filter(_ > 0)).sum
    if (ratios.isEmpty || floorTotal <= 0) None
    else Some(
      s""",
         |"floor":{"path":"$floorPath","total_ratio":${f3(total / floorTotal)},
         |"ratios":${ratios.mkString("{\n", ",\n", "\n}")}}""".stripMargin)
  }
}
