package graft

/** The recall regression gate — closes the one quality channel the
  * correctness gate cannot see: the ANN operators are no-oracle by
  * design, so an index-parameter drift (fewer probes, smaller codebook,
  * a broken centroid refresh) lands every round GREEN on the oracle
  * while quietly shipping worse retrieval. The bench already records
  * each operator's sweep recall per round; this gate compares the
  * fresh sweep against the committed prior record
  * (`RECALL_BASELINE.json`) and FLAGS any entry that dropped more than
  * `tol` — surfaced in the bench's JSON line (`recall_gate`) where the
  * driver reads it, and loudly on stderr.
  *
  * A thrown sweep records −1, which is always a violation against any
  * positive baseline — a BROKEN recall measurement must fail the gate,
  * not pass it by absence. A key missing from the current sweep (an
  * allowlisted partial run) is NOT a violation: partial local runs
  * don't gate. Raise the baseline when a retune genuinely improves an
  * operator; lower it only with the reasoning recorded in the round
  * artifacts (the gate exists precisely to make that step deliberate).
  */
object RecallGate {

  val DefaultTolerance = 0.05

  /** Entries whose current recall fell more than `tol` below baseline:
    * name → (baseline, current).
    */
  def violations(current: Map[String, Double], baseline: Map[String, Double],
                 tol: Double = DefaultTolerance): Map[String, (Double, Double)] =
    baseline.flatMap { case (k, b) =>
      current.get(k).filter(_ < b - tol).map(c => k -> (b, c))
    }

  /** Read a flat `{"name": value, ...}` baseline file; absent or
    * malformed reads as empty (the gate is then vacuous — a fresh clone
    * without the record must not fail its first bench).
    */
  def loadBaseline(path: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      "\"([^\"]+)\"\\s*:\\s*(-?[0-9]+(?:\\.[0-9]+)?)".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .toMap
    } catch { case _: Throwable => Map.empty }

  /** The `recall_gate` JSON fragment for the bench record. */
  def renderJson(viol: Map[String, (Double, Double)],
                 baselineEntries: Int, checked: Int,
                 tol: Double = DefaultTolerance): String = {
    def fmt(v: Double) = {
      val s = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
        .replaceAll("0+$", "").stripSuffix(".")
      if (s.isEmpty || s == "-") "0" else s
    }
    val vj = viol.toSeq.sortBy(_._1).map { case (k, (b, c)) =>
      "\"" + k + "\":{\"baseline\":" + fmt(b) + ",\"current\":" + fmt(c) + "}"
    }.mkString("{", ",", "}")
    s"""{"status":"${if (viol.isEmpty) "ok" else "fail"}","tolerance":$tol,"baseline_entries":$baselineEntries,"checked":$checked,"violations":$vj}"""
  }
}
