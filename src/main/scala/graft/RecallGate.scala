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
/** The ONE copy of the gate artifacts' JSON primitives — shared by
  * [[RecallGate]], [[PerfGate]], and [[graft.tools.BaselineGen]], so a
  * formatting or escaping tweak can never diverge a committed baseline
  * from the gate output that reads it.
  */
private[graft] object GateJson {

  /** 4-decimal, trailing zeros stripped, still a valid JSON number. */
  def fmt(v: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
      .replaceAll("0+$", "").stripSuffix(".")
    if (s.isEmpty || s == "-") "0" else s
  }

  /** `{"name":{"baseline":b,"current":c},...}`, name-sorted. */
  def violationsJson(viol: Map[String, (Double, Double)]): String =
    viol.toSeq.sortBy(_._1).map { case (k, (b, c)) =>
      "\"" + k + "\":{\"baseline\":" + fmt(b) + ",\"current\":" + fmt(c) + "}"
    }.mkString("{", ",", "}")

  /** `,"error":"..."` (escaped) or empty. */
  def errJson(error: Option[String]): String =
    error.fold("")(e =>
      ",\"error\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
}

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

  /** Read a flat `{"name": value, ...}` baseline file, distinguishing
    * the two absent-data cases the gate must treat OPPOSITELY:
    * file-absent → `Right(empty)` (vacuous gate — a fresh clone without
    * the record must not fail its first bench); file-present-but-
    * unparsable → `Left(reason)` (a corrupted committed baseline
    * silently disabling the gate is the exact drift channel the gate
    * exists to close — the caller fails the gate with the reason).
    *
    * Parsing is LINE-based over the machine-generated file: only a full
    * line of the form `"key": <number>[,]` is a numeric entry, so a
    * number-looking fragment inside a string value (`_comment`,
    * `_budget`) can never be read as a baseline. String-valued keys are
    * metadata, skipped here ([[readStamp]] reads `_budget`).
    */
  def loadBaselineChecked(path: String): Either[String, Map[String, Double]] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return Right(Map.empty)
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val num = "^\\s*\"([^\"]+)\"\\s*:\\s*(-?[0-9]+(?:\\.[0-9]+)?)\\s*,?\\s*$".r
      val entries = txt.linesIterator.collect {
        case num(k, v) => k -> v.toDouble
      }.toMap
      if (entries.isEmpty)
        Left(s"$path exists but holds no parsable numeric entries - " +
          "corrupted baseline, regenerate it (the gate fails rather than " +
          "silently disabling itself)")
      else Right(entries)
    } catch {
      case e: Throwable => Left(s"$path unreadable: ${e.getMessage}")
    }
  }

  /** Back-compat form: absent OR malformed reads as empty. Gating
    * callers use [[loadBaselineChecked]] — this stays for probes that
    * only want best-effort values.
    */
  def loadBaseline(path: String): Map[String, Double] =
    loadBaselineChecked(path).getOrElse(Map.empty)

  /** The `_budget` stamp of a baseline file (the ANN parameters the
    * recorded recalls were measured under), or None when the file or
    * stamp is absent.
    */
  def readStamp(path: String): Option[String] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      "\"_budget\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(txt).map(_.group(1))
    } catch { case _: Throwable => None }

  /** The canonical stamp for the CURRENT AnnBudget — written into the
    * baseline by [[graft.tools.RecallBaselineGen]] and compared by the
    * bench: a baseline recorded under different index parameters is
    * STALE (its recall values are not comparable to a sweep under the
    * new budget), and gating against it would either false-fire or
    * require the silent hand-edit the ratchet exists to prevent.
    */
  def budgetStamp(planes: Int, lshT: Int, lshMpT: Int,
                  nlist: Int, nprobe: Int): String =
    s"planes=$planes;lshT=$lshT;lshMpT=$lshMpT;nlist=$nlist;nprobe=$nprobe"

  /** The `recall_gate` JSON fragment for the bench record. `error`
    * (corrupt baseline / stale budget stamp) forces status "fail" even
    * with zero per-entry violations — a gate that cannot read its
    * baseline must say so, not pass vacuously.
    */
  def renderJson(viol: Map[String, (Double, Double)],
                 baselineEntries: Int, checked: Int,
                 tol: Double = DefaultTolerance,
                 error: Option[String] = None): String = {
    val status = if (error.isDefined || viol.nonEmpty) "fail" else "ok"
    s"""{"status":"$status","tolerance":$tol,"baseline_entries":$baselineEntries,"checked":$checked,"violations":${GateJson.violationsJson(viol)}${GateJson.errJson(error)}}"""
  }
}
