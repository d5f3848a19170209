package graft

/** The per-entry PERFORMANCE regression gate — the [[RecallGate]]'s
  * sibling for the time axis: every round's bench already records
  * per-entry min-of-N seconds, but until now a real slowdown only
  * surfaced when a judge eyeballed the artifact against the previous
  * round (q_dedup_best cost a full round of adjudication that way).
  * This gate compares each entry's ADJUDICATED min — the end-of-suite
  * remeasure when the entry was remeasured, the in-suite min otherwise
  * — against a committed per-entry baseline (`PERF_BASELINE.json`) and
  * flags anything above the band.
  *
  * The band is multiplicative + absolute ([[band]]): in-suite mins
  * breathe with session warmth, entry adjacency, and machine era
  * (BENCH_ISOLATED_r13/r15 quantified 1.5–2× swings that are
  * environmental, and the remeasure path exists to shake those out), so
  * a tight band would fire weekly on noise and train everyone to ignore
  * it. `baseline × 1.6 + 0.5 s` is calibrated against the r14/r15
  * records: every environmental swing that later adjudicated clean
  * stays inside it AFTER remeasure, while a genuine 2× slowdown on a
  * multi-second entry fires.
  *
  * Like the recall gate: a missing CURRENT entry (allowlisted partial
  * run) does not gate; an entry missing from the BASELINE (new this
  * round) does not gate — it enters the baseline when the round's
  * record is adopted; a present-but-unparsable baseline file FAILS the
  * gate rather than silently disabling it. Refresh the baseline from
  * each adopted round's BENCH_FULL via [[graft.tools.PerfBaselineGen]];
  * lower an entry's baseline only with the reasoning recorded in the
  * round artifacts.
  */
object PerfGate {

  /** Multiplicative tolerance over the baseline min. */
  val DefaultFactor = 1.6

  /** Absolute floor (seconds) — sub-second entries cross any ratio on a
    * single GC pause.
    */
  val DefaultAbsSec = 0.5

  def band(baseline: Double, factor: Double = DefaultFactor,
           absSec: Double = DefaultAbsSec): Double =
    baseline * factor + absSec

  /** Entries whose adjudicated current min exceeds the band:
    * name → (baseline, current). A broken entry (−1) does not gate here
    * — the bench's own `broken` count already fails it louder.
    */
  def violations(current: Map[String, Double], baseline: Map[String, Double],
                 factor: Double = DefaultFactor,
                 absSec: Double = DefaultAbsSec): Map[String, (Double, Double)] =
    baseline.flatMap { case (k, b) =>
      current.get(k).filter(c => c >= 0 && c > band(b, factor, absSec))
        .map(c => k -> (b, c))
    }

  /** The era ratchet's tolerance on the bench's partitioned-write IO
    * sentinel: a current era slower than the baseline's stamped era by
    * more than this factor means the write-heavy entries' baselines
    * predate the machine era — their per-entry comparisons fire on
    * weather (the r16 `ivf_index_build` adjudication: clean floor 1.7×
    * its baseline on UNCHANGED code while the CPU busy-loop read
    * 1.0–1.08), so the gate names the era ONCE, loudly, as "baseline
    * stale — regenerate". 2.0 sits above the sentinel's own measured
    * intra-era breathing (warm samples 0.81–1.63 s across the
    * BENCH_ISOLATED_r16 series — all adjudicated clean; a 1.5 factor
    * over a low stamp would fire on that weather) while a genuine era
    * shift (the r16 class read write-path floors at 1.7–2.8×) still
    * crosses it. A FASTER era does not fail: the band only loosens, and
    * the routine regenerate-on-adoption re-tightens it. Per-entry
    * violations are REPORTED alongside the era error, never suppressed
    * — a pure-compute regression landing in the same round as an era
    * drift must not ship unflagged behind the era message; the era
    * error tells the adjudicator which violations to re-read as
    * weather.
    */
  val EraFactor = 2.0

  /** The `_io_era` stamp of a baseline file — the IO sentinel seconds
    * the baseline's numbers were recorded under. Stored as a JSON
    * STRING so [[RecallGate.loadBaselineChecked]]'s numeric line parser
    * can never read the stamp as a gated entry. `Right(None)`: file or
    * stamp absent (pre-stamp baseline — no era check); `Left(reason)`:
    * a PRESENT stamp that does not parse — the gate fails with the
    * reason rather than silently skipping the era check (the same
    * corrupt-baseline discipline as `loadBaselineChecked`).
    */
  def readIoEra(path: String): Either[String, Option[Double]] = {
    val txt =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8"))
      catch { case _: Throwable => None }
    txt match {
      case None => Right(None)
      case Some(t) =>
        "\"_io_era\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(t) match {
          case None => Right(None)
          case Some(m) =>
            try Right(Some(m.group(1).toDouble))
            catch {
              case _: Throwable => Left(s"$path has an unparsable _io_era " +
                s"stamp '${m.group(1)}' - a present-but-broken stamp must " +
                "fail the gate, not silently disable the era check; " +
                "regenerate via graft.tools.PerfBaselineGen")
            }
        }
    }
  }

  /** "Baseline stale" when the CURRENT IO sentinel reads slower than the
    * stamped era by more than `factor`; None when the stamp is absent
    * (pre-stamp baseline — no era check, the per-entry band is all there
    * is) or the current reading is missing/invalid.
    */
  def eraError(stamped: Option[Double], currentIoMin: Double,
               factor: Double = EraFactor): Option[String] =
    stamped.filter(s => s > 0 && currentIoMin > 0 && currentIoMin > s * factor)
      .map(s => "baseline stale - io sentinel " + GateJson.fmt(currentIoMin) +
        "s vs stamped era " + GateJson.fmt(s) + s"s (> x$factor): the " +
        "machine's partitioned-write era drifted since the baseline was " +
        "recorded, so write-path per-entry violations below are weather; " +
        "re-pin via graft.tools.PerfBaselineGen on a clean current-era record")

  /** The `perf_gate` JSON fragment for the bench record. `factor` /
    * `absSec` are the band ACTUALLY gated against — callers that tune
    * [[violations]] must pass the same values here or the committed
    * artifact would misstate the band.
    */
  def renderJson(viol: Map[String, (Double, Double)],
                 baselineEntries: Int, checked: Int,
                 error: Option[String] = None,
                 factor: Double = DefaultFactor,
                 absSec: Double = DefaultAbsSec): String = {
    val status = if (error.isDefined || viol.nonEmpty) "fail" else "ok"
    s"""{"status":"$status","factor":$factor,"abs_sec":$absSec,"baseline_entries":$baselineEntries,"checked":$checked,"violations":${GateJson.violationsJson(viol)}${GateJson.errJson(error)}}"""
  }
}
