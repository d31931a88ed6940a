package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Locale-ROOT decimal formatting for every number that lands in the
    * committed JSON baseline. Round 15 pinned ROOT as the JVM DEFAULT
    * locale for this (`Locale.setDefault(Locale.ROOT)`), which broke
    * embedded Derby: a NEW database derives its territory from the JVM
    * default locale, and ROOT's empty language code fails validation
    * (`ERROR XBM0X: Supplied locale description '' is invalid`), so
    * `src_jdbc_table` recorded -1 in both the r15 final-gate baseline
    * and the driver bench while staying oracle-green in Verify (which
    * never pinned the locale) — exactly the silent split a JVM-global
    * mutation invites. ROOT is now scoped to the formatting sites; the
    * JVM default stays whatever the host set. (stderr f-interpolations
    * keep the default locale — a comma-decimal WARN line is cosmetic,
    * only the JSON artifact needs byte-stable numbers.) */
  private[graft] def jd(fmt: String, v: Double): String =
    String.format(java.util.Locale.ROOT, fmt, Double.box(v))

  /** A flagged key's load marker is the MAX of samples taken at key
    * start and key end (round 16, VERDICT r15 #3): sampling only at
    * key END missed the r15 `dedup_ngram_jaccard` adjudication — the
    * 1-minute load average had already decayed below the 2x-median
    * threshold by the time the 32 s key finished, so a contention flag
    * the isolated rerun proved host-caused carried
    * `host_attributed:false`. -1 markers (unavailable /proc) lose the
    * max against any real sample and only survive when BOTH samples
    * are missing. */
  private[graft] def keyWindowLoad(startLoad: Double, endLoad: Double): Double =
    math.max(startLoad, endLoad)

  /** Where a run's JSON line lands (round 16, VERDICT r15 #2):
    * `bench_full.json` is the committed baseline the regression guard
    * reads its priors from, so ONLY a full-suite, reference-sf run
    * with ZERO failed keys may overwrite it. The r15 final gate
    * committed a baseline with `src_jdbc_table:-1` — the key lost its
    * prior and the gate commit advertised "182 keys" while timing 181.
    * A run with failures now self-marks `baseline_ineligible` and is
    * redirected to `bench_filtered.json`, leaving the last good
    * committed baseline (and every key's prior) intact.
    *
    * BEATS-REFERENCE gate (round 17): eligibility now also requires
    * the run to be at-or-under the COMMITTED reference (read via
    * `git show HEAD:bench_full.json`, falling back to the working
    * tree only where git is unavailable — a dirty working-tree file
    * must not become the yardstick, that indirection is the exact
    * r16 hole) over the COMMON key set (see [[beatsReference]] — a
    * raw-total ratchet would permanently block baselines the first
    * time a round adds a key). The adjudication policy ("fastest
    * clean run stands") was prose only, and the round-16 close
    * auto-committed the working tree — which held the contended
    * 152.2 s driver run — as the baseline, silently inflating two
    * keys' priors ~5x. A slower full run now self-redirects to
    * bench_filtered.json, so whatever lands in the working tree's
    * bench_full.json IS baseline-eligible by construction.
    * Deliberate re-baselining after an accepted slowdown:
    * SPARK_GRAFT_BENCH_ACCEPT_SLOWER=1. */
  private[graft] def outFileFor(fullSuite: Boolean, sfMatchesRef: Boolean,
                                failedEmpty: Boolean,
                                beatsReference: Boolean): String =
    if (fullSuite && sfMatchesRef && failedEmpty && beatsReference)
      "bench_full.json"
    else "bench_filtered.json"

  /** Suite-wide ambient slowdown: the MEDIAN current/prior ratio over
    * every key with a usable prior. A loaded host inflates every key
    * roughly uniformly (round 10 measured a 1.34x median with 1.5-1.8x
    * on untimed build counters), so the median ratio IS the ambient
    * factor; per-key regressions are the outliers above it. Clamped at
    * >=1.0 so a quieter-than-baseline run tightens nothing (we only
    * ever discount slowdown, never amplify sensitivity on noise).
    */
  private[graft] def ambientRatio(results: Map[String, Double],
                                  prev: Map[String, Double]): Double = {
    val ratios = results.collect {
      case (k, v) if v > 0 && prev.get(k).exists(_ > 0) => v / prev(k)
    }.toSeq.sorted
    // the median is only an AMBIENT signal when it aggregates many
    // keys; on a SPARK_GRAFT_BENCH_KEYS-filtered run of a few keys the
    // regressed key's own ratio IS the median and the guard would
    // normalize itself away (amb=5 -> threshold 15x prior). Below 30
    // usable ratios, fall back to raw 1.0 — filtered triage runs get
    // the plain 3x rule. Known residual, documented: a real
    // regression hitting >= half the FULL suite is absorbed into the
    // ambient and needs the absolute total (also in the JSON) to spot.
    if (ratios.size < 30) 1.0 else math.max(1.0, ratios(ratios.size / 2))
  }

  /** The regression-guard decision, factored out so a spec can fire it
    * on planted timings without a bench run. Two rules, both gated on
    * >1 s absolute (sub-second keys jitter past any ratio on host
    * noise alone and are never the story):
    *
    *  - KNOWN key (has a committed median): >3x its prior time AFTER
    *    dividing out the suite's ambient ratio (round 11) — the
    *    round-10 run was 1.34x slower across the board from host load
    *    and the un-normalized guard flagged 19 keys, burning a judging
    *    cycle on ambiguity. An all-keys-uniformly-slower run now flags
    *    nothing; only keys that outrun the suite's own slowdown fire.
    *  - KEY WITHOUT A USABLE MEDIAN — first-time, or recorded as
    *    failed (-1) in the reference, so the prior-ratio rule is blind
    *    to it either way: >10x the committed suite MEAN, likewise
    *    AFTER dividing out the ambient ratio (round 12 — the committed
    *    mean is a quiet-host number, so a loaded host inflates v but
    *    never the ceiling, reopening exactly the round-10
    *    false-positive mode on every new key). The established
    *    surface's heaviest honest keys run ~5-7x the mean (streaming
    *    ingest loops), so a new key of that class enters unflagged,
    *    while an r8-style 15 s entry (~35x) fires on arrival. Keys
    *    failing in THIS run (-1) are the `failed` array's story, not a
    *    regression.
    */
  private[graft] def regressionsOf(results: Map[String, Double],
                                   prev: Map[String, Double]): List[String] = {
    val prevOk = prev.values.filter(_ > 0)
    val prevMean = if (prevOk.isEmpty) 0.0 else prevOk.sum / prevOk.size
    val amb = ambientRatio(results, prev)
    results.collect {
      case (k, v) if v > 1.0 && prev.get(k).exists(p => p > 0 && v > 3 * amb * p) => k
      case (k, v) if v > 1.0 && prev.get(k).forall(_ <= 0) && prevMean > 0 &&
        v > 10 * amb * prevMean => k
    }.toList.sorted
  }

  /** The documented host-attribution thresholds (round 15, VERDICT
    * r14 #2 — two consecutive driver benches adjudicated "host was
    * busy" by hand, so the adjudication is now mechanical): a flagged
    * key is annotated `host_attributed` when its own 1-minute load
    * average exceeds TWICE the suite's median (the r14 flags read
    * load 9.0-11.3 against a suite median of 3.0), or when the
    * hypervisor stole over 5% of the key's window (the r12 forensics
    * threshold — contention load_avg cannot see). The annotation
    * INFORMS the reader; it never auto-waives the flag (standing
    * steal policy, SURVEY §9).
    *
    * The round-17 baseline-load clause (VERDICT r16 #1) requires TWO
    * conjuncts: key load > 2x the SAME key's committed-quiet-run load
    * AND key load above this run's own suite median — the key must be
    * a load outlier within its run, not merely above a low quiet-run
    * prior. Without the second conjunct, a genuine code regression on
    * a mildly-loaded host self-attributes: early-suite keys baseline
    * at loads ~1.4-2.5 (the suite's own run queue ramping), so an
    * ambient load of ~3 — normal mid-suite in every recorded round —
    * would clear 2x the prior for exactly the keys whose regressions
    * most need to stay unattributed (round-17 review finding). */
  private[graft] def hostAttributed(keyLoad: Double, suiteMedianLoad: Double,
                                    keySteal: Double,
                                    baselineKeyLoad: Double): Boolean =
    (keyLoad > 0 && suiteMedianLoad > 0 && keyLoad > 2.0 * suiteMedianLoad) ||
      keySteal > 0.05 ||
      (keyLoad > 0 && baselineKeyLoad > 0 && keyLoad > 2.0 * baselineKeyLoad &&
        suiteMedianLoad > 0 && keyLoad > suiteMedianLoad)

  /** Counter-evidence attribution (round 17, VERDICT r16 #1): the
    * same-run-median load clause above under-attributes when the WHOLE
    * suite is contended — the r16 driver run had suite median load
    * 6.18, so `dedup_ngram_jaccard` at load 8.89 flagged 5.11x with
    * `host_attributed:false` even though its volume counters were
    * bit-identical to the baseline's (124,839 candidates / 256
    * rescores) and only the phase WALLS had stretched (docord build
    * 1,321→12,036 ms, rescore 2,618→10,219 ms) — the uniform
    * wall-stretch signature of contention, the fifth consecutive
    * round adjudicated by a manual isolated rerun. This clause makes
    * that adjudication mechanical: a flagged key is counter-attributed
    * when its own per-key counters say "same work, slower clock":
    *
    *  - the key's counter SET is unchanged vs the committed baseline
    *    (a counter appearing or vanishing means the code path changed
    *    — never waivable on counter evidence), and
    *  - every volume counter (no `_ms` suffix) is BIT-IDENTICAL to
    *    the baseline's — the ops' volumes are seeded-deterministic,
    *    so any drift is a real plan/algorithm change, and
    *  - the phase timers corroborate: the LOWER-median `_ms`
    *    inflation reaches at least HALF the key's wall ratio — the
    *    extra wall demonstrably landed inside the measured phases
    *    rather than in untracked code (a genuine regression in an
    *    untracked phase keeps flat `_ms` counters and stays
    *    unattributed). Lower median, not upper (round-17 review):
    *    contention stretches EVERY phase together (the r16 evidence:
    *    docord 9.1x AND rescore 3.9x), while a genuine per-unit-cost
    *    regression stretches ONE phase against flat siblings — on a
    *    two-phase key the upper median would read the single
    *    stretched phase as corroboration and attribute a real
    *    regression to the host. At least TWO usable `_ms` ratios are
    *    required (round 18) — with one timer the lower median is that
    *    timer and the single-phase invariant would be vacuous.
    *
    * Keys without counters (most of the surface) yield false — no
    * evidence is not evidence of contention; the load/steal clauses
    * and the isolated-rerun workflow still cover them. Like every
    * attribution, this ANNOTATES the flag (standing policy): the key
    * stays in `regressions` either way. */
  private[graft] def counterAttributed(key: String, wallRatio: Double,
                                       cur: Map[String, Long],
                                       prior: Map[String, Long]): Boolean = {
    if (wallRatio <= 1.0) return false
    val pfx = key + "."
    val c = cur.collect { case (k, v) if k.startsWith(pfx) => k -> v }
    val p = prior.collect { case (k, v) if k.startsWith(pfx) => k -> v }
    if (c.isEmpty || c.keySet != p.keySet) return false
    val (ms, vol) = c.keySet.partition(_.endsWith("_ms"))
    if (vol.isEmpty || vol.exists(k => c(k) != p(k))) return false
    val msRatios = ms.toSeq
      .flatMap { k => if (p(k) > 0 && c(k) > 0) Some(c(k).toDouble / p(k)) else None }
      .sorted
    // >= TWO usable phase ratios (round 18, r17 advice): on a key with
    // exactly one `_ms` counter the lower median IS that single phase,
    // so the "single stretched phase never attributes" invariant was
    // vacuous for the one-timer shape (join_range_bigbig:
    // range_estimate_ms beside two volume counters) — a genuine
    // per-unit-cost regression in the one tracked phase would have
    // self-attributed. Corroboration requires a second, independently
    // stretched phase; one-timer keys stay on the load/steal clauses.
    msRatios.size >= 2 && msRatios((msRatios.size - 1) / 2) >= 0.5 * wallRatio
  }

  /** Self-triaging detail for each flagged key: prior, current, raw
    * ratio, the key's own hypervisor-steal fraction, AND (round 13)
    * the key's own 1-minute load average beside the suite's median —
    * three rounds running, the driver-host guard flag adjudicated to
    * host contention, and the proof (`load_avg_keys`) was in the JSON
    * but nothing cited it at the flag site. A flag now arrives
    * pre-annotated ("3.0x prior, steal 0, load 4.0 vs suite median
    * 2.9" reads as host-attributed in one glance) while STAYING
    * visible — the annotation informs the adjudication, it never
    * auto-waives the flag (the steal policy, SURVEY §9). Round 15
    * adds the [[hostAttributed]] verdict as its own field so the
    * adjudication is mechanical, not a reader judgment call. Round 17
    * widens the evidence (VERDICT r16 #1): the key's load is ALSO
    * compared to the committed baseline's load for the SAME key
    * (`load_avg_baseline` — the suite's own 32-thread run queue makes
    * the absolute load self-generated, so the same key's quiet-run
    * load is the right yardstick when the whole run is contended and
    * the same-run median is inflated), and [[counterAttributed]]
    * brings the volume-counter/phase-wall evidence in as its own
    * field. */
  private[graft] def regressionsDetailJson(regressions: List[String],
                                           results: Map[String, Double],
                                           prev: Map[String, Double],
                                           committedPrev: Map[String, Double],
                                           keySteal: Map[String, Double],
                                           keyLoad: Map[String, Double],
                                           prevLoad: Map[String, Double],
                                           curCounters: Map[String, Long],
                                           prevCounters: Map[String, Long]): String = {
    val loads = keyLoad.values.filter(_ >= 0).toSeq.sorted
    val suiteMedianLoad = if (loads.isEmpty) -1.0 else loads(loads.size / 2)
    regressions.map { k =>
      val p = prev.get(k).filter(_ > 0).getOrElse(-1.0)
      val r = if (p > 0) results(k) / p else -1.0
      // counter attribution compares SELF-CONSISTENTLY against the
      // committed baseline (round-18 review): its `_ms`/volume priors
      // are the committed text's, so its wall ratio must be the
      // committed prior's too — when bench_full.json is dirty
      // (ACCEPT_SLOWER residue, consecutive uncommitted runs), the
      // working-tree ratio `r` above is a DIFFERENT yardstick and
      // mixing them could annotate a partially-regressed run as
      // contention. `ratio_committed` lands in the JSON so the
      // attribution is recomputable from the artifact alone; on a
      // clean tree it equals `ratio`.
      val pCom = committedPrev.get(k).filter(_ > 0).getOrElse(-1.0)
      val rCom = if (pCom > 0) results(k) / pCom else -1.0
      val baseLoad = prevLoad.get(k).filter(_ > 0).getOrElse(-1.0)
      val attributed = hostAttributed(keyLoad.getOrElse(k, -1.0),
        suiteMedianLoad, keySteal.getOrElse(k, -1.0), baseLoad)
      val counterAttr = counterAttributed(k, rCom, curCounters, prevCounters)
      s""""$k":{"prior":${jd("%.3f", p)},"cur":${jd("%.3f", results(k))},"ratio":${jd("%.2f", r)},"ratio_committed":${jd("%.2f", rCom)},"steal_frac":${jd("%.4f", keySteal.getOrElse(k, -1.0))},"load_avg":${jd("%.2f", keyLoad.getOrElse(k, -1.0))},"load_avg_suite_median":${jd("%.2f", suiteMedianLoad)},"load_avg_baseline":${jd("%.2f", baseLoad)},"host_attributed":$attributed,"counter_attributed":$counterAttr}"""
    }.mkString("{", ",", "}")
  }

  /** Resolve the committed-reference text from a bounded `git show
    * HEAD:bench_full.json` outcome (round 18, r17 advice; factored for
    * BenchGuardSpec). `Some((0, txt))` — the committed text stands.
    * `Some((nonzero, _))` — no trustworthy committed text, so the
    * result is EMPTY (no priors/loads/counters), never the
    * working-tree fallback — a dirty working-tree artifact standing in
    * for an unreadable committed one is exactly the provenance hole
    * the committed read exists to close. Whether the empty text also
    * grants first-run ELIGIBILITY is a separate question answered by
    * [[committedGateUnverifiable]] (round 19, r18 advice): only the
    * genuinely-absent output shapes do. `None` — git itself was
    * unavailable or wedged past the subprocess bound: the working-tree
    * text is the documented last resort (reference_dirty annotates its
    * provenance). */
  private[graft] def committedTextOf(gitOutcome: Option[(Int, String)],
                                     workingTreeTxt: String): String =
    gitOutcome match {
      case Some((0, txt)) => txt
      case Some(_) => ""
      case None => workingTreeTxt
    }

  /** True when a nonzero `git show HEAD:bench_full.json` output
    * matches git's path-absent messages (round 19, r18 advice):
    * "does not exist in" (path not at HEAD) and "exists on disk, but
    * not in" (working-tree file never committed). These messages are
    * NECESSARY but not SUFFICIENT evidence of a genuinely absent
    * committed reference: a corrupt repo emits the SAME second
    * message when HEAD's ref is garbage or the commit object is
    * missing (verified empirically in a scratch repo — in-round
    * review of the first revision of this gate), so the caller must
    * additionally require that HEAD peels to a real commit
    * ([[committedGateUnverifiable]]'s `headResolves`). "invalid
    * object name" is deliberately NOT matched: a no-commits repo and
    * a garbage-HEAD repo emit it identically, and only the second
    * may hide a committed baseline — establishing a first baseline
    * therefore requires at least one commit (or the ACCEPT_SLOWER
    * escape), the conservative trade. */
  private[graft] def committedRefAbsentOutput(out: String): Boolean =
    out.contains("does not exist in") ||
      out.contains("exists on disk, but not in")

  /** The fail-safe half of the round-19 fix (r18 advice): `git show`
    * ran but exited nonzero in a way that does not PROVE the
    * committed reference absent — a git environment error while a
    * committed baseline may exist. The beats gate cannot be evaluated
    * against a reference we cannot read, and treating the error as
    * "no committed reference" would grant trivial first-run
    * eligibility (empty map → beatsReference true), letting a
    * contended/slower run overwrite bench_full.json — the r16 hole
    * class this gate exists to close. Such a run is marked
    * baseline-INELIGIBLE (redirected to bench_filtered.json; the
    * documented ACCEPT_SLOWER=1 operator escape still overrides).
    * Proof of absence = the path-absent message AND `headResolves`
    * (HEAD peels to a real commit via `git rev-parse HEAD^{commit}`):
    * a garbage ref or missing commit object emits the same
    * "exists on disk, but not in 'HEAD'" message as a genuinely
    * uncommitted file, and only the rev-parse probe separates them
    * (both corrupt shapes fail it, the healthy repo passes —
    * verified empirically). Exit 0 is verifiable; `None` (git
    * unavailable/wedged) keeps the documented working-tree-fallback
    * path, where beatsReference still compares against real text. */
  private[graft] def committedGateUnverifiable(
      gitOutcome: Option[(Int, String)],
      headResolves: Boolean): Boolean =
    gitOutcome match {
      case Some((code, out)) if code != 0 =>
        !(committedRefAbsentOutput(out) && headResolves)
      case _ => false
    }

  /** Run a git subprocess with a BOUNDED wall (round 18, review: the
    * unbounded readAllBytes+waitFor pattern could hang the whole bench
    * on a wedged git — index.lock, hung NFS): stdout+stderr drained on
    * a daemon thread (output larger than the pipe buffer cannot
    * deadlock the bounded wait), 10 s waitFor, destroyForcibly on
    * timeout. None = git could not run or did not finish (unavailable
    * / wedged); Some((exit, output)) otherwise. */
  private def boundedGit(args: String*): Option[(Int, String)] =
    try {
      val pb = new ProcessBuilder(("git" +: args): _*)
        .redirectErrorStream(true)
      // C-locale messages (round 19): committedRefAbsentOutput matches
      // git's English text literally — under a localized git (user
      // LANG/LC_ALL) a genuinely-absent message would read as an
      // unrecognized environment error. That degrades fail-safe
      // (ineligible + loud warning, never baseline pollution), but
      // pinning the subprocess locale removes the misread entirely.
      pb.environment().put("LC_ALL", "C")
      val p = pb.start()
      val buf = new java.io.ByteArrayOutputStream()
      val drain = new Thread(() => {
        try { p.getInputStream.transferTo(buf); () }
        catch { case _: Throwable => () }
      })
      drain.setDaemon(true)
      drain.start()
      if (!p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly()
        None
      } else {
        drain.join(2000)
        // A drain still alive after the bounded join means git exited
        // but its output pipe is wedged (round 19, r18 advice): the
        // buffer is silently TRUNCATED, and exit-0-with-partial-text
        // would regex-parse into partial priors/counters — wrong
        // attribution yardsticks with no provenance marker. Return
        // None so the documented fallback/warning paths engage.
        if (drain.isAlive) None
        else Some(p.exitValue() -> buf.toString("UTF-8"))
      }
    } catch { case _: Throwable => None }

  /** Parse the committed reference's per-key medians, gated on its sf
    * matching this run's (factored out for BenchGuardSpec): on a
    * mismatch returns no priors (every cross-sf ratio is meaningless)
    * and `false` — the caller then redirects its own output away from
    * the reference file. A reference without an `sf` field (or none at
    * all) matches anything, preserving first-run behavior. */
  private[graft] def parseReference(txt: String,
                                    sfDir: String): (Map[String, Double], Boolean) = {
    val prevSf = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
    if (!prevSf.forall(_ == sfDir)) (Map.empty[String, Double], false)
    else {
      val qstart = txt.indexOf("\"queries\":{")
      val qend = if (qstart < 0) -1 else txt.indexOf("}", qstart)
      // an old-format/truncated reference without a queries field must
      // yield EMPTY priors (the documented contract) — the unguarded
      // substring fabricated bogus priors from whatever fields came
      // first, or threw (round-15 review)
      if (qstart < 0 || qend < 0) return (Map.empty[String, Double], false)
      val body = txt.substring(qstart + "\"queries\":{".length, qend)
      val kv = """"([A-Za-z0-9_]+)":(-?[0-9.]+(?:[eE]-?[0-9]+)?)""".r
      (kv.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap,
        true)
    }
  }

  /** Flat numeric sub-object of the committed reference (round 17) —
    * `load_avg_keys` and `counters` feed the widened attribution
    * evidence, both flat string→number maps in our own format so the
    * same regex-parse approach as [[parseReference]] suffices. The
    * first `}` after the field tag closes the object precisely
    * BECAUSE it is flat; `regressions_detail` (the one nested field)
    * is deliberately not parsed this way. Missing/truncated fields
    * yield an empty map — attribution evidence degrades to "absent",
    * never to a parse crash in the guard path. Counter names carry
    * the `<key>.<counter>` scope dots. */
  private[graft] def parseNamedSection(txt: String,
                                       field: String): Map[String, Double] = {
    val tag = "\"" + field + "\":{"
    val start = txt.indexOf(tag)
    if (start < 0) Map.empty
    else {
      val end = txt.indexOf("}", start)
      if (end < 0) Map.empty
      else {
        val body = txt.substring(start + tag.length, end)
        val kv = """"([A-Za-z0-9_.]+)":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)""".r
        kv.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
  }

  /** The committed baseline's recorded SOURCE-tree identity
    * (round 19): `"src_tree":"<tree-sha>+<blob-sha>"` — the git tree
    * object of `src/` plus the `build.sbt` blob at HEAD, as written by
    * this main. The COMMIT hash would be the wrong identity: the
    * baseline is committed in a LATER artifact-only commit, and the
    * driver's round-close bench runs after further doc/artifact
    * commits — head_rev always differs while the source is
    * byte-identical, which is precisely the case this field exists to
    * recognize. Tree/blob object hashes are invariant across commits
    * that don't touch them. Absent on pre-round-19 baselines —
    * `None`, never a guess. */
  private[graft] def parseSrcTree(txt: String): Option[String] =
    """"src_tree":"([0-9a-f]{40}\+[0-9a-f]{40})"""".r
      .findFirstMatchIn(txt).map(_.group(1))

  /** The committed baseline's recorded source-dirtiness marker
    * (round 19): whether `src/` or `build.sbt` had uncommitted
    * changes when the baseline run executed. */
  private[graft] def parseSrcDirty(txt: String): Option[Boolean] =
    """"src_dirty":(true|false)""".r.findFirstMatchIn(txt)
      .map(_.group(1) == "true")

  /** Same-tree self-adjudication (round 19): on the real r18 driver
    * bench, three of four regression flags arrived with NO attribution
    * (steal ~0, per-key loads matching the baseline's own) even though
    * the run executed on the SAME SOURCE TREE as the committed
    * baseline — a shape where a code regression is impossible by
    * construction and only a human holding both provenances could say
    * so. With the run's source-tree identity and dirtiness recorded in
    * the artifact, the conclusion is mechanical: `Some(true)` — both
    * runs on the same committed source with clean working trees, so
    * any regression flag is host contention by construction
    * (annotation, never a waiver: the flags stay visible).
    * `Some(false)` — different source or either tree dirty: the flags
    * may be real. `None` — provenance missing on either side
    * (pre-round-19 baseline, git unavailable): no conclusion. */
  private[graft] def sameTreeAsBaseline(srcTree: Option[String],
                                        srcDirty: Option[Boolean],
                                        committedTxt: String): Option[Boolean] =
    (srcTree, srcDirty, parseSrcTree(committedTxt),
      parseSrcDirty(committedTxt)) match {
      case (Some(t), Some(d), Some(rt), Some(rd)) =>
        Some(t == rt && !d && !rd)
      case _ => None
    }

  /** The beats-reference half of baseline eligibility (see
    * [[outFileFor]]), compared over the COMMON key set — keys timed
    * (>0) in BOTH this run and the committed reference. Raw suite
    * totals would ratchet wrongly across key-set changes (round-17
    * review): the first round to add a bench key makes every clean
    * run's raw total structurally exceed the old reference's, locking
    * the baseline until someone remembers the env-var escape, while
    * the new key never earns a prior; a removed key deflates the raw
    * total and lets a uniformly-slower run "beat" the reference. The
    * subtotal over shared timed keys measures the same work on both
    * sides. An empty common set (first run, corrupt reference, new
    * sf) means there is nothing to beat — eligible, the documented
    * first-run behavior, and CONSISTENT with the priors path: both
    * derive from the same [[parseReference]] parse, so a reference
    * rejected for priors cannot still gate eligibility through a
    * separately-parsed total (the prior revision's raw-regex total
    * did exactly that). */
  private[graft] def beatsReference(results: Map[String, Double],
                                    ref: Map[String, Double]): Boolean = {
    val common = results.keySet.intersect(ref.keySet)
      .filter(k => results(k) > 0 && ref(k) > 0)
    common.isEmpty ||
      common.toSeq.map(results).sum <= common.toSeq.map(ref).sum
  }

  /** 1-minute load average, the host-contention marker round 10's
    * forensics had to reconstruct from warmup-time proxies. Linux-only
    * read of /proc/loadavg; -1 where unavailable.
    */
  private def loadAvg1m(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative hypervisor-steal jiffies from /proc/stat's aggregate
    * cpu line (field 8, USER_HZ ticks summed over all CPUs) — the
    * contention marker load average CANNOT see (round 12): a noisy
    * VM neighbor steals cycles while the guest's own run queue, and
    * so its load_avg, stays quiet; the round-12 forensics saw heavy
    * keys swing 2-4x between full-suite runs at load_avg ~1 while
    * the aggregate steal counter ticked up. -1 where unavailable
    * (non-Linux / locked-down /proc). */
  private[graft] def stealJiffies(): Long =
    try {
      val st = java.nio.file.Files.lines(java.nio.file.Paths.get("/proc/stat"))
      // Files.lines holds the fd until the STREAM closes — two calls
      // per key leaked hundreds of handles per suite (round-15 review)
      val line = try st.findFirst().orElse("") finally st.close()
      parseStealJiffies(line)
    } catch { case _: Throwable => -1L }

  /** Field 8 of the aggregate `cpu` line (user nice system idle iowait
    * irq softirq STEAL ...), factored for BenchGuardSpec. */
  private[graft] def parseStealJiffies(cpuLine: String): Long = {
    val f = cpuLine.trim.split("\\s+")
    if (f.length > 8 && f(0) == "cpu") f(8).toLong else -1L
  }

  /** Steal share of one wall-clock window: stolen jiffies over the
    * window's total CPU capacity (elapsed x USER_HZ(100) x nCpus).
    * 0.05 means the hypervisor took 5% of every cycle this key could
    * have used — at 32 threads that is more than enough to double a
    * shuffle-heavy key whose critical path loses whole time slices.
    * -1 when either sample was unavailable. */
  private[graft] def stealFrac(dJiffies: Long, elapsedSec: Double,
                               nCpus: Int): Double =
    if (dJiffies < 0 || elapsedSec <= 0) -1.0
    else dJiffies / (elapsedSec * 100.0 * nCpus)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // container is 32-way (local[32], 128 GiB) — shuffle.partitions
    // matches so every core gets exactly one shuffle partition
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadAvg1m()
    // graft_dot / graft_l2norm SQL functions callable in this session
    // too, matching the spec-tested register path
    GraftExtensions.register(spark)
    // In-round iteration hook: SPARK_GRAFT_BENCH_KEYS=k1,k2 times just
    // those keys. Read HERE, before the prebuilds, so a filtered
    // triage run skips index/bucketing builds its keys never touch
    // (round-15 review: a one-key iteration paid the full multi-second
    // prebuild wall every cycle). Unknown/empty filters refuse loudly
    // — a typo'd key silently ran zero keys and wrote an
    // empty-but-healthy-looking bench_filtered.json.
    val keyFilter = sys.env.get("SPARK_GRAFT_BENCH_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    keyFilter.foreach { ks =>
      val unknown = ks.diff(SparkEntry.queries.keySet)
      require(ks.nonEmpty && unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_KEYS names no runnable keys: " +
          (if (ks.isEmpty) "empty filter" else s"unknown ${unknown.mkString(", ")}"))
    }
    // prebuild gating predicates — deliberately OVER-inclusive (an
    // unneeded build only costs wall clock; a missed one fails keys)
    def anySelected(p: String => Boolean): Boolean =
      keyFilter.forall(_.exists(p))
    val needVectors = anySelected(k => k.startsWith("sim_") ||
      k.contains("embedding") || k.contains("pq") || k.contains("ivf") ||
      k.contains("vector") || k.contains("srp") || k.contains("semantic"))
    val needShingles = anySelected(k => k.contains("jaccard") ||
      k.contains("minhash") || k.startsWith("dedup_"))
    val needBucketed = anySelected(_.contains("bucketed"))
    // Untimed JIT/readahead warmup: whichever key happens to run first
    // otherwise eats ~5 s of one-time JVM cost and distorts per-query
    // attribution round-over-round.
    val w0 = System.nanoTime()
    try { SparkEntry.queries("meta_table_exists")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    // IVF index build is an ingest-time step (the __cell column is
    // written with the table at production scale) — prebuild untimed,
    // report its cost as its own field so nothing is hidden.
    val i0 = System.nanoTime()
    if (needVectors)
      try { graft.queries.HarnessLLM.ivfIndexFor(spark, sfDir) }
      catch { case _: Throwable => () }
    val ivfBuildSec = (System.nanoTime() - i0) / 1e9
    // PQ code build is likewise ingest-time (the m-byte code column is
    // written with the table) — prebuild untimed, report the cost.
    val p0 = System.nanoTime()
    if (needVectors)
      try { graft.queries.HarnessLLM.pqIndexFor(spark, sfDir) }
      catch { case _: Throwable => () }
    // residual IVF-PQ build serves both PQ search keys (round 8);
    // fold its (same-kind, ingest-time) cost into the PQ build metric
    if (needVectors)
      try { graft.queries.HarnessLLM.ivfPqIndexFor(spark, sfDir) }
      catch { case _: Throwable => () }
    val pqBuildSec = (System.nanoTime() - p0) / 1e9
    // OPQ rotation + codebook fit is ingest-time (rotation stored with
    // the codebooks, rotated codes with the table) — prebuild untimed,
    // report the cost.
    val o0 = System.nanoTime()
    if (needVectors)
      try { graft.queries.HarnessLLM.opqModelsFor(spark, sfDir) }
      catch { case _: Throwable => () }
    // the rotated code relation is the same kind of ingest-time
    // artifact; fold its build into the OPQ fit metric
    if (needVectors)
      try { graft.queries.HarnessLLM.opqAnnIndexFor(spark, sfDir) }
      catch { case _: Throwable => () }
    val opqFitSec = (System.nanoTime() - o0) / 1e9
    // The shingle pass is likewise an ingest-time step (the shingle
    // column persists with the corpus) shared by the shingle-family
    // keys — prebuild untimed, report the cost.
    val f0 = System.nanoTime()
    if (needShingles)
      try { graft.queries.HarnessLLM.shingledDocsFor(spark, sfDir) }
      catch { case _: Throwable => () }
    val docFeatsSec = (System.nanoTime() - f0) / 1e9
    // Bucketed table layout is likewise ingest-time (the fact table
    // lands bucketed once; every recurring join then reuses it) —
    // prebuild untimed, report the cost.
    val b0 = System.nanoTime()
    if (needBucketed)
      try { graft.queries.HarnessIO.bucketedTablesFor(spark, sfDir) }
      catch { case _: Throwable => () }
    val bucketedSec = (System.nanoTime() - b0) / 1e9
    // A failing key must fail LOUDLY: stderr gets the key + stack trace
    // and the JSON records -1 (impossible as a duration) instead of a
    // plausible-looking elapsed time.
    //
    // Per-key MEDIAN of `runs` executions (round 8): a single-shot
    // per-key time swings ~3x with host load, which poisons
    // round-over-round comparison; the median of 3 is reproducible
    // within ~±20%. A key that fails its first run is not retried
    // (failures are deterministic; rerunning one 3x only burns wall
    // clock) and records -1 as before.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // Regression guard (round 9): load the last committed per-key
    // medians BEFORE this run overwrites the file, so any key that
    // blows past 3x its prior time gets a loud stderr WARN and a
    // `regressions` entry in the JSON — the r8 18 s surprise would
    // have been caught in-session. Our own flat format, so a regex
    // parse suffices (no JSON lib dependency).
    // Cross-SF guard (round 12): the committed reference records which
    // sf dir produced it — a full-suite run at a DIFFERENT sf must
    // neither compare against it (a sf0.01 run reads ~10x fast and
    // every ratio is meaningless) nor overwrite it (the next sf0.1 run
    // would then flag the entire suite against sf0.01 priors — exactly
    // what a verify-skill smoke at sf0.01 would have silently done).
    val refTxt: String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_full.json")), "UTF-8")
      catch { case _: Throwable => "" } // no reference = first-run behavior
    val (prevQueries: Map[String, Double], sfMatchesRef: Boolean) =
      if (refTxt.isEmpty) (Map.empty[String, Double], true)
      else try parseReference(refTxt, sfDir)
      catch { case _: Throwable => (Map.empty[String, Double], true) }
    // The COMMITTED bench_full.json content (round-17 review; widened
    // round 18): BOTH the beats-reference eligibility yardstick and
    // the attribution evidence below read it. The working-tree file is
    // whatever the last run left there — priors deliberately read it
    // (the round-12 provenance contract, annotated by reference_dirty
    // below), but eligibility or attribution keyed off a dirty file
    // re-opens the r16 hole (a dirty slower artifact becomes the bar,
    // a contended run "beats" it, and a wholesale round-close commit
    // baselines the contended run). Outcome handling (round 18, r17
    // advice): git ran and exited 0 -> the committed text; git ran and
    // exited NONZERO (bench_full.json absent at HEAD) -> there IS no
    // committed reference — empty text, first-run eligibility, never
    // the working-tree fallback that partially re-opened the hole;
    // only where git itself is unavailable or wedged (no binary, an
    // index.lock hang — the subprocess is bounded by a 10 s waitFor,
    // where the old unbounded read could hang the whole bench) does
    // the working-tree text stand in, the documented fallback.
    // A nonzero exit splits into two shapes (round 19, r18 advice):
    // git's genuinely-absent messages (path not at HEAD, no commits
    // yet) mean first-run eligibility; ANY OTHER nonzero output —
    // dubious ownership, wrong CWD, corrupt object — is a git
    // environment error behind which a committed baseline may exist,
    // so the beats gate is UNVERIFIABLE and the run is marked
    // baseline-ineligible below instead of trivially eligible (the
    // r18 shape where the warning annotated but did not prevent the
    // overwrite). Both shapes yield empty committed text — a dirty
    // working-tree yardstick is never substituted for a committed one.
    // Run provenance (round 19): the source tree this bench executed
    // on — the src/ tree object + build.sbt blob at HEAD (commit
    // hashes would differ across the artifact-only commits that
    // bracket every baseline) plus working-tree dirtiness — so a
    // later reader, or this run itself against a baseline that
    // recorded the same fields, can adjudicate regression flags
    // mechanically (see sameTreeAsBaseline). ONE combined rev-parse
    // resolves the HEAD commit (peeled — the ^{commit} read is also
    // the corrupt-repo probe committedGateUnverifiable requires,
    // since a garbage ref or missing commit object fails it while
    // plain ref-resolution would not) plus both source objects;
    // three sequential bounded subprocesses would stall up to 30 s
    // in the wedged-git environment this code designs for (in-round
    // review). A repo whose HEAD lacks src/ or build.sbt reads as
    // unresolved — conservative: provenance and first-baseline
    // eligibility both require the committed source layout.
    val provenance: Option[Seq[String]] =
      boundedGit("rev-parse", "HEAD^{commit}", "HEAD:src", "HEAD:build.sbt")
        .collect { case (0, out) => out.trim.split("\\s+").toSeq }
        .filter(s => s.length == 3 && s.forall(_.matches("[0-9a-f]{40}")))
    val headRev: Option[String] = provenance.map(_.head)
    val srcTree: Option[String] = provenance.map(s => s(1) + "+" + s(2))
    val srcDirty: Option[Boolean] =
      boundedGit("status", "--porcelain", "--", "src", "build.sbt").collect {
        case (0, out) => out.trim.nonEmpty
      }
    val (committedTxt: String, gateUnverifiable: Boolean) = {
      val outcome = boundedGit("show", "HEAD:bench_full.json")
      val unverifiable = committedGateUnverifiable(outcome, headRev.isDefined)
      if (unverifiable)
        outcome.foreach { case (code, out) =>
          System.err.println("[bench] WARN: `git show HEAD:bench_full.json` " +
            s"exited $code without proving the committed reference absent " +
            s"(working-tree file ${if (refTxt.nonEmpty) "exists" else "absent"}, " +
            s"HEAD ${if (headRev.isDefined) "resolves" else "does NOT resolve"}) " +
            "— the reference cannot be verified, so this run is " +
            "baseline-INELIGIBLE (bench_filtered.json) unless " +
            "SPARK_GRAFT_BENCH_ACCEPT_SLOWER=1 deliberately overrides. Fix " +
            s"the git environment to re-arm the beats gate. git said: " +
            s"${out.trim.take(200)}")
        }
      (committedTextOf(outcome, refTxt), unverifiable)
    }
    val baselineSameTree: Option[Boolean] =
      sameTreeAsBaseline(srcTree, srcDirty, committedTxt)
    val (committedRefQueries: Map[String, Double], committedSfOk: Boolean) =
      if (committedTxt.isEmpty) (Map.empty[String, Double], true)
      else try parseReference(committedTxt, sfDir)
      catch { case _: Throwable => (Map.empty[String, Double], true) }
    // The widened attribution evidence (round 17) is the committed
    // baseline's per-key quiet-run loads and counters — parsed from
    // the SAME committed text as the eligibility yardstick (round 18,
    // r17 advice: the code read the working-tree refTxt while every
    // doc described the committed baseline, so a dirty artifact
    // silently became the attribution yardstick). Cross-sf numbers
    // would be meaningless on both axes, so gate on the committed
    // text's OWN sf match.
    val prevLoads: Map[String, Double] =
      if (committedTxt.isEmpty || !committedSfOk) Map.empty
      else try parseNamedSection(committedTxt, "load_avg_keys")
      catch { case _: Throwable => Map.empty }
    val prevCounters: Map[String, Long] =
      if (committedTxt.isEmpty || !committedSfOk) Map.empty
      else try parseNamedSection(committedTxt, "counters")
        .map { case (k, v) => k -> v.toLong }
      catch { case _: Throwable => Map.empty }
    // Reference provenance (round 12): a second full run without an
    // intervening commit reads its priors from the FIRST run's
    // working-tree output, not the committed baseline — an empty
    // regressions list against rebased priors proves nothing (this
    // exact sequence hid a 4x contention spike in-round). Record
    // whether the reference file was git-clean at prior-load time;
    // the adjudicating reader (and the commit discipline) key off it.
    val referenceDirty: Option[Boolean] =
      boundedGit("status", "--porcelain", "--", "bench_full.json").collect {
        case (0, out) => out.trim.nonEmpty
      }
    if (referenceDirty.contains(true))
      System.err.println("[bench] WARN: bench_full.json has uncommitted changes — " +
        "priors are NOT the committed baseline; restore it (git checkout -- " +
        "bench_full.json) before trusting the regression list")
    // Between-key GC drain (round 11, SPARK_GRAFT_BENCH_GC=0 disables):
    // 166+ keys accumulate persists/localCheckpoints/broadcasts whose
    // async ContextCleaner reclamation lags the suite — late keys read
    // ~2x their isolated time from the drag (stream_opq_ingest: 5.9 s
    // in-suite vs 2.8 s isolated, same host). An explicit GC between
    // keys forces the cleaner's reference queue to drain, making
    // per-key timings independent of suite position.
    val gcBetween = !sys.env.get("SPARK_GRAFT_BENCH_GC").contains("0")
    var failed = List.empty[String]
    // Per-key 1-minute load average, MAX of a sample at key START and
    // one at key END (round 12, VERDICT r11 #6; round 16 added the
    // start sample — see keyWindowLoad): the suite-level start/end
    // markers prove a run was contended but cannot say WHICH keys
    // overlapped the spike, so adjudicating a single flagged key
    // (r11: flt_like) still needed a manual rerun. Key-level markers
    // let the reader correlate a key's slowdown with the load curve
    // directly.
    var keyLoad = Map.empty[String, Double]
    // Per-key hypervisor-steal fraction over the key's own wall-clock
    // window (round 12): load_avg is blind to a noisy VM neighbor —
    // the guest's run queue stays short while the hypervisor takes
    // cycles — so a key flagged at load_avg ~1 was previously
    // unadjudicable without an isolated rerun. steal_frac_keys says
    // directly whether the host was being robbed DURING that key.
    var keySteal = Map.empty[String, Double]
    val nCpus = cpus.toInt
    val stealStart = stealJiffies()
    val suiteStartNanos = System.nanoTime()
    // SORTED key order (round 12): SparkEntry.queries is a hash map,
    // so iteration order used to be bucket order — adding ONE key
    // reshuffled every key's suite position, and position-dependent
    // residue (JIT warmth, cleaner backlog the GC drain doesn't fully
    // cover) then moved between rounds, polluting exactly the
    // round-over-round per-key comparison the bench exists for.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => keyFilter.forall(_.contains(name)) }
      .map { case (name, fn) =>
      if (gcBetween) System.gc()
      var times = List.empty[Double]
      var dead = false
      var i = 0
      val k0 = System.nanoTime()
      val s0 = stealJiffies()
      // load sampled at key START as well as end — see keyWindowLoad
      val l0 = loadAvg1m()
      // caller-namespaced counters (round 13): every Metrics.record
      // fired while THIS key runs lands as `<key>.<counter>`, so two
      // keys sharing a code path no longer overwrite each other's
      // phase numbers (the r12 adjudication of dedup_jaccard_probe
      // needed a manual isolated rerun precisely because
      // stream_jaccard_probe had overwritten its counters)
      Metrics.withScope(name) {
        while (i < runs && !dead) {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); times ::= (System.nanoTime() - t0) / 1e9 }
          catch {
            case e: Throwable =>
              System.err.println(s"BENCH FAILURE key=$name: $e")
              e.printStackTrace()
              failed ::= name
              dead = true
          }
          i += 1
        }
      }
      keyLoad += name -> keyWindowLoad(l0, loadAvg1m())
      keySteal += name -> stealFrac(
        if (s0 < 0) -1L else stealJiffies() - s0,
        (System.nanoTime() - k0) / 1e9, nCpus)
      // a key that fails on ANY run records -1 (the "failed" contract)
      // — a partial median of its surviving runs would contradict the
      // `failed` array and pollute `total`
      val sec = if (dead || times.isEmpty) -1.0 else times.sorted.apply(times.size / 2)
      name -> sec
    }
    val resultMap = results.toMap
    val ambient = ambientRatio(resultMap, prevQueries)
    val regressions = regressionsOf(resultMap, prevQueries)
    regressions.foreach { k =>
      val why = prevQueries.get(k).filter(_ > 0)
        .map(p => f"vs prior ${p}%.2fs (${resultMap(k) / p}%.1fx raw, suite ambient ${ambient}%.2fx)")
        .getOrElse("first-time key above the 10x-suite-mean ceiling")
      System.err.println(f"BENCH REGRESSION key=$k: ${resultMap(k)}%.2fs $why")
    }
    // data-dependent scale counters the ops recorded while running
    // (candidate-pair volumes etc.) — see graft.Metrics; the same
    // snapshot feeds the counter-attribution evidence at the flag site
    val counterSnapshot = Metrics.snapshot
    val regDetail = regressionsDetailJson(regressions, resultMap, prevQueries,
      committedRefQueries, keySteal, keyLoad, prevLoads,
      counterSnapshot.toMap, prevCounters)
    val loadEnd = loadAvg1m()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val regJson = regressions.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val countersJson = counterSnapshot
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // beats-reference half of baseline eligibility (see outFileFor):
    // a clean-but-slower full run must not replace the fastest clean
    // committed run — the round-16 close proved the prose-only policy
    // insufficient when the working tree gets committed wholesale
    val acceptSlower = sys.env.get("SPARK_GRAFT_BENCH_ACCEPT_SLOWER").contains("1")
    // gateUnverifiable (round 19, r18 advice): a git environment
    // error left the committed reference unreadable — there is no
    // yardstick to beat, so the run cannot become the baseline. The
    // deliberate-operator escape hatch still applies: ACCEPT_SLOWER=1
    // is an explicit human decision to commit this run regardless,
    // and is the only way to establish a baseline in a git-broken
    // environment.
    val beatsRef = acceptSlower ||
      (!gateUnverifiable && beatsReference(resultMap, committedRefQueries))
    // The output-file decision IS the eligibility verdict, so the JSON
    // field simply mirrors it (round-17 review): the previous
    // formulation gated the field on keyFilter.isEmpty && sfMatchesRef,
    // so a FILTERED run with a dead key — or an off-sf smoke with one —
    // reported baseline_ineligible:false on exactly the failure-holed
    // artifacts the flag exists to mark. Every run that does not land
    // in bench_full.json is, as a fact, not a baseline.
    val outFile = outFileFor(keyFilter.isEmpty, sfMatchesRef, failed.isEmpty,
      beatsRef)
    val baselineIneligible = outFile != "bench_full.json"
    val keyLoadJson = results.map { case (k, _) =>
      s""""$k":${jd("%.2f", keyLoad.getOrElse(k, -1.0))}""" }.mkString("{", ",", "}")
    val keyStealJson = results.map { case (k, _) =>
      s""""$k":${jd("%.4f", keySteal.getOrElse(k, -1.0))}""" }.mkString("{", ",", "}")
    val stealSuite = stealFrac(
      if (stealStart < 0) -1L else stealJiffies() - stealStart,
      (System.nanoTime() - suiteStartNanos) / 1e9, nCpus)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs_per_key":$runs,"stat":"median","warmup_sec":$warmupSec,"load_avg_start":$loadStart,"load_avg_end":$loadEnd,"load_avg_keys":$keyLoadJson,"steal_frac_suite":${jd("%.4f", stealSuite)},"steal_frac_keys":$keyStealJson,"ambient_ratio":$ambient,"reference_dirty":${referenceDirty.map(_.toString).getOrElse("null")},"head_rev":${headRev.map("\"" + _ + "\"").getOrElse("null")},"src_tree":${srcTree.map("\"" + _ + "\"").getOrElse("null")},"src_dirty":${srcDirty.map(_.toString).getOrElse("null")},"baseline_same_tree":${baselineSameTree.map(_.toString).getOrElse("null")},"baseline_ineligible":$baselineIneligible,"ivf_index_build_sec":$ivfBuildSec,"pq_index_build_sec":$pqBuildSec,"opq_fit_sec":$opqFitSec,"doc_feats_build_sec":$docFeatsSec,"bucketed_build_sec":$bucketedSec,"failed":$failedJson,"regressions":$regJson,"regressions_detail":$regDetail,"counters":$countersJson}"""
    println(line)
    // Short trailer AFTER the JSON line (round 17, VERDICT r16 #3):
    // every BENCH_r*.json the driver captured (r01-r16) carries
    // `parsed:null` because the single JSON line outruns the driver's
    // 2000-char stdout tail — the headline numbers must survive any
    // truncation, and a tail window always keeps the LAST lines.
    println(s"[bench] total_s=${jd("%.1f", total)} keys_timed=" +
      s"${resultMap.values.count(_ >= 0)} failed=${failed.size} " +
      s"regressions=${regressions.size} ambient=${jd("%.2f", ambient)} " +
      s"baseline_ineligible=$baselineIneligible same_tree=" +
      baselineSameTree.map(_.toString).getOrElse("null"))
    // Same-tree regression flags are host contention by construction
    // (round 19) — say so next to the flags themselves, where the r18
    // driver shape (three unattributed flags, steal ~0, loads at
    // baseline) left a human to reconstruct the provenance by hand.
    // ONLY when the reference was loaded git-clean (in-round review):
    // the flag list derives from the WORKING-TREE priors, so with a
    // dirty bench_full.json the flags measure against a different
    // yardstick than the committed baseline the same-tree conclusion
    // is about — e.g. an uncommitted-speedup run baselined into the
    // dirty file, then reverted: flags vs its fast priors are a REAL
    // code delta, while src_tree still equals the committed
    // baseline's.
    if (regressions.nonEmpty && baselineSameTree.contains(true) &&
        referenceDirty.contains(false))
      println(s"[bench] note: ${regressions.size} regression flag(s) on " +
        "the SAME SOURCE TREE as the committed baseline (identical " +
        "src/ + build.sbt objects, both working trees clean) — host " +
        "contention by construction, not a code change (flags stay " +
        "visible; adjudicate walls via an isolated rerun)")
    // The driver keeps only a 2000-char tail of stdout, which truncates
    // the per-key map and loses the total; persist the full line so
    // round-over-round totals stay recoverable from the repo itself.
    // ONLY for full-suite runs AT THE REFERENCE'S SF with ZERO failed
    // keys AND a total at-or-under the committed reference's (see
    // outFileFor): a SPARK_GRAFT_BENCH_KEYS-filtered iteration, an
    // off-sf smoke, a run with a dead key, or a clean-but-slower run
    // must not clobber the committed reference (and with it the
    // regression guard's per-key priors/loads/counters) with a
    // partial, wrong-scale, failure-holed, or contention-inflated
    // queries map.
    if (keyFilter.isEmpty && sfMatchesRef && failed.nonEmpty)
      System.err.println("[bench] REFUSING to overwrite bench_full.json: " +
        s"failed keys ${failed.sorted.mkString(", ")} — this run is " +
        "baseline_ineligible and lands in bench_filtered.json; fix the " +
        "failures and rerun before committing a baseline")
    else if (keyFilter.isEmpty && sfMatchesRef && !beatsRef) {
      // two distinct refusal reasons (in-round review): a gate left
      // unverifiable by a git environment error must not print the
      // lost-the-comparison message — with empty committed queries it
      // would read "0.0s does not beat 0.0s over the same 0 keys"
      // and advise re-baselining after a slowdown that never happened
      if (gateUnverifiable)
        System.err.println("[bench] NOT overwriting bench_full.json: the " +
          "committed reference could not be verified (git environment " +
          "error — see the WARN above), so there is no yardstick to beat " +
          "and this run lands in bench_filtered.json; fix the git " +
          "environment, or SPARK_GRAFT_BENCH_ACCEPT_SLOWER=1 to " +
          "deliberately baseline without one")
      else {
        val common = resultMap.keySet.intersect(committedRefQueries.keySet)
          .filter(k => resultMap(k) > 0 && committedRefQueries(k) > 0)
        System.err.println("[bench] NOT overwriting bench_full.json: " +
          s"common-key total ${jd("%.1f", common.toSeq.map(resultMap).sum)}s " +
          "does not beat the committed baseline's " +
          s"${jd("%.1f", common.toSeq.map(committedRefQueries).sum)}s over " +
          s"the same ${common.size} keys — the fastest clean committed run " +
          "stands and this run lands in bench_filtered.json " +
          "(SPARK_GRAFT_BENCH_ACCEPT_SLOWER=1 to deliberately re-baseline " +
          "after an accepted slowdown)")
      }
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"$outFile write failed: $e") }
    // Per-round forensics (round 18, VERDICT r17 #2): a FULL-suite run
    // that lands in bench_filtered.json — the driver's contended runs,
    // exactly the artifacts a later adjudication needs — ALSO writes a
    // timestamped copy, because bench_filtered.json is clobbered by
    // any later run: the r17 judge's own isolated rerun overwrote the
    // round's driver-run per-key record minutes after extracting it.
    // Key-filtered triage iterations stay single-file (dozens per
    // round; their detail is never the round's forensic record), and
    // so do CROSS-SF runs (round-18 review: a routine verify-skill
    // sf0.01 smoke is full-suite and always ineligible against an
    // sf0.1 reference — without the sf gate every smoke would litter
    // the repo root with a stamped copy the round-close wholesale
    // commit then sweeps in).
    if (baselineIneligible && keyFilter.isEmpty && sfMatchesRef) {
      val stamp = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      val keep = s"bench_filtered_$stamp.json"
      try java.nio.file.Files.write(java.nio.file.Paths.get(keep),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"$keep write failed: $e") }
    }
    spark.stop()
  }
}
