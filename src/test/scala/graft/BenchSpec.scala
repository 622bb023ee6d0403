package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's stall-adjudication logic (round-14 verdict item
  * 1), pinned on the pure helpers — the full-flow proof (synthetic
  * SPARK_GRAFT_BENCH_STALL run producing a flagged, diverted artifact)
  * runs in the round ritual and is recorded in PLANS.md. No Spark
  * session needed here. */
class BenchSpec extends AnyFunSuite {

  test("isSuspect: flags the stall signature, not sub-second jitter") {
    // the round-14 close's own signatures
    assert(Bench.isSuspect(Seq(50.9, 127.9)))
    assert(Bench.isSuspect(Seq(17.3, 112.2)))
    // >2.5x spread but sub-floor: GC/JIT neighborhood noise (q121/q166)
    assert(!Bench.isSuspect(Seq(0.21, 0.93)))
    // stable pair
    assert(!Bench.isSuspect(Seq(20.1, 21.4)))
    // exactly at the ratio is NOT suspect (strict >)
    assert(!Bench.isSuspect(Seq(2.0, 5.0)))
    assert(Bench.isSuspect(Seq(2.0, 5.01)))
    // single sample (errored repeat / single-pass run): never suspect
    assert(!Bench.isSuspect(Seq(9.9)))
    assert(!Bench.isSuspect(Nil))
  }

  test("ctlDriftOf: max spread across controls; 1.0 with no samples") {
    assert(Bench.ctlDriftOf(Map.empty) == 1.0)
    assert(Bench.ctlDriftOf(Map("q01" -> Seq(0.2, 0.21, 0.2))) < 1.1)
    val d = Bench.ctlDriftOf(Map(
      "q01" -> Seq(0.2, 0.2, 0.2),
      "q22" -> Seq(0.14, 0.42, 0.15))) // mid-suite stall window
    assert(math.abs(d - 3.0) < 1e-9)
    // a zero/negative sample (defensive) contributes nothing
    assert(Bench.ctlDriftOf(Map("q10" -> Seq(0.0, 0.4))) == 1.0)
  }

  test("ctlDisturbed: the stall signature, not sub-second control jitter") {
    // measured in the synthetic-stall run: clean sf0.001 controls spread
    // 1.34x from pure scheduling noise — NOT disturbed
    assert(!Bench.ctlDisturbed(Map(
      "q01" -> Seq(0.337, 0.338, 0.437),
      "q10" -> Seq(0.286, 0.384, 0.306),
      "q22" -> Seq(0.177, 0.175, 0.218))))
    // a control sampled inside a stall window parks for seconds
    assert(Bench.ctlDisturbed(Map(
      "q01" -> Seq(0.25, 14.2, 0.26),
      "q22" -> Seq(0.15, 0.16, 0.15))))
    assert(!Bench.ctlDisturbed(Map.empty))
  }

  private val nominal =
    """{"metric":"total","value":260.863,"unit":"sec","cpus":"32",
      |"queries":{"q01":0.252,"q10":0.421,"q22":0.143,"q150":13.452},
      |"raw":{"q01":[0.393,0.252]},"peak_mem":{"q01":52428800},
      |"suspect":[],"suspect_n":0,"ctl":{"q01":[0.25,0.26,0.25]},
      |"ctl_drift":1.040,"ctl_disturbed":false,"box_factor":null,
      |"sf":"/root/testdata/sf0.1","git":"731a785"}""".stripMargin
      .replace("\n", "")

  test("extractQueriesMap: reads the queries block only (no raw/peak collision)") {
    val qs = Bench.extractQueriesMap(nominal)
    assert(qs == Map("q01" -> 0.252, "q10" -> 0.421, "q22" -> 0.143,
      "q150" -> 13.452))
    assert(Bench.extractQueriesMap("{}").isEmpty)
    assert(Bench.extractQueriesMap("""{"queries":{"n":180}}""") == Map("n" -> 180.0))
  }

  test("extractNum / extractStr: present, absent, null") {
    assert(Bench.extractNum(nominal, "suspect_n").contains(0.0))
    assert(Bench.extractNum(nominal, "ctl_drift").contains(1.04))
    assert(Bench.extractNum(nominal, "box_factor").isEmpty) // null
    assert(Bench.extractStr(nominal, "sf").contains("/root/testdata/sf0.1"))
    assert(Bench.extractStr(nominal, "absent").isEmpty)
  }

  test("boxFactorVs: median control ratio; None cross-sf or no controls") {
    val newQs = Map("q01" -> 0.252 * 1.5, "q10" -> 0.421 * 1.2,
      "q22" -> 0.143 * 2.0, "q150" -> 99.0)
    val bf = Bench.boxFactorVs(Some(nominal), oldSfOk = true, newQs)
    assert(bf.exists(v => math.abs(v - 1.5) < 1e-9)) // median of 1.5,1.2,2.0
    assert(Bench.boxFactorVs(Some(nominal), oldSfOk = false, newQs).isEmpty)
    assert(Bench.boxFactorVs(None, oldSfOk = true, newQs).isEmpty)
    assert(Bench.boxFactorVs(Some(nominal), oldSfOk = true,
      Map("q150" -> 1.0)).isEmpty) // no control overlap
    // two controls -> mean of the pair
    val bf2 = Bench.boxFactorVs(Some(nominal), oldSfOk = true,
      Map("q01" -> 0.252 * 1.0, "q10" -> 0.421 * 2.0))
    assert(bf2.exists(v => math.abs(v - 1.5) < 1e-9))
  }

  test("shouldDivert: protects a nominal record from a disturbed run, " +
      "and only then") {
    val suspectOld = nominal.replace("\"suspect_n\":0", "\"suspect_n\":3")
    val driftOld = nominal.replace("\"ctl_disturbed\":false",
      "\"ctl_disturbed\":true")
    val legacyOld = """{"queries":{"q01":0.25},"sf":"x"}""" // pre-r15 record
    // disturbed new (by suspects or controls) vs nominal old -> divert
    assert(Bench.shouldDivert(Some(nominal), 2, newCtlDisturbed = false, force = false))
    assert(Bench.shouldDivert(Some(nominal), 0, newCtlDisturbed = true, force = false))
    // disturbed new vs legacy old: legacy was adjudicated into the tree,
    // presumed nominal -> divert
    assert(Bench.shouldDivert(Some(legacyOld), 1, newCtlDisturbed = false, force = false))
    // nominal new run always writes in place
    assert(!Bench.shouldDivert(Some(nominal), 0, newCtlDisturbed = false, force = false))
    // disturbed old record (either flavor) deserves no protection
    assert(!Bench.shouldDivert(Some(suspectOld), 2, newCtlDisturbed = false, force = false))
    assert(!Bench.shouldDivert(Some(driftOld), 2, newCtlDisturbed = false, force = false))
    // no old record -> nothing to protect
    assert(!Bench.shouldDivert(None, 5, newCtlDisturbed = true, force = false))
    // force overrides
    assert(!Bench.shouldDivert(Some(nominal), 5, newCtlDisturbed = true, force = true))
  }
}
