package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins SURVEY.md's registry line to the CODE (VERDICT r8 stretch #9: at
  * 350 queries, drift between the doc inventory and `SparkEntry.queries`
  * is the likeliest future embarrassment). SURVEY.md must carry exactly
  * one line of the form
  *
  *   Registry: N queries - G oracle-gated (S static + D run-captured), R rows-only.
  *
  * and every number must match the registry arithmetic. Whoever adds a
  * query updates the line; this spec makes forgetting impossible.
  */
class InventorySpec extends AnyFunSuite {

  private val pat =
    """Registry: (\d+) queries [-—] (\d+) oracle-gated \((\d+) static \+ (\d+) run-captured\), (\d+) rows-only\.""".r

  test("SURVEY.md registry line matches SparkEntry") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      "UTF-8")
    val hits = pat.findAllMatchIn(survey).toSeq
    assert(hits.size == 1,
      s"SURVEY.md must contain exactly one registry line, found ${hits.size}")
    val m = hits.head
    val (n, g, s, d, r) =
      (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
        m.group(4).toInt, m.group(5).toInt)
    val queries = graft.SparkEntry.queries.keySet
    val static =
      (ParityQueries.oracles ++ RelationalQueries.oracles ++
        PipelineQueries.oracles).keySet
    val dynamic = DynamicOracles.declared
    assert(static.subsetOf(queries), s"static oracles without a query: ${static.diff(queries)}")
    assert(dynamic.subsetOf(queries), s"declared captures without a query: ${dynamic.diff(queries)}")
    assert(static.intersect(dynamic).isEmpty,
      s"oracle both static and run-captured: ${static.intersect(dynamic)}")
    assert(n == queries.size, s"SURVEY says $n queries, registry has ${queries.size}")
    assert(s == static.size, s"SURVEY says $s static oracles, registry has ${static.size}")
    assert(d == dynamic.size, s"SURVEY says $d run-captured oracles, registry has ${dynamic.size}")
    assert(g == s + d, s"SURVEY gated total $g != $s + $d")
    assert(r == n - g, s"SURVEY rows-only $r != $n - $g")
  }
}
