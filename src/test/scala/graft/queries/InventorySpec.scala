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
  * README.md carries the SAME line (r10 verdict item 6: README's prose
  * count drifted to a stale 376) and is pinned by the same test — the
  * two documents cannot drift from the registry or from each other.
  */
class InventorySpec extends AnyFunSuite {

  private val pat =
    """Registry: (\d+) queries [-—] (\d+) oracle-gated \((\d+) static \+ (\d+) run-captured\), (\d+) rows-only\.""".r

  for (doc <- Seq("SURVEY.md", "README.md"))
    test(s"$doc registry line matches SparkEntry") {
      checkDoc(doc)
    }

  private def checkDoc(doc: String): Unit = {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(doc)),
      "UTF-8")
    val hits = pat.findAllMatchIn(survey).toSeq
    assert(hits.size == 1,
      s"$doc must contain exactly one registry line, found ${hits.size}")
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
    assert(n == queries.size, s"$doc says $n queries, registry has ${queries.size}")
    assert(s == static.size, s"$doc says $s static oracles, registry has ${static.size}")
    assert(d == dynamic.size, s"$doc says $d run-captured oracles, registry has ${dynamic.size}")
    assert(g == s + d, s"$doc gated total $g != $s + $d")
    assert(r == n - g, s"$doc rows-only $r != $n - $g")
  }
}
