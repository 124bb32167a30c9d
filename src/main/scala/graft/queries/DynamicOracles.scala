package graft.queries

/** Oracle SQL whose text exists only AFTER its query runs — literals from
  * seeded-deterministic quantizer fits (knn_ivf centroids, knn_pq
  * codebooks) and physical side-output paths (source_manifest's file dir,
  * which is scale-factor-specific so a sf0.001 spec run can never clobber
  * the sf0.01 gate's files).
  *
  * `graft.Verify` executes every query BEFORE dumping
  * [[graft.SparkEntry.oracleSql]] (a def), so a full run always dumps the
  * captured entries; a filtered debug run that skips a capturing query
  * simply omits its entry (the driver then records rows-only — never
  * stale literals).
  */
object DynamicOracles {
  /** The DECLARED capture set — every query that registers its oracle at
    * run time must be listed here (put() enforces it), so the registry
    * arithmetic in SURVEY.md stays spec-checkable: oracle-gated total =
    * static oracles + this set.
    */
  val declared: Set[String] =
    Set("knn_ivf", "knn_pq", "knn_ivfpq", "source_manifest", "source_rowgroups")

  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def put(name: String, sql: String): Unit = {
    require(declared.contains(name),
      s"dynamic oracle '$name' is not in DynamicOracles.declared — " +
        "declare it so the registry inventory stays spec-checkable")
    m.put(name, sql)
  }

  def snapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }
}
