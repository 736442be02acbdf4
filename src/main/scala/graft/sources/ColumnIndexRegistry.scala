package graft.sources

/** JVM-wide map from a QUALIFIED table directory to its zone-map index —
  * the bridge between the engine's registration lifecycle and the
  * [[graft.plans.IndexPruneRule]] Catalyst rule, which sees only the scan's
  * root path at optimization time. Keyed by directory (not table name):
  * two registrations of the same dir share files, so either index prunes
  * correctly for both. The engine registers/removes entries in lock-step
  * with its per-table indexes. */
object ColumnIndexRegistry {
  private val byDir =
    new java.util.concurrent.ConcurrentHashMap[String, ColumnIndex.Index]()

  def register(qualifiedDir: String, idx: ColumnIndex.Index): Unit =
    byDir.put(qualifiedDir, idx)
  def remove(qualifiedDir: String): Unit = byDir.remove(qualifiedDir)
  def lookup(qualifiedDir: String): Option[ColumnIndex.Index] =
    Option(byDir.get(qualifiedDir))
}
