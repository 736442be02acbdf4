package graft.sources

import scala.jdk.CollectionConverters._

/** JVM-wide map from a QUALIFIED table directory to its zone-map index —
  * the bridge between the engine's registration lifecycle and the
  * [[graft.plans.IndexPruneRule]] Catalyst rule, which sees only the scan's
  * root path at optimization time.
  *
  * Entries are OWNED by table names: several registrations may point at the
  * same dir (they share files, so either index prunes correctly for both),
  * and an entry only disappears when its LAST owner releases it — a
  * non-indexed table over the same dir must not strip another table's
  * pruning (review finding). */
object ColumnIndexRegistry {

  private final case class Entry(idx: ColumnIndex.Index, owners: Set[String])
  private val byDir =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  def register(qualifiedDir: String, idx: ColumnIndex.Index, owner: String): Unit =
    byDir.compute(qualifiedDir, (_, prev) =>
      Entry(idx, Option(prev).map(_.owners).getOrElse(Set.empty) + owner))

  /** Release `owner`'s claim; the entry survives while other owners remain. */
  def release(qualifiedDir: String, owner: String): Unit =
    byDir.computeIfPresent(qualifiedDir, (_, prev) => {
      val rest = prev.owners - owner
      if (rest.isEmpty) null else prev.copy(owners = rest)
    })

  def lookup(qualifiedDir: String): Option[ColumnIndex.Index] =
    Option(byDir.get(qualifiedDir)).map(_.idx)

  /** Spec hook. */
  private[graft] def ownersOf(qualifiedDir: String): Set[String] =
    Option(byDir.get(qualifiedDir)).map(_.owners).getOrElse(Set.empty)

  /** Spec hook: entries currently registered (dir -> owners). */
  private[graft] def snapshot: Map[String, Set[String]] =
    byDir.asScala.map { case (d, e) => d -> e.owners }.toMap
}
