package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Zone-map file pruning for the SQL frontend — the optimizer-rule face of
  * the column index (reference roadmap "column index", README.md:296).
  *
  * The REST/GraphQL frontends prune explicitly in the engine; SQL (and so
  * the Postgres wire and FlightSQL, which ride `querySql`) arrives as an
  * arbitrary plan. This rule rewrites
  *
  *   `Filter(cond, LogicalRelation(parquet scan of a REGISTERED dir))`
  *
  * to the same filter over a scan of only the index-surviving files. It is
  * injected through `SparkSessionExtensions.injectOptimizerRule` (the same
  * seat as `LocalFoldRules`) and runs inside the fixed-point operator-
  * optimization batch — after Catalyst has pushed the filter down to the
  * scan, the rewrite fires; on the next iteration the rewritten scan's
  * root paths are leaf FILES, not the registered dir, so the registry
  * lookup misses and the rule is a no-op (no re-entry).
  *
  * Strictly conservative by construction:
  *   - fires only for dirs the engine registered with `index_columns`
  *     ([[graft.sources.ColumnIndexRegistry]] — empty registry = dead rule);
  *   - only simple `attr op literal` conjuncts prune (plus top-level ORs
  *     of such conjunctions, as the union of their disjuncts' surviving
  *     sets); casts, expressions, null literals, float literals
  *     (float->double widening would compare a DIFFERENT value than the
  *     runtime float comparison), and sub-second timestamps contribute
  *     nothing;
  *   - partitioned, bucketed, catalog-backed, and streaming relations are
  *     left untouched (Spark's own partition pruning owns those);
  *   - the interval test itself is [[graft.sources.ColumnIndex.zoneMayMatch]],
  *     the same proven-disjoint-only logic the REST path uses.
  *
  * All-files-pruned collapses to an empty [[LocalRelation]] with the scan's
  * own attributes — `LocalFoldRules` then folds the rest of the query, so a
  * provably-empty filter answers without a job at all. */
object IndexPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, l: LogicalRelation) =>
      prunedRelation(cond, l).getOrElse(f)
  }

  private def prunedRelation(cond: Expression,
                             l: LogicalRelation): Option[LogicalPlan] = {
    val fsRel = l.relation match {
      case r: HadoopFsRelation
          if r.fileFormat.isInstanceOf[ParquetFileFormat] &&
            r.partitionSchema.isEmpty && r.bucketSpec.isEmpty &&
            l.catalogTable.isEmpty && !l.isStreaming => r
      case _ => return None
    }
    val idx = lookupFor(fsRel.location.rootPaths).getOrElse(return None)
    val conjuncts = splitConjunctivePredicates(cond)
    val simple = conjuncts.flatMap(triplesOf)
    // a top-level OR conjunct prunes as the UNION of its disjuncts'
    // surviving sets — but only when EVERY disjunct contributes pruning
    // evidence (a disjunct the index cannot see keeps all files, making
    // the union the full set). A disjunct's own conjunction prunes on any
    // subset of its conjuncts (superset of matches = sound).
    val orGroups = conjuncts.collect {
      case o: Or => splitDisjunctivePredicates(o)
        .map(d => splitConjunctivePredicates(d).flatMap(triplesOf))
    }.filter(ds => ds.nonEmpty && ds.forall(_.nonEmpty))
    if (simple.isEmpty && orGroups.isEmpty) return None
    // prune among the SCAN's own listing, not the index's: files the
    // index has not harvested yet (mid-tick appends, fresher ad-hoc
    // listings) always keep
    val scanFiles = fsRel.location.inputFiles.toSeq
    var kept: Seq[String] = scanFiles
    if (simple.nonEmpty) idx.pruneAmong(kept, simple).foreach(k => kept = k)
    orGroups.foreach { ds =>
      val surviving = ds.map(d => idx.pruneAmong(kept, d).getOrElse(kept).toSet)
        .reduce(_ union _)
      kept = kept.filter(surviving)
    }
    if (kept.size >= scanFiles.size) None
    else if (kept.isEmpty) Some(LocalRelation(l.output))
    else {
      val spark = fsRel.sparkSession
      val loc = new InMemoryFileIndex(
        spark, kept.map(new Path(_)).toSeq, fsRel.options, Some(fsRel.dataSchema))
      Some(Filter(cond, l.copy(relation = fsRel.copy(location = loc)(spark))))
    }
  }

  /** Registry lookup for a scan's root paths. The engine's registered
    * parquet dirs match a single-root scan exactly; Delta/Iceberg loader
    * scans list leaf FILES as roots, so those match by walking the first
    * root's ancestors up to the registered table dir (a bounded number of
    * ConcurrentHashMap probes). Soundness does not depend on the walk:
    * `pruneAmong` keeps every file the index does not know, so an
    * ancestor hit can never over-prune a foreign file, and a re-visit of
    * an already-pruned scan rewrites nothing (kept == listing). */
  private def lookupFor(roots: Seq[Path]): Option[graft.sources.ColumnIndex.Index] = {
    if (roots.isEmpty) return None
    val direct = graft.sources.ColumnIndexRegistry.lookup(roots.head.toString)
    if (direct.isDefined) return direct
    // deep enough for data/<k1>=v/<k2>=v/.../part.parquet layouts with
    // many partition columns (review finding: 4 hops missed the table
    // root past 3 identity partitions); each probe is one map lookup
    var p = roots.head.getParent
    var hops = 0
    while (p != null && hops < 12) {
      val hit = graft.sources.ColumnIndexRegistry.lookup(p.toString)
      if (hit.isDefined) return hit
      p = p.getParent; hops += 1
    }
    None
  }

  /** One conjunct -> zero or more REST-surface triples. Beyond the simple
    * comparisons: `IN (v, ...)` becomes one "in" disjunction triple (only
    * when EVERY value converts — a partially-converted list would
    * under-approximate the disjunction and wrongly prune); a LIKE prefix
    * (Catalyst's `StartsWith`, same optimizer batch) becomes the
    * [prefix, prefix+1) range pair for ASCII prefixes. */
  private def triplesOf(e: Expression): Seq[(String, String, String)] = e match {
    case In(a: AttributeReference, vs) if vs.nonEmpty &&
        vs.forall(_.isInstanceOf[Literal]) =>
      inTriple(a.name, vs.collect { case Literal(v, dt) => raw(v, dt) })
    case InSet(a: AttributeReference, hset) if hset.nonEmpty && hset.size <= 1000 =>
      inTriple(a.name, hset.toSeq.map(raw(_, a.dataType)))
    case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType))
        if p != null =>
      // shared [prefix, prefix+1) expansion (empty/non-ASCII refuse there)
      graft.sources.ColumnIndex.prefixRangeTriples(a.name, p.toString)
    case _ => tripleOf(e).toSeq
  }

  /** The "in" disjunction triple — the shared encoder applies the
    * all-converted/empty/separator guards (a dropped or split-corrupted
    * value could under-approximate the disjunction and wrongly prune). */
  private def inTriple(col: String,
                       raws: Seq[Option[String]]): Seq[(String, String, String)] =
    graft.sources.ColumnIndex.inTripleOpt(col, raws)

  /** `attr op literal` (either side) -> the REST-surface triple the index
    * consumes; anything else contributes no pruning evidence. */
  private def tripleOf(e: Expression): Option[(String, String, String)] = e match {
    case EqualTo(a: AttributeReference, Literal(v, dt)) => raw(v, dt).map((a.name, "eq", _))
    case EqualTo(Literal(v, dt), a: AttributeReference) => raw(v, dt).map((a.name, "eq", _))
    case LessThan(a: AttributeReference, Literal(v, dt)) => raw(v, dt).map((a.name, "lt", _))
    case LessThan(Literal(v, dt), a: AttributeReference) => raw(v, dt).map((a.name, "gt", _))
    case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) => raw(v, dt).map((a.name, "lte", _))
    case LessThanOrEqual(Literal(v, dt), a: AttributeReference) => raw(v, dt).map((a.name, "gte", _))
    case GreaterThan(a: AttributeReference, Literal(v, dt)) => raw(v, dt).map((a.name, "gt", _))
    case GreaterThan(Literal(v, dt), a: AttributeReference) => raw(v, dt).map((a.name, "lt", _))
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) => raw(v, dt).map((a.name, "gte", _))
    case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) => raw(v, dt).map((a.name, "lte", _))
    case _ => None
  }

  /** Catalyst literal -> REST literal surface, EXACTLY value-preserving or
    * None. Doubles round-trip through `toString` losslessly; floats do NOT
    * (the widened double differs from the runtime float comparison) and are
    * refused; timestamps only at whole seconds (fractions refuse on the
    * index side anyway). */
  private def raw(v: Any, dt: DataType): Option[String] = {
    if (v == null) None
    else dt match {
      case StringType =>
        Some("'" + v.asInstanceOf[UTF8String].toString.replace("'", "''") + "'")
      case ByteType | ShortType | IntegerType | LongType => Some(v.toString)
      case DoubleType => Some(v.toString)
      case DateType =>
        Some("'" + java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[Int].toLong).toString + "'")
      case TimestampType | TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        if (Math.floorMod(micros, 1000000L) != 0L) None
        else Some("'" + java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
          .toString + "'")
      case _ => None
    }
  }
}
