package graft.sources

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Column index — the reference's unshipped query-layer roadmap box
  * (reference: README.md:296 "[ ] column index"), realized Spark-first as a
  * per-FILE zone-map (data-skipping) index over parquet tables.
  *
  * Spark's own parquet reader already prunes row groups from footer
  * statistics, but it does so per TASK: at 100 TB / ~100k files every
  * filtered query still schedules a task per file split just to open a
  * footer and discover "nothing here". This index hoists the same min/max
  * stats to the driver ONCE at registration (the footers are read in a
  * distributed pass — one task per file batch, no row data touched), so a
  * filtered REST query plans over only the files whose [min,max] interval
  * can match — the Delta/Iceberg data-skipping design, and the reason the
  * repo's `ZOrder` operator exists: z-ordered layout makes these intervals
  * tight on multiple columns at once.
  *
  * Driver-side footprint is `files × indexed-columns` fixed-width entries —
  * the same order as Spark's `InMemoryFileIndex` listing the driver already
  * holds for every table.
  *
  * Pruning is strictly conservative: a file is dropped only when its stats
  * PROVE the conjunction cannot match (interval disjoint, or the column is
  * all-null — `eq/lt/…` never match null). Missing/unsupported stats keep
  * the file.
  */
object ColumnIndex {

  /** One column's zone entry in one file. `kind`: "long" | "double" |
    * "string" | "date" (epoch days in the long fields) | "tsus"/"tsms"
    * (epoch micros/millis — literal date/datetime strings convert at UTC,
    * which matches Spark semantics because GraftSession pins
    * `spark.sql.session.timeZone=UTC`). `allNull` means every value in the
    * file is null (provably, from footer null counts). */
  final case class Zone(kind: String, minL: Long, maxL: Long,
                        minD: Double, maxD: Double,
                        minS: String, maxS: String, allNull: Boolean,
                        /** Null count in the file — informational for the
                          * interval test, but the stats channel table-format
                          * writers ([[DeltaWriter]]) publish. */
                        nulls: Long = 0L)
      extends Serializable

  /** `sig` = "length:mtime" of the file when harvested — the reuse check
    * for incremental rebuilds (parquet data files are immutable by
    * convention, but a rewritten file must re-harvest). */
  final case class FileZones(path: String, rows: Long,
                             zones: Map[String, Zone],
                             sig: String = "") extends Serializable

  /** Filter triple as the REST grammar produces it: (column, op, raw value)
    * with op in {"", eq, lt, lte, lteq, gt, gte, gteq} — plus [[InOp]],
    * the SQL rule's IN-list disjunction (values joined by [[InSep]]). */
  type Pred = (String, String, String)

  final class Index private[ColumnIndex] (
      val dir: String, val columns: Seq[String], val files: Vector[FileZones],
      /** How many files this build reused from its `prev` index. */
      val reusedFiles: Int = 0,
      /** Whether re-reading this index's "kept" files as RAW parquet
        * ([[prunedDf]]) is faithful to the table. True for plain parquet
        * dirs, and for table-format indexes exactly when nothing in the
        * log/manifests changes what the bytes mean — no partition columns
        * to reconstruct (Delta), no deletion vectors / delete files to
        * apply, no column mapping. When false, pruning happens only among
        * an existing plan's own listing ([[pruneAmong]], the
        * optimizer-rule path), which is always sound. Staleness: an index
        * built before a DML commit serves that older snapshot's rows until
        * the registry refresh lands — snapshot isolation, never
        * corruption (the older version's files stay on disk for the
        * vacuum retention window). A CROSS-PROCESS writer that compacts
        * and vacuums at aggressive retention can delete files a remote
        * server's stale index still lists; the pruned scan then fails
        * LOUDLY (file not found) rather than mis-answer — re-register the
        * index to recover. */
      val rawScanSafe: Boolean = true) {

    /** Spec/metrics hook: (kept, total) of the most recent prune. */
    @volatile var lastPrune: Option[(Int, Int)] = None

    def fileCount: Int = files.size

    private def usablePreds(preds: Seq[Pred]): Seq[Pred] =
      preds.filter { case (c, op, _) =>
        columns.exists(_.equalsIgnoreCase(c)) && opSupported(op)
      }

    private def fileMayMatch(f: FileZones, usable: Seq[Pred],
        cache: mutable.Map[(String, String), Option[Any]]): Boolean =
      usable.forall { case (c, op, raw) =>
        f.zones.find(_._1.equalsIgnoreCase(c)) match {
          case None => true // no stats for this column in this file
          case Some((_, z)) => zoneMayMatchCached(z, op, raw, cache)
        }
      }

    // one literal-conversion cache per prune CALL: conversions run once
    // per (zone kind, value), not once per (file, value)
    private def freshCache() = mutable.Map.empty[(String, String), Option[Any]]

    /** Files that may satisfy the conjunction; None when no predicate
      * touches an indexed column (nothing to prune on). */
    def prune(preds: Seq[Pred]): Option[Vector[String]] = {
      val usable = usablePreds(preds)
      if (usable.isEmpty) None
      else {
        val cache = freshCache()
        val kept = files.filter(fileMayMatch(_, usable, cache)).map(_.path)
        lastPrune = Some((kept.size, files.size))
        Some(kept)
      }
    }

    /** Prune among an EXPLICIT scan listing (the optimizer-rule path):
      * files the index does not know ALWAYS keep — the scan's listing can
      * be fresher than the index (mid-tick appends, ad-hoc dir scans), and
      * dropping an unknown file would silently lose rows (review finding). */
    def pruneAmong(scanFiles: Seq[String], preds: Seq[Pred]): Option[Seq[String]] = {
      val usable = usablePreds(preds)
      if (usable.isEmpty) None
      else {
        val byPath = files.iterator.map(f => f.path -> f).toMap
        val cache = freshCache()
        // normalize before lookup: listings disagree on empty-authority
        // URIs (file:/x vs file:///x); Path.toString canonicalizes both
        val kept = scanFiles.filter { p =>
          byPath.get(new Path(p).toString).forall(fileMayMatch(_, usable, cache))
        }
        // record only REAL prunes: the optimizer rule re-visits scans it
        // (or the engine's prunedDf) already pruned — those no-op passes
        // must not clobber the meaningful (kept, total) record
        if (kept.size < scanFiles.size)
          lastPrune = Some((kept.size, scanFiles.size))
        Some(kept)
      }
    }

    /** The pruned scan, or None when pruning cannot help (no usable
      * predicate, or nothing was actually pruned). An all-pruned result
      * yields an empty LocalRelation with the table schema. `options` are
      * the table's registered reader options — the pruned scan must apply
      * them (pathGlobFilter, rebase modes, …) or its rows could diverge
      * from the unpruned view's (review finding). */
    def prunedDf(spark: SparkSession, preds: Seq[Pred], schema: StructType,
                 options: Map[String, String] = Map.empty): Option[DataFrame] =
      if (!rawScanSafe) None
      else prune(preds).flatMap { kept =>
        if (kept.size == files.size) None
        else if (kept.isEmpty)
          Some(spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema))
        else Some(spark.read.options(options).schema(schema)
          .option("basePath", dir).parquet(kept: _*))
      }
  }

  private def opSupported(op: String): Boolean =
    op == InOp ||
      Set("", "eq", "lt", "lte", "lteq", "gt", "gte", "gteq").contains(op)

  /** Value separator inside an [[InOp]] predicate's raw field — a private
    * contract between the triple encoders (IndexPruneRule) and this
    * decoder; U+0001 cannot appear in the REST literal surface. */
  private[graft] val InSep = '\u0001'

  /** The IN-disjunction op tag. Deliberately NOT the surface string "in":
    * REST/GraphQL op strings reach [[Index.prune]] verbatim, and a future
    * frontend `in` operator would encode its list differently (comma-
    * separated) — a tag containing [[InSep]] cannot collide with any
    * user-supplied op (review finding). */
  private[graft] val InOp: String = InSep.toString + "in"

  /** THE one InOp triple encoder, shared by every frontend (REST, GraphQL,
    * the Catalyst rule) so the guard set cannot drift (review finding: three
    * hand-rolled encoders had three different guard sets, and the weakest
    * one wrongly pruned). Refuses — no pruning evidence, never a wrong
    * prune — when the list is empty, any element is EMPTY (String.split
    * drops trailing empty strings, so an empty element would vanish at
    * decode and under-approximate the disjunction), or any element contains
    * the separator itself (a split-corrupted value). */
  private[graft] def inTriple(col: String, raws: Seq[String]): Seq[Pred] =
    if (raws.isEmpty || raws.exists(r => r.isEmpty || r.indexOf(InSep.toInt) >= 0))
      Seq.empty
    else Seq((col, InOp, raws.mkString(InSep.toString)))

  /** THE one prefix-to-range encoder (shared like [[inTriple]], and for the
    * same reason): `col LIKE 'prefix%'` / `StartsWith(col, prefix)` prunes
    * as the `[prefix, prefix+1)` string range. ASCII-only — the zone
    * compare is unsigned-byte lexicographic, which matches String.compareTo
    * only below 128 — and the <127 bound keeps the last char bumpable.
    * Anything else: no pruning evidence. */
  private[graft] def prefixRangeTriples(col: String, prefix: String): Seq[Pred] =
    if (prefix.nonEmpty && prefix.forall(_ < 127)) {
      val bumped = prefix.init + (prefix.last + 1).toChar
      Seq((col, "gte", s"'${prefix.replace("'", "''")}'"),
        (col, "lt", s"'${bumped.replace("'", "''")}'"))
    } else Seq.empty

  /** [[inTriple]] for callers whose elements may have failed to convert:
    * ANY unconverted element refuses the whole triple (a partial list
    * would under-approximate the disjunction and wrongly prune). Separate
    * name — erasure forbids a Seq[Option[String]] overload. */
  private[graft] def inTripleOpt(col: String, raws: Seq[Option[String]]): Seq[Pred] =
    if (raws.exists(_.isEmpty)) Seq.empty else inTriple(col, raws.flatten)

  /** Conservative interval test; any conversion surprise keeps the file. */
  private[sources] def zoneMayMatch(z: Zone, op: String, raw: String): Boolean =
    zoneMayMatchCached(z, op, raw,
      scala.collection.mutable.Map.empty[(String, String), Option[Any]])

  /** [[zoneMayMatch]] with a per-prune-call literal-conversion cache keyed
    * (zone kind, raw) — an IN list over many files would otherwise re-run
    * unquote+BigDecimal per (file, value) pair (review finding). */
  private def zoneMayMatchCached(z: Zone, op: String, raw: String,
      cache: scala.collection.mutable.Map[(String, String), Option[Any]]): Boolean = {
    if (z.allNull) return false // eq/range/in predicates never match null
    if (op == InOp) // disjunction of equalities: any value may match
      return raw.split(InSep).exists(v => zoneMayMatchCached(z, "eq", v, cache))
    cache.getOrElseUpdate((z.kind, raw), literalFor(z, raw)) match {
      case None => true
      case Some(v) =>
        val (cmpMin, cmpMax) = z.kind match {
          case "double" =>
            val d = v.asInstanceOf[BigDecimal]
            (BigDecimal(z.minD).compare(d), BigDecimal(z.maxD).compare(d))
          case "string" =>
            // parquet binary stats order is unsigned-byte lexicographic;
            // that matches String.compareTo only for pure-ASCII values —
            // anything else keeps the file (conservative)
            val s = v.asInstanceOf[String]
            val ascii = (x: String) => x.forall(_ < 128)
            if (!ascii(s) || !ascii(z.minS) || !ascii(z.maxS)) return true
            (z.minS.compareTo(s), z.maxS.compareTo(s))
          case "long" if v.isInstanceOf[RoundedDouble] =>
            // a fractional literal against an integer zone: the runtime
            // comparison widens the COLUMN to double (lossy past 2^53), so
            // the bounds must round the same way — exact-BigDecimal bounds
            // could prove disjointness the rounded runtime denies (review
            // finding). long->double rounding is monotone, so the rounded
            // interval still covers every rounded value.
            val d = BigDecimal(v.asInstanceOf[RoundedDouble].d)
            (BigDecimal(z.minL.toDouble).compare(d), BigDecimal(z.maxL.toDouble).compare(d))
          case _ => // long / date / ts: exact integer compare
            val d = v.asInstanceOf[BigDecimal]
            (BigDecimal(z.minL).compare(d), BigDecimal(z.maxL).compare(d))
        }
        op match {
          case "" | "eq"      => cmpMin <= 0 && cmpMax >= 0
          case "lt"           => cmpMin < 0
          case "lte" | "lteq" => cmpMin <= 0
          case "gt"           => cmpMax > 0
          case "gte" | "gteq" => cmpMax >= 0
          case _              => true
        }
    }
  }

  /** Marker for a fractional literal hitting an integer zone — compared in
    * the runtime's rounded-to-double domain, not exactly. */
  private final case class RoundedDouble(d: Double)

  /** REST raw literal -> the zone's comparison domain. Strings arrive
    * either bare or in the REST `'..'` quoting. */
  private def literalFor(z: Zone, raw: String): Option[Any] = {
    val t = raw.trim
    // the frontends' exact unquote rule — decode and runtime must agree
    val unquoted = graft.frontend.RestQuery.unquote(raw)
    z.kind match {
      case "string" =>
        // a BARE numeric-looking value is ambiguous across frontends: REST
        // compares it as a string (schema-directed typing) but GraphQL/SQL
        // coerce numerically ('05' = 5 is true there) — lexicographic
        // pruning would be wrong for the latter, so only quoted values
        // prune (review finding)
        unquoted.orElse(
          Some(raw).filter(_ => t.toDoubleOption.isEmpty && t.toLongOption.isEmpty))
      // date/timestamp zones accept ONLY date/datetime strings: a bare
      // numeric's runtime meaning is cast-dependent (Spark casts numerics
      // to timestamps as SECONDS, not micros) — no pruning evidence
      case "date" =>
        val s = unquoted.getOrElse(t)
        scala.util.Try(java.time.LocalDate.parse(s).toEpochDay)
          .toOption.map(BigDecimal(_))
      case "tsus" | "tsms" =>
        val s = unquoted.getOrElse(t)
        val perSec = if (z.kind == "tsus") 1000000L else 1000L
        epochSeconds(s).map(sec => BigDecimal(sec) * BigDecimal(perSec))
      case "long" =>
        if (unquoted.isDefined) None
        else t.toLongOption.map(BigDecimal(_))
          .orElse(t.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite)
            .map(RoundedDouble(_)))
      case _ => // double zones: numeric literals only
        if (unquoted.isDefined) None
        else t.toLongOption.map(BigDecimal(_))
          .orElse(t.toDoubleOption.filter(d => !d.isNaN && !d.isInfinite)
            .map(BigDecimal(_)))
    }
  }

  /** `YYYY-MM-DD[ T]HH:MM:SS` or bare `YYYY-MM-DD` -> epoch seconds at UTC.
    * Fractional seconds refuse (None -> keep the file): truncating them
    * could falsely prove disjointness for `lt`/`gt` bounds. */
  private def epochSeconds(s: String): Option[Long] = {
    val norm = s.trim.replace(' ', 'T')
    if (norm.contains('.')) None
    else scala.util.Try(java.time.LocalDateTime.parse(norm)
        .toEpochSecond(java.time.ZoneOffset.UTC)).toOption
      .orElse(scala.util.Try(java.time.LocalDate.parse(norm)
        .atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC)).toOption)
  }

  // ---- persistence ---------------------------------------------------------

  /** Sidecar name carries a hash of the (lowercased, sorted) column set:
    * two persisted tables over the same dir with DIFFERENT index_columns
    * would otherwise clobber each other's sidecar on every boot (review
    * finding). Same column set -> shared sidecar, as intended. */
  private[sources] def sidecarName(cols: Seq[String]): String = {
    val key = cols.map(_.toLowerCase).sorted.mkString(",")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = md5.take(4).map(b => f"$b%02x").mkString
    s"_graft_colindex_$hex.json"
  }
  private lazy val json = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Persist the index as a `_graft_colindex.json` sidecar INSIDE the table
    * dir (underscore-prefixed: invisible to Spark's listings, like
    * `_delta_log`). Opt-in via the table's `index_persist` option — a
    * restart then reloads zones and the next build harvests only files
    * whose length:mtime signature changed. Failures warn and continue:
    * persistence is an optimization, never a correctness gate. */
  def save(spark: SparkSession, idx: Index): Unit =
    try {
      val root = new Path(idx.dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val doc = json.createObjectNode()
      val cols = doc.putArray("columns"); idx.columns.foreach(cols.add)
      val fl = doc.putArray("files")
      idx.files.foreach { f =>
        val fo = fl.addObject()
        fo.put("path", f.path); fo.put("rows", f.rows); fo.put("sig", f.sig)
        val zs = fo.putObject("zones")
        f.zones.foreach { case (c, z) =>
          val zo = zs.putObject(c)
          zo.put("kind", z.kind); zo.put("minL", z.minL); zo.put("maxL", z.maxL)
          zo.put("minD", z.minD); zo.put("maxD", z.maxD)
          zo.put("minS", z.minS); zo.put("maxS", z.maxS)
          zo.put("allNull", z.allNull); zo.put("nulls", z.nulls)
        }
      }
      val out = fs.create(new Path(root, sidecarName(idx.columns)), true)
      try out.write(json.writerWithDefaultPrettyPrinter.writeValueAsBytes(doc))
      finally out.close()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[colindex] persist ${idx.dir}: ${e.getMessage}")
    }

  /** Load a previously-saved sidecar; None when absent, unreadable, or
    * built for a different column set (then a fresh harvest runs). */
  def load(spark: SparkSession, dir: String, cols: Seq[String]): Option[Index] =
    try {
      val root = new Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = new Path(root, sidecarName(cols))
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val doc = try json.readTree(in) finally in.close()
        import scala.jdk.CollectionConverters._
        val colSeq = doc.get("columns").elements().asScala.map(_.asText()).toVector
        if (colSeq.map(_.toLowerCase).toSet != cols.map(_.toLowerCase).toSet) None
        else {
          val files = Vector.newBuilder[FileZones]
          doc.get("files").elements().forEachRemaining { fo =>
            val zones = scala.collection.mutable.Map[String, Zone]()
            fo.get("zones").properties().forEach { e =>
              val z = e.getValue
              zones(e.getKey) = Zone(z.get("kind").asText(),
                z.get("minL").asLong(), z.get("maxL").asLong(),
                z.get("minD").asDouble(), z.get("maxD").asDouble(),
                z.get("minS").asText(), z.get("maxS").asText(),
                z.get("allNull").asBoolean(),
                if (z.has("nulls")) z.get("nulls").asLong() else 0L)
            }
            files += FileZones(fo.get("path").asText(), fo.get("rows").asLong(),
              zones.toMap, fo.get("sig").asText())
          }
          Some(new Index(dir, colSeq, files.result()))
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[colindex] load $dir: ${e.getMessage}")
      None
    }

  // ---- build ---------------------------------------------------------------

  /** Harvest footer stats for `cols` over every parquet file under `dir`.
    * Footer reads run as a distributed job (metadata-only — no row bytes);
    * only the small per-file zone rows come back to the driver.
    *
    * `prev` makes the rebuild INCREMENTAL: files whose (path, length,
    * mtime) signature already appears in the previous index reuse its
    * zones, so a refresh tick over an append-only 100k-file table
    * harvests only the new arrivals — O(new files), not O(all files).
    * A different column list disables reuse entirely. Removed files
    * simply drop out (they are absent from the fresh listing). */
  def build(spark: SparkSession, dir: String, cols: Seq[String],
            prev: Option[Index] = None): Index = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val listed = listDataFiles(fs, root)
    val reusable: Map[String, FileZones] = prev match {
      case Some(p) if p.dir == dir &&
          p.columns.map(_.toLowerCase).toSet == cols.map(_.toLowerCase).toSet =>
        p.files.iterator.filter(_.sig.nonEmpty)
          .map(f => (f.path + "#" + f.sig) -> f).toMap
      case _ => Map.empty
    }
    val (kept, toHarvest) = listed.partition(ps => reusable.contains(ps._1 + "#" + ps._2))
    val paths = toHarvest
    val confEntries = DistKit.confEntries(conf)
    val wanted = cols.toVector
    val fresh =
      if (paths.isEmpty) Vector.empty[FileZones]
      else spark.sparkContext
        .parallelize(paths, math.min(paths.size,
          math.max(1, spark.sparkContext.defaultParallelism)))
        .mapPartitions { it =>
          val c = DistKit.rebuildConf(confEntries)
          it.map { case (p, sig) => readFileZones(c, p, wanted).copy(sig = sig) }
        }
        .collect().toVector
    val zones = (fresh ++ kept.map(ps => reusable(ps._1 + "#" + ps._2)))
      .sortBy(_.path)
    new Index(dir, wanted, zones, reusedFiles = kept.size)
  }

  /** Zones from a Delta table's own transaction-log metadata (`add.stats`
    * min/max/nullCount + identity partition values) — ZERO parquet footers
    * touched: at 100 TB the log already carries everything data skipping
    * needs, exactly the design the protocol intends. Live files only (dead
    * adds never enter); `rawScanSafe` is computed — true exactly when the
    * log adds no meaning to the bytes (no partition columns, no deletion
    * vectors; see [[Index.rawScanSafe]]). Column-mapped tables get an
    * empty index: their stats are keyed by PHYSICAL names, so logical-name
    * zones would be wrong. */
  def buildFromDelta(spark: SparkSession, dir: String, cols: Seq[String]): Index = {
    val snap = DeltaLoader.snapshot(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wanted = cols.toVector
    if (snap.columnMappingMode != "none") {
      System.err.println(
        s"[colindex] $dir: column-mapped delta table, stats zones disabled")
      return new Index(dir, wanted, Vector.empty, rawScanSafe = false)
    }
    val fieldFor: Map[String, org.apache.spark.sql.types.StructField] =
      snap.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val files = snap.files.map { f =>
      val abs =
        if (f.path.contains("://") || f.path.startsWith("/")) f.path
        else new Path(dir, java.net.URLDecoder.decode(f.path, "UTF-8")).toString
      val qualified = fs.makeQualified(new Path(abs)).toString
      val zones = mutable.Map[String, Zone]()
      var rows = -1L
      f.stats.foreach { s =>
        try {
          val node = json.readTree(s)
          rows = Option(node.get("numRecords")).map(_.asLong()).getOrElse(-1L)
          wanted.foreach(c => fieldFor.get(c.toLowerCase).foreach { field =>
            deltaStatsZone(node, field, rows).foreach(zones(field.name) = _)
          })
        } catch { case scala.util.control.NonFatal(_) => () }
      }
      // identity partition values live in the log, not the stats: an exact
      // [v, v] zone per file (null partition value = all-null column)
      wanted.foreach(c => snap.partitionColumns.find(_.equalsIgnoreCase(c))
        .foreach { pc =>
          if (f.partitionValues.contains(pc))
            fieldFor.get(pc.toLowerCase).foreach { field =>
              partitionValueZone(f.partitionValues(pc), field.dataType)
                .foreach(zones(field.name) = _)
            }
        })
      FileZones(qualified, math.max(rows, 0L), zones.toMap)
    }
    // a raw parquet scan of the LIVE FILE LIST is faithful exactly when
    // nothing in the log changes what those bytes mean: no partition
    // columns to reconstruct, no deletion vectors to apply (column mapping
    // refused above). Then prunedDf may serve index-survivor files
    // directly — the layout a Z-ORDER compaction produces (review finding:
    // the hardcoded false silently degraded every pruned delta scan to the
    // full-table fallback).
    val rawOk = snap.partitionColumns.isEmpty && snap.files.forall(_.dv.isEmpty)
    new Index(dir, wanted, files.sortBy(_.path).toVector, rawScanSafe = rawOk)
  }

  /** Zones from an Iceberg table's manifest stats (null_value_counts +
    * lower/upper bounds in the spec's single-value binary serialization) —
    * the [[buildFromDelta]] story for the other table format. */
  def buildFromIceberg(spark: SparkSession, dir: String, cols: Seq[String]): Index = {
    val (schemaNode, stats, hasDeletes, partitioned) =
      IcebergLoader.currentFileStats(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val wanted = cols.toVector
    import scala.jdk.CollectionConverters._
    // top-level primitive fields only: id + iceberg type string
    val fieldFor: Map[String, (String, Int, String)] =
      Option(schemaNode).flatMap(n => Option(n.get("fields"))).toSeq
        .flatMap(_.elements().asScala)
        .filter(f => f.get("type").isTextual)
        .map(f => f.get("name").asText().toLowerCase ->
          (f.get("name").asText(), f.get("id").asInt(), f.get("type").asText()))
        .toMap
    val files = stats.map { st =>
      val qualified = fs.makeQualified(new Path(st.path)).toString
      val zones = mutable.Map[String, Zone]()
      wanted.foreach(c => fieldFor.get(c.toLowerCase).foreach {
        case (name, fid, t) =>
          val nulls = st.nullCounts.getOrElse(fid, 0L)
          if (st.recordCount > 0 && nulls == st.recordCount)
            zones(name) = Zone("long", 0, 0, 0, 0, "", "", allNull = true,
              nulls = nulls)
          else for {
            lo <- st.lowerBounds.get(fid)
            hi <- st.upperBounds.get(fid)
            z <- icebergBoundsZone(t, lo, hi, nulls)
          } zones(name) = z
      })
      FileZones(qualified, math.max(st.recordCount, 0L), zones.toMap)
    }
    // iceberg data files CONTAIN identity partition columns, but the
    // hive-style layout dirs (identity AND transform tuples) would be
    // partition-INFERRED by a raw basePath scan — transform dirs as extra
    // columns, identity columns reordered — so raw scans are faithful only
    // for unpartitioned delete-free tables (review finding)
    new Index(dir, wanted, files.sortBy(_.path).toVector,
      rawScanSafe = !hasDeletes && !partitioned)
  }

  /** One column's zone out of a Delta `stats` document, typed by the
    * table-schema field. Absent/unparseable values contribute no zone
    * (conservative keep). */
  private def deltaStatsZone(node: com.fasterxml.jackson.databind.JsonNode,
                             field: org.apache.spark.sql.types.StructField,
                             rows: Long): Option[Zone] = {
    import org.apache.spark.sql.types._
    val nulls = Option(node.get("nullCount")).flatMap(n =>
      Option(n.get(field.name))).filter(_.isNumber).map(_.asLong())
    if (rows > 0 && nulls.contains(rows))
      return Some(Zone("long", 0, 0, 0, 0, "", "", allNull = true, nulls = rows))
    val minN = Option(node.get("minValues")).flatMap(n => Option(n.get(field.name)))
      .filterNot(_.isNull)
    val maxN = Option(node.get("maxValues")).flatMap(n => Option(n.get(field.name)))
      .filterNot(_.isNull)
    val n0 = nulls.getOrElse(0L)
    (minN, maxN) match {
      case (Some(mi), Some(ma)) => field.dataType match {
        case ByteType | ShortType | IntegerType | LongType
            if mi.isIntegralNumber && ma.isIntegralNumber =>
          Some(Zone("long", mi.asLong(), ma.asLong(), 0, 0, "", "", false, n0))
        case FloatType | DoubleType if mi.isNumber && ma.isNumber &&
            java.lang.Double.isFinite(mi.asDouble()) &&
            java.lang.Double.isFinite(ma.asDouble()) =>
          Some(Zone("double", 0, 0, mi.asDouble(), ma.asDouble(), "", "", false, n0))
        case StringType if mi.isTextual && ma.isTextual =>
          // writers may truncate string stats (max gets a bumped prefix);
          // the protocol still guarantees them as valid bounds
          Some(Zone("string", 0, 0, 0, 0, mi.asText(), ma.asText(), false, n0))
        case DateType if mi.isTextual && ma.isTextual =>
          for {
            lo <- scala.util.Try(java.time.LocalDate.parse(mi.asText()).toEpochDay).toOption
            hi <- scala.util.Try(java.time.LocalDate.parse(ma.asText()).toEpochDay).toOption
          } yield Zone("date", lo, hi, 0, 0, "", "", false, n0)
        case TimestampType | TimestampNTZType if mi.isTextual && ma.isTextual =>
          for {
            lo <- statsTsMicros(mi.asText(), floorOk = true)
            hi <- statsTsMicros(ma.asText(), floorOk = false)
          } yield Zone("tsus", lo, hi, 0, 0, "", "", false, n0)
        case _ => None
      }
      case _ => None
    }
  }

  /** ISO-ish stats timestamp -> epoch micros at UTC (accepts `Z`, offsets,
    * space separators, fractional seconds). A max bound with sub-micro
    * precision refuses (`floorOk = false`): truncating it could falsely
    * prove disjointness. */
  private def statsTsMicros(s0: String, floorOk: Boolean): Option[Long] = {
    val s = s0.trim.replace(' ', 'T')
    val inst = scala.util.Try(java.time.OffsetDateTime.parse(s).toInstant).toOption
      .orElse(scala.util.Try(
        java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)).toOption)
    inst.flatMap { i =>
      if (!floorOk && i.getNano % 1000 != 0) None
      else Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    }
  }

  /** Delta partition-value string -> an exact [v, v] zone (null = the
    * column is null across the whole file). */
  private def partitionValueZone(raw: String,
      dt: org.apache.spark.sql.types.DataType): Option[Zone] = {
    import org.apache.spark.sql.types._
    if (raw == null)
      return Some(Zone("long", 0, 0, 0, 0, "", "", allNull = true))
    dt match {
      case StringType => Some(Zone("string", 0, 0, 0, 0, raw, raw, false))
      case ByteType | ShortType | IntegerType | LongType =>
        raw.toLongOption.map(v => Zone("long", v, v, 0, 0, "", "", false))
      case DateType =>
        scala.util.Try(java.time.LocalDate.parse(raw).toEpochDay).toOption
          .map(v => Zone("date", v, v, 0, 0, "", "", false))
      case FloatType | DoubleType =>
        raw.toDoubleOption.filter(java.lang.Double.isFinite(_))
          .map(v => Zone("double", 0, 0, v, v, "", "", false))
      case TimestampType | TimestampNTZType =>
        statsTsMicros(raw, floorOk = false)
          .map(v => Zone("tsus", v, v, 0, 0, "", "", false))
      case _ => None
    }
  }

  /** Iceberg single-value bounds -> zone, typed by the iceberg primitive.
    * Length/format surprises contribute no zone. */
  private def icebergBoundsZone(t: String, lo: Array[Byte], hi: Array[Byte],
                                nulls: Long): Option[Zone] = {
    def le(b: Array[Byte]) = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def i32(b: Array[Byte]): Option[Long] =
      if (b.length == 4) Some(le(b).getInt.toLong) else None
    def i64(b: Array[Byte]): Option[Long] =
      if (b.length == 8) Some(le(b).getLong) else None
    t match {
      case "int" => for (l <- i32(lo); h <- i32(hi))
        yield Zone("long", l, h, 0, 0, "", "", false, nulls)
      case "long" => for (l <- i64(lo); h <- i64(hi))
        yield Zone("long", l, h, 0, 0, "", "", false, nulls)
      case "date" => for (l <- i32(lo); h <- i32(hi))
        yield Zone("date", l, h, 0, 0, "", "", false, nulls)
      case "timestamp" | "timestamptz" => for (l <- i64(lo); h <- i64(hi))
        yield Zone("tsus", l, h, 0, 0, "", "", false, nulls)
      case "float" =>
        if (lo.length != 4 || hi.length != 4) None
        else {
          val l = le(lo).getFloat.toDouble; val h = le(hi).getFloat.toDouble
          if (java.lang.Double.isFinite(l) && java.lang.Double.isFinite(h))
            Some(Zone("double", 0, 0, l, h, "", "", false, nulls)) else None
        }
      case "double" =>
        if (lo.length != 8 || hi.length != 8) None
        else {
          val l = le(lo).getDouble; val h = le(hi).getDouble
          if (java.lang.Double.isFinite(l) && java.lang.Double.isFinite(h))
            Some(Zone("double", 0, 0, l, h, "", "", false, nulls)) else None
        }
      case "string" =>
        Some(Zone("string", 0, 0, 0, 0, new String(lo, "UTF-8"),
          new String(hi, "UTF-8"), false, nulls))
      case _ => None
    }
  }

  /** Every data file Spark's parquet listing would read (all non-hidden
    * files, NOT just `*.parquet` — an extension-less data file missing
    * from the index would make pruning silently lossy; review finding).
    * Non-parquet junk among them degrades to a zone-less always-kept
    * entry in [[readFileZones]]. */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                            root: Path): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    def sig(st: org.apache.hadoop.fs.FileStatus) =
      st.getLen.toString + ":" + st.getModificationTime
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) ()
      else if (st.isDirectory) walk(st.getPath)
      else out += (st.getPath.toString -> sig(st))
    }
    val st = fs.getFileStatus(root)
    if (st.isDirectory) walk(root) else out += (st.getPath.toString -> sig(st))
    out.result()
  }

  /** One footer -> zones for the wanted top-level columns. Row-group stats
    * merge per file; any row group with missing/unsupported stats marks the
    * column unindexed for the file (conservative). */
  private[sources] def readFileZones(conf: Configuration, path: String,
                                     wanted: Seq[String]): FileZones = {
    val rd = try ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    catch { case scala.util.control.NonFatal(_) =>
      // unreadable/non-parquet data file: keep it forever (no zones).
      // rows = -1 marks UNREADABLE, distinct from a genuinely row-less
      // footer — stats writers must not publish numRecords for it
      // (review finding)
      return FileZones(path, -1L, Map.empty)
    }
    try {
      val footer = rd.getFooter
      val blocks = footer.getBlocks
      val rows = { var r = 0L; blocks.forEach(b => r += b.getRowCount); r }
      val zones = mutable.Map[String, Zone]()
      wanted.foreach { w =>
        var zone: Option[Zone] = None
        var nulls = 0L
        var usable = true
        blocks.forEach { b =>
          b.getColumns.forEach { cc =>
            val pathParts = cc.getPath.toArray
            if (pathParts.length == 1 && pathParts(0).equalsIgnoreCase(w)) {
              val st = cc.getStatistics
              if (st == null || st.isEmpty || st.getNumNulls < 0) usable = false
              else {
                nulls += st.getNumNulls
                if (st.hasNonNullValue) {
                  zoneOf(cc.getPrimitiveType, st) match {
                    case Some(z) =>
                      zone = Some(zone.map(mergeZones(_, z)).getOrElse(z))
                    case None => usable = false
                  }
                }
              }
            }
          }
        }
        if (usable) {
          if (zone.isDefined) zones(w) = zone.get.copy(nulls = nulls)
          else if (rows > 0 && nulls == rows)
            zones(w) = Zone("long", 0, 0, 0, 0, "", "", allNull = true, nulls = nulls)
        }
      }
      FileZones(path, rows, zones.toMap)
    } finally rd.close()
  }

  private def mergeZones(a: Zone, b: Zone): Zone = a.copy(
    minL = math.min(a.minL, b.minL), maxL = math.max(a.maxL, b.maxL),
    minD = math.min(a.minD, b.minD), maxD = math.max(a.maxD, b.maxD),
    minS = if (a.minS <= b.minS) a.minS else b.minS,
    maxS = if (a.maxS >= b.maxS) a.maxS else b.maxS,
    allNull = false)

  /** NaN/Infinity stats can't bound an interval (and BigDecimal(d) would
    * throw at prune time) -> unsupported, conservative keep. */
  private def finiteZone(lo: Double, hi: Double): Option[Zone] =
    if (java.lang.Double.isFinite(lo) && java.lang.Double.isFinite(hi))
      Some(Zone("double", 0, 0, lo, hi, "", "", allNull = false))
    else None

  /** parquet physical+logical type -> zone domain; None = unsupported
    * (decimals, int96, nested — conservative keep). */
  private def zoneOf(pt: org.apache.parquet.schema.PrimitiveType,
                     st: org.apache.parquet.column.statistics.Statistics[_]): Option[Zone] = {
    val logical = pt.getLogicalTypeAnnotation
    // unsigned int annotations order differently than the signed stats
    val signedInt = logical == null || (logical match {
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
      case _ => false
    })
    def longZone(kind: String, lo: Long, hi: Long) =
      Some(Zone(kind, lo, hi, 0, 0, "", "", allNull = false))
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.INT32 if signedInt =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
        longZone("long", s.getMin.toLong, s.getMax.toLong)
      case PrimitiveTypeName.INT32
          if logical.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation] =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
        longZone("date", s.getMin.toLong, s.getMax.toLong)
      case PrimitiveTypeName.INT64 if signedInt =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        longZone("long", s.getMin, s.getMax)
      case PrimitiveTypeName.INT64
          if logical.isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation] =>
        val ts = logical.asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        ts.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MICROS => longZone("tsus", s.getMin, s.getMax)
          case LogicalTypeAnnotation.TimeUnit.MILLIS => longZone("tsms", s.getMin, s.getMax)
          // NANOS: under `legacy.parquet.nanosAsLong` Spark surfaces the
          // column as a plain long, so literals arrive as raw nanos
          case LogicalTypeAnnotation.TimeUnit.NANOS => longZone("long", s.getMin, s.getMax)
          case _ => None
        }
      case PrimitiveTypeName.FLOAT =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.FloatStatistics]
        finiteZone(s.getMin.toDouble, s.getMax.toDouble)
      case PrimitiveTypeName.DOUBLE =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.DoubleStatistics]
        finiteZone(s.getMin, s.getMax)
      case PrimitiveTypeName.BINARY
          if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        val s = st.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
        Some(Zone("string", 0, 0, 0, 0,
          s.genericGetMin.toStringUsingUTF8, s.genericGetMax.toStringUsingUTF8, false))
      case _ => None
    }
  }
}
