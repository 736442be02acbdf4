package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Zone-map column index (reference roadmap box README.md:296): footer-stats
  * harvesting, conservative interval pruning across the long/double/string/
  * date domains, null handling, and the Engine's REST integration. */
class ColumnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.get()
  private var dir: String = _
  private var idx: ColumnIndex.Index = _

  override def beforeAll(): Unit = {
    dir = Files.createTempDirectory("colindex").toString + "/t"
    val df = spark.range(0, 2000).toDF("k")
      .withColumn("d", col("k") * 0.5)
      .withColumn("s", format_string("s%04d", col("k")))
      .withColumn("dt", expr("date_add(date'2020-01-01', cast(k / 10 as int))"))
      .withColumn("half_null", when(col("k") % 2 === 0, col("k")))
      .withColumn("all_null", lit(null).cast(StringType))
    // contiguous k ranges per file => tight zones on every correlated column
    df.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.parquet(dir)
    idx = ColumnIndex.build(spark, dir,
      Seq("k", "d", "s", "dt", "half_null", "all_null"))
  }

  private def fullScan = spark.read.parquet(dir)

  test("builds one zone row per file with footer stats") {
    assert(idx.fileCount == 8)
    assert(idx.files.map(_.rows).sum == 2000)
    val zs = idx.files.flatMap(_.zones.get("k"))
    assert(zs.size == 8)
    assert(zs.map(_.minL).min == 0 && zs.map(_.maxL).max == 1999)
    // files cover disjoint contiguous ranges (repartitionByRange)
    val sorted = zs.sortBy(_.minL)
    sorted.sliding(2).foreach { case Seq(a, b) => assert(a.maxL < b.minL); case _ => () }
  }

  test("eq on a long column keeps exactly the covering file") {
    val kept = idx.prune(Seq(("k", "eq", "500"))).get
    assert(kept.size == 1)
    val viaIndex = spark.read.schema(fullScan.schema).parquet(kept: _*)
      .filter(col("k") === 500)
    assert(viaIndex.count() == 1)
    assert(idx.lastPrune.contains((1, 8)))
  }

  test("range predicates prune to the overlapping interval") {
    val kept = idx.prune(Seq(("k", "gte", "400"), ("k", "lt", "700"))).get
    assert(kept.size < 8 && kept.nonEmpty)
    val pruned = spark.read.schema(fullScan.schema).parquet(kept: _*)
      .filter(col("k") >= 400 && col("k") < 700).count()
    assert(pruned == fullScan.filter(col("k") >= 400 && col("k") < 700).count())
  }

  test("out-of-domain predicates prune everything; empty DF keeps schema") {
    assert(idx.prune(Seq(("k", "lt", "0"))).get.isEmpty)
    assert(idx.prune(Seq(("k", "gt", "99999"))).get.isEmpty)
    val empty = idx.prunedDf(spark, Seq(("k", "lt", "0")), fullScan.schema).get
    assert(empty.count() == 0 && empty.schema == fullScan.schema)
  }

  test("double, string, and date domains all prune") {
    assert(idx.prune(Seq(("d", "eq", "250.0"))).get.size == 1)
    assert(idx.prune(Seq(("s", "eq", "'s1500'"))).get.size == 1)
    assert(idx.prune(Seq(("s", "eq", "s1500"))).get.size == 1) // bare string
    val dk = idx.prune(Seq(("dt", "gte", "'2020-06-01'"))).get
    assert(dk.size < 8 && dk.nonEmpty)
    val viaIdx = spark.read.schema(fullScan.schema).parquet(dk: _*)
      .filter(col("dt") >= "2020-06-01").count()
    assert(viaIdx == fullScan.filter(col("dt") >= "2020-06-01").count())
  }

  test("all-null columns prove non-match; mixed nulls stay conservative") {
    assert(idx.prune(Seq(("all_null", "eq", "'x'"))).get.isEmpty)
    // half_null files still carry real min/max over the non-null half
    val kept = idx.prune(Seq(("half_null", "eq", "500"))).get
    assert(kept.size == 1)
  }

  test("bare numeric-looking values never prune string zones") {
    // REST compares filter[s]=1500 as a string, GraphQL/SQL coerce it
    // numerically — the index cannot know which, so it must keep all
    assert(idx.prune(Seq(("s", "eq", "1500"))).get.size == 8)
    assert(idx.prune(Seq(("s", "lt", "42"))).get.size == 8)
    // quoted stays prunable
    assert(idx.prune(Seq(("s", "eq", "'1500'"))).get.isEmpty) // no s#### matches
  }

  test("fractional literals on integer zones compare in the rounded domain") {
    val d4 = Files.createTempDirectory("colindex4").toString + "/t"
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(9007199254740993L)),
      StructType(Seq(StructField("k", LongType)))).coalesce(1).write.parquet(d4)
    val i4 = ColumnIndex.build(spark, d4, Seq("k"))
    // (double)(2^53+1) == 2^53, so an eq against 2^53-as-double must KEEP
    // the file (exact integer compare would wrongly prove disjointness)
    assert(i4.prune(Seq(("k", "eq", "9.007199254740992E15"))).get.size == 1)
    // exact integral literals still compare exactly
    assert(i4.prune(Seq(("k", "eq", "9007199254740992"))).get.isEmpty)
    assert(i4.prune(Seq(("k", "eq", "9007199254740993"))).get.size == 1)
  }

  test("pruneAmong keeps files the index has never seen") {
    val known = idx.files.head.path
    val unknown = "file:/nowhere/unknown.parquet"
    val kept = idx.pruneAmong(Seq(known, unknown), Seq(("k", "gt", "99999"))).get
    assert(kept == Seq(unknown))
    assert(idx.lastPrune.contains((1, 2)))
  }

  test("registry entries are owner-counted per dir") {
    val eng = new graft.server.Engine(spark, readOnly = true)
    def owners = ColumnIndexRegistry.snapshot.collect {
      case (d, o) if d.endsWith(dir) => o }.flatten.toSet
    try {
      eng.registerTable(TableSource("zta", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k", "use_memory_table" -> "false")))
      eng.registerTable(TableSource("ztb", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k", "use_memory_table" -> "false")))
      // a NON-indexed table over the same dir must not strip the entry
      eng.registerTable(TableSource("ztc", dir, format = Some("parquet"),
        options = Map("use_memory_table" -> "false")))
      assert(owners == Set("zta", "ztb"))
      eng.dropTable("zta")
      assert(owners == Set("ztb")) // survives while an owner remains
      eng.dropTable("ztc")
      assert(owners == Set("ztb"))
      eng.dropTable("ztb")
      assert(owners.isEmpty)
    } finally Seq("zta", "ztb", "ztc").foreach(eng.dropTable)
  }

  test("unindexed columns, unsupported ops, and type surprises keep files") {
    assert(idx.prune(Seq(("nope", "eq", "1"))).isEmpty) // nothing usable
    // quoted string literal against a numeric zone: no pruning evidence
    assert(idx.prune(Seq(("k", "eq", "'abc'"))).get.size == 8)
    // conjunction with one unusable predicate still prunes on the usable one
    assert(idx.prune(Seq(("k", "eq", "500"), ("nope", "eq", "1"))).get.size == 1)
  }

  test("extension-less data files are indexed (zone-less) and never pruned away") {
    val d2 = Files.createTempDirectory("colindex2").toString + "/t"
    spark.range(0, 100).toDF("k").coalesce(1).write.parquet(d2)
    // rename the part file so it loses its .parquet suffix — Spark's dir
    // listing still reads it, so the index must still account for it
    val part = new java.io.File(d2).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val bare = new java.io.File(part.getParent, "datafile")
    assert(part.renameTo(bare))
    new java.io.File(part.getParent, "." + part.getName + ".crc").delete()
    spark.range(100, 200).toDF("k").coalesce(1).write.mode("append").parquet(d2)
    val i2 = ColumnIndex.build(spark, d2, Seq("k"))
    assert(i2.fileCount == 2)
    // the renamed file still parses as parquet, so it kept real zones:
    // k<50 keeps exactly it and drops the [100,200) file
    val kept = i2.prune(Seq(("k", "lt", "50"))).get
    assert(kept.size == 1 && kept.head.endsWith("/datafile"))
    // genuinely unreadable data files degrade to zone-less always-kept
    val junk = new java.io.File(part.getParent, "notparquet")
    Files.write(junk.toPath, "junk".getBytes("UTF-8"))
    val fz = ColumnIndex.readFileZones(
      spark.sparkContext.hadoopConfiguration, junk.toString, Seq("k"))
    assert(fz.zones.isEmpty)
    assert(junk.delete())
  }

  test("incremental rebuild harvests only new files and reuses the rest") {
    val d3 = Files.createTempDirectory("colindex3").toString + "/t"
    spark.range(0, 100).toDF("k").coalesce(1).write.parquet(d3)
    val first = ColumnIndex.build(spark, d3, Seq("k"))
    assert(first.fileCount == 1 && first.reusedFiles == 0)
    spark.range(100, 200).toDF("k").coalesce(1).write.mode("append").parquet(d3)
    val second = ColumnIndex.build(spark, d3, Seq("k"), prev = Some(first))
    assert(second.fileCount == 2 && second.reusedFiles == 1)
    // the reused zone + fresh zone both prune correctly
    assert(second.prune(Seq(("k", "lt", "50"))).get.size == 1)
    assert(second.prune(Seq(("k", "gte", "150"))).get.size == 1)
    // a different column list disables reuse
    val third = ColumnIndex.build(spark, d3, Seq("k", "nope"), prev = Some(second))
    assert(third.reusedFiles == 0 && third.fileCount == 2)
  }

  test("index_persist writes a sidecar and a restart reloads it") {
    val d5 = Files.createTempDirectory("colindex5").toString + "/t"
    spark.range(0, 500).toDF("k").repartitionByRange(4, col("k"))
      .write.parquet(d5)
    val src = TableSource("ztp", d5, format = Some("parquet"),
      options = Map("index_columns" -> "k", "index_persist" -> "true",
        "use_memory_table" -> "false"))
    def sidecars = new java.io.File(d5).listFiles()
      .filter(_.getName.startsWith("_graft_colindex")).toSeq
    val eng1 = new graft.server.Engine(spark, readOnly = true)
    try {
      // enabling persist on an ALREADY-registered table must still write
      // the sidecar (the memory index is fresh but disk has nothing)
      eng1.registerTable(TableSource("ztp", d5, format = Some("parquet"),
        options = Map("index_columns" -> "k", "use_memory_table" -> "false")))
      assert(sidecars.isEmpty)
      eng1.registerTable(src)
      assert(eng1.columnIndex("ztp").exists(_.reusedFiles == 4)) // from memory
      assert(sidecars.size == 1)
    } finally eng1.dropTable("ztp")
    // a fresh engine (= restart) reuses every zone from the sidecar
    val eng2 = new graft.server.Engine(spark, readOnly = true)
    try {
      eng2.registerTable(src)
      val idx = eng2.columnIndex("ztp").get
      assert(idx.reusedFiles == idx.fileCount && idx.fileCount == 4)
      assert(idx.prune(Seq(("k", "lt", "10"))).get.size == 1)
      // the sidecar itself never shows up as a data file
      assert(idx.files.forall(!_.path.contains("_graft_colindex")))
    } finally eng2.dropTable("ztp")
  }

  test("re-registering without index_columns drops the stale index") {
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("zt2", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k", "use_memory_table" -> "false")))
      assert(eng.columnIndex("zt2").isDefined)
      eng.registerTable(TableSource("zt2", dir, format = Some("parquet"),
        options = Map("use_memory_table" -> "false")))
      assert(eng.columnIndex("zt2").isEmpty)
      // pinned-local tables skip the footer job entirely
      eng.registerTable(TableSource("zt3", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k")))
      assert(eng.columnIndex("zt3").isEmpty) // 2000 rows -> pinned local
    } finally { eng.dropTable("zt2"); eng.dropTable("zt3") }
  }

  test("engine serves filtered REST queries through the index") {
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("zt", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k;s", "use_memory_table" -> "false")))
      val viaRest = eng.queryRest("zt",
        Map("filter[k]gte" -> "100", "filter[k]lt" -> "110", "sort" -> "k"))
      assert(viaRest.collect().map(_.getAs[Long]("k")).toSeq == (100L until 110L))
      val p = eng.columnIndex("zt").get.lastPrune
      assert(p.exists { case (kept, total) => total == 8 && kept < 8 })
      // SQL prunes through the IndexPruneRule optimizer rule: the scan's
      // root paths become the surviving files
      val sdf = eng.querySql("SELECT count(*) AS n FROM zt WHERE k >= 400 AND k < 700")
      assert(sdf.collect().head.getLong(0) == 300)
      val rel = sdf.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }.get
      val loc = rel.relation
        .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location
      // the rewrite replaces the DIR root with the surviving FILES
      assert(loc.rootPaths.nonEmpty && loc.rootPaths.size < 8 &&
        loc.rootPaths.forall(_.getName.endsWith(".parquet")))
      // a provably-empty filter folds the scan away entirely (no relation)
      val none = eng.querySql("SELECT k FROM zt WHERE k < 0")
      assert(none.count() == 0)
      assert(none.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }.isEmpty)
      // unindexed-column SQL predicates leave the full scan untouched
      val full = eng.querySql("SELECT count(*) AS n FROM zt WHERE d = 250.0")
      assert(full.collect().head.getLong(0) == 1)
      // IN lists prune as a disjunction of equalities
      def prunedRoots(sql: String): Seq[org.apache.hadoop.fs.Path] =
        eng.querySql(sql).queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths
        }.getOrElse(Seq.empty)
      val inq = eng.querySql("SELECT k FROM zt WHERE k IN (100, 1500)")
      assert(inq.collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 1500L))
      val inRoots = prunedRoots("SELECT k FROM zt WHERE k IN (100, 1500)")
      assert(inRoots.size == 2 && inRoots.forall(_.getName.endsWith(".parquet")))
      // past optimizer.inSetConversionThreshold (10) Catalyst swaps In for
      // InSet whose elements are INTERNAL values — the encoder must read
      // them the same way (15 longs spanning the same 2 files)
      val bigList = ((100 to 109) ++ (1500 to 1504)).mkString(", ")
      val insetQ = s"SELECT k FROM zt WHERE k IN ($bigList)"
      assert(eng.querySql(insetQ).count() == 15)
      val insetRoots = prunedRoots(insetQ)
      assert(insetRoots.size == 2 && insetRoots.forall(_.getName.endsWith(".parquet")))
      val insetStrQ = "SELECT s FROM zt WHERE s IN (" +
        ((100 to 109) ++ (1500 to 1504)).map(i => f"'s$i%04d'").mkString(", ") + ")"
      assert(eng.querySql(insetStrQ).count() == 15) // the RIGHT 2 files survive
      val insetStr = prunedRoots(insetStrQ)
      assert(insetStr.size == 2 && insetStr.forall(_.getName.endsWith(".parquet")))
      // LIKE prefixes prune to the [prefix, prefix+1) range
      val likeq = eng.querySql("SELECT s FROM zt WHERE s LIKE 's03%' ORDER BY s")
      assert(likeq.count() == 100)
      val likeRoots = prunedRoots("SELECT s FROM zt WHERE s LIKE 's03%'")
      assert(likeRoots.size == 1 && likeRoots.head.getName.endsWith(".parquet"))
      // non-prefix LIKE contributes nothing (full dir scan remains)
      val anyRoots = prunedRoots("SELECT s FROM zt WHERE s LIKE '%03'")
      assert(anyRoots.size == 1 && !anyRoots.head.getName.endsWith(".parquet"))
      // unfiltered and unindexed-column queries bypass the index untouched
      assert(eng.queryRest("zt", Map("limit" -> "5")).count() == 5)
      assert(eng.queryRest("zt", Map("filter[d]eq" -> "250.0")).count() == 1)
      // GraphQL rides the same pruning (string filter re-quotes internally)
      val viaGql = eng.queryGraphQl(
        """{ zt(filter: {s: {gte: "s0100", lt: "s0110"}}, sort: [{field: "s"}]) { k s } }""")
      assert(viaGql.collect().map(_.getAs[String]("s")).toSeq ==
        (100 until 110).map(i => f"s$i%04d"))
      assert(eng.columnIndex("zt").get.lastPrune.exists {
        case (kept, total) => total == 8 && kept < 8 })
    } finally eng.dropTable("zt")
  }

  test("top-level OR predicates prune to the union of disjunct survivors") {
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("zor", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k;s", "use_memory_table" -> "false")))
      def roots(sql: String): Seq[org.apache.hadoop.fs.Path] =
        eng.querySql(sql).queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths
        }.getOrElse(Seq.empty)
      // (range) OR (eq): the union covers exactly two of the eight files
      val orQ = "SELECT k FROM zor WHERE (k >= 100 AND k < 110) OR k = 1500"
      assert(eng.querySql(orQ).collect().map(_.getLong(0)).sorted.toSeq ==
        ((100L until 110L) :+ 1500L))
      val r1 = roots(orQ)
      assert(r1.size == 2 && r1.forall(_.getName.endsWith(".parquet")),
        r1.mkString(","))
      // a disjunct WITHOUT index evidence disables the whole OR — pruning
      // on the seen disjunct alone would drop rows the unseen one matches
      val r2 = roots("SELECT k FROM zor WHERE k < 50 OR k % 7 = 0")
      assert(r2.size == 1 && !r2.head.getName.endsWith(".parquet"),
        r2.mkString(","))
      // an OR intersects with sibling conjuncts: the LIKE pins k to
      // 300..399, disjoint from both disjuncts -> provably empty, scan
      // folds away entirely
      val none = eng.querySql(
        "SELECT k FROM zor WHERE s LIKE 's03%' AND (k < 10 OR k > 1990)")
      assert(none.count() == 0)
      assert(none.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }.isEmpty)
      // cross-column OR: long range union string range
      val q3 = "SELECT k FROM zor WHERE (k < 10) OR (s >= 's1990' AND s < 's1995')"
      assert(eng.querySql(q3).count() == 15)
      val r3 = roots(q3)
      assert(r3.size == 2 && r3.forall(_.getName.endsWith(".parquet")),
        r3.mkString(","))
    } finally eng.dropTable("zor")
  }

  test("SQL date predicates prune through the rule (raw() epoch-day decode)") {
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("zdt", dir, format = Some("parquet"),
        options = Map("index_columns" -> "dt", "use_memory_table" -> "false")))
      def roots(sql: String) =
        eng.querySql(sql).queryExecution.optimizedPlan.collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.rootPaths
        }.getOrElse(Seq.empty)
      // Catalyst's Literal(date) carries an epoch-day Int — raw() must
      // decode it back to the surface form the zones compare
      val q = "SELECT count(*) AS n FROM zdt WHERE dt = DATE '2020-03-01'"
      assert(eng.querySql(q).collect().head.getLong(0) == 10) // k 600..609
      val r = roots(q)
      assert(r.size == 1 && r.head.getName.endsWith(".parquet"))
      // date IN lists ride the same decode through the shared encoder
      val rin = roots("SELECT count(*) AS n FROM zdt " +
        "WHERE dt IN (DATE '2020-01-02', DATE '2020-06-15')")
      assert(rin.size == 2 && rin.forall(_.getName.endsWith(".parquet")))
    } finally eng.dropTable("zdt")
  }

  test("the shared inTriple encoder refuses empty and separator-bearing elements") {
    val sep = ColumnIndex.InSep
    assert(ColumnIndex.inTriple("c", Seq("a", "b")) ==
      Seq(("c", ColumnIndex.InOp, s"a${sep}b")))
    assert(ColumnIndex.inTriple("c", Seq.empty).isEmpty)
    assert(ColumnIndex.inTriple("c", Seq("a", "")).isEmpty)  // trailing-empty decode loss
    assert(ColumnIndex.inTriple("c", Seq("")).isEmpty)
    assert(ColumnIndex.inTriple("c", Seq(s"a${sep}b")).isEmpty)
  }

  test("REST and GraphQL `in` filters prune through the index") {
    val eng = new graft.server.Engine(spark, readOnly = true)
    try {
      eng.registerTable(TableSource("zin", dir, format = Some("parquet"),
        options = Map("index_columns" -> "k;s", "use_memory_table" -> "false")))
      val viaRest = eng.queryRest("zin",
        Map("filter[k]in" -> "100,1500", "sort" -> "k"))
      assert(viaRest.collect().map(_.getAs[Long]("k")).toSeq == Seq(100L, 1500L))
      assert(eng.columnIndex("zin").get.lastPrune.contains((2, 8)))
      val viaGql = eng.queryGraphQl(
        """{ zin(filter: {s: {in: ["s0100", "s1500"]}}, sort: [{field: "k"}]) { k } }""")
      assert(viaGql.collect().map(_.getAs[Long]("k")).toSeq == Seq(100L, 1500L))
      assert(eng.columnIndex("zin").get.lastPrune.contains((2, 8)))
      // bare non-numeric string elements prune too (the ambiguity rule
      // only blocks numeric-looking bare values, per element)
      val bare = eng.queryRest("zin", Map("filter[s]in" -> "s0100,s1500", "sort" -> "k"))
      assert(bare.collect().map(_.getAs[Long]("k")).toSeq == Seq(100L, 1500L))
      assert(eng.columnIndex("zin").get.lastPrune.contains((2, 8)))
      // a numeric-looking bare element is ambiguous at the REST surface,
      // so the ENGINE-side prune keeps all files — but the fallback plan's
      // Catalyst IN literals are typed strings, so the optimizer-side
      // IndexPruneRule still prunes precisely (to s0100's file alone)
      val mixed = eng.queryRest("zin", Map("filter[s]in" -> "s0100,1500"))
      assert(mixed.count() == 1) // the string "1500" matches no s value
      assert(eng.columnIndex("zin").get.lastPrune.contains((1, 8)))
      // REST prefix LIKE prunes as the [prefix, prefix+1) range
      val likeRest = eng.queryRest("zin", Map("filter[s]like" -> "s030%", "sort" -> "k"))
      assert(likeRest.count() == 10)
      assert(eng.columnIndex("zin").get.lastPrune.contains((1, 8)))
    } finally eng.dropTable("zin")
  }
}
