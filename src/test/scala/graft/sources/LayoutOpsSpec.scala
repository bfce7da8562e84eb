package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.{SharedSpark, Tables}

class LayoutOpsSpec extends AnyFunSuite {
  import SharedSpark._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_layout").toString

  private def leafFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("writePartitioned: hive dirs per lang, one file each, sorted inside") {
    val out = tmpDir() + "/docs"
    val docs = Tables(spark, sf, "documents")
    LayoutOps.writePartitioned(docs, out, "lang", "doc_id")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val d = new java.io.File(s"$out/lang=$l")
      assert(d.isDirectory, s"missing partition dir for $l")
      assert(leafFiles(d.toString).size == 1,
        s"expected one file per partition for $l")
    }
    // within-file order: doc_id non-decreasing in read order of one file
    val one = spark.read.parquet(s"$out/lang=${langs.head}")
      .select("doc_id").collect().map(_.getLong(0))
    assert(one.sameElements(one.sorted))
    // round trip: nothing lost or duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select(sum("doc_id")).collect()(0).getLong(0) ==
      docs.select(sum("doc_id")).collect()(0).getLong(0))
  }

  test("prunedScan resolves the partition predicate as PartitionFilters") {
    val out = tmpDir() + "/docs"
    val docs = Tables(spark, sf, "documents")
    LayoutOps.writePartitioned(docs, out, "lang", "doc_id")
    val scan = LayoutOps.prunedScan(spark, out, "lang", "en")
    val fsScans = scan.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(fsScans.nonEmpty)
    val s = fsScans.head
    assert(s.partitionFilters.nonEmpty,
      "lang predicate must prune partitions, not filter rows")
    assert(!s.dataFilters.exists(_.references.exists(_.name == "lang")),
      "lang must not appear as a data filter")
    // and the pruned read returns exactly the partition's rows
    assert(scan.count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("writeBucketed: co-bucketed tables join with zero exchanges") {
    val li = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    LayoutOps.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    LayoutOps.writeBucketed(
      ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 8)
    // one file per bucket: the repartition inside writeBucketed matched
    // write tasks to the bucket function
    val whLi = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("li_bucketed"))
      .location.getPath
    assert(leafFiles(whLi).size == 8,
      s"expected 8 bucket files, got ${leafFiles(whLi).size}")
    val save = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the join to plan as SMJ so any missing co-partitioning
      // would surface as an Exchange, not hide under a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
      assert(j.count() == li.count(), "bucketed join must equal plain join")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", save)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("versioned compaction: snapshot readers see old-or-new, never empty") {
    val out = tmpDir() + "/vdocs"
    val events = Tables(spark, sf, "events").select("event_id", "event_type")
    // v1: a high-parallelism write → many small files
    LayoutOps.writeVersioned(events.repartition(16), out)
    assert(LayoutOps.currentVersion(spark, out) == 1)
    val before = LayoutOps.readCurrent(spark, out)
      .agg(count(lit(1)), sum("event_id")).collect()(0)
    // an in-flight reader resolves v1 BEFORE the compaction commits
    val inFlight = spark.read.parquet(s"$out/v1")
    val n = events.count()
    LayoutOps.compactCurrent(spark, out, "event_id", targetRows = n / 2 + 1)
    // the pointer now names the compacted v2 — same rows, fewer files
    assert(LayoutOps.currentVersion(spark, out) == 2)
    assert(LayoutOps.readCurrent(spark, out)
      .agg(count(lit(1)), sum("event_id")).collect()(0) == before)
    assert(leafFiles(s"$out/v2").size == 2)
    // the in-flight reader's snapshot is UNTOUCHED by the commit: every
    // row still readable — old-or-new, never empty, never partial
    assert(inFlight.agg(count(lit(1)), sum("event_id")).collect()(0) == before)
    // a second compactor is excluded while the lock is held
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    fs.createNewFile(new org.apache.hadoop.fs.Path(s"$out/_compact.lock"))
    intercept[IllegalStateException] {
      LayoutOps.compactCurrent(spark, out, "event_id", targetRows = n)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_compact.lock"), false)
    // vacuum drops only superseded versions; the current one survives
    LayoutOps.vacuum(spark, out)
    assert(!new java.io.File(s"$out/v1").exists())
    assert(LayoutOps.readCurrent(spark, out).count() == n)
  }

  test("compact: bin-packs many small files into range-disjoint big ones") {
    val out = tmpDir() + "/events"
    val events = Tables(spark, sf, "events").select("event_id", "event_type")
    // simulate a high-parallelism write: many small files
    events.repartition(16).write.mode("overwrite").parquet(out)
    assert(leafFiles(out).size == 16)
    val before = spark.read.parquet(out).agg(
      count(lit(1)), sum("event_id")).collect()(0)
    val n = events.count()
    LayoutOps.compact(spark, out, "event_id", targetRows = n / 2 + 1)
    val files = leafFiles(out)
    assert(files.size == 2, s"expected 2 compacted files, got ${files.size}")
    val after = spark.read.parquet(out).agg(
      count(lit(1)), sum("event_id")).collect()(0)
    assert(before == after, "compaction must preserve rows exactly")
    // range-disjoint: per-file event_id ranges don't overlap
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("event_id"), max("event_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }

  test("analyzeTable: row count and column NDV/min/max land in the catalog") {
    import org.apache.spark.sql.catalyst.TableIdentifier
    spark.range(1000)
      .selectExpr("id AS k", "CAST(id % 7 AS LONG) AS grp")
      .write.mode("overwrite").format("parquet").saveAsTable("stats_t")
    LayoutOps.analyzeTable(spark, "stats_t", Seq("k", "grp"))
    val stats = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("stats_t")).stats
      .getOrElse(fail("no stats recorded"))
    assert(stats.rowCount.contains(BigInt(1000)), s"rowCount ${stats.rowCount}")
    val grp = stats.colStats.getOrElse("grp", fail("no grp column stats"))
    assert(grp.distinctCount.exists(_.toInt == 7), s"grp ndv ${grp.distinctCount}")
    assert(grp.min.exists(_.toString == "0") && grp.max.exists(_.toString == "6"),
      s"grp min/max ${grp.min}/${grp.max}")
    assert(stats.sizeInBytes > 0)
  }

  test("analyzeTable stats flip the initial (pre-AQE) join build side under CBO") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hash-valued columns so parquet cannot compress the files below the
    // broadcast threshold — the no-stats fallback estimate is FILE size
    spark.range(500000).select($"id", hash($"id").as("pad"))
      .write.mode("overwrite").format("parquet").saveAsTable("cbo_big")
    spark.range(100000)
      .select($"id", pmod(hash($"id"), lit(1000)).as("k"), hash($"id" + 1).as("pad"))
      .write.mode("overwrite").format("parquet").saveAsTable("cbo_dim")
    def initialPlan: String = spark.table("cbo_big")
      .join(spark.table("cbo_dim").filter($"k" === 7), "id")
      .queryExecution.executedPlan.toString
    val saveCbo = spark.conf.get("spark.sql.cbo.enabled")
    val saveTh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "50000")
      // without stats the filter cannot shrink the dim's size estimate
      // (size-only propagation keeps the child's file size): sort-merge
      val before = initialPlan
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"expected SMJ before stats:\n$before")
      // ANALYZE gives rowCount + ndv(k): the k = 7 filter estimates
      // ~100000/1000 rows, far under the threshold — the initial plan
      // (not an AQE runtime rescue) now builds a broadcast on the dim
      LayoutOps.analyzeTable(spark, "cbo_dim", Seq("id", "k"))
      LayoutOps.analyzeTable(spark, "cbo_big", Seq("id"))
      val after = initialPlan
      assert(after.contains("BroadcastHashJoin"),
        s"stats did not flip the initial build side:\n$after")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", saveCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saveTh)
    }
  }

  test("manifest: narrow range reads only overlapping files, result matches full scan") {
    import spark.implicits._
    val dir = tmpDir() + "/data"
    val mdir = tmpDir() + "/manifest"
    // range-disjoint layout: 16 files, each covering ~1/16th of the key
    spark.range(16000).select(col("id").as("k"), (col("id") * 7).as("v"))
      .repartitionByRange(16, col("k"))
      .sortWithinPartitions(col("k"))
      .write.parquet(dir)
    LayoutOps.writeManifest(spark, dir, mdir, "k")

    val m = spark.read.parquet(mdir)
    assert(m.count() == leafFiles(dir).size.toLong,
      "manifest must carry one row per data file")
    assert(m.agg(sum("n_rows")).head().getLong(0) == 16000L)

    // a 1.5-file-wide range: the pruned scan's input files must be a
    // strict subset, and the rows must match the brute-force filter
    val pruned = LayoutOps.manifestPrunedRead(spark, dir, mdir, "k", 1000, 2500)
    val nInput = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.relation.location.inputFiles.length
    }.sum
    assert(nInput <= 3 && nInput < leafFiles(dir).size,
      s"expected <=3 input files for a 1.5-file range, got $nInput")
    val expect = spark.read.parquet(dir)
      .filter(col("k") >= 1000 && col("k") <= 2500)
    assert(pruned.count() == expect.count())
    assert(pruned.agg(sum("v")).head().getLong(0) ==
      expect.agg(sum("v")).head().getLong(0))

    // a range outside the data: zero files, empty frame, schema intact
    val none = LayoutOps.manifestPrunedRead(spark, dir, mdir, "k", 90000, 99000)
    assert(none.count() == 0L && none.columns.sameElements(Array("k", "v")))
  }

  test("writeZOrdered: box predicates prune files on BOTH dims; linear sort only on one") {
    import spark.implicits._
    // 40k-point uniform grid in (x, y)
    val grid = spark.range(40000).select(
      (col("id") % 200).as("x"), (col("id") / 200).cast("long").as("y"),
      col("id").as("payload"))
    val zdir = tmpDir() + "/z"
    val ldir = tmpDir() + "/linear"
    LayoutOps.writeZOrdered(grid, zdir, "x", "y", nFiles = 16)
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")).write.parquet(ldir)

    // round trip exact
    val back = spark.read.parquet(zdir)
    assert(back.count() == 40000L)
    assert(back.agg(sum("payload")).head().getLong(0) ==
      grid.agg(sum("payload")).head().getLong(0))

    // candidate files for a box query = files whose per-file min/max
    // bounding box intersects it (what parquet stats pruning consults)
    def candidates(dir: String, xLo: Long, xHi: Long,
                   yLo: Long, yHi: Long): Int =
      leafFiles(dir).count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        r.getLong(1) >= xLo && r.getLong(0) <= xHi &&
          r.getLong(3) >= yLo && r.getLong(2) <= yHi
      }

    // y-range predicate: the x-sorted layout cannot prune at all (every
    // file spans y's full range); z-order confines it to a curve strip
    val zY = candidates(zdir, 0, 199, 0, 24)
    val lY = candidates(ldir, 0, 199, 0, 24)
    assert(lY == 16, s"x-sorted layout unexpectedly pruned on y ($lY)")
    assert(zY <= 8, s"z-order failed to prune on y: $zY of 16 files")
    // x-range predicate: linear is perfect here, z-order must still
    // prune meaningfully (the curve trades a little x-locality for y)
    val zX = candidates(zdir, 0, 24, 0, 199)
    assert(zX <= 8, s"z-order failed to prune on x: $zX of 16 files")
    // box on both: the quarter-quarter box covers 1/16 of the curve;
    // files whose z-run straddles the box boundary pad that a little
    val zBox = candidates(zdir, 0, 49, 0, 49)
    assert(zBox <= 6, s"z-order box query touched $zBox of 16 files")
  }

  test("state write survives a stale warehouse directory with no catalog entry") {
    import spark.implicits._
    // the cross-process failure mode: the table's directory exists in the
    // warehouse (a previous JVM wrote it) but this session's metastore
    // has never heard of it — saveAsTable used to die with
    // LOCATION_ALREADY_EXISTS instead of claiming the leftovers
    val tbl = "graft_state_stale_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc, "stale-leftover"))
    assert(!spark.catalog.tableExists(tbl) && fs.exists(loc))
    val df = (1L to 100L).toDF("k").withColumn("v", col("k") * 2)
    LayoutOps.writeBucketed(df, tbl, "k", 4)
    assert(spark.table(tbl).count() == 100)
    spark.sql(s"DROP TABLE $tbl")
  }

  test("non-state sink directory is ADOPTED, not wiped: prior appends survive") {
    import spark.implicits._
    // a caller-named append sink is accumulated output, not rebuildable
    // state — a fresh JVM must re-register the existing location so
    // appends continue, never delete it
    val tbl = "adopt_sink_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    (1L to 50L).toDF("k").write.parquet(loc.toString)
    assert(!spark.catalog.tableExists(tbl) && fs.exists(loc))
    LayoutOps.clearStaleLocation(spark, tbl)
    assert(spark.catalog.tableExists(tbl),
      "existing sink output must be registered, not deleted")
    assert(spark.table(tbl).count() == 50, "prior rows must survive")
    (51L to 60L).toDF("k").write.mode("append").format("parquet").saveAsTable(tbl)
    assert(spark.table(tbl).count() == 60, "appends must keep accumulating")
    spark.sql(s"DROP TABLE $tbl")
    fs.delete(loc, true)
  }

  test("empty non-state leftover directory is still cleared (nothing to adopt)") {
    val tbl = "adopt_empty_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    LayoutOps.clearStaleLocation(spark, tbl)
    assert(!fs.exists(loc), "schema-less empty dir should be cleared")
    assert(!spark.catalog.tableExists(tbl))
  }

  test("snapshot diff: change feed reports exactly the planted changes") {
    import spark.implicits._
    val out = tmpDir() + "/diffdocs"
    val v1 = (1L to 10L).map(i => (i, s"val$i", i * 100L))
      .toDF("id", "name", "score")
    LayoutOps.writeVersioned(v1, out)
    // v2: update id 3, delete id 5, insert id 11; everything else as-is
    val v2 = v1.filter($"id" =!= 5L)
      .withColumn("score", when($"id" === 3L, lit(999L)).otherwise($"score"))
      .unionByName(Seq((11L, "val11", 1100L)).toDF("id", "name", "score"))
    LayoutOps.writeVersioned(v2, out)
    assert(LayoutOps.currentVersion(spark, out) == 2)
    val diff = LayoutOps.snapshotDiff(spark, out, 1, 2, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(diff == Seq(3L -> "update", 5L -> "delete", 11L -> "insert"),
      s"unexpected change feed: $diff")
    // unchanged rows never appear — the feed is exactly the delta
    assert(diff.size == 3)
    // column order must not affect the row signature: a reordered-but-
    // equal v3 diffs empty against v2
    LayoutOps.writeVersioned(v2.select($"score", $"id", $"name"), out)
    assert(LayoutOps.snapshotDiff(spark, out, 2, 3, "id").count() == 0)
  }

  test("stateBuckets: a malformed graft.state.buckets names the conf " +
      "instead of surfacing a bare NumberFormatException (r15 ADVICE)") {
    val key = "graft.state.buckets"
    try {
      for (bad <- Seq("banana", "0", "-4", "2.5")) {
        spark.conf.set(key, bad)
        val e = intercept[IllegalArgumentException] {
          LayoutOps.stateBuckets(spark)
        }
        assert(e.getMessage.contains(key), s"'$bad' error hides the conf")
      }
      spark.conf.set(key, "16")
      assert(LayoutOps.stateBuckets(spark) == 16)
    } finally spark.conf.unset(key)
    // default: session shuffle parallelism
    assert(LayoutOps.stateBuckets(spark) ==
      spark.sessionState.conf.numShufflePartitions)
  }
}
