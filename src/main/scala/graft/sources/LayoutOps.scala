package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management: how a 100 TB corpus is physically arranged
  * so downstream queries prune instead of scan.
  *
  * The reference copies rows into a target database and leaves layout to
  * it (SURVEY.md §2.1 #13); on a data lake the engine itself owns layout.
  * Three primitives cover the common lifecycle:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning on a
  *    low-cardinality column + in-file ordering on a high-cardinality
  *    one. Directory partitioning turns `WHERE lang = 'en'` into
  *    partition PRUNING (the non-matching directories are never listed,
  *    visible as `PartitionFilters` in the scan); the within-file sort
  *    tightens parquet row-group min/max stats so range predicates on
  *    the sort column skip row groups inside the files that survive.
  *  - [[compact]]: bin-pack a directory written by many small tasks into
  *    ~`targetRows`-sized files. Small files are the classic lake
  *    pathology (every file costs a driver listing + task schedule +
  *    footer read); compaction after high-parallelism writes keeps file
  *    count proportional to data volume, not to historical task count.
  *  - [[prunedScan]]: the read side — a reader over the partitioned
  *    layout with the partition predicate applied, for plan inspection
  *    and use as a source.
  *
  * `repartition(cols)` before the partitioned write sends each hive
  * partition's rows to ONE task (otherwise every task writes a file into
  * every partition directory: tasks × partitions small files);
  * `sortWithinPartitions` then orders rows inside each file. This is the
  * standard write-side shuffle trade: one exchange at write time buys
  * pruning on every subsequent read.
  */
object LayoutOps {

  /** Write `df` hive-partitioned by `partCol`, one file per partition,
    * rows ordered by `sortCol` inside each file. */
  def writePartitioned(df: DataFrame, path: String,
                       partCol: String, sortCol: String): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write
      .mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)

  /** Rewrite a parquet directory into ceil(count/targetRows) files,
    * preserving rows exactly. `repartitionByRange` on `orderCol` keeps
    * the new files range-disjoint (so min/max stats stay tight) instead
    * of round-robin shuffling rows across files.
    *
    * IN-PLACE swap: the rewrite is count-validated before it replaces
    * the original, and the swap is two renames (original → backup,
    * rewrite → original) rather than delete-then-rename — but a reader
    * listing the directory BETWEEN the renames can still miss it. This
    * is single-writer, no-concurrent-reader MAINTENANCE semantics; a
    * shared path must use the snapshot-versioned primitives below
    * ([[writeVersioned]]/[[compactCurrent]]), whose pointer swap is
    * atomic for readers. */
  def compact(spark: SparkSession, path: String, orderCol: String,
              targetRows: Long): Unit = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartitionByRange(files, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .write.mode("overwrite").parquet(tmp)
    // a partial rewrite must never replace good data
    val m = spark.read.parquet(tmp).count()
    require(m == n, s"compact: rewrite holds $m of $n rows — aborting swap")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_old")
    fs.delete(bak, true)
    // Hadoop rename signals failure by returning false, not throwing: a
    // silent failure here would let the final backup delete remove the
    // only copy at the published path. Check every step before deleting.
    require(fs.rename(dst, bak), s"compact: rename $dst -> $bak failed")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"compact: rename $tmp -> $dst failed; original preserved at $bak")
    require(fs.exists(dst), s"compact: $dst missing after swap")
    fs.delete(bak, true)
  }

  // ---- snapshot-versioned layout: multi-reader-safe compaction ----
  //
  // Data lives in immutable v<N> subdirectories; a one-line _CURRENT
  // pointer file names the active one. Republishing the pointer writes a
  // temp file and renames it over _CURRENT — a FILE rename is atomic on
  // posix and HDFS, so a reader resolves either the old version or the
  // new, never a half-written pointer and never a missing directory.
  // Superseded versions stay on disk (a reader that already resolved one
  // keeps a consistent snapshot) until [[vacuum]]. This is a miniature
  // of a lake table format's commit protocol, in plain filesystem ops.

  private val Pointer = "_CURRENT"

  private def hfc(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileContext.getFileContext(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)

  /** The version the `_CURRENT` pointer names (throws if unpublished). */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val in = hfc(spark, path)
      .open(new org.apache.hadoop.fs.Path(s"$path/$Pointer"))
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
    s.stripPrefix("v").toInt
  }

  /** Atomically point `_CURRENT` at version `v`: temp file + rename. */
  private def publish(spark: SparkSession, path: String, v: Int): Unit = {
    val fc = hfc(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path/${Pointer}_tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(s"v$v".getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, new org.apache.hadoop.fs.Path(s"$path/$Pointer"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Write `df` as the next version of a snapshot-versioned path and
    * publish it (v1 for a fresh path). Readers switch at the pointer
    * swap; none ever observes a partial write. */
  def writeVersioned(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val next =
      try currentVersion(spark, path) + 1
      catch { case _: java.io.FileNotFoundException => 1 }
    df.write.mode("overwrite").parquet(s"$path/v$next")
    publish(spark, path, next)
  }

  /** Reader over the currently-published snapshot. */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/v${currentVersion(spark, path)}")

  /** Time-travel reader over a specific published version (versions
    * stay on disk until [[vacuum]], so any un-vacuumed v is readable —
    * the same contract a lake format's VERSION AS OF gives). */
  def readVersion(spark: SparkSession, path: String, v: Int): DataFrame =
    spark.read.parquet(s"$path/v$v")

  /** Change feed between two snapshot versions of a keyed table:
    * (key, change_type ∈ insert | delete | update), unchanged rows
    * dropped — "what did the nightly rebuild actually change", the
    * question downstream incremental consumers ask before reprocessing.
    *
    * Scale shape: rows are compared by an md5 over the sorted non-key
    * columns computed MAP-SIDE in each version's own scan, so the one
    * key-shuffle (full-outer join) carries (key, 32-byte sig) — never
    * the payload. This is the honest cost of diffing a format that
    * does not track row-level changes per commit: two snapshot scans
    * plus a key-width shuffle; a real CDF sidesteps the scans by
    * logging changes at write time, which [[graft.streaming.StreamOps
    * .streamingIvm]]'s delta-folding is the write-side half of. */
  def snapshotDiff(spark: SparkSession, path: String, vOld: Int, vNew: Int,
                   keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val old = readVersion(spark, path, vOld)
    val neu = readVersion(spark, path, vNew)
    // Signatures are only comparable over a COMMON schema: a column
    // added in vNew would be silently excluded (rows changing only in
    // it diff as unchanged) and a column dropped in vNew would fail
    // with an unresolved-column error deep in the plan. Schema drift
    // is a real change-feed event — surface it explicitly and make the
    // caller reconcile schemas first.
    val oldCols = old.columns.toSet
    val newCols = neu.columns.toSet
    require(oldCols == newCols,
      s"snapshotDiff: schema drift between v$vOld and v$vNew — " +
        s"only in v$vOld: [${(oldCols -- newCols).toSeq.sorted.mkString(", ")}], " +
        s"only in v$vNew: [${(newCols -- oldCols).toSeq.sorted.mkString(", ")}]; " +
        "project both versions to a common schema before diffing")
    val cols = old.columns.filterNot(_ == keyCol).sorted
    def sigged(df: DataFrame, sig: String) =
      df.select(col(keyCol),
        md5(to_json(struct(cols.map(col): _*))).as(sig))
    sigged(old, "sig_old").join(sigged(neu, "sig_new"), Seq(keyCol), "full_outer")
      .withColumn("change_type",
        when(col("sig_old").isNull, "insert")
          .when(col("sig_new").isNull, "delete")
          .when(col("sig_old") =!= col("sig_new"), "update"))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol), col("change_type"))
      .orderBy(col(keyCol))
  }

  /** Compact the current snapshot into ceil(count/targetRows)
    * range-disjoint files AS A NEW VERSION, then atomically republish
    * the pointer. The rewrite is count-validated before the swap, so
    * the pointer only ever names a complete version; the superseded
    * version remains readable until [[vacuum]]. A `_compact.lock`
    * (atomic create) excludes concurrent compactors. */
  def compactCurrent(spark: SparkSession, path: String, orderCol: String,
                     targetRows: Long): Unit = {
    val fc = hfc(spark, path)
    val lock = new org.apache.hadoop.fs.Path(s"$path/_compact.lock")
    try fc.create(lock,
        java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE),
        org.apache.hadoop.fs.Options.CreateOpts.createParent()).close()
    catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
      throw new IllegalStateException(
        s"compactCurrent: another compaction holds $lock")
    }
    try {
      val cur = currentVersion(spark, path)
      val df = spark.read.parquet(s"$path/v$cur")
      val n = df.count()
      val files = math.max(1, math.ceil(n.toDouble / targetRows).toInt)
      df.repartitionByRange(files, col(orderCol))
        .sortWithinPartitions(col(orderCol))
        .write.mode("overwrite").parquet(s"$path/v${cur + 1}")
      val m = spark.read.parquet(s"$path/v${cur + 1}").count()
      require(m == n,
        s"compactCurrent: rewrite holds $m of $n rows — pointer not advanced")
      publish(spark, path, cur + 1)
    } finally fc.delete(lock, false)
  }

  /** Delete every superseded version directory, keeping the current one.
    * Run after in-flight readers of older snapshots have drained (the
    * grace period is the caller's policy, as in any lake format). */
  def vacuum(spark: SparkSession, path: String): Unit = {
    val cur = currentVersion(spark, path)
    val fc = hfc(spark, path)
    fc.util.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches("v\\d+") &&
        st.getPath.getName != s"v$cur")
      .foreach(st => fc.delete(st.getPath, true))
  }

  /** Reader over [[writePartitioned]] output with the partition predicate
    * applied — resolves to a pruned scan (PartitionFilters, not a data
    * filter). */
  def prunedScan(spark: SparkSession, path: String,
                 partCol: String, value: String): DataFrame =
    spark.read.parquet(path).filter(col(partCol) === value)

  /** Write `df` as a bucketed, per-bucket-sorted catalog table — the
    * PRE-PAID shuffle. Rows are hash-distributed into `buckets` files by
    * `bucketCol` at write time and the bucket spec rides in the catalog,
    * so a later join or aggregation keyed on `bucketCol` between tables
    * with the SAME bucket count needs no exchange at all: both scans
    * already report `HashPartitioning(bucketCol, buckets)` and
    * EnsureRequirements inserts nothing. This is THE layout for
    * fact-to-fact joins at 100 TB, where neither side can broadcast and
    * an on-the-fly shuffle of either side is the job's dominant cost —
    * one write-time exchange is amortized over every subsequent join.
    *
    * The explicit `repartition` matches the write tasks to the bucket
    * function (Spark's bucketing and `repartition` both use Murmur3 on
    * the column), so each bucket is exactly ONE file — without it every
    * task writes a sliver of every bucket (tasks × buckets small files)
    * and the per-bucket `sortBy` order no longer implies a single sorted
    * run, forcing joins to re-sort. */
  /** Deterministic catalog-table name for PERSISTED STANDING STATE — the
    * artifact an incremental pipeline keeps between ingests (a corpus
    * signature table, an LSH band table, an ANN index). Keyed on the
    * dataset directory so state built from different scale factors in
    * the same session never collides. Incremental operators build the
    * table once ([[writeBucketed]] for join state, so the daily probe
    * join is exchange-free on the corpus side) and every later run
    * probes it — build once, serve many.
    *
    * VERSIONING RULE (round 11): when an operator's SEMANTICS change in
    * a way that alters what its standing state contains (e.g. round
    * 10's basket cap changed which edges q47/q48 persist), the prefix
    * MUST carry a bumped `_vN` suffix. Content-hash keying only guards
    * against cross-dataset collisions, not cross-semantics ones: a
    * pre-cap run's table would otherwise silently mix uncapped day-1
    * edges with capped day-2 deltas, because tables rebuild only on
    * tableExists=false. A version bump makes stale state invisible
    * (new name → rebuilt), which is the correct failure mode. */
  def stateTable(prefix: String, dir: String): String =
    prefix + "_" + java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Survive a stale warehouse: the metastore is per-process but the
    * warehouse directory is not, so a fresh session can find a table's
    * directory on disk without any catalog entry — and saveAsTable
    * then refuses with LOCATION_ALREADY_EXISTS instead of overwriting.
    * What to do with the orphan depends on what the name promises:
    *
    *  - `graft_state_*` tables are content-hash-named ([[stateTable]])
    *    REBUILDABLE state — an unknown directory is always a prior
    *    run's output of the same derivation, so it is safe to clear
    *    and rebuild.
    *  - Any OTHER name is caller-owned data (e.g. a streaming append
    *    sink) whose accumulated output must NOT be wiped on a fresh
    *    JVM: the existing location is ADOPTED — re-registered in this
    *    session's catalog so appends keep accumulating. An empty
    *    leftover directory (no data files) is the one non-state case
    *    that is still cleared, since there is nothing to adopt and
    *    registration cannot infer a schema from it.
    *
    * Call before EVERY catalog-table state/sink write. */
  def clearStaleLocation(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        val hasData = fs.listStatus(loc).exists { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        if (table.startsWith("graft_state_") || !hasData)
          fs.delete(loc, true)
        else
          spark.catalog.createTable(table, loc.toString, "parquet")
      }
    }

  /** Standing-state bucket count (r14 verdict item 5): ONE config read
    * by both the bucketed-table writers and every delta-side
    * repartition, replacing the hardcoded 32 that would cap every
    * standing-state fold at 32-way parallelism on a 1000-executor
    * cluster. Defaults to the session's shuffle parallelism (32 under
    * the local[32] harness — byte-identical layouts to prior rounds),
    * overridable via `graft.state.buckets` BEFORE first building
    * state. Changing it with state already on disk is a layout change:
    * clear `graft_state_*` first, the same discipline the dir-hash
    * staleness contract already imposes after data regeneration —
    * though reads stay CORRECT either way because delta sides size
    * themselves off the standing table's actual spec
    * ([[tableBuckets]]), never off this conf. */
  def stateBuckets(spark: SparkSession): Int =
    spark.conf.getOption("graft.state.buckets") match {
      case None => spark.sessionState.conf.numShufflePartitions
      case Some(v) =>
        // a bad value must name the conf here, not surface as a bare
        // NumberFormatException or invalid bucketBy inside the writer
        val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"graft.state.buckets must be a positive integer, got '$v'"))
        if (n <= 0) throw new IllegalArgumentException(
          s"graft.state.buckets must be > 0, got $n")
        n
    }

  /** The bucket count a standing table was ACTUALLY written with —
    * what a delta-side repartition must match for the fold to
    * co-partition with zero exchange on the standing side. Falls back
    * to [[stateBuckets]] for tables without a bucket spec. */
  def tableBuckets(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(stateBuckets(spark))

  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(bucketCol), buckets)

  /** Multi-column variant: bucketing on ALL of a downstream join's
    * equi-keys is what lets that join co-partition without any conf
    * games — Spark's default `requireAllClusterKeysForCoPartition`
    * only reuses children partitionings that cover every join key, so
    * a standing table probed on a composite key (e.g. q50's (a, b)
    * pair counts) must be bucketed on the full composite to make the
    * daily fold shuffle nothing but the delta. */
  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    clearStaleLocation(spark, table)
    df.repartition(buckets, bucketCols.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Statistics maintenance for catalog tables — the ANALYZE step a lake
    * job scheduler runs after large writes: table-level row count/size
    * plus per-column NDV/min/max/null counts. These are what the
    * cost-based optimizer consumes for join reordering and build-side
    * selection on STATIC plans (AQE fixes sizes at runtime, but only
    * after a stage has executed; CBO stats inform the initial plan —
    * both matter at 100 TB where a wrong initial join order can be the
    * whole job). */
  def analyzeTable(spark: SparkSession, table: String,
                   cols: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (cols.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
        cols.mkString(", "))
  }

  /** File-statistics MANIFEST: per data file, min/max/count of a chosen
    * column — the metadata layer a lake table format (Iceberg/Delta)
    * maintains automatically, built here explicitly for plain parquet
    * directories. One scan groups by the hidden `_metadata.file_path`
    * column; the result is one fixed-width row per file (a 100 TB
    * directory at ~1 GB/file is ~100k rows — driver-metadata-sized), so
    * the manifest itself is a tiny parquet file.
    *
    * The manifest describes the directory AS WRITTEN; rewriting the data
    * (compact / a new version) invalidates it — pair with the versioned
    * layout (one manifest per `v<N>`) for multi-writer safety. */
  def writeManifest(spark: SparkSession, dataPath: String,
                    manifestPath: String, statCol: String): Unit =
    spark.read.parquet(dataPath)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(statCol)).as("min_v"), max(col(statCol)).as("max_v"),
           count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath)

  /** Manifest-driven FILE SKIPPING: list only the files whose [min, max]
    * overlaps the predicate range, and hand exactly those paths to the
    * scan. Row-group stats inside parquet footers prune AFTER a file is
    * opened and scheduled; the manifest prunes BEFORE — the driver never
    * lists, schedules, or footers the excluded files, which is where a
    * narrow range query on a 100k-file directory spends its time. On a
    * range-disjoint layout ([[compact]]'s `repartitionByRange` or
    * [[writeZOrdered]]) a narrow range touches O(1) files.
    *
    * The residual filter stays on the scan: the manifest bounds are
    * file-granular, so surviving files can still carry out-of-range
    * rows. */
  def manifestPrunedRead(spark: SparkSession, dataPath: String,
                         manifestPath: String, statCol: String,
                         lo: Long, hi: Long): DataFrame = {
    val files = spark.read.parquet(manifestPath)
      .filter(col("max_v") >= lo && col("min_v") <= hi)
      .select("file").collect().map(_.getString(0))
    val pred = col(statCol) >= lo && col(statCol) <= hi
    if (files.isEmpty) spark.read.parquet(dataPath).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).filter(pred)
  }

  /** Morton spread of an 8-bit value: bits interleaved with zeros
    * (abcdefgh → 0a0b0c0d0e0f0g0h). Precomputed for 0..255 and shipped
    * as a literal lookup array — one element_at per row, no UDF. */
  private val spread8: Array[Int] = Array.tabulate(256) { v =>
    (0 until 8).map(i => ((v >> i) & 1) << (2 * i)).sum
  }

  /** Z-ORDER (Morton-curve) clustered write: 2-dimensional clustering so
    * a range predicate on EITHER column — or a box on both — prunes
    * files. A linear sort on c1 gives perfect pruning on c1 and NONE on
    * c2 (every file spans c2's full range); interleaving the bits of the
    * two rank-normalized columns keeps each file's (c1, c2) bounding box
    * tight in BOTH, the public Delta/Iceberg `ZORDER BY` layout.
    *
    * Rank normalization uses each column's approx-quantile cuts (p5's
    * threshold trick: the 255-value cut array is a tiny driver artifact
    * baked into the plan; binning is a map-side fold over the literal
    * array), so skewed value distributions still fill all 256 bins and
    * the curve stays balanced. `repartitionByRange` on the z-value makes
    * files z-disjoint; the within-file sort tightens row-group stats the
    * same way [[writePartitioned]]'s does. One shuffle at write time —
    * identical cost shape to any clustered write at 100 TB. */
  def writeZOrdered(df: DataFrame, path: String,
                    c1: String, c2: String, nFiles: Int): Unit = {
    val probs = (1 until 256).map(_ / 256.0).toArray
    val cuts1 = df.stat.approxQuantile(c1, probs, 0.001)
    val cuts2 = df.stat.approxQuantile(c2, probs, 0.001)
    def bin(c: String, cuts: Array[Double]) =
      size(filter(typedLit(cuts), b => col(c).cast("double") >= b))
    val z = shiftleft(element_at(typedLit(spread8), bin(c1, cuts1) + 1), 1)
      .bitwiseOR(element_at(typedLit(spread8), bin(c2, cuts2) + 1))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
