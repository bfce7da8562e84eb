package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declares a streaming maintainer's state tables so [[EpochStore]] can
  * resolve, compact, and vacuum them. `snaps` are full-state tables the
  * maintainer REWRITES every batch (support counts, df tables, SCD2
  * dimensions); `logs` are append-only tables it only ever ADDS to
  * (posting lists, edge sets, processed-id markers). Values are the
  * bucket columns (`Nil` = plain parquet) — bucketing on a snap's fold
  * key is what keeps the standing side of the daily fold exchange-free,
  * exactly as in the batch maintainers. */
final case class EpochTables(snaps: Map[String, Seq[String]],
                             logs: Map[String, Seq[String]])

/** Transactional MULTI-TABLE commit for the streaming maintainers — the
  * lake-catalog pattern that closes foreachBatch's mid-batch crash
  * window (r11 verdict item #5), built from plain parquet + one atomic
  * file rename.
  *
  * The problem: a maintainer's batch writes SEVERAL tables (q50's dual
  * writes counts, labels, and a processed-basket marker). Parquet
  * writes are per-table; a crash between them leaves the state
  * half-updated — counts landed, marker not — and the old code could
  * only document the window. The fix is MVCC with a single commit
  * point, the same shape every lake table format (Iceberg snapshot
  * list, Delta log) implements:
  *
  *  - Nothing is ever updated in place. Epoch `n`'s state lives in
  *    tables named `..__e<n>` (snapshots, rewritten fully each epoch)
  *    and `..__d<n>` (log deltas, one per epoch). Committed tables are
  *    IMMUTABLE — which also retires the refreshTable/localCheckpoint
  *    "pin before overwrite" discipline the old duals needed, since no
  *    read plan can ever have files yanked from under it.
  *  - Readers resolve through a pointer file (`_EPOCH`, content
  *    `"<epoch> <base> <batchId>"`). Snapshots read `__e<N>`; logs read
  *    `__b<B>` (the compacted base) plus the deltas in `(B, N]`.
  *  - A batch writes ALL its tables under epoch `N+1`, then flips the
  *    pointer — a temp-file write plus ONE atomic rename (posix/HDFS),
  *    the transaction's only commit point. A reader at any instant
  *    resolves either epoch `N` in full or epoch `N+1` in full, never a
  *    mix.
  *  - A crash BEFORE the flip leaves orphan `__e/d<N+1>` tables that no
  *    reader can reach. Recovery is plain re-delivery: the replay guard
  *    probes COMMITTED state, sees the batch unprocessed, recomputes,
  *    and overwrites the orphans (state-table names are
  *    `graft_state_`-prefixed, so [[graft.sources.LayoutOps
  *    .clearStaleLocation]] clears them on the rewrite) — convergence
  *    without compensation logic. A replay of an ALREADY-committed
  *    batch is caught by the guard before any transaction opens: no
  *    epoch bump, no file churn (the true-no-op contract, spec-pinned).
  *
  * Scale notes:
  *  - Snapshot reads stay single-bucketed-table reads at every epoch,
  *    so the zero-exchange folds (q50's co-partitioned count fold) are
  *    preserved verbatim.
  *  - Log reads are a UNION of base + deltas: the read amplification is
  *    one relation per epoch since the last compaction, and the union
  *    does not report its children's bucketing, so probe joins against
  *    a multi-delta log pay an exchange a single-table log would not.
  *    [[EpochStore.compact]] is the OPTIMIZE that folds the chain back
  *    into one bucketed base (itself a normal transaction — crash-safe
  *    like any other epoch); run it on the same cadence a lake runs
  *    compaction. Between compactions the trade is bounded and visible
  *    in the plan, not silent.
  *  - The pointer also carries the last committed `batchId`, closing
  *    the replay window for maintainers whose fold is purely ADDITIVE
  *    (q41's IVM dual): their state cannot reveal a re-delivered batch,
  *    but foreachBatch re-delivers under the SAME batchId, so
  *    `batchId <= lastCommitted` is a sufficient guard — the standard
  *    idempotent-foreachBatch pattern.
  *
  * Single-writer per store (one streaming query), matching Structured
  * Streaming's execution model; readers are unrestricted. */
final class EpochStore(prefix: String, dir: String, tables: EpochTables) {
  require(prefix.startsWith("graft_state_"),
    "EpochStore: prefix must be graft_state_-prefixed so orphan " +
      "next-epoch tables are rebuildable by contract (clearStaleLocation)")

  /** Content-hash tag keying this store to its dataset, as every
    * standing state table does ([[graft.sources.LayoutOps.stateTable]]). */
  val tag: String = graft.sources.LayoutOps.stateTable(prefix, dir)

  private def tname(name: String, suffix: String) = s"${tag}_${name}__$suffix"

  // ------------------------------------------------------------ pointer

  private def pointerDir(sp: SparkSession): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      sp.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${tag}__epoch")))

  private def fc(sp: SparkSession, p: org.apache.hadoop.fs.Path) =
    org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, sp.sparkContext.hadoopConfiguration)

  /** (epoch, logBase, lastBatchId); (0, 0, -1) for a store that has
    * never committed. */
  def committed(sp: SparkSession): (Int, Int, Long) = {
    val pd = pointerDir(sp)
    val f = new org.apache.hadoop.fs.Path(pd, "_EPOCH")
    try {
      val in = fc(sp, pd).open(f)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      val Array(e, b, bid) = s.split(" ")
      (e.toInt, b.toInt, bid.toLong)
    } catch { case _: java.io.FileNotFoundException => (0, 0, -1L) }
  }

  def exists(sp: SparkSession): Boolean = committed(sp)._1 > 0

  /** Atomic pointer flip: temp file + rename — THE commit point.
    * private[streaming] ONLY so the restart spec can hand-commit a
    * path-written epoch (simulating a prior process's warehouse). */
  private[streaming] def flip(sp: SparkSession, epoch: Int, base: Int,
                              batchId: Long): Unit = {
    val pd = pointerDir(sp)
    val ctx = fc(sp, pd)
    val tmp = new org.apache.hadoop.fs.Path(pd, "_EPOCH_tmp")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      org.apache.hadoop.fs.Options.CreateOpts.createParent())
    try out.write(s"$epoch $base $batchId".getBytes("UTF-8"))
    finally out.close()
    ctx.rename(tmp, new org.apache.hadoop.fs.Path(pd, "_EPOCH"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // -------------------------------------------------------------- reads

  /** Resolve a committed table, ADOPTING its directory into this
    * process's catalog if needed: the warehouse outlives the in-memory
    * catalog, so after a process restart a committed epoch's directory
    * exists with no catalog entry. Adoption registers it as plain
    * parquet — the bucket spec is catalog metadata and does not survive
    * the restart, so folds in the restarted process pay one exchange
    * until the next epoch's write restores a bucketed table. */
  private def resolve(sp: SparkSession, t: String): DataFrame = {
    if (!sp.catalog.tableExists(t)) {
      val loc = new org.apache.hadoop.fs.Path(
        sp.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(t)))
      val fs = loc.getFileSystem(sp.sparkContext.hadoopConfiguration)
      require(fs.exists(loc),
        s"EpochStore: committed table $t has no directory — state lost")
      sp.catalog.createTable(t, loc.toString, "parquet")
    }
    sp.table(t)
  }

  /** Committed snapshot's catalog-table name (for cores that read via
    * `sp.table(name)`); adoption-safe. */
  def snapName(sp: SparkSession, name: String): String = {
    val (e, _, _) = committed(sp)
    require(e > 0, s"EpochStore($tag): no committed epoch")
    val t = tname(name, s"e$e")
    resolve(sp, t)
    t
  }

  def snap(sp: SparkSession, name: String): DataFrame =
    sp.table(snapName(sp, name))

  /** Time-travel read: the snapshot AS OF an earlier committed epoch.
    * Superseded epochs stay on disk until [[vacuum]] (the same
    * contract a lake format's VERSION AS OF gives), so any un-vacuumed
    * epoch is readable — the audit/debug path ("what did the state
    * look like before batch N folded in"). */
  def snapAt(sp: SparkSession, name: String, epoch: Int): DataFrame = {
    val (e, _, _) = committed(sp)
    require(epoch >= 1 && epoch <= e,
      s"EpochStore($tag): epoch $epoch outside committed range [1, $e]")
    resolve(sp, tname(name, s"e$epoch"))
  }

  /** Committed log content: base (if compacted) plus the delta chain. */
  def log(sp: SparkSession, name: String): DataFrame = {
    val (e, b, _) = committed(sp)
    require(e > 0, s"EpochStore($tag): no committed epoch")
    val parts =
      (if (b > 0) Seq(tname(name, s"b$b")) else Nil) ++
        ((b + 1) to e).map(k => tname(name, s"d$k"))
          .filter(t => sp.catalog.tableExists(t) || {
            // a delta is only absent if that epoch wrote none for this
            // log (legal: an epoch need not touch every log) — probe
            // the directory so a restarted process still sees it
            val loc = new org.apache.hadoop.fs.Path(
              sp.sessionState.catalog.defaultTablePath(
                org.apache.spark.sql.catalyst.TableIdentifier(t)))
            loc.getFileSystem(sp.sparkContext.hadoopConfiguration).exists(loc)
          })
    require(parts.nonEmpty, s"EpochStore($tag): log $name has no parts")
    parts.map(resolve(sp, _)).reduce(_ unionByName _)
  }

  /** [[log]] registered as a temp view, for maintenance cores that take
    * a table NAME and read via `sp.table(...)` — a temp view resolves
    * there identically, so the cores stay storage-agnostic. */
  def logView(sp: SparkSession, name: String): String = {
    val v = s"${tag}_${name}__committed"
    log(sp, name).createOrReplaceTempView(v)
    v
  }

  def lastBatchId(sp: SparkSession): Long = committed(sp)._3

  // ------------------------------------------------------- transactions

  /** One epoch's uncommitted write set. All writes target `__e/d<epoch>`
    * tables invisible to readers until the caller's [[transact]] flips
    * the pointer. */
  final class Tx private[EpochStore] (sp: SparkSession, val epoch: Int) {
    /** Next-epoch snapshot table name, for init cores that write
      * directly ([[graft.operators.RelationalOps.q50InitState]]). */
    def snapName(name: String): String = {
      require(tables.snaps.contains(name), s"undeclared snap $name")
      tname(name, s"e$epoch")
    }
    def logDeltaName(name: String): String = {
      require(tables.logs.contains(name), s"undeclared log $name")
      tname(name, s"d$epoch")
    }
    def writeSnap(name: String, df: DataFrame): Unit =
      write(snapName(name), df, tables.snaps(name))
    def writeLogDelta(name: String, df: DataFrame): Unit =
      write(logDeltaName(name), df, tables.logs(name))
    private def write(t: String, df: DataFrame, buckets: Seq[String]): Unit =
      if (buckets.nonEmpty)
        graft.sources.LayoutOps.writeBucketed(df, t, buckets, 32)
      else {
        graft.sources.LayoutOps.clearStaleLocation(sp, t)
        df.write.mode("overwrite").format("parquet").saveAsTable(t)
      }
  }

  /** Run `body` as epoch N+1 and commit. Every snap the store declares
    * must be (re)written by the body — reads at N+1 resolve ONLY
    * `__e<N+1>` names — which is the natural shape of these maintainers
    * (each batch folds into every snap it owns). On any exception the
    * pointer is untouched: readers stay on epoch N, and the partial
    * `__e/d<N+1>` tables are unreachable orphans the next delivery
    * overwrites. */
  def transact[A](sp: SparkSession, batchId: Long = -1L)(body: Tx => A): A = {
    val (e, b, _) = committed(sp)
    val r = body(new Tx(sp, e + 1))
    flip(sp, e + 1, b, batchId)
    r
  }

  // ------------------------------------------------------- maintenance

  /** OPTIMIZE: fold every log's delta chain into a single bucketed base
    * and carry the snapshots forward, as one normal transaction — crash
    * mid-compaction leaves readers on the old chain, retry overwrites
    * the orphans. After the flip the superseded tables are vacuumed.
    * Run on a lake's compaction cadence (the read-amplification bound
    * is one relation per epoch since the last run). */
  def compact(sp: SparkSession): Unit = {
    val (e, _, bid) = committed(sp)
    require(e > 0, s"EpochStore($tag): nothing to compact")
    val next = e + 1
    tables.logs.foreach { case (name, buckets) =>
      val t = tname(name, s"b$next")
      if (buckets.nonEmpty)
        graft.sources.LayoutOps.writeBucketed(log(sp, name), t, buckets, 32)
      else {
        graft.sources.LayoutOps.clearStaleLocation(sp, t)
        log(sp, name).write.mode("overwrite").format("parquet").saveAsTable(t)
      }
    }
    tables.snaps.foreach { case (name, buckets) =>
      val t = tname(name, s"e$next")
      if (buckets.nonEmpty)
        graft.sources.LayoutOps.writeBucketed(snap(sp, name), t, buckets, 32)
      else {
        graft.sources.LayoutOps.clearStaleLocation(sp, t)
        snap(sp, name).write.mode("overwrite").format("parquet").saveAsTable(t)
      }
    }
    flip(sp, next, next, bid)
    vacuum(sp)
  }

  /** Drop every table of this store the committed pointer no longer
    * references: superseded snapshots, compacted-away deltas and bases,
    * crash orphans above the committed epoch. Safe post-commit — the
    * pointer is the only path to a table, so an unreferenced one has no
    * readers (modulo the same in-flight-reader grace period every lake
    * format's VACUUM documents). */
  def vacuum(sp: SparkSession): Unit = {
    val (e, b, _) = committed(sp)
    val Snap = s"${tag}_(\\w+)__e(\\d+)".r
    val Delta = s"${tag}_(\\w+)__d(\\d+)".r
    val Base = s"${tag}_(\\w+)__b(\\d+)".r
    sp.sessionState.catalog.listTables("default", s"${tag}_*__*")
      .map(_.table).foreach {
        case t @ Snap(_, k) if k.toInt != e => drop(sp, t)
        case t @ Delta(_, k) if k.toInt <= b || k.toInt > e => drop(sp, t)
        case t @ Base(_, k) if k.toInt != b => drop(sp, t)
        case _ => ()
      }
  }

  private def drop(sp: SparkSession, t: String): Unit =
    sp.sql(s"DROP TABLE IF EXISTS $t")

  /** Remove the store entirely: every epoch table and the pointer.
    * Test/teardown utility — a production store is vacuumed, not
    * destroyed. */
  def destroy(sp: SparkSession): Unit = {
    sp.sessionState.catalog.listTables("default", s"${tag}_*__*")
      .map(_.table).foreach(drop(sp, _))
    val pd = pointerDir(sp)
    val fs = pd.getFileSystem(sp.sparkContext.hadoopConfiguration)
    fs.delete(pd, true)
  }
}

object EpochStore {
  /** Test-only failpoint: thrown by a maintainer's batch body AFTER its
    * data tables land but BEFORE the pointer flip, simulating a crash
    * inside the multi-table write — the window the epoch commit closes. */
  final class InjectedCrash
    extends RuntimeException("injected crash before epoch commit")
}
