package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 specs: e30/e31's BIGINT result surface (the r15 driver
  * gate proved DECIMAL(38,0) OUTPUT columns are the one non-portable
  * result-schema feature) and the int64 headroom that makes the final
  * decimal→long cast provably lossless on the planted corpora. */
class Round16OpsSpec extends AnyFunSuite {
  import graft.SharedSpark._

  test("e30/e31 surface BIGINT totals (decimal stays internal)") {
    for (name <- Seq("e30_decayed_engagement", "e31_decayed_day2")) {
      val schema = graft.SparkEntry.queries(name)(spark, sf).schema
      for (c <- Seq("total_cents", "score_micro"))
        assert(schema(c).dataType == org.apache.spark.sql.types.LongType,
          s"$name.$c must surface as BIGINT, got ${schema(c).dataType}")
    }
  }

  test("e30/e31 int64 headroom: per-user Σ|cents|·10^6 bounds BOTH " +
      "surfaced sums and sits orders of magnitude under Long.MaxValue") {
    import spark.implicits._
    // |score_micro| ≤ Σ|cents|·10^6 (weights ≤ 1) and |total_cents| ≤
    // Σ|cents|, so one magnitude bound covers both output columns.
    val worst = graft.Tables(spark, sf, "events")
      .select(abs(floor($"value" * 100 + 0.5)).cast("decimal(38,0)")
        .as("acents"))
      .agg(sum($"acents").as("s")) // corpus-wide ≥ any per-user sum
      .select(($"s" * lit(1000000L)).cast("decimal(38,0)"))
      .first().getDecimal(0)
    val ceiling = new java.math.BigDecimal(Long.MaxValue / 10000L)
    assert(worst.compareTo(ceiling) <= 0,
      s"headroom eroded: corpus Σ|cents|·10^6 = $worst exceeds " +
        s"Long.MaxValue/10^4 — revisit the BIGINT surface cast")
  }

  // ------------------------------------------------------------- e32

  private def ts32(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 3, 1)
      .atTime(h, m))

  private def shape(sessions: org.apache.spark.sql.DataFrame) = {
    import graft.SharedSpark.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    sessions
      .withColumn("sess_id", org.apache.spark.sql.functions.row_number()
        .over(Window.partitionBy($"user_id").orderBy($"start_us"))
        .cast("long"))
      .select($"user_id", $"sess_id", $"n_events",
        ($"end_us" - $"start_us").as("dur_us"))
      .orderBy($"user_id", $"sess_id")
      .collect().map(_.toSeq).toSeq
  }

  test("e32: fold of standing sessions + delta points equals the " +
      "from-scratch sessionization — bridge merges (two standing " +
      "sessions joined through new points), extensions, brand-new " +
      "users, duplicate timestamps, untouched pass-through") {
    import spark.implicits._
    val old = Seq(
      // user 1: two standing sessions 80 min apart
      (101L, ts32(10, 0), 1L), (102L, ts32(10, 10), 1L),
      (103L, ts32(11, 30), 1L), (104L, ts32(11, 40), 1L),
      // user 2: one standing session
      (105L, ts32(9, 0), 2L), (106L, ts32(9, 5), 2L),
      // user 4: untouched (no delta) — must pass through verbatim
      (107L, ts32(15, 0), 4L), (108L, ts32(16, 0), 4L))
    val fresh = Seq(
      // chain bridging user 1's sessions: 10:35 (25m after A-end),
      // 11:05 (exactly the 30m gap to 10:35 — boundary INCLUDED),
      // 25m before B-start ⇒ ALL SIX events collapse into one session
      (201L, ts32(10, 35), 1L), (202L, ts32(11, 5), 1L),
      // user 2: duplicate of an old event's timestamp — joins
      (203L, ts32(9, 5), 2L),
      // user 3: brand-new user, delta-only session
      (204L, ts32(12, 0), 3L))
    def df(rows: Seq[(Long, java.sql.Timestamp, Long)]) =
      rows.toDF("event_id", "ts", "user_id")
    val t = "graft_state_e32spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sources.LayoutOps.writeBucketed(
      EventOps.e32Sessions(df(old)), t, Seq("user_id"),
      graft.sources.LayoutOps.stateBuckets(spark))
    val got = EventOps.e32Fold(t, df(fresh))
      .collect().map(_.toSeq).toSeq
    val scratch = shape(EventOps.e32Sessions(df(old ++ fresh)))
    assert(got == scratch, s"fold diverged from scratch:\n$got\n$scratch")
    // hand-computed: u1 one merged session of 6, 10:00→11:40 = 100 min
    val us = (m: Long) => m * 60L * 1000000L
    assert(got == Seq(
      Seq(1L, 1L, 6L, us(100)),
      Seq(2L, 1L, 3L, us(5)),
      Seq(3L, 1L, 1L, 0L),
      Seq(4L, 1L, 1L, 0L), Seq(4L, 2L, 1L, 0L)), s"got $got")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("e32: a 31-minute bridge does NOT merge (the gap contract is " +
      "strict >30min split, same as e3)") {
    import spark.implicits._
    val old = Seq((1L, ts32(10, 0), 1L), (2L, ts32(11, 30), 1L))
    val fresh = Seq((3L, ts32(10, 31), 1L)) // 31m after A, 59m before B
    val t = "graft_state_e32spec2"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sources.LayoutOps.writeBucketed(
      EventOps.e32Sessions(old.toDF("event_id", "ts", "user_id")),
      t, Seq("user_id"), graft.sources.LayoutOps.stateBuckets(spark))
    val got = EventOps.e32Fold(t, fresh.toDF("event_id", "ts", "user_id"))
      .collect().map(_.toSeq).toSeq
    assert(got == Seq(Seq(1L, 1L, 1L, 0L), Seq(1L, 2L, 1L, 0L),
      Seq(1L, 3L, 1L, 0L)), s"got $got")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("e32: the fold never re-shuffles the standing session table — " +
      "both the semi (touched) and anti (untouched) probes read it " +
      "co-partitioned, and the untouched branch's sess_id window " +
      "rides the bucketing instead of a post-union re-hash") {
    graft.SparkEntry.queries("e32_sessions_day2")(spark, sf) // build state
    val sessT = graft.sources.LayoutOps
      .stateTable("graft_state_e32_sessions", sf)
    val fold = EventOps.e32Fold(sessT,
      graft.Tables(spark, sf, "events").limit(64))
    val plan = fold.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def standing(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collectLeaves().exists(_.toString.contains("graft_state_e32_sessions"))
    // HASH exchanges above the standing scan may only carry the
    // delta-sized TOUCHED side (the sweep's necessary shuffle); the
    // only other exchange over standing rows is the final presentation
    // sort (range partitioning). An untouched-branch hash exchange
    // would mean the whole standing table re-shuffles every day.
    val hashExAboveStanding = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if standing(e) && e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    // the touched sweep's one shuffle carries points ∪ touched — its
    // subtree must contain the delta scan too; anything hashing a
    // standing-only subtree is the regression this spec guards
    val standingOnly = hashExAboveStanding.filterNot(e =>
      e.collectLeaves().exists(_.toString.contains("events")))
    assert(standingOnly.isEmpty,
      s"standing-only subtree re-hashed ${standingOnly.size}x:\n$plan")
    // and the two fold joins probe the standing side in place
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if standing(j) => j
    }
    assert(joins.nonEmpty, s"no fold join over standing sessions:\n$plan")
    joins.foreach { j =>
      j.children.filter(standing).foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if standing(e) => e
        }
        assert(ex.isEmpty,
          s"standing side of a fold join rides an exchange:\n$j")
      }
    }
  }

  // ------------------------------------------------------------- e34

  test("e34: deleting a bridge event SPLITS its session; a fully " +
      "deleted user vanishes; duplicate timestamps retract " +
      "one-for-one; spurious deletions are no-ops; untouched users " +
      "pass through — retract ≡ from-scratch over the survivors") {
    import spark.implicits._
    val old = Seq(
      // u1: one session 10:00–10:40 via the 10:20 bridge
      (11L, ts32(10, 0), 1L), (12L, ts32(10, 20), 1L),
      (13L, ts32(10, 40), 1L),
      // u2: a single session — fully deleted below
      (21L, ts32(9, 0), 2L), (22L, ts32(9, 10), 2L),
      // u3: two events at the SAME timestamp + a neighbor
      (31L, ts32(14, 0), 3L), (32L, ts32(14, 0), 3L),
      (33L, ts32(14, 10), 3L),
      // u4: untouched (but receives a spurious deletion below)
      (41L, ts32(16, 0), 4L), (42L, ts32(16, 5), 4L))
    // deletion times go through the same unix_micros path as the
    // operator, so the spec is timezone-agnostic
    val dels = Seq(
      (1L, ts32(10, 20)),                  // the bridge — must split
      (2L, ts32(9, 0)), (2L, ts32(9, 10)), // all of u2
      (3L, ts32(14, 0)),                   // ONE of the duplicate copies
      (4L, ts32(23, 59)))                  // spurious: u4 has no such event
      .toDF("user_id", "ts")
      .select($"user_id", unix_micros($"ts").as("us"))
    val t = "graft_state_e34spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sources.LayoutOps.writeBucketed(
      EventOps.e34Sessions(old.toDF("event_id", "ts", "user_id")),
      t, Seq("user_id"), graft.sources.LayoutOps.stateBuckets(spark))
    val got = EventOps.e34Retract(t, dels).collect().map(_.toSeq).toSeq
    // from-scratch over the survivors (event 32 survives: only one of
    // the two 14:00 copies was deleted)
    val kept = old.filterNot(e => Set(12L, 21L, 22L, 31L).contains(e._1))
    val scratch = shape(EventOps.e32Sessions(
      kept.toDF("event_id", "ts", "user_id")))
    assert(got == scratch, s"retract diverged from scratch:\n$got\n$scratch")
    assert(got == Seq(
      Seq(1L, 1L, 1L, 0L), Seq(1L, 2L, 1L, 0L), // split: two singletons
      Seq(3L, 1L, 2L, 600000000L),              // one 14:00 copy + 14:10
      Seq(4L, 1L, 2L, 300000000L)), s"got $got") // untouched, intact
    assert(!got.exists(_.head == 2L), "fully deleted user did not vanish")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("e34: the retract never re-shuffles the standing session table " +
      "— both fold joins probe it co-partitioned") {
    graft.SparkEntry.queries("e34_sessions_retract")(spark, sf) // state
    val sessT = graft.sources.LayoutOps
      .stateTable("graft_state_e34_sessions", sf)
    import spark.implicits._
    val fold = EventOps.e34Retract(sessT,
      graft.Tables(spark, sf, "events").limit(32)
        .select($"user_id", unix_micros($"ts").as("us")))
    val plan = fold.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def standing(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collectLeaves().exists(_.toString.contains("graft_state_e34_sessions"))
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if standing(j) => j
    }
    assert(joins.nonEmpty, s"no fold join over standing sessions:\n$plan")
    joins.foreach { j =>
      j.children.filter(standing).foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if standing(e) => e
        }
        assert(ex.isEmpty,
          s"standing side of a fold join rides an exchange:\n$j")
      }
    }
  }

  // ------------------------------------------------------------- e35

  test("e35: one mixed batch — bridge-adds MERGE, deletes SPLIT, a " +
      "delete re-bridged by a same-batch add, same-batch add+delete " +
      "cancels, spurious delete no-ops, new user appears, fully " +
      "deleted user vanishes, untouched passes through — fold ≡ " +
      "from-scratch over the net corpus, at BOTH shapes") {
    import spark.implicits._
    val old = Seq(
      // u1: two sessions A=[10:00,10:10] B=[11:30,11:40]; adds bridge
      (11L, ts32(10, 0), 1L), (12L, ts32(10, 10), 1L),
      (13L, ts32(11, 30), 1L), (14L, ts32(11, 40), 1L),
      // u2: one session via the 30-min boundary gap; delete splits it
      (21L, ts32(9, 0), 2L), (22L, ts32(9, 10), 2L),
      (23L, ts32(9, 40), 2L),
      // u3: standing 14:00; batch adds AND deletes 14:00 (one copy
      // each) — net unchanged through the weight ledger
      (31L, ts32(14, 0), 3L),
      // u4: delete the 16:20 bridge AND add 16:25 in the same batch —
      // the split is immediately re-bridged
      (41L, ts32(16, 0), 4L), (42L, ts32(16, 20), 4L),
      (43L, ts32(16, 40), 4L),
      // u5: spurious delete target (no 23:00 event) — must no-op
      (51L, ts32(18, 0), 5L),
      // u7: fully deleted below
      (71L, ts32(7, 0), 7L), (72L, ts32(7, 10), 7L),
      // u8: untouched — must pass through verbatim
      (81L, ts32(20, 0), 8L), (82L, ts32(20, 5), 8L))
    val adds = Seq(
      (1L, ts32(10, 40)), // 30 min after u1.A-end: boundary merge
      (1L, ts32(11, 0)),  // chains A..B into ONE session
      (3L, ts32(14, 0)),  // cancelled by the same-batch delete below
      (4L, ts32(16, 25)), // re-bridges u4's deletion split
      (6L, ts32(12, 0)))  // brand-new user
      .toDF("user_id", "ts").select($"user_id", unix_micros($"ts").as("us"))
    val dels = Seq(
      (2L, ts32(9, 10)),  // splits u2 (9:00 → 9:40 is 40 min)
      (3L, ts32(14, 0)),  // cancels the same-batch add
      (4L, ts32(16, 20)), // the bridge — split, then re-bridged
      (5L, ts32(23, 0)),  // spurious
      (7L, ts32(7, 0)), (7L, ts32(7, 10))) // all of u7
      .toDF("user_id", "ts").select($"user_id", unix_micros($"ts").as("us"))
    val t = "graft_state_e35spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sources.LayoutOps.writeBucketed(
      EventOps.e34Sessions(old.toDF("event_id", "ts", "user_id")),
      t, Seq("user_id"), graft.sources.LayoutOps.stateBuckets(spark))
    val got = EventOps.e35Upsert(t,
      adds.toDF(), dels.toDF()).collect().map(_.toSeq).toSeq
    // net corpus: old minus deleted ids, plus the surviving adds
    val kept = old.filterNot(e => Set(22L, 42L, 71L, 72L).contains(e._1))
    val net = kept.map(e => (e._2, e._3)) ++ Seq(
      (ts32(10, 40), 1L), (ts32(11, 0), 1L), (ts32(16, 25), 4L),
      (ts32(12, 0), 6L))
    val scratch = shape(EventOps.e32Sessions(
      net.zipWithIndex.map { case ((ts, u), i) => (1000L + i, ts, u) }
        .toDF("event_id", "ts", "user_id")))
    assert(got == scratch, s"fold diverged from scratch:\n$got\n$scratch")
    assert(!got.exists(_.head == 7L), "fully deleted user did not vanish")
    assert(got.filter(_.head == 1L).map(_(2)) == Seq(6L),
      s"u1 bridge-merge: expected one 6-event session, got $got")
    assert(got.filter(_.head == 2L).size == 2, "u2 delete did not split")
    assert(got.filter(_.head == 4L).map(_(2)) == Seq(3L),
      "u4 same-batch delete+add did not re-bridge into one session")
    // the STATE shape the maintainer persists must equal a from-scratch
    // multiset state over the net corpus (the inductive step)
    val (resw, untouched) = EventOps.e35MergedParts(t, adds, dels)
    def stateRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"start_us", $"end_us", $"n_events", $"ts_list")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getSeq[Long](4).toList)).toSet
    val gotState = stateRows(resw) ++ stateRows(untouched)
    val scratchState = stateRows(EventOps.e34Sessions(
      net.zipWithIndex.map { case ((ts, u), i) => (1000L + i, ts, u) }
        .toDF("event_id", "ts", "user_id")))
    assert(gotState == scratchState,
      s"state shape diverged:\n$gotState\n$scratchState")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("e35: the standing table is probed IN PLACE (semi/anti sides " +
      "exchange-free) and every standing-carrying shuffle sits above " +
      "the touched split — only delta rows ever move") {
    graft.SparkEntry.queries("e35_sessions_upsert")(spark, sf) // state
    val sessT = graft.sources.LayoutOps
      .stateTable("graft_state_e35_sessions", sf)
    import spark.implicits._
    val feed = graft.Tables(spark, sf, "events").limit(32)
      .select($"user_id", unix_micros($"ts").as("us"))
    val fold = EventOps.e35Upsert(sessT, feed, feed)
    val plan = fold.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def standing(p: org.apache.spark.sql.execution.SparkPlan) =
      p.collectLeaves().exists(_.toString.contains("graft_state_e35_sessions"))
    import org.apache.spark.sql.catalyst.plans.{LeftSemi, LeftAnti}
    val probes = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if standing(j) && (j.joinType == LeftSemi || j.joinType == LeftAnti)
        => j
    }
    assert(probes.size == 2, s"expected the semi+anti probe pair:\n$plan")
    probes.foreach { j =>
      j.children.filter(standing).foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if standing(e) => e
        }
        assert(ex.isEmpty,
          s"standing side of a probe join rides an exchange:\n$j")
      }
    }
    // the weight-ledger aggregate does shuffle — but only rows that
    // already passed the LeftSemi touched split (delta-sized, never
    // the table): every standing-carrying shuffle must contain the
    // semi probe in its subtree
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if standing(e) => e
    }.foreach { e =>
      val aboveSplit = e.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == LeftSemi && standing(j) => j
      }.nonEmpty
      assert(aboveSplit,
        s"a standing-carrying shuffle below the touched split:\n$e")
    }
  }

  // ------------------------------------------------------------- q64

  test("q64: buffered decremental top-k — underflowed-while-full " +
      "groups refill from below the buffer, covered groups serve from " +
      "the buffer, never-full buffers never refill, fully-deleted " +
      "groups vanish — fold ≡ from-scratch over the survivors") {
    import spark.implicits._
    def mk(g: Long, n: Int) = // ids g*100+1.., values 80, 70, 60, ...
      (1 to n).map(i => (g, g * 100 + i, 90.0 - 10 * i))
    val all = mk(1, 8) ++ mk(2, 8) ++ mk(3, 2) ++ mk(4, 3) ++
      mk(5, 8) ++ mk(6, 2)
    val dels = Seq( // (g, id)
      (1L, 101L), (1L, 102L), (1L, 103L), (1L, 104L), // 4 of g1's top-6
      (2L, 201L),                                     // 1 of g2's top-6
      (3L, 301L),                                     // never-full buffer
      (5L, 501L), (5L, 502L), (5L, 503L),             // ALL of g5's
      (5L, 504L), (5L, 505L), (5L, 506L),             //   buffer
      (6L, 601L), (6L, 602L))                         // all of g6
    val t = "graft_state_q64spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    graft.sources.LayoutOps.writeBucketed(
      RelationalOps.q64Buffer(all.toDF("g", "id", "v")), t, Seq("g"),
      graft.sources.LayoutOps.stateBuckets(spark))
    val delIds = dels.map(_._2).toSet
    val survivors = all.filterNot(r => delIds.contains(r._2))
    val got = RelationalOps.q64Fold(t, dels.toDF("g", "id"),
      survivors.toDF("g", "id", "v")).collect().map(_.toSeq).toSeq
    val scratch = survivors.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(RelationalOps.Q64K).zipWithIndex
        .map { case (r, i) => Seq[Any](g, (i + 1).toLong, r._2, r._3) }
    }.sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(got == scratch, s"fold diverged from scratch:\n$got\n$scratch")
    assert(got.filter(_.head == 1L).map(_(2)) == Seq(105L, 106L, 107L),
      "g1 did not refill: rank 3 must be the below-buffer row 107")
    assert(got.filter(_.head == 5L).map(_(2)) == Seq(507L, 508L),
      "g5 (whole buffer deleted) must serve only below-buffer survivors")
    assert(got.filter(_.head == 3L) == Seq(Seq(3L, 1L, 302L, 70.0)),
      "g3's never-full buffer must serve its survivor without refill")
    assert(!got.exists(_.head == 6L), "fully deleted group did not vanish")
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("q64: the buffer is probed and served in place (no " +
      "standing-carrying hash exchange outside the refill branch) and " +
      "the refill's base read is semi-join pruned by the buffer") {
    val fold = graft.SparkEntry.queries("q64_topk_retract")(spark, sf)
    val plan = fold.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def has(p: org.apache.spark.sql.execution.SparkPlan, s: String) =
      p.collectLeaves().exists(_.toString.contains(s))
    val buf = "graft_state_q64_topk"
    // every hash exchange carrying buffer-derived rows must be the
    // refill branch (it also reads the orders base); the buffer-only
    // pipeline — probes, both counts, the serve window — rides the
    // bucketing with zero exchange
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
          && has(e, buf) => e
    }.foreach { e =>
      assert(has(e, "orders.parquet"),
        s"a buffer-carrying hash exchange outside the refill branch:\n$e")
    }
    // the refill reads the base under a LeftSemi against buffer-derived
    // groups — structural proof the day-2 base read is pruned
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val pruned = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType == LeftSemi && has(j.left, "orders.parquet") &&
          has(j.right, buf) => j
    }
    assert(pruned.nonEmpty, s"refill base read is not semi-pruned:\n$plan")
  }

  // ------------------------------------------------------------- q65

  test("q65: exact g3 repair distance on planted dependencies — " +
      "hand-counted violations, an exactly-holding FD, the 1% " +
      "approximate band, and null-group handling") {
    import spark.implicits._
    def profile(rows: Seq[(java.lang.Long, String)]) =
      RelationalOps.q65One(rows.toDF("a", "b"), "t", "a", "b")
        .collect().map(_.toSeq).head
    // a=1: {x,x,y} → g3 1; a=2: {z,z,z,z} → 0; a=3: {p,q} → 1;
    // a=5: {null,null,w} → 1 (nulls form one rhs group)
    val messy: Seq[(java.lang.Long, String)] = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),
      (2L, "z"), (2L, "z"), (2L, "z"), (2L, "z"),
      (3L, "p"), (3L, "q"),
      (5L, null), (5L, null), (5L, "w"))
    assert(profile(messy) ==
      Seq("t.a->b", 12L, 4L, 3L, false, false), s"got ${profile(messy)}")
    // exact hold: rhs is a function of lhs
    val exact: Seq[(java.lang.Long, String)] =
      (1 to 50).map(i => (java.lang.Long.valueOf(i % 5L), s"v${i % 5}"))
    assert(profile(exact) == Seq("t.a->b", 50L, 5L, 0L, true, true))
    // 1% band: 300 rows, 2 violations → g3·100 = 200 ≤ 300
    val approx: Seq[(java.lang.Long, String)] =
      (1 to 298).map(_ => (java.lang.Long.valueOf(1L), "u")) ++
        Seq((1L, "v"), (1L, "v")).map(t => (java.lang.Long.valueOf(t._1), t._2))
    assert(profile(approx) == Seq("t.a->b", 300L, 1L, 2L, false, true))
  }

  // ------------------------------------------------------------- e36

  /** Page's CUSUM by the literal recurrence — the independent oracle
    * the window-identity implementation must reproduce. */
  private def cusumByRecurrence(xs: Seq[(Int, Long)]) // (di, cents)
      : Option[(String, Int, Long, Long)] = {
    val n = xs.size
    val k = xs.map(_._2).sum / n // positive totals: floor == truncate
    val h = EventOps.E36HMult * k
    var sp = 0L; var sm = 0L
    var firstUp = Option.empty[Int]; var firstDn = Option.empty[Int]
    var peakUp = 0L; var peakDn = 0L
    for ((di, x) <- xs.sortBy(_._1)) {
      sp = math.max(0L, sp + (x - k)); sm = math.max(0L, sm - (x - k))
      peakUp = math.max(peakUp, sp); peakDn = math.max(peakDn, sm)
      if (sp > h && firstUp.isEmpty) firstUp = Some(di)
      if (sm > h && firstDn.isEmpty) firstDn = Some(di)
    }
    if (firstUp.isEmpty && firstDn.isEmpty) None
    else {
      val dir = if (firstDn.isEmpty ||
        (firstUp.nonEmpty && firstUp.get <= firstDn.get)) "up" else "down"
      Some((dir, math.min(firstUp.getOrElse(Int.MaxValue),
        firstDn.getOrElse(Int.MaxValue)), peakUp, peakDn))
    }
  }

  private def e36Events(rows: Seq[(Long, Int, Long)]) = { // user, di, cents
    import graft.SharedSpark.spark.implicits._
    rows.toDF("user_id", "di", "cents")
      .select($"user_id",
        to_timestamp(date_add(lit("1970-01-01").cast("date"), $"di"))
          .as("ts"),
        ($"cents".cast("double") / 100.0).as("value"))
  }

  test("e36: hand-verified planted series — a 6-day trough alarms DOWN " +
      "on day 5 (699·5 = 3495 > h = 2800) before the later up-swing; " +
      "a flat series never alarms") {
    import spark.implicits._
    val trough = (1 to 6).map(d => (9L, d, 1L)) ++
      (7 to 20).map(d => (9L, d, 1000L))
    val flat = (1 to 20).map(d => (10L, d, 500L))
    val got = EventOps.e36From(e36Events(trough ++ flat))
      .collect().map(_.toSeq).toSeq
    // k = 14006 div 20 = 700, h = 2800; S⁻ = 699·i crosses on day 5
    // (3495), peaks 4194 on day 6; S⁺ then climbs 300/day to 4200
    assert(got == Seq(Seq(9L, "down", 5, 4200L, 4194L)), s"got $got")
  }

  test("e36: the window identity S⁺=cum−min(0,runmin cum), " +
      "S⁻=max(0,runmax cum)−cum reproduces Page's literal recurrence " +
      "on 40 seeded-random user series") {
    import spark.implicits._
    val rnd = new scala.util.Random(1636)
    val rows = for {
      u <- 1L to 40L
      days = 10 + rnd.nextInt(20)
      base = 50L + rnd.nextInt(2000)
      d <- 1 to days
      // occasional regime shifts so some users alarm and some don't
      x = math.max(1L, base + rnd.nextInt(600) - 300 +
        (if (d > days / 2 && u % 3 == 0) base * 2 else 0L))
    } yield (u, d, x)
    val got = EventOps.e36From(e36Events(rows))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))).toMap
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      cusumByRecurrence(rs.map(r => (r._2, r._3))).map(u -> _)
    }
    assert(got == expected,
      s"identity diverged from recurrence:\ngot      $got\nexpected $expected")
    assert(got.nonEmpty && got.size < 40,
      s"fuzz should alarm some but not all users, alarmed ${got.size}/40")
  }

  // ------------------------------------------------------------- e33

  test("e33: planted lifecycle — new/retained/resurrected/churned per " +
      "day, churn not counted past the observation window") {
    import spark.implicits._
    def at(day: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, day).atTime(h, 0))
    // u1: days 1, 2, 4 — new, retained, resurrected (+churn into day 3)
    // u2: day 1 only — churn into day 2
    // u3: day 4 only — new on the LAST observed day, so neither u1 nor
    //     u3 churns into day 5 (window ends)
    val ev = Seq(
      (1L, at(1, 5)), (1L, at(1, 20)), (1L, at(2, 3)), (1L, at(4, 9)),
      (2L, at(1, 7)),
      (3L, at(4, 2)))
      .toDF("user_id", "ts")
    val base = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toInt
    val rows = EventOps.e33From(ev).collect().map(_.toSeq).toSeq
    assert(rows == Seq(
      Seq(base, 2L, 0L, 0L, 0L),
      Seq(base + 1, 0L, 1L, 0L, 1L),
      Seq(base + 2, 0L, 0L, 0L, 1L),
      Seq(base + 3, 1L, 0L, 1L, 0L)), s"got $rows")
  }

  test("e33: growth-accounting identity on real data — actives(D) = " +
      "new + retained + resurrected, every day") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("e33_growth_accounting")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    val actives = graft.Tables(spark, sf, "events")
      .select($"user_id",
        datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
          .cast("int").as("di"))
      .distinct().groupBy($"di").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(actives.nonEmpty &&
      actives.forall { case (di, n) => got.getOrElse(di, 0L) == n },
      s"identity broken: $got vs $actives")
  }

  test("e30 decimal→long surface cast is exact on a planted extreme") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-06-30 12:00:00")
    // 9e7 value → 9e9 cents → 9e15 micro-score: far beyond any real
    // per-event value yet still well inside int64 — cast must be exact
    val got = EventOps.e30From(
        Seq((1L, ts, 9.0e7)).toDF("user_id", "ts", "value"))
      .select($"total_cents", $"score_micro").first()
    assert(got.getLong(0) == 9000000000L)
    assert(got.getLong(1) == 9000000000000000L)
  }
}
