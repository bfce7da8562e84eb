package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property specs for the round-14 operators — planted
  * cases pin the designed behaviors; these sweep the input space the
  * designer did NOT think of. Every generator is seeded, so failures
  * reproduce. */
class Round14RandomSpec extends AnyFunSuite {
  import graft.SharedSpark._

  private def digest(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("q63: over random point sets, ANY ≤ k random deletions fold " +
      "from k+1 layers to exactly the from-scratch skyline — and the " +
      "repair cycle keeps it exact (seeds 1..5)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val pts = (1L to 60L).map(i =>
        (i, (rng.nextInt(500) + 1) / 100.0, rng.nextInt(20) + 1))
        .toDF("p_partkey", "p_retailprice", "p_size")
      // arbitrary victims (frontier or dominated — the theorem holds
      // for both), up to the k = 2 budget
      val vic = rng.shuffle((1L to 60L).toList).take(2)
      val d1 = vic.toDF("p_partkey")
      val live1 = pts.join(d1, Seq("p_partkey"), "left_anti")
      val ls = RelationalOps.skylineLayers(pts, 3)
      try assert(digest(RelationalOps.q63Fold(ls, d1)) ==
        digest(RelationalOps.q56From(live1)), s"fold diverged, seed $seed")
      finally ls.foreach(DedupOps.unpersistCheckpointed)
      // repair + second deletion batch
      val vic2 = rng.shuffle((1L to 60L).filterNot(vic.contains).toList)
        .take(2)
      val d2 = vic2.toDF("p_partkey")
      val ls2 = RelationalOps.skylineLayers(live1, 3)
      try assert(digest(RelationalOps.q63Fold(ls2, d2)) ==
        digest(RelationalOps.q56From(
          live1.join(d2, Seq("p_partkey"), "left_anti"))),
        s"post-repair fold diverged, seed $seed")
      finally ls2.foreach(DedupOps.unpersistCheckpointed)
    }
  }

  test("d22: UNCAPPED blocking equals the quadratic truth arm on " +
      "seeded random corpora dense with near-pairs (seeds 1..3)") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(100 + seed)
      // small alphabet + shared base strings ⇒ many pairs near the
      // K = 8 threshold, exercising every segment/displacement path
      val bases = Vector.fill(4)(
        (1 to DedupOps.D22PrefixLen).map(_ => ('a' + rng.nextInt(3)).toChar)
          .mkString)
      val docs = (1L to 40L).map { i =>
        var s = bases(rng.nextInt(bases.size))
        val edits = rng.nextInt(12) // 0..11 — both sides of the threshold
        for (_ <- 0 until edits)
          s = s.updated(rng.nextInt(s.length), ('a' + rng.nextInt(3)).toChar)
        (i, if (rng.nextInt(5) == 0) "de" else "en", s)
      }.toDF("doc_id", "lang", "pre")
      assert(digest(DedupOps.d22From(docs, Int.MaxValue)
          .drop("n_capped_keys")) ==
        digest(DedupOps.d22Naive(docs)), s"seed $seed")
    }
  }

  test("t28: the full capped pipeline equals an independent Scala " +
      "reimplementation on seeded random corpora (seeds 1..3)") {
    import spark.implicits._
    def winnowBrute(text: String): Set[Long] = {
      val toks = text.split(" ", -1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val n = TextOps.T28Gram; val w = TextOps.T28Win
      val hs = (0 to toks.length - n).map { i =>
        val d = md.digest(toks.slice(i, i + n).mkString(" ")
          .getBytes("UTF-8"))
        var acc = 0L
        for (b <- 0 until 7) acc = (acc << 8) | (d(b) & 0xffL)
        (acc << 4) | ((d(7) & 0xffL) >>> 4)
      }
      (0 to hs.length - w).map(s => hs.slice(s, s + w).min).toSet
    }
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(200 + seed)
      // docs are random splices of a small shared-phrase pool, so
      // verbatim runs (→ shared fingerprints, pairs) actually occur,
      // and popular phrases push fingerprints over the cap
      val phrases = Vector.fill(6)(
        (0 until 12).map(_ => s"w${rng.nextInt(400)}").mkString(" "))
      val texts = (1L to 30L).map { i =>
        (i, (0 until 2 + rng.nextInt(3))
          .map(_ => phrases(rng.nextInt(phrases.size))).mkString(" "))
      }
      val cap = 10
      // independent pipeline: fingerprints → df-cap → pairs ≥ threshold
      val fpdocs = scala.collection.mutable.Map[Long, Set[Long]]()
      texts.foreach { case (id, t) =>
        winnowBrute(t).foreach(f =>
          fpdocs(f) = fpdocs.getOrElse(f, Set.empty) + id)
      }
      val hot = fpdocs.filter(_._2.size > cap).keySet
      val share = scala.collection.mutable.Map[(Long, Long), Long]()
      fpdocs.foreach { case (f, ds) =>
        if (!hot(f)) for (a <- ds; b <- ds if a < b)
          share((a, b)) = share.getOrElse((a, b), 0L) + 1
      }
      val expect = share.toSeq
        .filter(_._2 >= TextOps.T28MinShared)
        .map { case ((a, b), c) => Seq[Any](a, b, c, hot.size.toLong) }
        .sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
      val got = digest(TextOps.t28From(texts.toDF("doc_id", "text"), cap))
      assert(got == expect, s"seed $seed: got ${got.take(3)} " +
        s"expect ${expect.take(3)}")
    }
  }

  test("streaming skyline: a seeded random insert/delete batch " +
      "sequence — repair triggers included — serves the from-scratch " +
      "frontier after every batch") {
    import spark.implicits._
    import graft.streaming.{EpochStore, StreamOps}
    val store = new EpochStore("graft_state_rsky", "crash",
      StreamOps.SkylineTables)
    store.destroy(spark)
    val rng = new scala.util.Random(42)
    var nextId = 1000L
    var corpusRows = (1L to 40L).map(i =>
      (i, (rng.nextInt(500) + 1) / 100.0, rng.nextInt(20) + 1))
    val corpus = corpusRows.toDF("p_partkey", "p_retailprice", "p_size")
    var live = corpusRows
    def serve() = StreamOps
      .skylineServe(spark, "graft_state_rsky", "crash")
      .select($"p_partkey").as[Long].collect().toSet
    def truth() = RelationalOps.q56From(
        live.toDF("p_partkey", "p_retailprice", "p_size"))
      .select($"p_partkey").as[Long].collect().toSet
    for (step <- 1 to 12) {
      val ins = (0 until rng.nextInt(3)).map { _ =>
        nextId += 1
        (nextId, (rng.nextInt(500) + 1) / 100.0, rng.nextInt(20) + 1,
          "insert")
      }
      // deletions drawn from anywhere live (frontier or not); batch
      // sizes 0..3 cross the k = 2 repair budget repeatedly
      val dels = rng.shuffle(live.map(_._1).toList)
        .take(rng.nextInt(4))
        .map(id => (id, 0.0, 0, "delete"))
      val batch = (ins ++ dels)
        .toDF("p_partkey", "p_retailprice", "p_size", "op")
      StreamOps.skylineBatch(batch, corpus, "graft_state_rsky", "crash")
      live = live ++ ins.map(r => (r._1, r._2, r._3))
      val dead = dels.map(_._1).toSet
      live = live.filterNot(r => dead(r._1))
      assert(serve() == truth(), s"diverged at step $step " +
        s"(ins=${ins.size}, dels=${dels.size})")
    }
    store.destroy(spark)
  }
}
