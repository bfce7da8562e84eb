package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Bounds the driver-facing bench stdout line (r13 verdict #2): the
  * r12/r13 driver artifacts arrived `"parsed": null` because the
  * per-query line (~8 KB) overflowed the driver's ~2.2 KB stdout tail
  * capture. The compact line must stay well under that window AT THE
  * FULL CURRENT QUERY SURFACE — this spec builds it from the real
  * `SparkEntry.queries` key set, so growing the surface re-checks the
  * bound automatically — and must stay valid JSON with the fields the
  * driver contract names (metric/value/unit/queries/failed/sf). */
class BenchLineSpec extends AnyFunSuite {

  private def realisticInputs = {
    // worst-case-ish values: multi-digit seconds everywhere
    val results = SparkEntry.queries.keySet.toSeq.sorted
      .map(n => n -> 12.345678901234)
    val anchorNames =
      Seq("q1_agg", "q4_topk", "s1_knn_brute", "t1_token_stats", "__iter")
    val anchors = anchorNames.map(_ -> 2.0499999)
    // child-anchor keys: pre/post + one per family letter (s bisected)
    // + every solo query — mirror of the orchestrator's keying
    val fams = SparkEntry.queries.keySet.map(_.takeWhile(!_.isDigit))
      .toSeq.sorted.flatMap(f => if (f == "s") Seq("s_a", "s_b") else Seq(f))
    val solos = Seq("q39_graph_converge", "q44_triangles", "q47_kcore",
      "q48_triangles_day2", "q49_components", "q50_components_day2",
      "q52_components_retract", "d21_band_tuning")
    val childAnchors =
      (Seq("pre") ++ fams ++ solos ++ Seq("post")).map(_ -> 2.0499999)
    (results, anchors, childAnchors)
  }

  test("compact line stays under the driver's capture window at the " +
      "full query surface and parses as JSON with the contract fields") {
    val (results, anchors, childAnchors) = realisticInputs
    val line = Bench.compactLine(results, "/root/testdata/sf0.1",
      anchors, anchors, childAnchors, 2232.123456, "BENCH_detail.json")
    assert(line.length < 1500,
      s"compact line is ${line.length} bytes — overflows the driver's " +
        s"~2.2 KB tail capture margin:\n$line")
    val node = new ObjectMapper().readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("value").asDouble > 0)
    assert(node.get("queries").isObject && node.get("queries").size >= 8)
    assert(node.get("failed").isArray && node.get("failed").size == 0)
    assert(node.get("n_queries").asInt == SparkEntry.queries.size)
    assert(node.get("sf").asText.endsWith("sf0.1"))
    assert(node.get("child_anchors").size == childAnchors.size)
  }

  test("failed queries survive the compaction by full name and are " +
      "excluded from the total") {
    val (results, anchors, childAnchors) = realisticInputs
    val broken = results.map {
      case ("d22_editdist_join", _) => "d22_editdist_join" -> -1.0
      case kv => kv
    }
    val line = Bench.compactLine(broken, "sf", anchors, anchors,
      childAnchors, 1.0, "p")
    val node = new ObjectMapper().readTree(line)
    assert(node.get("failed").get(0).asText == "d22_editdist_join")
    val expect = (results.size - 1) * 12.345678901234
    assert(math.abs(node.get("value").asDouble - expect) < 0.01)
  }

  test("string fields are JSON-escaped — a path with quotes or " +
      "backslashes must not reproduce the parsed:null failure " +
      "(r14 ADVICE)") {
    val (results, anchors, childAnchors) = realisticInputs
    val evilPath = """/tmp/w"eird\dir/BENCH_detail.json"""
    val evilSf = "/root/test\"data\\sf0.1"
    val line = Bench.compactLine(results, evilSf, anchors, anchors,
      childAnchors, 1.0, evilPath)
    val node = new ObjectMapper().readTree(line) // throws if invalid
    assert(node.get("detail").asText == evilPath)
    assert(node.get("sf").asText == evilSf)
  }
}
