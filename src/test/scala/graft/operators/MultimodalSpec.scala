package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

class MultimodalSpec extends AnyFunSuite {
  import SharedSpark._

  test("media records carry payload bytes + typed metadata") {
    val recs = MultimodalOps.buildMedia(spark, sf).collect()
    assert(recs.length == 500)
    recs.take(10).foreach { r =>
      assert(r.payload.nonEmpty)
      assert(r.meta.n_bytes == r.payload.length)
      assert(Set("image/fake", "audio/fake", "video/fake").contains(r.meta.mime))
      assert(r.meta.width >= 16 && r.meta.height >= 16)
    }
  }

  test("batched feature extraction is deterministic and complete") {
    val media = MultimodalOps.buildMedia(spark, sf)
    val feats = MultimodalOps.extractFeatures(media, batchSize = 7).collect()
    assert(feats.length == 500)
    val byId = feats.map(f => f.doc_id -> f).toMap
    val sample = MultimodalOps.buildMedia(spark, sf).collect().take(5)
    sample.foreach { r =>
      val f = byId(r.doc_id)
      assert(f.n_bytes == r.payload.length)
      // thumbnail keeps every 4th byte
      assert(f.thumb_n_bytes == (r.payload.length + 3) / 4)
      // histogram head matches a direct recount
      val hist = MultimodalOps.FakeCodec.decode(r.payload)
      assert(f.head_histogram == hist.take(8).toSeq)
      assert(f.entropy_milli == MultimodalOps.FakeCodec.entropyMilli(hist, f.n_bytes))
    }
  }

  test("m2 query shape: one feature row per document") {
    val df = MultimodalOps.m2MediaFeatures(spark, sf)
    assert(df.columns.toSeq == Seq("doc_id", "n_bytes", "entropy_milli", "thumb_n_bytes"))
    assert(df.count() == 500)
  }
}
