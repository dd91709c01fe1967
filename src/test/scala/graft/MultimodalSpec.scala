package graft

import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSpec {

  test("media table carries opaque bytes + typed metadata") {
    val m = MultimodalOps.mediaTable(spark, Sf)
    val row = m.filter(_.media_id == 0).head()
    assert(row.kind == "image")
    assert(row.bytes.nonEmpty)
    assert(row.meta.channels == 3)
  }

  test("feature extraction is deterministic and fixed-width") {
    val f1 = MultimodalOps.extractFeatures(MultimodalOps.mediaTable(spark, Sf))
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(MultimodalOps.mediaTable(spark, Sf))
      .filter(_.media_id < 10).collect().sortBy(_.media_id)
    assert(f1.forall(_.features.length == MultimodalOps.FeatureDim))
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq)
    }
  }

  test("frame sampling yields strided frames for videos only") {
    val frames = MultimodalOps.sampleFrames(
      MultimodalOps.mediaTable(spark, Sf), stride = 2)
    val kinds = frames.toDF().select("media_id").distinct()
      .join(MultimodalOps.mediaTable(spark, Sf).toDF(), "media_id")
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("video"))
    val idx = frames.filter(_.media_id == 2).collect().map(_.frame_idx).sorted
    assert(idx.zipWithIndex.forall { case (f, i) => f == i * 2 })
  }

  test("resize keeps aspect bookkeeping") {
    val resized = MultimodalOps.resizeMeta(
      MultimodalOps.mediaTable(spark, Sf), targetW = 32)
    resized.collect().foreach { m =>
      assert(m.meta.width == 32 && m.meta.height >= 1)
    }
  }
}
