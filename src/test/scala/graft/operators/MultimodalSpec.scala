package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abc"), (2L, "A longer payload simulating an image blob")
  ).toDF("doc_id", "text")

  test("payload + metadata layout and deterministic stub decode") {
    val withP = Multimodal.withPayload(docs, "doc_id", "text")
    assert(withP.schema("payload").dataType.typeName == "binary")
    val f = Multimodal.decodeFeatures(withP).collect()
      .map(m => m.doc_id -> m).toMap
    assert(f(1L).n_bytes == 3 && f(1L).width == 4 && f(1L).channels == 1)
    // "abc" → (97+98+99)/3 = 98.0
    assert(f(1L).mean_intensity == 98.0)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(withP).collect()
      .map(m => m.doc_id -> m.mean_intensity).toMap
    assert(again(2L) == f(2L).mean_intensity)
  }

  test("frame sampling fans one payload into ordered frame rows") {
    val frames = Multimodal.sampleFrames(
      Multimodal.withPayload(docs, "doc_id", "text"), stride = 10)
      .filter($"doc_id" === 2L)
    val n = frames.count()
    assert(n == 4) // 42 bytes / 10 → 4 full frames
    assert(frames.agg(max("frame_no")).head().getInt(0) == 3)
  }
}
