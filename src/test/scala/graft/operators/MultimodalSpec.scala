package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, deterministic stub decode, frame
  * sampling, and the typed mapPartitions path.
  */
class MultimodalSpec extends SparkTestBase {

  test("asMedia: binary payload + metadata struct") {
    val m = Multimodal.asMedia(spark, sf)
    val f = m.schema("payload")
    assert(f.dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "n_bytes", "origin"))
    val r = m.select(col("meta.n_bytes"), length(col("payload"))).head()
    assert(r.getInt(0) == r.getInt(1))
  }

  test("decodeStub is deterministic and fixed-size") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val a = Multimodal.decodeStub(bytes)
    val b = Multimodal.decodeStub(bytes)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 8)
    assert(a.forall(v => v >= 0 && v <= 1.001))
  }

  test("frameSample takes every k-th byte") {
    val bytes = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.frameSample(bytes, 3).toSeq == Seq[Byte](0, 3, 6, 9))
  }

  test("decodeFeatures: typed mapPartitions path, one row per doc") {
    val feats = Multimodal.decodeFeatures(spark, sf)
    val docs = graft.Tables.documents(spark, sf).count()
    assert(feats.count() == docs)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "n_frames", "features"))
    val r = feats.orderBy("doc_id").head()
    assert(r.getAs[scala.collection.Seq[Double]]("features").length == 8)
    assert(r.getInt(2) > 0)
  }
}
