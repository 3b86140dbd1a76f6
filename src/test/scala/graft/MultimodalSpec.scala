package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binary payload plumbing: schema, determinism, partition batching") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withPayload = Multimodal.withPayload(docs)
    assert(withPayload.schema("payload").dataType.typeName === "binary")

    val meta = Multimodal.decodeMeta(withPayload).cache()
    assert(meta.schema === Multimodal.metaSchema)
    assert(meta.count() === docs.count())
    assert(meta.where(col("n_bytes") <= 0).count() === 0)
    assert(meta.where(col("width") < 1 || col("height") < 1 || col("n_frames") < 1).count() === 0)
    // deterministic stub: same input → same metadata across runs
    val a = Multimodal.decodeMeta(withPayload).orderBy("doc_id").collect()
    val b = Multimodal.decodeMeta(withPayload.repartition(7)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    meta.unpersist()
  }
}
