package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Multimodal plumbing: binary payloads, typed metadata, decode
  * boundary via mapPartitions, frame fan-out determinism.
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("assets: binary payload bytes round-trip the document text") {
    val rows = Multimodal.assets(spark, dir).limit(10).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]]("bytes")
      assert(new String(bytes, "UTF-8") == docs(id))
      val meta = r.getStruct(3)
      assert(meta.getAs[Long]("nBytes") == bytes.length.toLong)
      assert(Set("image", "audio", "video")(r.getString(1)))
    }
  }

  test("decodeAssets: stub decoder runs partition-parallel and is deterministic") {
    val d1 = Multimodal.decodeAssets(Multimodal.assets(spark, dir))
      .collect().map(d => d.assetId -> d).toMap
    val d2 = Multimodal.decodeAssets(Multimodal.assets(spark, dir).repartition(7))
      .collect().map(d => d.assetId -> d).toMap
    assert(d1.keySet == d2.keySet)
    for ((id, d) <- d1) {
      assert(d == d2(id)) // partitioning must not change decode output
      assert(d.width >= 16 && d.width < 80 && d.nFrames >= 1)
    }
  }

  test("mmFrames: offsets within payload, at most 8 frames, video only") {
    val rows = Multimodal.mmFrames(spark, dir).collect()
    assert(rows.nonEmpty)
    val byAsset = rows.groupBy(_.getLong(0))
    for ((id, fs) <- byAsset) {
      assert(id % 3 == 2)
      assert(fs.length <= 8)
      assert(fs.map(_.getLong(1)).sorted.sameElements(0L until fs.length))
    }
  }
}
