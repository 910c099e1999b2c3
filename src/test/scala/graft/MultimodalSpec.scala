package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaAsset

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def asset(id: Long, tpe: String, bytes: Array[Byte],
                    w: Int = 4, h: Int = 3, frames: Int = 4) =
    MediaAsset(id, tpe, bytes, w, h, frames)

  test("featurize computes byte stats, entropy, and hash per asset") {
    val ds = Seq(
      asset(1, "image", Array[Byte](0, 0, 0, 0)),
      asset(2, "image", Array[Byte](0, 1, 2, 3)),
      asset(3, "image", Array.emptyByteArray)).toDS()
    val f = Multimodal.featurize(ds).collect().sortBy(_.asset_id)
    assert(f(0).n_bytes == 4 && f(0).mean_byte == 0.0 && f(0).byte_entropy_bits == 0.0)
    assert(f(1).mean_byte == 1.5 && math.abs(f(1).byte_entropy_bits - 2.0) < 1e-12)
    assert(f(2).n_bytes == 0)
    // md5 of the exact bytes
    assert(f(0).content_hash ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(Array[Byte](0, 0, 0, 0)).map("%02x".format(_)).mkString)
  }

  test("decode is deterministic and length-preserving") {
    val ds = Seq(asset(1, "image", Array[Byte](1, 2, 3, 4, 5))).toDS()
    val once = Multimodal.decode(ds).collect().head.content
    val twice = Multimodal.decode(ds).collect().head.content
    assert(once.toSeq == twice.toSeq && once.length == 5)
    assert(once.toSeq != Seq[Byte](1, 2, 3, 4, 5)) // actually transformed
  }

  test("resize produces dstW*dstH bytes and updates metadata") {
    val ds = Seq(asset(1, "image", Array.tabulate[Byte](12)(_.toByte), w = 4, h = 3)).toDS()
    val r = Multimodal.resize(ds, 2, 2).collect().head
    assert(r.width == 2 && r.height == 2 && r.content.length == 4)
    // nearest-neighbor picks source pixels deterministically
    assert(Multimodal.resize(ds, 2, 2).collect().head.content.toSeq == r.content.toSeq)
  }

  test("frameSample slices videos into n_frames chunks, every Nth") {
    val ds = Seq(
      asset(1, "video", Array.tabulate[Byte](8)(_.toByte), frames = 4),
      asset(2, "image", Array.tabulate[Byte](8)(_.toByte), frames = 4)).toDS()
    val all = Multimodal.frameSample(ds).collect().sortBy(f => (f.asset_id, f.frame_idx))
    assert(all.map(_.asset_id).toSet == Set(1L)) // images skipped
    assert(all.length == 4 && all.forall(_.frame_bytes.length == 2))
    val everyOther = Multimodal.frameSample(ds, everyNth = 2).collect()
    assert(everyOther.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
  }

  test("syntheticAssets derives a typed binary asset table from documents") {
    val docs = Seq((1L, "hello world"), (2L, "abc"), (5L, "xyz"))
      .toDF("doc_id", "text")
    val assets = Multimodal.syntheticAssets(docs).collect().sortBy(_.asset_id)
    assert(assets.map(_.media_type).toSeq == Seq("audio", "video", "video"))
    assert(assets(0).content.toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(assets(0).width == 17 && assets(0).n_frames == 2)
  }
}
