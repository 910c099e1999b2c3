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

  test("real Y4M roundtrip is frame-exact; junk and truncation fail loudly") {
    val (w, h) = (6, 4)
    // gradient frames (not constant fill) prove byte ORDER survives
    val frames = Array.tabulate(3)(f =>
      Array.tabulate[Byte](w * h)(i => ((f * 89 + i * 13) % 256).toByte))
    val y4m = Multimodal.encodeVideoKernel(frames, w, h, fps = 30)
    // a real Y4M stream any tool reads: ASCII magic + tagged header
    assert(new String(y4m.take(9), "US-ASCII") == "YUV4MPEG2")
    assert(new String(y4m.takeWhile(_ != '\n'.toByte), "US-ASCII")
      .contains(s"W$w"))
    val (back, dw, dh) = Multimodal.decodeVideoKernel(y4m)
    assert(dw == w && dh == h && back.length == 3)
    back.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // unknown header tags and frame parameters are tolerated per spec
    val tagged = ("YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono Xgraft\n" +
      "FRAME Xtag\n").getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    val (tf, _, _) = Multimodal.decodeVideoKernel(tagged)
    assert(tf.length == 1 && tf(0).toSeq == Seq[Byte](1, 2, 3, 4))
    // loud failures: junk, truncated frame, non-mono colorspace
    intercept[Exception] { Multimodal.decodeVideoKernel("not video".getBytes) }
    intercept[Exception] { Multimodal.decodeVideoKernel(y4m.dropRight(1)) }
    intercept[Exception] { Multimodal.decodeVideoKernel(
      "YUV4MPEG2 W2 H2 C420\nFRAME\n".getBytes("US-ASCII") ++ new Array[Byte](6)) }
  }

  test("frameSample demuxes the real container distributed, every Nth") {
    val (w, h) = (4, 3)
    def vid(id: Long, n: Int) = MediaAsset(id, "video",
      Multimodal.encodeVideoKernel(
        Array.tabulate(n)(f => Array.tabulate[Byte](w * h)(i => (f * 10 + i).toByte)),
        w, h), w, h, n)
    val ds = Seq(vid(1, 4),
      asset(2, "image", Array.tabulate[Byte](8)(_.toByte), frames = 4)).toDS()
    val all = Multimodal.frameSample(ds).collect().sortBy(f => (f.asset_id, f.frame_idx))
    assert(all.map(_.asset_id).toSet == Set(1L)) // images skipped
    assert(all.length == 4 && all.forall(_.frame_bytes.length == w * h))
    // frame content is the decoded plane, not a byte slice of the container
    assert(all(1).frame_bytes.toSeq ==
      Array.tabulate[Byte](w * h)(i => (10 + i).toByte).toSeq)
    val everyOther = Multimodal.frameSample(ds, everyNth = 2).collect()
    assert(everyOther.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    // metadata/container disagreement is loud, not silent
    val lying = Seq(vid(3, 2).copy(n_frames = 5)).toDS()
    intercept[Exception] { Multimodal.frameSample(lying).collect() }
  }

  test("syntheticVideoAssets: closed-form features match the demuxed frames") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val feats = Multimodal.frameFeatures(
      Multimodal.frameSample(Multimodal.syntheticVideoAssets(docs)))
      .collect().sortBy(f => (f.asset_id, f.frame_idx))
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val id = f.asset_id
      val plane = (id % 16 + 8) * (id % 12 + 6)
      val fill = (id * 31 + f.frame_idx * 7) % 256
      assert(f.n_frame_bytes == plane)
      assert(f.sum_bytes == fill * plane)
      assert(f.min_byte == fill && f.max_byte == fill)
    }
  }

  test("frameMotion sums per-pixel |luma diff| between consecutive frames") {
    import graft.multimodal.Multimodal.Frame
    val frames = Seq(
      Frame(1L, 0, Array[Byte](10, 20, 30)),
      Frame(1L, 1, Array[Byte](12, 17, 30)), // |2| + |3| + |0| = 5
      Frame(1L, 2, Array[Byte](0, 0, 0)),    // 12 + 17 + 30 = 59
      Frame(2L, 0, Array[Byte](5, 5))        // single frame: no transition
    ).toDS()
    val out = Multimodal.frameMotion(frames).collect()
      .sortBy(m => (m.asset_id, m.frame_idx))
    assert(out.length == 2)
    assert(out(0).frame_idx == 1 && out(0).sum_abs_diff == 5L && out(0).n_bytes == 3L)
    assert(out(1).frame_idx == 2 && out(1).sum_abs_diff == 59L)
    // closed form on the real Y4M demux path
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val motion = Multimodal.frameMotion(Multimodal.frameSample(
      Multimodal.syntheticVideoAssets(docs))).collect()
    assert(motion.nonEmpty)
    motion.foreach { m =>
      val id = m.asset_id
      val plane = (id % 16 + 8) * (id % 12 + 6)
      val diff = math.abs((id * 31 + m.frame_idx * 7) % 256 -
        (id * 31 + (m.frame_idx - 1) * 7) % 256)
      assert(m.n_bytes == plane && m.sum_abs_diff == plane * diff)
    }
  }

  test("syntheticAssets derives a typed binary asset table from documents") {
    val docs = Seq((1L, "hello world"), (2L, "abc"), (5L, "xyz"))
      .toDF("doc_id", "text")
    val assets = Multimodal.syntheticAssets(docs).collect().sortBy(_.asset_id)
    assert(assets.map(_.media_type).toSeq == Seq("audio", "video", "video"))
    assert(assets(0).content.toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(assets(0).width == 17 && assets(0).n_frames == 2)
  }

  test("real JPEG roundtrip: encodeImageKernel output decodes with true dims") {
    val (w, h) = (24, 16)
    val plane = Array.tabulate[Byte](w * h)(i => (i % 251).toByte)
    val jpeg = Multimodal.encodeImageKernel(plane, w, h, "jpg")
    // a real JFIF bitstream: SOI marker 0xFFD8
    assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
    val (decoded, dw, dh) = Multimodal.decodeImageKernel(jpeg)
    assert(dw == w && dh == h && decoded.length == w * h)
    // JPEG is lossy but close on an 8-bit plane; decode is deterministic
    val mad = decoded.zip(plane).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / (w * h)
    assert(mad < 48.0, s"mean abs diff $mad")
    assert(Multimodal.decodeImageKernel(jpeg)._1.toSeq == decoded.toSeq)
  }

  test("real PNG roundtrip is bit-exact (lossless codec)") {
    val (w, h) = (9, 7)
    val plane = Array.tabulate[Byte](w * h)(i => (i * 37 % 256).toByte)
    val png = Multimodal.encodeImageKernel(plane, w, h, "png")
    val (decoded, dw, dh) = Multimodal.decodeImageKernel(png)
    assert(dw == w && dh == h && decoded.toSeq == plane.toSeq)
  }

  test("averageHash + phashNearDups: identical images collide, one-pixel twins stay near, inverted images never pair") {
    def png(plane: Array[Byte], w: Int, h: Int) =
      Multimodal.encodeImageKernel(plane, w, h, "png")
    val (w, h) = (20, 14)
    val base = Array.tabulate[Byte](w * h)(i => ((i * 31 + 7) % 256).toByte)
    val twin = base.clone(); twin(0) = (((base(0) & 0xff) + 128) % 256).toByte
    val inverted = base.map(b => (255 - (b & 0xff)).toByte)
    val assets = Seq(
      MediaAsset(0L, "image", png(base, w, h), w, h, 1),
      MediaAsset(1L, "image", png(base, w, h), w, h, 1),      // exact dup
      MediaAsset(2L, "image", png(twin, w, h), w, h, 1),      // near dup
      MediaAsset(3L, "image", png(inverted, w, h), w, h, 1))  // far
      .toDS()
    val hashes = Multimodal.averageHash(assets)
    val hm = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hm(0L) == hm(1L), "identical bitstreams must hash identically")
    assert(hm.values.forall(_ >= 0L), "60-bit hash must stay non-negative")
    assert(java.lang.Long.bitCount(hm(0L) ^ hm(3L)) > 3,
      "inversion must flip most threshold bits")
    val pairs = Multimodal.phashNearDups(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 0L)
    // the one-pixel twin sits within the band budget of BOTH copies
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(pairs((0L, 2L)) <= 3L)
    // the inverted image pairs with nothing
    assert(!pairs.keys.exists(k => k._1 == 3L || k._2 == 3L))
    // banding is a SCREEN, not a weaker metric: every emitted pair
    // carries its exact popcount distance
    pairs.foreach { case ((a, b), d) =>
      assert(java.lang.Long.bitCount(hm(a) ^ hm(b)) == d)
    }
  }

  test("decodeImages runs the real codec distributed over synthetic JPEG assets") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "jumps over"), (3L, "lazy dogs"))
      .toDF("doc_id", "text")
    val assets = Multimodal.syntheticImageAssets(docs)
    val decoded = Multimodal.decodeImages(assets).collect().sortBy(_.asset_id)
    assert(decoded.length == 3)
    decoded.foreach { a =>
      assert(a.media_type == "image")
      assert(a.content.length == a.width * a.height) // plane, not bitstream
      assert(a.width == (a.asset_id % 32 + 16).toInt &&
        a.height == (a.asset_id % 24 + 12).toInt)
    }
    // PNG variant decodes to the exact tiled source plane
    val png = Multimodal.decodeImages(
      Multimodal.syntheticImageAssets(docs, format = "png"))
      .collect().sortBy(_.asset_id)
    val jpgMad = decoded.zip(png).map { case (j, p) =>
      j.content.zip(p.content).map { case (a, b) =>
        math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / j.content.length }
    assert(jpgMad.forall(_ < 48.0), s"jpeg drifted: $jpgMad")
  }

  test("real WAV roundtrip is bit-exact and tolerates unknown RIFF chunks") {
    val samples = Array.tabulate[Short](777)(i => ((i * 31 - 9000) % 32767).toShort)
    val wav = Multimodal.encodeWavKernel(samples, 44100, 1)
    val (back, rate, ch) = Multimodal.decodeWavKernel(wav)
    assert(back.sameElements(samples) && rate == 44100 && ch == 1)
    // stereo block alignment honored
    val st = Multimodal.encodeWavKernel(Array[Short](1, -1, 2, -2), 8000, 2)
    assert(Multimodal.decodeWavKernel(st)._3 == 2)
    // an unknown (odd-sized, padded) chunk before `data` is skipped
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 65, 66, 67, 0) // size 3 + pad byte
    val patched = wav.take(36) ++ listChunk ++ wav.drop(36)
    val patchedBuf = java.nio.ByteBuffer.wrap(patched)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    patchedBuf.putInt(4, patched.length - 8) // fix RIFF size
    val (back2, _, _) = Multimodal.decodeWavKernel(patched)
    assert(back2.sameElements(samples))
    // junk and non-PCM16 payloads fail loudly, not silently
    intercept[Exception] { Multimodal.decodeWavKernel("not a wav".getBytes) }
    val bad = wav.clone()
    bad(34) = 8 // bits-per-sample: claim PCM8
    intercept[Exception] { Multimodal.decodeWavKernel(bad) }
  }

  test("featurizeAudio decodes the real WAV assets distributed, features match closed form") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(60)
    val feats = Multimodal.featurizeAudio(Multimodal.syntheticAudioAssets(docs))
      .collect().sortBy(_.asset_id)
    assert(feats.length == 60)
    feats.foreach { f =>
      val id = f.asset_id
      val n = id % 400 + 100
      val period = id % 37 + 8
      val amp = ((id % 5 + 1) * 4000).toInt
      assert(f.n_samples == n && f.sample_rate == 8000 && f.n_channels == 1)
      assert(f.rms == amp.toDouble && f.peak == amp)
      assert(f.zero_crossings == (n - 1) / period,
        s"id=$id zc=${f.zero_crossings} expected ${(n - 1) / period}")
    }
  }

  test("crossModalClusters merges duplicate groups ACROSS modalities with honest per-member evidence") {
    import spark.implicits._
    // the canonical cross-modal case: A~B by paraphrase-tolerant TEXT
    // similarity, B~C by re-encoded IMAGE similarity — no single
    // modality links A to C, the shared clustering must
    val textPairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val imagePairs = Seq((2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val out = graft.dedup.Dedup.crossModalClusters(textPairs, imagePairs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // one cluster {1,2,3} rooted at min member; evidence flags name
    // which modality held EACH member in
    assert(out(1L) == ((1L, 1L, 0L)))           // text-only member
    assert(out(2L) == ((1L, 1L, 1L)))           // the bridge: both
    assert(out(3L) == ((1L, 0L, 1L)))           // image-only member
    // an image-only pair clusters without any text evidence
    assert(out(7L) == ((7L, 0L, 1L)) && out(8L) == ((7L, 0L, 1L)))
    assert(out.size == 5)
  }
}
