package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * All three codecs are REAL bitstream formats, no external library
  * needed: IMAGE via javax.imageio (JPEG/PNG), AUDIO via a RIFF/PCM16
  * WAV reader+writer, VIDEO via a YUV4MPEG2 (Y4M, Cmono) container
  * reader+writer — every encoded payload is a file a third-party tool
  * (ffmpeg, mplayer, sox, any image viewer) would read. Compressed
  * video bitstreams (H.264 etc.) would need an ffmpeg-class native
  * demuxer that the JVM doesn't ship; the container layer — which is
  * what the Spark operators touch — is complete, and a compressed
  * decoder would slot in behind [[decodeVideoKernel]] without touching
  * any operator.
  *
  * Scale notes: every operator is a per-partition map over the binary
  * column — no shuffle. Batched iteration inside `mapPartitions` keeps
  * per-row overhead constant (the same batch shape a vectorized UDF
  * would use), and binary payloads never leave the executor.
  */
object Multimodal {

  // javax.imageio defaults to FILE-backed stream caches: every
  // ImageIO.write/read call creates (and deletes) a temp file on
  // local disk. The codec output is byte-identical either way; at
  // thousands of encode/decode calls per partition the temp-file
  // churn dominates the kernels. Memory-backed caches instead —
  // set once per JVM when this object loads (kernels are members,
  // so any executor touching them initializes the object first).
  javax.imageio.ImageIO.setUseCache(false)

  /** A media asset row: opaque payload + typed metadata. */
  case class MediaAsset(
      asset_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  /** Extracted per-asset features. */
  case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      byte_entropy_bits: Double,
      content_hash: String)

  /** One sampled frame of a video asset. */
  case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  // ------------------------------------------------------------------
  // Byte-plane kernels shared by the generic (format-agnostic)
  // operators `decode` and `resize`.
  // ------------------------------------------------------------------

  /** Deterministic, invertible byte-mixing transform (prefix-XOR
    * rolling): the format-agnostic payload transform behind the
    * generic [[decode]] operator and the plane scrambler for
    * [[syntheticImageAssets]]. Cheap, length-preserving, and exactly
    * reproducible in the DuckDB oracle (a bit_xor window), which is
    * what makes the composed multimodal pipeline hash-checkable
    * end-to-end. Format-aware decoding lives in the real codec
    * kernels ([[decodeImageKernel]], [[decodeWavKernel]],
    * [[decodeVideoKernel]]). */
  private def decodeBytes(content: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](content.length)
    var acc: Byte = 0
    var i = 0
    while (i < content.length) {
      acc = (content(i) ^ acc).toByte
      out(i) = acc
      i += 1
    }
    out
  }

  /** Nearest-neighbor plane resampler (the standard cheap resize;
    * bilinear would change only this kernel). Indexing is guarded
    * modulo the payload length so metadata-declared dims that exceed
    * the actual plane can't read out of bounds — for a true
    * `srcW*srcH` plane the modulo is a no-op. Exactly reproduced in
    * the DuckDB oracle via the same index map. */
  private def resizeKernel(content: Array[Byte], srcW: Int, srcH: Int,
                           dstW: Int, dstH: Int): Array[Byte] = {
    if (content.isEmpty || srcW <= 0 || srcH <= 0) return Array.emptyByteArray
    val out = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = math.min(srcH - 1, y * srcH / dstH)
      var x = 0
      while (x < dstW) {
        val sx = math.min(srcW - 1, x * srcW / dstW)
        out(y * dstW + x) = content((sy.toLong * srcW + sx).toInt % content.length)
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // REAL video codec kernels — YUV4MPEG2 (Y4M) with the mono
  // colorspace is a plain byte container (ASCII header + raw luma
  // planes) that ffmpeg/mplayer/x264 all read, so uncompressed video
  // needs no external library either. A compressed bitstream decoder
  // (H.264 etc.) would require a native demuxer the JVM doesn't ship;
  // it would slot in behind decodeVideoKernel without touching any
  // operator.
  // ------------------------------------------------------------------

  /** Encode luma frames as a real YUV4MPEG2 stream: ASCII stream
    * header `YUV4MPEG2 W.. H.. F<fps>:1 Ip A1:1 Cmono\n`, then per
    * frame an ASCII `FRAME\n` marker followed by the raw `w*h` luma
    * plane. Any Y4M-aware tool plays the result. */
  def encodeVideoKernel(frames: Array[Array[Byte]], w: Int, h: Int,
                        fps: Int = 25): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0, s"bad Y4M params: ${w}x$h @$fps")
    frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == w * h, s"frame $i: ${f.length} bytes != ${w}x$h") }
    val header = s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.map(marker.length + _.length).sum)
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** Decode a YUV4MPEG2 stream by walking the container: parse the
    * stream-header tags (W/H required, C must be mono; F/I/A/X
    * tolerated per the spec), then each `FRAME` record — marker,
    * optional frame parameters up to the newline, then exactly one
    * `w*h` luma plane. Truncated or non-Y4M payloads fail loudly.
    * Returns (frames, width, height). */
  def decodeVideoKernel(content: Array[Byte]): (Array[Array[Byte]], Int, Int) = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    require(content.length >= magic.length &&
      java.util.Arrays.equals(content, 0, magic.length, magic, 0, magic.length),
      "not a YUV4MPEG2 stream")
    var i = magic.length
    def restOfLine(): String = {
      val start = i
      while (i < content.length && content(i) != '\n') i += 1
      require(i < content.length, "truncated Y4M header line")
      val s = new String(content, start, i - start, "US-ASCII")
      i += 1
      s
    }
    var w = -1
    var h = -1
    var colorspace = "420" // the Y4M default when no C tag is present
    restOfLine().split(' ').filter(_.nonEmpty).foreach { tag =>
      tag.charAt(0) match {
        case 'W' => w = tag.tail.toInt
        case 'H' => h = tag.tail.toInt
        case 'C' => colorspace = tag.tail
        case _ => () // F (rate) / I (interlace) / A (aspect) / X (meta)
      }
    }
    require(w > 0 && h > 0, s"Y4M header missing W/H")
    require(colorspace.startsWith("mono"),
      s"only Cmono is supported, got C$colorspace")
    val planeLen = w * h
    val frameMagic = "FRAME".getBytes("US-ASCII")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (i < content.length) {
      require(content.length - i >= frameMagic.length &&
        java.util.Arrays.equals(content, i, i + frameMagic.length,
          frameMagic, 0, frameMagic.length),
        s"bad FRAME marker at byte $i (frame ${frames.length})")
      i += frameMagic.length
      restOfLine() // optional frame parameters, ignored
      require(content.length - i >= planeLen,
        s"truncated frame ${frames.length}: ${content.length - i} of $planeLen bytes")
      frames += java.util.Arrays.copyOfRange(content, i, i + planeLen)
      i += planeLen
    }
    (frames.toArray, w, h)
  }

  // ------------------------------------------------------------------
  // REAL image codec kernels — javax.imageio ships in the JDK, so the
  // image modality needs no stub: these encode/decode actual JPEG/PNG
  // bitstreams. (Audio/video kernels above remain documented stand-ins
  // for the absent ffmpeg-class libraries.)
  // ------------------------------------------------------------------

  /** Encode an 8-bit grayscale plane as a real image bitstream
    * ("jpg" or "png") via javax.imageio. */
  def encodeImageKernel(gray: Array[Byte], w: Int, h: Int, format: String): Array[Byte] = {
    require(gray.length == w * h, s"plane ${gray.length} != ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, gray)
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, baos), s"no writer for $format")
    baos.toByteArray
  }

  /** REAL decode via javax.imageio: any format the JDK reads (JPEG,
    * PNG, BMP, GIF); returns the luminance plane + true dimensions. */
  def decodeImageKernel(content: Array[Byte]): (Array[Byte], Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray =
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img
      else {
        val g = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val gr = g.createGraphics()
        gr.drawImage(img, 0, 0, null)
        gr.dispose()
        g
      }
    val plane = new Array[Byte](w * h)
    gray.getRaster.getDataElements(0, 0, w, h, plane)
    (plane, w, h)
  }

  // ------------------------------------------------------------------
  // REAL audio codec kernels — WAV/RIFF PCM16 is a plain byte format,
  // so the audio modality needs no external library either: these
  // write and parse actual RIFF containers any audio tool reads.
  // (Video remains the one documented stand-in — there is no pure-JVM
  // ffmpeg equivalent.)
  // ------------------------------------------------------------------

  /** Decoded audio features. */
  case class AudioFeatures(
      asset_id: Long, n_samples: Long, n_channels: Int, sample_rate: Int,
      duration_ms: Double, rms: Double, zero_crossings: Long, peak: Int)

  /** Encode 16-bit PCM samples as a real WAV (RIFF little-endian)
    * bitstream: RIFF/WAVE header + fmt chunk + data chunk. */
  def encodeWavKernel(samples: Array[Short], sampleRate: Int,
                      channels: Int): Array[Byte] = {
    require(channels >= 1 && sampleRate > 0 && samples.length % channels == 0,
      s"bad WAV params: ${samples.length} samples, $channels ch, $sampleRate Hz")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort)  // block align
    bb.putShort(16)                      // bits per sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Decode a WAV bitstream: walks RIFF chunks (tolerating unknown
    * chunks and odd-size padding per the spec), requires PCM16, returns
    * (samples, sampleRate, channels). */
  def decodeWavKernel(content: Array[Byte]): (Array[Short], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(content)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(bb.remaining() >= 12 && tag4() == "RIFF", "not a RIFF container")
    bb.getInt // declared RIFF size (unchecked: some writers get it wrong)
    require(tag4() == "WAVE", "RIFF but not WAVE")
    var rate = 0
    var channels = 0
    var samples: Array[Short] = null
    while ((rate == 0 || samples == null) && bb.remaining() >= 8) {
      val id = tag4()
      val size = bb.getInt
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val fmt = bb.getShort
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt; bb.getShort
          val bits = bb.getShort
          require(fmt == 1 && bits == 16,
            s"only PCM16 supported, got format=$fmt bits=$bits")
          bb.position(bb.position() + (size - 16) + (size & 1))
        case "data" =>
          val n = math.min(size, bb.remaining()) / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort; i += 1 }
        case _ => // skip unknown chunk (+ pad byte on odd sizes)
          bb.position(bb.position() + math.min(size + (size & 1), bb.remaining()))
      }
    }
    require(rate > 0 && samples != null, "missing fmt or data chunk")
    (samples, rate, channels)
  }

  /** Deterministic synthetic table of REAL WAV audio assets: a square
    * wave whose length / period / amplitude derive from doc_id, encoded
    * as a PCM16 RIFF bitstream any audio tool reads. */
  def syntheticAudioAssets(documents: DataFrame,
                           sampleRate: Int = 8000): Dataset[MediaAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val n = (id % 400 + 100).toInt
      val period = (id % 37 + 8).toInt
      val amp = ((id % 5 + 1) * 4000).toInt
      val samples = Array.tabulate[Short](n)(i =>
        (if ((i / period) % 2 == 0) amp else -amp).toShort)
      MediaAsset(id, "audio", encodeWavKernel(samples, sampleRate, 1),
        width = 0, height = 0, n_frames = 0)
    })
  }

  /** Decode audio payloads with the REAL codec and extract features
    * (mapPartitions, zero shuffle): sample/channel/rate metadata,
    * duration, RMS, zero crossings, peak amplitude. */
  def featurizeAudio(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.media_type == "audio").mapPartitions(_.map { a =>
      val (s, rate, ch) = decodeWavKernel(a.content)
      var sumSq = 0.0
      var zc = 0L
      var peak = 0
      var i = 0
      while (i < s.length) {
        val v = s(i).toInt
        sumSq += v.toDouble * v.toDouble
        if (i > 0 && (s(i - 1).toInt ^ v) < 0 && s(i - 1) != 0 && v != 0) zc += 1
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      val rms = if (s.isEmpty) 0.0 else math.sqrt(sumSq / s.length)
      AudioFeatures(a.asset_id, s.length.toLong, ch, rate,
        s.length.toDouble * 1000.0 / (rate * math.max(ch, 1)), rms, zc, peak)
    })
  }

  // ------------------------------------------------------------------
  // Spark operators (real plumbing)
  // ------------------------------------------------------------------

  /** Decode image payloads with the REAL codec (mapPartitions, zero
    * shuffle): content becomes the luminance plane, width/height are
    * replaced by the bitstream's true dimensions. Non-image rows pass
    * through untouched. */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.media_type != "image") a
      else {
        val (plane, w, h) = decodeImageKernel(a.content)
        a.copy(content = plane, width = w, height = h)
      }
    })
  }

  /** Deterministic synthetic table of REAL JPEG (or PNG) image assets:
    * the grayscale plane is the document's XOR-rolled text bytes tiled
    * to (doc_id%32+16) x (doc_id%24+12), encoded with the JDK codec.
    * Every row is a valid bitstream a third-party decoder would read. */
  def syntheticImageAssets(documents: DataFrame, format: String = "jpg"): Dataset[MediaAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val w = (id % 32 + 16).toInt
        val h = (id % 24 + 12).toInt
        val src = decodeBytes(text.getBytes("UTF-8"))
        val plane = Array.tabulate[Byte](w * h)(i => src(i % src.length))
        MediaAsset(id, "image", encodeImageKernel(plane, w, h, format),
          w, h, n_frames = 1)
      })
  }

  /** Paired REAL-PNG assets for the perceptual-hash dedup proof: per
    * document, asset `2·doc_id` is the XOR-rolled text plane tiled to
    * (doc_id%32+16) × (doc_id%24+12) and asset `2·doc_id+1` the SAME
    * plane with its first pixel shifted by +128 (mod 256) — a
    * guaranteed near-duplicate under any perceptual hash that isn't
    * trivially exact. PNG is lossless, so the decoded plane equals
    * the constructed one byte-for-byte and the whole encode → decode
    * → resize → hash chain stays closed-form for the oracle. */
  def syntheticImagePairAssets(documents: DataFrame,
                               format: String = "png"): Dataset[MediaAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val w = (id % 32 + 16).toInt
        val h = (id % 24 + 12).toInt
        val src = decodeBytes(text.getBytes("UTF-8"))
        val plane = Array.tabulate[Byte](w * h)(i => src(i % src.length))
        val pert = plane.clone()
        pert(0) = (((plane(0) & 0xff) + 128) % 256).toByte
        Seq(
          MediaAsset(id * 2, "image", encodeImageKernel(plane, w, h, format),
            w, h, n_frames = 1),
          MediaAsset(id * 2 + 1, "image", encodeImageKernel(pert, w, h, format),
            w, h, n_frames = 1))
      })
  }

  /** 60-bit AVERAGE HASH (aHash) of image assets — the classic
    * perceptual fingerprint behind image dedup at corpus scale:
    * decode with the REAL codec, nearest-neighbor resize to 8×8, set
    * bit q iff pixel q exceeds the floor-mean of the 64-pixel
    * thumbnail. 60 bits (pixels 0–59) rather than 64 so the hash —
    * and every band/shift the dedup join derives from it — stays a
    * POSITIVE signed long in any engine (the SimHash convention; the
    * dropped corner pixels cost ~nothing against a mean threshold).
    * Pure per-partition kernel work, zero shuffle. */
  def averageHash(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val (plane, w, h) = decodeImageKernel(a.content)
      val r = resizeKernel(plane, w, h, 8, 8)
      var sum = 0L
      var i = 0
      while (i < r.length) { sum += (r(i) & 0xff); i += 1 }
      val m = sum / 64 // positive → floor
      var hash = 0L
      var q = 0
      while (q < 60) { if ((r(q) & 0xff) > m) hash |= (1L << q); q += 1 }
      (a.asset_id, hash)
    }).toDF("asset_id", "phash")
  }

  /** Banded Hamming near-duplicate join over 60-bit perceptual
    * hashes — the pigeonhole screen that keeps image dedup off the
    * all-pairs cliff: two hashes within Hamming distance `maxHamming`
    * must agree EXACTLY on at least one of `maxHamming + 1` disjoint
    * bit bands, so candidates come from equality joins on (band,
    * band-bits) and only candidates pay the exact popcount check.
    * Identical images share every band; bucket population is bounded
    * by true duplicate-cluster sizes, the same shape as the
    * MinHash/SimHash screens. Returns (asset_a, asset_b, hamming)
    * with asset_a < asset_b. */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nb = maxHamming + 1
    require(maxHamming >= 0 && 60 % nb == 0,
      s"phashNearDups: maxHamming+1 must divide 60, got $maxHamming")
    val wbits = 60 / nb
    val mask = (1L << wbits) - 1
    // the hash frame feeds BOTH sides of the band self-join — without
    // a scoped persist the upstream pipeline (typically the real image
    // decode + resize + hash) runs twice. Same lifecycle discipline as
    // the MinHash twin: the verified pair set (small — near-dups only)
    // materializes eagerly and the narrow (asset_id, phash) cache is
    // released before returning.
    hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val banded = hashes.select(col("asset_id"), col("phash"),
          explode(sequence(lit(0), lit(nb - 1))).as("b"))
        .withColumn("bv", expr(s"shiftright(phash, b * $wbits) & $mask"))
      val cand = banded.as("l").join(banded.as("r"),
          col("l.b") === col("r.b") && col("l.bv") === col("r.bv") &&
            col("l.asset_id") < col("r.asset_id"))
        .select(col("l.asset_id").as("asset_a"), col("l.phash").as("ph_a"),
          col("r.asset_id").as("asset_b"), col("r.phash").as("ph_b"))
        .distinct()
      cand
        .withColumn("hamming",
          bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
        .filter(col("hamming") <= maxHamming)
        .select(col("asset_a"), col("asset_b"), col("hamming"))
        .localCheckpoint(true)
    } finally { hashes.unpersist(blocking = false); () }
  }

  /** Decode payloads in place (mapPartitions; batch shape = the
    * partition iterator, zero shuffle). */
  def decode(assets: Dataset[MediaAsset]): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a => a.copy(content = decodeBytes(a.content))))
  }

  /** Feature extraction: byte stats + entropy + md5, computed per
    * partition with a reused 256-bin histogram (the batch-local scratch
    * a vectorized UDF would carry). */
  def featurize(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val hist = new Array[Long](256)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        java.util.Arrays.fill(hist, 0L)
        var sum = 0L
        var i = 0
        while (i < a.content.length) { val b = a.content(i) & 0xff; hist(b) += 1; sum += b; i += 1 }
        val n = a.content.length.toDouble
        var ent = 0.0
        if (n > 0) {
          var j = 0
          while (j < 256) {
            if (hist(j) > 0) { val p = hist(j) / n; ent -= p * (math.log(p) / math.log(2)) }
            j += 1
          }
        }
        md.reset()
        val hash = md.digest(a.content).map("%02x".format(_)).mkString
        MediaFeatures(a.asset_id, a.media_type, a.content.length.toLong,
          if (n > 0) sum / n else 0.0, ent, hash)
      }
    }
  }

  /** Resize image assets to (dstW, dstH); metadata updated with the
    * content. */
  def resize(assets: Dataset[MediaAsset], dstW: Int, dstH: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      a.copy(content = resizeKernel(a.content, a.width, a.height, dstW, dstH),
        width = dstW, height = dstH)
    })
  }

  /** Sample every `everyNth` frame of video assets by demuxing the
    * REAL Y4M container → one row per sampled frame (flatMap: rows
    * expand, still no shuffle). `frame_idx` is the frame's position in
    * the stream; metadata that disagrees with the container fails
    * loudly rather than silently trusting either side. */
  def frameSample(assets: Dataset[MediaAsset], everyNth: Int = 1): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    require(everyNth >= 1, "everyNth must be >= 1")
    assets.filter(_.media_type == "video").flatMap { a =>
      val (frames, w, h) = decodeVideoKernel(a.content)
      require(frames.length == a.n_frames && w == a.width && h == a.height,
        s"asset ${a.asset_id}: container says ${frames.length} frames ${w}x$h, " +
          s"metadata says ${a.n_frames} frames ${a.width}x${a.height}")
      (0 until frames.length by everyNth).map(i => Frame(a.asset_id, i, frames(i)))
    }
  }

  /** Per-transition motion proxy: sum of per-pixel |luma diff| between
    * consecutive sampled frames — the scene-cut / static-content
    * signal a video-curation pipeline thresholds on (static slideshows
    * score ~0, cuts spike). Emitted against the LATER frame's index.
    *
    * Shape: one groupByKey per asset; a group holds that asset's
    * sampled frames only (bounded by the sample stride and clip
    * length — at scale, sample before motion, not after). Integer
    * arithmetic throughout. Frames of one asset must share
    * dimensions; a mismatch raises rather than guessing. */
  case class FrameMotion(asset_id: Long, frame_idx: Int,
                         sum_abs_diff: Long, n_bytes: Long)

  def frameMotion(frames: Dataset[Frame]): Dataset[FrameMotion] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.asset_id).flatMapGroups { (id, it) =>
      val fs = it.toSeq.sortBy(_.frame_idx)
      fs.sliding(2).collect { case Seq(a, b) =>
        require(a.frame_bytes.length == b.frame_bytes.length,
          s"asset $id: frame ${a.frame_idx} has ${a.frame_bytes.length} bytes " +
            s"but frame ${b.frame_idx} has ${b.frame_bytes.length}")
        var s = 0L
        var i = 0
        while (i < a.frame_bytes.length) {
          s += math.abs((a.frame_bytes(i) & 0xff) - (b.frame_bytes(i) & 0xff))
          i += 1
        }
        FrameMotion(id, b.frame_idx, s, b.frame_bytes.length.toLong)
      }.toSeq
    }
  }

  /** Per-frame features over sampled frames (mapPartitions, zero
    * shuffle): byte count, exact byte sum, min/max byte. */
  case class FrameFeatures(asset_id: Long, frame_idx: Int,
                           n_frame_bytes: Long, sum_bytes: Long,
                           min_byte: Int, max_byte: Int)

  def frameFeatures(frames: Dataset[Frame]): Dataset[FrameFeatures] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map { fr =>
      var sum = 0L
      var mn = 256
      var mx = -1
      var i = 0
      while (i < fr.frame_bytes.length) {
        val v = fr.frame_bytes(i) & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      FrameFeatures(fr.asset_id, fr.frame_idx, fr.frame_bytes.length.toLong,
        sum, if (mn == 256) 0 else mn, if (mx == -1) 0 else mx)
    })
  }

  /** Deterministic synthetic table of REAL Y4M video assets: asset
    * `id` carries `id%8+1` constant-luma frames of `(id%16+8) x
    * (id%12+6)` — frame `f`'s fill byte is `(id*31 + f*7) % 256`, so
    * every per-frame feature is predictable in closed form by the SQL
    * oracle while the bytes still round-trip a real container any
    * Y4M-aware tool plays. */
  def syntheticVideoAssets(documents: DataFrame, fps: Int = 25): Dataset[MediaAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val w = (id % 16 + 8).toInt
      val h = (id % 12 + 6).toInt
      val n = (id % 8 + 1).toInt
      val frames = Array.tabulate(n) { f =>
        val fill = ((id * 31 + f * 7) % 256).toByte
        Array.fill[Byte](w * h)(fill)
      }
      MediaAsset(id, "video", encodeVideoKernel(frames, w, h, fps), w, h, n)
    })
  }

  /** Deterministic synthetic asset table derived from the documents
    * table (the container ships no media fixtures): payload bytes are
    * the UTF-8 text, metadata derived from doc_id. Exercises the binary
    * column path end-to-end with real Spark types. */
  def syntheticAssets(documents: DataFrame): Dataset[MediaAsset] = {
    import documents.sparkSession.implicits._
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      (col("doc_id") % 64 + 16).cast("int").as("width"),
      (col("doc_id") % 48 + 12).cast("int").as("height"),
      (col("doc_id") % 8 + 1).cast("int").as("n_frames"))
      .as[MediaAsset]
  }
}
