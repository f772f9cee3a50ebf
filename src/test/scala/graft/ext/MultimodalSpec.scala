package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ext.Multimodal.MediaCodec

class MultimodalSpec extends AnyFunSuite {
  implicit lazy val spark = SparkTestSession.spark
  lazy val docs = Tables.documents(spark, SparkTestSession.sf)

  test("PNG codec round-trips exact pixels through a real ImageIO encode/decode") {
    val raster = Multimodal.syntheticRaster(42L, 13, 9)
    val png = MediaCodec.encodePng(13, 9, raster)
    // a real PNG, not pass-through bytes: magic header + size differs
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, back) = MediaCodec.decodePng(png)
    assert(w == 13 && h == 9)
    assert(back.sameElements(raster), "PNG decode must return the exact encoded pixels")
  }

  test("nearest-neighbor scale: identity at same dims, exact floor mapping up and down") {
    val raster = Multimodal.syntheticRaster(7L, 12, 10)
    assert(MediaCodec.scaleNearest(12, 10, raster, 12, 10).sameElements(raster))
    val down = MediaCodec.scaleNearest(12, 10, raster, 6, 5)
    for (y <- 0 until 5; x <- 0 until 6)
      assert(down(y * 6 + x) == raster((y * 10 / 5) * 12 + x * 12 / 6))
    val up = MediaCodec.scaleNearest(12, 10, raster, 24, 10)
    for (y <- 0 until 10; x <- 0 until 24)
      assert(up(y * 24 + x) == raster(y * 12 + x * 12 / 24))
  }

  test("synthetic PNGs decode back to the arithmetic raster; resize emits real scaled PNGs") {
    val media = Multimodal.syntheticPng(docs.limit(50))
    media.collect().foreach { r =>
      val (w, h, rgb) = MediaCodec.decodePng(r.payload)
      assert(w == r.meta.width && h == r.meta.height)
      assert(rgb.sameElements(Multimodal.syntheticRaster(r.media_id, w, h)))
    }
    // resize -> decode: dims are the target's and pixels are exactly the
    // nearest-neighbor selection of the source raster (up AND down)
    val stats = Multimodal.decodedStats(Multimodal.resize(media, 10, 6)).collect()
    assert(stats.length == 50)
    stats.foreach { s =>
      assert(s.width == 10 && s.height == 6)
      val id = s.media_id
      val (sw, sh) = ((8 + Math.floorMod(id, 9L)).toInt, (8 + Math.floorMod(id, 5L)).toInt)
      val expected = MediaCodec.pixelChecksum(
        MediaCodec.scaleNearest(sw, sh, Multimodal.syntheticRaster(id, sw, sh), 10, 6))
      assert(s.checksum == expected, s"media $id checksum drifted")
    }
  }

  test("media features: PNG path uses decoded pixels, opaque path uses byte stats") {
    val png = Multimodal.extractFeatures(Multimodal.syntheticPng(docs.limit(20))).collect()
    assert(png.length == 20)
    png.foreach { f =>
      assert(f.embedding.length == 32)
      assert(math.abs(f.embedding.sum - 1.0f) < 1e-3) // L1-normalized histogram
      val id = f.media_id
      val (sw, sh) = ((8 + Math.floorMod(id, 9L)).toInt, (8 + Math.floorMod(id, 5L)).toInt)
      assert(f.checksum ==
        MediaCodec.pixelChecksum(Multimodal.syntheticRaster(id, sw, sh)),
        "PNG features must digest DECODED pixels, not payload bytes")
    }
    val opaque = Multimodal.extractFeatures(Multimodal.syntheticMedia(docs.limit(20))).collect()
    assert(opaque.length == 20)
    opaque.foreach { f =>
      assert(f.embedding.length == 32 && math.abs(f.embedding.sum - 1.0f) < 1e-3)
      assert(f.n_bytes > 0)
    }
  }

  test("frame sampling slices payloads deterministically") {
    val media = Multimodal.syntheticMedia(docs.limit(10))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyNth = 4)
    assert(frames.count() > 0)
    val bad = frames.filter(length(col("frame_payload")) > 16).count()
    assert(bad == 0)
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() == 0)
  }

  test("frame container: stride sampling decodes exactly the sampled frames of a real PNG sequence") {
    val media = Multimodal.syntheticPngSequence(docs.limit(40))
    // container parses back to per-id frame counts and REAL PNG frames
    media.collect().foreach { r =>
      val frames = Multimodal.unpackFrames(r.payload)
      assert(frames.length == (2 + Math.floorMod(r.media_id, 3L)).toInt)
      frames.zipWithIndex.foreach { case (png, f) =>
        assert((png(0) & 0xFF) == 0x89 && png(1) == 'P')
        val (w, h, rgb) = MediaCodec.decodePng(png)
        assert(w == r.meta.width && h == r.meta.height)
        assert(rgb.sameElements(
          Multimodal.syntheticFrameRaster(r.media_id, f, w, h)))
      }
    }
    // stride semantics: stride 1 = all frames; stride 2 = even indices
    val all = Multimodal.extractFrames(media, stride = 1).collect()
    val sampled = Multimodal.extractFrames(media, stride = 2).collect()
    val byId = all.groupBy(_.media_id)
    assert(all.length == byId.keys.toSeq.map(id => 2 + Math.floorMod(id, 3L)).sum)
    assert(sampled.map(s => (s.media_id, s.frame_idx)).toSet ==
      all.filter(_.frame_idx % 2 == 0).map(s => (s.media_id, s.frame_idx)).toSet)
    // frames genuinely differ along the frame axis (the sampler isn't
    // re-reading frame 0)
    byId.values.filter(_.length > 1).foreach { fs =>
      assert(fs.map(_.checksum).distinct.length > 1,
        s"frames of ${fs.head.media_id} all decoded identically")
    }
  }

  test("keyframes: one start per shot, frame 0 always kept, consistent with shotBoundaries") {
    val media = Multimodal.syntheticPngSequence(docs.limit(40)).cache()
    val kf = Multimodal.keyframes(media, threshold = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = kf.groupBy(_._1)
    // frame 0 opens shot 0 for EVERY medium (single-frame media included)
    assert(byId.keySet == media.collect().map(_.media_id).toSet)
    byId.values.foreach { ks =>
      val sorted = ks.sortBy(_._3)
      assert(sorted.head._2 == 0L && sorted.head._3 == 0L,
        s"medium ${sorted.head._1} must open with shot 0 at frame 0")
      // shot ids are contiguous 0..n-1 in frame order (one keyframe per shot)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
        s"shot ids not contiguous for ${sorted.head._1}: ${sorted.map(_._2).toSeq}")
    }
    // keyframes beyond frame 0 are EXACTLY the m08 boundaries
    val cuts = Multimodal.shotBoundaries(media, threshold = 10)
      .filter(col("is_boundary") === 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kf.filter(_._3 > 0).map(k => (k._1, k._3)).toSet == cuts,
      "non-zero keyframes must equal the boundary set")
    media.unpersist()
  }

  test("JPEG codec: real JDK baseline JPEGs; solid rasters decode uniform at exact dims") {
    val g = 137
    val rgb = Array.fill(20 * 11)((g << 16) | (g << 8) | g)
    val jpg = MediaCodec.encodeJpeg(20, 11, rgb)
    // a real JPEG: SOI marker, and lossy (not pass-through bytes)
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8)
    val (w, h, out) = MediaCodec.decodeJpeg(jpg)
    assert(w == 20 && h == 11)
    // DC-only blocks: the decoded raster is UNIFORM even though the
    // level may have moved under quantization — the invariant the m12
    // gate stands on
    assert(out.distinct.length == 1)
    // and the level stays near the encoded gray (DC drift is small)
    val v = out(0) & 0xFF
    assert(math.abs(v - g) <= 8, s"decoded level $v vs encoded $g")
    // decodeImage dispatches by declared format AND by SOI sniffing
    assert(MediaCodec.decodeImage(Multimodal.JpegFormat, jpg)._1 == 20)
    assert(MediaCodec.decodeImage("application/octet-stream", jpg)._1 == 20)
  }

  test("containerMeta: header-only sniff matches decoded dims; declared format is ignored; garbage rejected") {
    import org.apache.spark.sql.functions.col
    val png = Multimodal.syntheticPng(docs.limit(30).filter(col("doc_id") % 2 === 0))
    val jpg = Multimodal.syntheticJpeg(docs.limit(30).filter(col("doc_id") % 2 =!= 0))
    val meta = Multimodal.containerMeta(png.unionByName(jpg)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    assert(meta.nonEmpty)
    meta.foreach { case (id, (c, w, h, depth, ch)) =>
      assert(c == (if (id % 2 == 0) "png" else "jpeg"), s"media $id sniffed as $c")
      assert(w == 8 + (id % 9) && h == 8 + (id % 5), s"media $id dims ($w,$h)")
      assert(depth == 8 && ch == 3, s"media $id depth/channels ($depth,$ch)")
    }
    // sniffing, not trusting: swap every declared format and nothing moves
    import spark.implicits._
    val lied = png.unionByName(jpg).map(r =>
      r.copy(meta = r.meta.copy(format =
        if (r.meta.format == Multimodal.PngFormat) Multimodal.JpegFormat
        else Multimodal.PngFormat)))
    val liedMeta = Multimodal.containerMeta(lied).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    assert(liedMeta == meta, "declared format leaked into the sniffed metadata")
    // header cost only: parse succeeds on a TRUNCATED jpeg (headers
    // intact, entropy data gone) — proof no decode runs on this path
    val jr = jpg.head()
    val sof = Multimodal.MediaCodec.sniffMeta(jr.payload)
    val cut = jr.payload.take(jr.payload.length - 8)
    assert(Multimodal.MediaCodec.sniffMeta(cut) == sof,
      "sniffMeta read past the frame header (decode-shaped cost)")
    intercept[IllegalArgumentException] {
      Multimodal.MediaCodec.sniffMeta(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    }
  }

  test("JPEG payloads flow through the production image operators; resize re-emits lossless PNG") {
    import spark.implicits._
    val media = Multimodal.syntheticJpeg(docs.limit(30))
    val rows = media.collect()
    assert(rows.nonEmpty && rows.forall(r => (r.payload(0) & 0xFF) == 0xFF))
    // dHash of a uniform raster is 0; quality metrics see zero contrast
    val dh = Multimodal.imageDhash(media).collect()
    assert(dh.forall(_.getLong(1) == 0L))
    val qr = Multimodal.imageQualityRules(media)
      .select("media_id", "contrast", "keep").collect()
    assert(qr.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    // decodedStats sees the generator dims
    val st = Multimodal.decodedStats(media).collect()
    assert(st.forall { d =>
      d.width == (8 + Math.floorMod(d.media_id, 9L)).toInt &&
        d.height == (8 + Math.floorMod(d.media_id, 5L)).toInt
    })
    // resize accepts JPEG input and emits a PNG artifact of the scaled
    // pixels (uniform source -> uniform scaled raster, exact dims)
    val rs = Multimodal.resize(media, 6, 6).collect()
    assert(rs.forall { r =>
      r.meta.format == Multimodal.PngFormat && {
        val (w, h, rgb) = MediaCodec.decodePng(r.payload)
        w == 6 && h == 6 && rgb.distinct.length == 1
      }
    })
    // extractFeatures routes JPEG through the DECODED-pixel path: a
    // uniform raster's histogram has one nonzero luma bucket
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.forall(_.embedding.count(_ > 0f) == 1))
  }

  test("WAV codec round-trips exact PCM through a real RIFF encode/decode; layout is header-driven") {
    import graft.ext.Multimodal.AudioCodec
    val samples = Array.tabulate(1000)(i => ((i * 7919) % 65536 - 32768).toShort)
    val wav = AudioCodec.encodeWav(samples)
    // a real RIFF/WAVE container, not pass-through bytes
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "payload is not a WAV file")
    assert(AudioCodec.decodeWav(wav).sameElements(samples))
    // decode parses the header: a stereo payload is rejected, not misread
    val fmt2 = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val raw = new Array[Byte](400)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt2, 100L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    intercept[IllegalArgumentException] { AudioCodec.decodeWav(out.toByteArray) }
  }

  test("PNG codec parity vs ImageIO in both directions; unfilter handles adaptive-filtered rows") {
    import graft.ext.Multimodal.{MediaCodec, PngBytes}
    // gradient raster big enough for ImageIO's adaptive writer to pick
    // varied row filters (Sub/Up/Average/Paeth), exercising the
    // byte decoder's full unfilter set
    val w = 40; val h = 37
    val rgb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 6) & 0xff) << 16) | (((y * 7) & 0xff) << 8) | ((x * x + y * 3) & 0xff)
    }
    // our byte encode -> JDK decode: the JDK reads the exact raster back
    val ours = MediaCodec.encodePng(w, h, rgb)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(img.getWidth == w && img.getHeight == h, "JDK misread our IHDR")
    assert(img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF).sameElements(rgb))
    // JDK encode (adaptive filters) -> our byte decode
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, w, h, rgb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val viaBytes = PngBytes.decode(bos.toByteArray)
    assert(viaBytes.isDefined, "byte decoder must accept ImageIO's writer output")
    val (dw, dh, drgb) = viaBytes.get
    assert(dw == w && dh == h && drgb.sameElements(rgb))
    // a truncated payload declines (None) so the fallback handles it —
    // the byte path never mis-decodes what it can't fully verify
    // (ImageIO itself tolerates this particular truncation, which is
    // exactly why declining to the fallback is the right contract)
    assert(PngBytes.decode(ours.dropRight(20)).isEmpty)
  }

  test("WAV codec parity vs javax.sound in both directions (byte codec is pinned to the JDK's)") {
    import graft.ext.Multimodal.AudioCodec
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = Array.tabulate(777)(i => ((i * 7919 + 13) % 65536 - 32768).toShort)
    // our encode -> JDK decode: the JDK accepts our container and reads back the exact PCM
    val ours = AudioCodec.encodeWav(samples)
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(ours))
    val fmt = ais.getFormat
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian &&
      fmt.getSampleRate == 8000f, s"JDK misread our header: $fmt")
    val bytes = ais.readAllBytes()
    val jdkDecoded = Array.tabulate(bytes.length / 2)(i =>
      (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort)
    assert(jdkDecoded.sameElements(samples))
    // JDK encode -> our decode: chunk walk handles whatever header the JDK emits
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val jais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
      new AudioFormat(8000f, 16, 1, true, false), samples.length.toLong)
    val out2 = new java.io.ByteArrayOutputStream()
    AudioSystem.write(jais, AudioFileFormat.Type.WAVE, out2)
    assert(AudioCodec.decodeWav(out2.toByteArray).sameElements(samples))
    // chunk walk: an extra LIST chunk between fmt and data is skipped, not misread
    val data = ours.drop(44)
    val listBody = "INFOIARTx".getBytes("US-ASCII") // odd-length body exercises word alignment
    val withList = new java.io.ByteArrayOutputStream()
    withList.write(ours.slice(0, 36)) // RIFF..fmt chunk
    withList.write("LIST".getBytes("US-ASCII"))
    withList.write(Array[Byte]((listBody.length & 0xff).toByte, 0, 0, 0))
    withList.write(listBody)
    withList.write(0) // RIFF pad byte after odd-size chunk
    withList.write(ours.slice(36, 44)) // data header
    withList.write(data)
    val padded = withList.toByteArray
    // fix the RIFF size field for the inserted chunk
    val total = padded.length - 8
    padded(4) = (total & 0xff).toByte; padded(5) = ((total >> 8) & 0xff).toByte
    padded(6) = ((total >> 16) & 0xff).toByte; padded(7) = ((total >> 24) & 0xff).toByte
    assert(AudioCodec.decodeWav(padded).sameElements(samples))
  }

  test("audio frames: stats recompute from decoded samples; partial tail frame kept") {
    import graft.ext.Multimodal
    val audio = Multimodal.syntheticWav(docs.limit(20))
    val frames = Multimodal.extractAudioFrames(audio, frame = 256).collect()
    // every id emits ceil(n/256) frames with the tail frame partial
    val byId = frames.groupBy(_.media_id)
    byId.foreach { case (id, fs) =>
      val n = (512 + Math.floorMod(id, 384L)).toInt
      assert(fs.length == (n + 255) / 256)
      assert(fs.map(_.n_samples).sum == n)
      val tail = fs.maxBy(_.frame_idx)
      assert(tail.n_samples == (if (n % 256 == 0) 256 else n % 256))
      // spot-recompute frame 0 of this id straight from the arithmetic
      val s0 = Array.tabulate(256)(i =>
        (Math.floorMod(id * 31 + i.toLong * 17, 65536L) - 32768L).toInt)
      val f0 = fs.find(_.frame_idx == 0).get
      assert(f0.energy == s0.map(v => v.toLong * v).sum)
      assert(f0.peak == s0.map(math.abs).max)
      assert(f0.zero_crossings ==
        s0.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
    }
  }

  test("PNG tEXt: tagged payloads stay decodable images; CRC corruption is rejected") {
    import graft.ext.Multimodal
    import graft.ext.Multimodal.PngText
    val tagged = Multimodal.syntheticPngTagged(docs.limit(10)).collect()
    tagged.foreach { r =>
      // still a valid image with the ORIGINAL pixels
      val (w, h, rgb) = MediaCodec.decodePng(r.payload)
      assert(rgb.sameElements(Multimodal.syntheticRaster(r.media_id, w, h)))
      // tags parse back exactly
      val tags = PngText.readText(r.payload).toMap
      assert(tags("source") == s"src_${r.media_id % 7}" &&
        tags("license") == s"cc${r.media_id % 3}")
    }
    // flip one byte inside the first tEXt data region → CRC must catch it
    val p = tagged.head.payload.clone()
    val ihdrEnd = 8 + 4 + 4 + 13 + 4
    p(ihdrEnd + 8 + 2) = (p(ihdrEnd + 8 + 2) ^ 0x01).toByte
    intercept[IllegalArgumentException] { PngText.readText(p) }
  }

  test("dHash: banded pairs equal brute-force pairs; class near-dups found") {
    import spark.implicits._
    val media = Multimodal.syntheticPngClasses(docs.limit(120))
    val hashes = Multimodal.imageDhash(media).cache()
    // hashes are 56-bit non-negative
    assert(hashes.filter(col("dhash") < 0 || col("dhash") >= (1L << 56)).count() == 0)
    // banded join == brute-force O(n²) Hamming filter (pigeonhole is
    // a guarantee, not a heuristic)
    val brute = hashes.as("a").crossJoin(hashes.as("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("bit_count(a.dhash ^ b.dhash)").cast("long").as("dist"))
      .filter(col("dist") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Multimodal.dhashPairs(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
    // same class + same noise level ⇒ identical image ⇒ dist 0 pair
    assert(banded.exists(_._3 == 0L))
    // the fixture's 120 docs span 50 classes; cross-class rasters are
    // unrelated, so the pair set must stay far below all-pairs
    assert(banded.size < 120 * 119 / 2 / 4)
    hashes.unpersist()
  }

  test("audio fingerprint: banded pairs equal brute force; noise never moves the sketch") {
    import spark.implicits._
    val media = Multimodal.syntheticWavClasses(docs.limit(120))
    val fps = Multimodal.audioFingerprint(media).cache()
    assert(fps.filter(col("afp") < 0 || col("afp") >= (1L << 31)).count() == 0)
    val brute = fps.as("a").crossJoin(fps.as("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("bit_count(a.afp ^ b.afp)").cast("long").as("dist"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = Multimodal.hammingPairs(fps, bits = 31, maxDist = 2,
        idCol = "media_id", hashCol = "afp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute)
    // the energy sketch is noise-robust by design: same class, any
    // noise level ⇒ identical fingerprint ⇒ dist-0 pairs exist
    assert(banded.exists(_._3 == 0L))
    // ...and class-discriminative: nowhere near all-pairs
    assert(banded.size < 120 * 119 / 2 / 2)
    fps.unpersist()
  }

  test("imageQualityRules: hand-built rasters hit each rule; luma recomputes through the codec") {
    import spark.implicits._
    import graft.ext.Multimodal.{MediaCodec, MediaMeta, MediaRow}
    def img(id: Long, w: Int, h: Int)(px: (Int, Int) => Int) = {
      val rgb = Array.tabulate(w * h)(i => px(i % w, i / w))
      MediaRow(id, MediaMeta("image", Multimodal.PngFormat, w, h),
        MediaCodec.encodePng(w, h, rgb))
    }
    def gray(l: Int) = (l << 16) | (l << 8) | l // luma(g,g,g) == g exactly
    val media = Seq(
      // 1: half black / half white — contrast 255 but both extremes
      //    at 500000 micro each → dropped by dark AND bright
      img(1L, 10, 10)((x, _) => if (x < 5) gray(0) else gray(255)),
      // 2: mid-gray gradient 64..163 — keeps (contrast 99? no: < 150)
      //    → dropped by contrast alone (exposure fine)
      img(2L, 10, 10)((x, y) => gray(64 + x * 10 + (y % 1))),
      // 3: healthy spread 40..211, mean in band, no extremes — keeps
      img(3L, 10, 10)((x, y) => gray(40 + x * 17 + y * 2)),
      // 4: blown out — mean 250 above the band
      img(4L, 4, 4)((_, _) => gray(250))
    ).toDS()
    val got = Multimodal.imageQualityRules(media)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._4 == 255L && byId(1L)._5 == 500000L &&
      byId(1L)._6 == 500000L && byId(1L)._7 == 0L)
    assert(byId(2L)._4 == 90L && byId(2L)._7 == 0L,
      s"gradient contrast must be 90 (dropped): ${byId(2L)}")
    assert(byId(3L)._4 == 171L && byId(3L)._5 == 0L && byId(3L)._6 == 0L &&
      byId(3L)._7 == 1L, s"healthy image must keep: ${byId(3L)}")
    assert(byId(4L)._3 == 250L && byId(4L)._7 == 0L)
    // n_pixels reflects the decoded raster, not metadata
    assert(byId(4L)._2 == 16L)
  }

  test("audioQualityRules: hand-built clips hit each rule; metrics recompute from PCM") {
    import spark.implicits._
    import graft.ext.Multimodal.{AudioCodec, MediaMeta, MediaRow}
    def clip(id: Long, samples: Array[Short]) =
      MediaRow(id, MediaMeta("audio", Multimodal.WavFormat, 0, 0),
        AudioCodec.encodeWav(samples))
    val media = Seq(
      // 1: clean mid-level tone — keeps
      clip(1L, Array.tabulate(100)(i => (2000 + (i % 7) * 100).toShort)),
      // 2: hard-clipped half the time — dropped by clip_micro
      clip(2L, Array.tabulate(100)(i =>
        if (i % 2 == 0) 32767.toShort else 1500.toShort)),
      // 3: mostly silence (90 quiet of 100) — dropped by silence_micro
      clip(3L, Array.tabulate(100)(i =>
        if (i < 10) 5000.toShort else 100.toShort)),
      // 4: dead air (peak under minPeak) — dropped by peak
      clip(4L, Array.fill(100)(50.toShort)),
      // 5: -32768 rail — |s| handling must not overflow/misclassify
      clip(5L, Array.tabulate(100)(i =>
        if (i == 0) Short.MinValue else 3000.toShort))
    ).toDS()
    val got = Multimodal.audioQualityRules(media)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(1L)._8 == 1L, "clean clip must keep")
    assert(byId(2L)._4 == 50L && byId(2L)._5 == 500000L && byId(2L)._8 == 0L)
    assert(byId(3L)._7 == 900000L && byId(3L)._8 == 0L)
    assert(byId(4L)._3 == 50L && byId(4L)._8 == 0L)
    // doc 5: one rail sample counts as clipped (1%), peak = 32768
    assert(byId(5L)._3 == 32768L && byId(5L)._4 == 1L && byId(5L)._5 == 10000L)
    assert(byId(5L)._8 == 1L, "1% clipping is within the 10000-micro gate")
    // energy recomputes: doc 4 is exactly 50² per sample
    assert(byId(4L)._6 == 2500L)
  }

  test("normalizeAudio: truncating gain, negative rounding, silence pass-through, gain-1 identity") {
    import spark.implicits._
    import graft.ext.Multimodal.{AudioCodec, MediaMeta, MediaRow}
    def clip(id: Long, samples: Array[Short]) =
      MediaRow(id, MediaMeta("audio", Multimodal.WavFormat, 0, 0),
        AudioCodec.encodeWav(samples))
    val media = Seq(
      // peak 4, target 10: 3→7 (30/4 trunc), -3→-7 (TRUNCATION toward
      // zero — floor would give -8), 4→10, -4→-10
      clip(1L, Array[Short](3, -3, 4, -4)),
      clip(2L, Array.fill(5)(0.toShort)),          // silence: pass-through
      clip(3L, Array[Short](10, -10, 5)),          // peak == target: identity
      clip(4L, Array[Short](Short.MinValue, 100))  // -32768 rail: exact -10
    ).toDS()
    val out = Multimodal.normalizeAudio(media, targetPeak = 10)
      .collect().map(r => r.media_id -> AudioCodec.decodeWav(r.payload)).toMap
    assert(out(1L).toSeq == Seq[Short](7, -7, 10, -10), out(1L).toSeq)
    assert(out(2L).toSeq == Seq[Short](0, 0, 0, 0, 0), "silence must pass through")
    assert(out(3L).toSeq == Seq[Short](10, -10, 5), "gain 1 must be exact")
    assert(out(4L)(0) == -10 && out(4L)(1) == 0, out(4L).toSeq) // 100·10/32768 = 0
    // |s'| ≤ target everywhere
    assert(out.values.forall(_.forall(s => math.abs(s.toInt) <= 10)))
    // non-WAV payloads fail loudly, never silently mangle
    val bad = Seq(MediaRow(9L, MediaMeta("image", Multimodal.PngFormat, 1, 1),
      Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.normalizeAudio(bad).collect()
    }
    assert(e.getMessage.contains("normalizeAudio") ||
      Option(e.getCause).exists(_.getMessage.contains("normalizeAudio")))
    // audioStats recomputes: doc 1 after = 49+49+100+100
    val st = Multimodal.audioStats(Multimodal.normalizeAudio(media, 10))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(st(1L) == ((4L, 10L, 298L)), st(1L))
  }

  test("trimSilence/silenceBounds: edge-only trim, inclusive interior quiet, all-quiet empties, bounds == edit") {
    import spark.implicits._
    import graft.ext.Multimodal.{AudioCodec, MediaMeta, MediaRow}
    def clip(id: Long, samples: Array[Short]) =
      MediaRow(id, MediaMeta("audio", Multimodal.WavFormat, 0, 0),
        AudioCodec.encodeWav(samples))
    val media = Seq(
      clip(1L, Array[Short](0, 50, 200, -300, 1, 0)), // pad both ends
      clip(2L, Array[Short](1, -1, 99)),              // all-quiet: empty out
      clip(3L, Array[Short](101)),                    // nothing to trim
      clip(4L, Array[Short](200, 0, 0, 200))          // interior quiet KEPT
    ).toDS()
    val out = Multimodal.trimSilence(media, threshold = 100L)
      .collect().map(r => r.media_id -> AudioCodec.decodeWav(r.payload).toSeq).toMap
    assert(out(1L) == Seq[Short](200, -300), out(1L))
    assert(out(2L).isEmpty, "all-quiet clip must trim to the empty clip")
    assert(out(3L) == Seq[Short](101))
    assert(out(4L) == Seq[Short](200, 0, 0, 200), "interior quiet is not trimmed")
    // bounds table is the edit's audit twin: n_out = n - lead - trail,
    // peak matches the kept slice
    val b = Multimodal.silenceBounds(media, threshold = 100L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(b(1L) == ((6L, 2L, 2L, 300L)), b(1L))
    assert(b(2L) == ((3L, 3L, 0L, 0L)), "all-quiet: lead = n, trail = 0, peak 0")
    assert(b(3L) == ((1L, 0L, 0L, 101L)))
    assert(b(4L) == ((4L, 0L, 0L, 200L)))
    b.foreach { case (id, (n, lead, trail, _)) =>
      assert(out(id).length.toLong == n - lead - trail, s"clip $id") }
    // non-WAV payloads fail loudly
    val bad = Seq(MediaRow(9L, MediaMeta("image", Multimodal.PngFormat, 1, 1),
      Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.trimSilence(bad, 100L).collect()
    }
    assert(e.getMessage.contains("trimSilence") ||
      Option(e.getCause).exists(_.getMessage.contains("trimSilence")))
  }

  test("hammingPairsNew: equals full pairs restricted to the batch; batch supersedes") {
    import spark.implicits._
    val media = Multimodal.syntheticPngClasses(docs.limit(100))
    val hashes = Multimodal.imageDhash(media).cache()
    val batch = hashes.filter(col("media_id") % 10 === 0)
    val corpus = hashes.filter(col("media_id") % 10 =!= 0)
    val inc = Multimodal.hammingPairsNew(batch, corpus, bits = 56, maxDist = 3,
        idCol = "media_id", hashCol = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full pair set restricted to pairs touching the batch, re-oriented
    // the incremental way (batch id first; new-new once, smaller first)
    val full = Multimodal.dhashPairs(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = full.flatMap { case (a, b, d) =>
      (a % 10 == 0, b % 10 == 0) match {
        case (true, true)   => Seq((a, b, d))
        case (true, false)  => Seq((a, b, d))
        case (false, true)  => Seq((b, a, d))
        case (false, false) => Seq.empty
      }
    }.toSet
    assert(inc == expected)
    // a corpus row whose id reappears in the batch is superseded: no
    // self-pair, and the stale hash never pairs
    val stale = batch.limit(1).withColumn("dhash", lit(0L))
    val withStale = Multimodal.hammingPairsNew(batch, corpus.union(stale),
        bits = 56, maxDist = 3, idCol = "media_id", hashCol = "dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(withStale == inc)
    hashes.unpersist()
  }

  test("identical payloads are found as media duplicates") {
    import spark.implicits._
    val dupDocs = Seq((1L, "same bytes"), (2L, "same bytes"), (3L, "different"))
      .toDF("doc_id", "text")
    val pairs = Multimodal.mediaDupPairs(Multimodal.syntheticMedia(dupDocs)).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
  }
}
