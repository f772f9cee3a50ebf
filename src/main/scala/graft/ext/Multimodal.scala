package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, processed in partition-sized
  * batches (one codec allocation per task, rows streamed through it —
  * the standard Spark shape for binary-blob work).
  *
  * The image codec is REAL: `javax.imageio` (public JDK, no native
  * deps) encodes/decodes PNG payloads, [[resize]] decodes, scales by
  * nearest-neighbor, and re-encodes — the m02 oracle gates the decoded
  * pixels of the resized output byte-for-byte against SQL replaying
  * the same pixel arithmetic. Formats the container has no decoder for
  * (audio/video) flow through the same plumbing as opaque payloads
  * with content-hash features ([[MediaCodec.byteHistogram]]) — byte-level
  * statistics, not a decode, and documented as such.
  */
object Multimodal {

  case class MediaMeta(mediaType: String, format: String, width: Int, height: Int)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, mediaType: String, n_bytes: Int,
      checksum: Long, embedding: Array[Float])
  case class DecodedStats(media_id: Long, width: Int, height: Int, checksum: Long)

  val PngFormat = "image/png"
  val JpegFormat = "image/jpeg"

  /** Formats the image operators REALLY decode (vs opaque byte-feature
    * payloads): lossless PNG via the byte-level codec, JPEG via the
    * thread-local ImageIO reader (r13 verdict task 4 — a real crawl's
    * image column is overwhelmingly JPEG).
    */
  def isDecodableImage(format: String): Boolean =
    format == PngFormat || format == JpegFormat

  /** Byte-level PNG codec for the hot loop — the image twin of the
    * RIFF/WAVE rewrite: encode emits IHDR + one filter-0 deflated IDAT
    * + IEND (any standard decoder reads it; ImageIO parity is
    * spec-pinned), decode chunk-walks the container, concatenates IDAT,
    * inflates, and reconstructs all five PNG row filters (None / Sub /
    * Up / Average / Paeth) for 8-bit RGB and RGBA non-interlaced
    * images. Anything else (palette, 16-bit, interlaced, non-PNG)
    * returns None and the caller falls back to ImageIO — correctness
    * never narrows, only the common case gets the fast path.
    */
  private[ext] object PngBytes {
    import java.util.zip.{CRC32, Deflater, Inflater}

    private val Sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)

    private def i32be(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    private def writeChunk(out: ByteArrayOutputStream, typ: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(body, 0, len)
      val crc = new CRC32()
      crc.update(tb); crc.update(body)
      val c = crc.getValue.toInt
      out.write((c >>> 24) & 0xff); out.write((c >>> 16) & 0xff)
      out.write((c >>> 8) & 0xff); out.write(c & 0xff)
    }

    def encode(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      val stride = width * 3
      val raw = new Array[Byte]((stride + 1) * height)
      var y = 0
      while (y < height) {
        val ro = y * (stride + 1) // raw(ro) = 0: filter type None
        var x = 0
        while (x < width) {
          val p = rgb(y * width + x)
          raw(ro + 1 + 3 * x) = ((p >> 16) & 0xff).toByte
          raw(ro + 2 + 3 * x) = ((p >> 8) & 0xff).toByte
          raw(ro + 3 + 3 * x) = (p & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
      deflater.setInput(raw); deflater.finish()
      val zipped = new ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        zipped.write(buf, 0, n)
      }
      deflater.end()
      val ihdr = new Array[Byte](13)
      ihdr(0) = ((width >>> 24) & 0xff).toByte; ihdr(1) = ((width >>> 16) & 0xff).toByte
      ihdr(2) = ((width >>> 8) & 0xff).toByte; ihdr(3) = (width & 0xff).toByte
      ihdr(4) = ((height >>> 24) & 0xff).toByte; ihdr(5) = ((height >>> 16) & 0xff).toByte
      ihdr(6) = ((height >>> 8) & 0xff).toByte; ihdr(7) = (height & 0xff).toByte
      ihdr(8) = 8            // bit depth
      ihdr(9) = 2            // color type: truecolor RGB
      ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate / adaptive / non-interlaced
      val out = new ByteArrayOutputStream(zipped.size() + 64)
      out.write(Sig, 0, 8)
      writeChunk(out, "IHDR", ihdr)
      writeChunk(out, "IDAT", zipped.toByteArray)
      writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (payload.length < 8 + 25 || !(0 until 8).forall(i => payload(i) == Sig(i)))
        return None
      var off = 8
      var w = 0; var h = 0; var bitDepth = -1; var colorType = -1; var interlace = -1
      val idat = new ByteArrayOutputStream()
      var done = false
      while (!done && off + 12 <= payload.length) {
        val len = i32be(payload, off)
        if (len < 0 || off + 12 + len > payload.length) return None // corrupt
        val typ = new String(payload, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        typ match {
          case "IHDR" =>
            w = i32be(payload, off + 8); h = i32be(payload, off + 12)
            bitDepth = payload(off + 16) & 0xff; colorType = payload(off + 17) & 0xff
            interlace = payload(off + 20) & 0xff
          case "IDAT" => idat.write(payload, off + 8, len)
          case "IEND" => done = true
          case _      => () // tEXt and other ancillary chunks: skip
        }
        off += 12 + len
      }
      if (bitDepth != 8 || (colorType != 2 && colorType != 6) || interlace != 0 ||
        w <= 0 || h <= 0 || idat.size() == 0) return None
      val bpp = if (colorType == 6) 4 else 3
      val stride = w * bpp
      val raw = new Array[Byte]((stride + 1) * h)
      val inflater = new Inflater()
      inflater.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inflater.finished()) {
          val n = inflater.inflate(raw, got, raw.length - got)
          if (n == 0 && (inflater.needsInput() || inflater.needsDictionary())) return None
          got += n
        }
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inflater.end()
      if (got < raw.length) return None
      val out = new Array[Int](w * h)
      val prev = new Array[Byte](stride)
      val cur = new Array[Byte](stride)
      var y = 0
      while (y < h) {
        val ro = y * (stride + 1)
        val ft = raw(ro) & 0xff
        System.arraycopy(raw, ro + 1, cur, 0, stride)
        ft match {
          case 0 => ()
          case 1 =>
            var i = bpp
            while (i < stride) { cur(i) = (cur(i) + cur(i - bpp)).toByte; i += 1 }
          case 2 =>
            var i = 0
            while (i < stride) { cur(i) = (cur(i) + prev(i)).toByte; i += 1 }
          case 3 =>
            var i = 0
            while (i < stride) {
              val left = if (i >= bpp) cur(i - bpp) & 0xff else 0
              cur(i) = (cur(i) + ((left + (prev(i) & 0xff)) >> 1)).toByte
              i += 1
            }
          case 4 =>
            var i = 0
            while (i < stride) {
              val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
              val b = prev(i) & 0xff
              val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              cur(i) = (cur(i) + pred).toByte
              i += 1
            }
          case _ => return None
        }
        var x = 0
        while (x < w) {
          val i = x * bpp
          out(y * w + x) = ((cur(i) & 0xff) << 16) | ((cur(i + 1) & 0xff) << 8) | (cur(i + 2) & 0xff)
          x += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      Some((w, h, out))
    }
  }

  object MediaCodec {
    private val P = 1000000007L

    // by default ImageIO spools every read/write through a FILE-cached
    // image stream (a temp file per image!) and re-scans the plugin
    // registry per call — at millions of payloads that is the codec
    // cost, not the pixels. Memory-cached streams + one writer/reader
    // per executor thread keep the hot loop allocation-only.
    ImageIO.setUseCache(false)

    private val pngWriter = new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue() = ImageIO.getImageWritersByFormatName("png").next()
    }
    private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue() = ImageIO.getImageReadersByFormatName("png").next()
    }
    private val jpegWriter = new ThreadLocal[javax.imageio.ImageWriter] {
      override def initialValue() = ImageIO.getImageWritersByFormatName("jpeg").next()
    }
    private val jpegReader = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue() = ImageIO.getImageReadersByFormatName("jpeg").next()
    }

    /** Encode an RGB raster (row-major packed 0xRRGGBB ints) as a real
      * PNG — byte-level: IHDR (8-bit RGB, non-interlaced) + one
      * deflated filter-0 IDAT + IEND, CRC32 per chunk. Lossless, so
      * [[decodePng]] round-trips the exact pixels, and any standard
      * decoder (ImageIO parity is spec-pinned) reads it. Like the WAV
      * codec, the per-row path is pure byte arithmetic — no
      * BufferedImage, no color-model conversion, no ImageIO plumbing.
      */
    def encodePng(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
      require(rgb.length == width * height, s"raster ${rgb.length} != $width x $height")
      PngBytes.encode(width, height, rgb)
    }

    /** Decode a PNG payload to (width, height, row-major 0xRRGGBB) —
      * byte-level for the common case (8-bit RGB/RGBA, non-interlaced;
      * full 5-filter unfilter, chunk walk skips tEXt/ancillary), with
      * the ImageIO path kept as the fallback for every other layout
      * and for non-PNG image payloads (format-sniffing). Byte==ImageIO
      * decode parity on adaptive-filtered writer output is spec-pinned.
      */
    def decodePng(payload: Array[Byte]): (Int, Int, Array[Int]) =
      PngBytes.decode(payload).getOrElse(decodeViaImageIO(payload))

    /** Encode an RGB raster as a real baseline JPEG at the given
      * quality — the JDK's own codec (public ImageIO), driven through
      * the same thread-local-writer + memory-cached-stream pattern
      * that killed the PNG registry contention. Lossy: use
      * [[decodeJpeg]] invariants (dims always; uniformity for
      * flat rasters, whose blocks are DC-only) rather than pixel
      * equality when gating.
      */
    def encodeJpeg(width: Int, height: Int, rgb: Array[Int],
        qualityPct: Int = 85): Array[Byte] = {
      require(rgb.length == width * height, s"raster ${rgb.length} != $width x $height")
      require(qualityPct >= 1 && qualityPct <= 100, "quality in [1, 100]")
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, width, height, rgb, 0, width)
      val out = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      val writer = jpegWriter.get()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(qualityPct / 100.0f)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      } finally { writer.setOutput(null); ios.close() }
      out.toByteArray
    }

    /** Decode a JPEG payload to (width, height, row-major 0xRRGGBB) via
      * the thread-local reader — one reader per executor thread, no
      * plugin-registry scan, no temp-file spooling in the hot loop.
      */
    def decodeJpeg(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(payload))
      val reader = jpegReader.get()
      val img =
        try { reader.setInput(iis, true, true); reader.read(0) }
        finally { reader.setInput(null); iis.close() }
      require(img != null, "payload is not a decodable JPEG")
      val (w, h) = (img.getWidth, img.getHeight)
      (w, h, img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF))
    }

    /** Format-dispatched image decode — the one entry point the image
      * operators use. Declared formats route directly (no sniffing
      * cost); anything else is sniffed by magic bytes (JPEG SOI, then
      * the PNG path, whose own ImageIO fallback format-sniffs the
      * rest).
      */
    def decodeImage(format: String, payload: Array[Byte]): (Int, Int, Array[Int]) =
      if (format == Multimodal.PngFormat) decodePng(payload)
      else if (format == Multimodal.JpegFormat) decodeJpeg(payload)
      else if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF &&
        (payload(1) & 0xFF) == 0xD8) decodeJpeg(payload)
      else decodePng(payload)

    /** Container metadata WITHOUT decode — the gating scan a 100 TB
      * crawl runs before paying for any decompression: identify the
      * container by MAGIC BYTES (never the declared format — crawled
      * content lies about itself) and read (width, height, bit depth,
      * channel count) straight from the header structures. PNG: the
      * IHDR chunk that the signature forces to come first. JPEG: the
      * marker-segment walk (length-prefixed, fill-byte tolerant) to
      * the first SOF frame header — the walk must skip APPn/DQT/DHT
      * correctly to land on SOF, so any length-arithmetic bug breaks
      * the gated dims. Cost is O(header), not O(pixels): no inflate,
      * no IDCT, no BufferedImage.
      */
    def sniffMeta(payload: Array[Byte]): (String, Int, Int, Int, Int) = {
      if (payload.length >= 2 && (payload(0) & 0xFF) == 0xFF &&
          (payload(1) & 0xFF) == 0xD8) parseJpegMeta(payload)
      else if (payload.length >= 8 && (payload(0) & 0xFF) == 0x89 &&
          payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
        parsePngMeta(payload)
      else throw new IllegalArgumentException(
        "unrecognized container (no JPEG SOI or PNG signature)")
    }

    private def be16(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
    private def be32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xFF) << 24) | ((p(i + 1) & 0xFF) << 16) |
        ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)

    private def parseJpegMeta(p: Array[Byte]): (String, Int, Int, Int, Int) = {
      var i = 2 // past SOI
      while (i + 1 < p.length) {
        require((p(i) & 0xFF) == 0xFF, s"corrupt marker stream at offset $i")
        var m = p(i + 1) & 0xFF
        i += 2
        while (m == 0xFF && i < p.length) { m = p(i) & 0xFF; i += 1 } // fill bytes
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOF frame header: len(2) precision(1) height(2) width(2) ncomp(1)
          require(i + 7 < p.length, "truncated SOF segment")
          return ("jpeg", be16(p, i + 5), be16(p, i + 3), p(i + 2) & 0xFF,
            p(i + 7) & 0xFF)
        }
        require(m != 0xDA && m != 0xD9, "no SOF frame header before SOS/EOI")
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) () // standalone, no length
        else { require(i + 1 < p.length, "truncated segment"); i += be16(p, i) }
      }
      throw new IllegalArgumentException("no SOF frame header in payload")
    }

    private def parsePngMeta(p: Array[Byte]): (String, Int, Int, Int, Int) = {
      // signature(8) + IHDR chunk: len(4) 'IHDR'(4) w(4) h(4) depth(1) colortype(1)
      require(p.length >= 26 && p(12) == 'I' && p(13) == 'H' &&
        p(14) == 'D' && p(15) == 'R', "PNG signature without leading IHDR")
      val ct = p(25) & 0xFF
      val channels = ct match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case other => throw new IllegalArgumentException(s"bad PNG color type $other")
      }
      ("png", be32(p, 16), be32(p, 20), p(24) & 0xFF, channels)
    }

    private def decodeViaImageIO(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img =
        try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(payload))
          val reader = pngReader.get()
          try { reader.setInput(iis, true, true); reader.read(0) }
          finally { reader.setInput(null); iis.close() }
        } catch {
          case _: java.io.IOException =>
            ImageIO.read(new ByteArrayInputStream(payload))
        }
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val rgb = img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xFFFFFF)
      (w, h, rgb)
    }

    /** Nearest-neighbor scale of a packed raster: output pixel (x, y)
      * reads source pixel (x·srcW/dstW, y·srcH/dstH) — floor integer
      * arithmetic, so SQL replays the mapping exactly. Handles both
      * up- and down-scaling.
      */
    def scaleNearest(srcW: Int, srcH: Int, rgb: Array[Int],
        dstW: Int, dstH: Int): Array[Int] = {
      val out = new Array[Int](dstW * dstH)
      var y = 0
      while (y < dstH) {
        val sy = y * srcH / dstH
        var x = 0
        while (x < dstW) {
          out(y * dstW + x) = rgb(sy * srcW + x * srcW / dstW)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Position-weighted pixel digest: Σ rgbᵢ·(i+1) mod 1e9+7,
      * mod-accumulated so it never overflows at any image size; for
      * small rasters a 128-bit SQL sum-then-mod equals it exactly.
      */
    def pixelChecksum(rgb: Array[Int]): Long = {
      var acc = 0L
      var i = 0
      while (i < rgb.length) {
        acc = (acc + (rgb(i).toLong % P) * ((i + 1) % P)) % P
        i += 1
      }
      acc
    }

    /** Content-hash feature for OPAQUE payloads (no decoder in this
      * container for audio/video): a 32-bin byte histogram,
      * L1-normalized. Byte-level statistics by design — not a decode.
      */
    def byteHistogram(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](32)
      payload.foreach(b => hist((b & 0xFF) / 8) += 1f)
      val total = math.max(1f, payload.length.toFloat)
      hist.map(_ / total)
    }

    /** RGB-channel histogram of a decoded raster (32 bins over the
      * r, g, b bytes), L1-normalized — the decoded-pixel embedding.
      */
    def pixelHistogram(rgb: Array[Int]): Array[Float] = {
      val hist = new Array[Float](32)
      rgb.foreach { p =>
        hist(((p >> 16) & 0xFF) / 8) += 1f
        hist(((p >> 8) & 0xFF) / 8) += 1f
        hist((p & 0xFF) / 8) += 1f
      }
      val total = math.max(1f, 3f * rgb.length)
      hist.map(_ / total)
    }

    def checksum(payload: Array[Byte]): Long =
      payload.foldLeft(1125899906842597L)((acc, b) => acc * 31 + (b & 0xFF))
  }

  /** Wrap any table's string column as a binary media payload — the
    * opaque-format fixture generator (real pipelines read binary
    * columns straight from parquet).
    */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col(idCol).as("media_id"),
        struct(
          lit("image").as("mediaType"),
          lit("fake/raw").as("format"),
          (length(col(textCol)) % 64 + 1).cast("int").as("width"),
          lit(1).cast("int").as("height")).as("meta"),
        encode(col(textCol), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Deterministic synthetic PNG per id: dims 8+id%9 × 8+id%5, pixel
    * (x, y) = pure mod arithmetic over (id, x, y) — the whole raster
    * is SQL-replayable, which is what lets the m02 gate check a real
    * encode → resize → decode round trip byte-for-byte. Payloads are
    * REAL PNGs produced by ImageIO in the per-partition batch shape.
    */
  def syntheticPng(docs: DataFrame, idCol: String = "doc_id")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + Math.floorMod(id, 9L)).toInt
        val h = (8 + Math.floorMod(id, 5L)).toInt
        MediaRow(id, MediaMeta("image", PngFormat, w, h),
          MediaCodec.encodePng(w, h, syntheticRaster(id, w, h)))
      }
    }
  }

  /** The m02 pixel function: three channels of (id·a + x·b + y·c) mod
    * 256 — chosen to be exactly expressible in ANSI SQL.
    */
  private[graft] def syntheticRaster(id: Long, w: Int, h: Int): Array[Int] = {
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
        val g = Math.floorMod(id * 17 + x * 11 + y * 5, 256L).toInt
        val b = Math.floorMod(id * 13 + x * 3 + y * 19, 256L).toInt
        rgb(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Batched decode + feature extraction, dispatched on `meta.format`:
    * PNG payloads get a REAL decode (embedding over decoded pixels,
    * position-weighted pixel checksum); opaque formats get byte-level
    * content features. One codec pass per partition either way.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (isDecodableImage(r.meta.format)) {
          val (_, _, rgb) = MediaCodec.decodeImage(r.meta.format, r.payload)
          MediaFeatures(r.media_id, r.meta.mediaType, r.payload.length,
            MediaCodec.pixelChecksum(rgb), MediaCodec.pixelHistogram(rgb))
        } else {
          MediaFeatures(r.media_id, r.meta.mediaType, r.payload.length,
            MediaCodec.checksum(r.payload), MediaCodec.byteHistogram(r.payload))
        }
      }
    }
  }

  val PngSeqFormat = "video/png-seq"

  case class FrameStats(media_id: Long, frame_idx: Int, width: Int, height: Int,
      checksum: Long)

  /** Length-prefixed frame container: `[int32 nFrames][int32 len, bytes]…`
    * (big-endian, DataOutputStream) — the minimal seekable video-ish
    * layout frame sampling needs: a reader can skip a frame in O(1)
    * without decoding it.
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(frames.length)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    out.toByteArray
  }

  def unpackFrames(payload: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val dis = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    val n = dis.readInt()
    require(n >= 0, s"corrupt frame container: count $n")
    (0 until n).map { _ =>
      val len = dis.readInt()
      val buf = new Array[Byte](len)
      dis.readFully(buf)
      buf
    }
  }

  /** Deterministic synthetic PNG SEQUENCE per id (a tiny "video"):
    * 2 + id%3 frames of 8+id%9 × 8+id%5, each frame a REAL
    * ImageIO-encoded PNG whose raster is pure mod arithmetic over
    * (id, frame, x, y) — so [[extractFrames]]' decoded checksums
    * replay in SQL (the m03 gate), exactly the m02 pattern lifted to
    * the frame axis.
    */
  def syntheticPngSequence(docs: DataFrame, idCol: String = "doc_id")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + Math.floorMod(id, 9L)).toInt
        val h = (8 + Math.floorMod(id, 5L)).toInt
        val nf = (2 + Math.floorMod(id, 3L)).toInt
        val frames = (0 until nf).map(f =>
          MediaCodec.encodePng(w, h, syntheticFrameRaster(id, f, w, h)))
        MediaRow(id, MediaMeta("video", PngSeqFormat, w, h), packFrames(frames))
      }
    }
  }

  /** The m03 pixel function: [[syntheticRaster]]'s three channels with
    * a frame term mixed in — still exactly expressible in ANSI SQL.
    */
  private[graft] def syntheticFrameRaster(id: Long, f: Int, w: Int, h: Int): Array[Int] = {
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = Math.floorMod(id * 31 + f * 23 + x * 7 + y * 13, 256L).toInt
        val g = Math.floorMod(id * 17 + f * 29 + x * 11 + y * 5, 256L).toInt
        val b = Math.floorMod(id * 13 + f * 37 + x * 3 + y * 19, 256L).toInt
        rgb(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Frame sampling over a [[packFrames]] container: parse the frame
    * table, DECODE only every `stride`-th frame (skipped frames cost a
    * length read, not a codec pass — the reason the container is
    * length-prefixed), and report each sampled frame's decoded
    * (width, height, pixel checksum). Per-partition batch shape like
    * every codec op here; the output explodes ≤ nFrames/stride rows
    * per payload, so downstream grouping sees bounded fan-out.
    */
  def extractFrames(media: Dataset[MediaRow], stride: Int = 1): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    require(stride > 0, "stride must be positive")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        require(r.meta.format == PngSeqFormat,
          s"extractFrames needs a $PngSeqFormat container, got ${r.meta.format}")
        unpackFrames(r.payload).iterator.zipWithIndex.collect {
          case (png, idx) if idx % stride == 0 =>
            val (w, h, rgb) = MediaCodec.decodePng(png)
            FrameStats(r.media_id, idx, w, h, MediaCodec.pixelChecksum(rgb))
        }
      }
    }
  }

  /** SHOT-BOUNDARY detection over a frame container: per-frame 56-bit
    * dHash (one codec pass per partition, like [[extractFrames]]),
    * then the Hamming distance between each frame and its predecessor
    * — a boundary is a consecutive pair whose perceptual hashes differ
    * by ≥ `threshold` bits (the classic hash-difference shot cut
    * detector). Output one row per non-first frame:
    * (media_id, frame_idx, hamming, is_boundary).
    *
    * Plan: frame hashes explode ≤ nFrames rows per payload; the
    * consecutive pairing is a lag window partitioned by media_id —
    * frame counts per medium are bounded (a 2-hour film is ~200k
    * frames), so the window partition never approaches corpus scale.
    * Payload bytes are dropped before the shuffle: only (id, idx,
    * 8-byte hash) rows move.
    */
  def shotBoundaries(media: Dataset[MediaRow], threshold: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameDhashes(media)
      .withColumn("_prev", lag(col("dhash"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col("media_id"), col("frame_idx"),
        bit_count(expr("_prev ^ dhash")).cast("long").as("hamming"))
      .withColumn("is_boundary", (col("hamming") >= threshold).cast("long"))
  }

  /** Per-frame 56-bit dHash table (media_id, frame_idx, dhash) — one
    * codec pass per partition, payload bytes dropped before any
    * shuffle. Shared by [[shotBoundaries]] and [[keyframes]].
    */
  private def frameDhashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        require(r.meta.format == PngSeqFormat,
          s"frame hashing needs a $PngSeqFormat container, got ${r.meta.format}")
        unpackFrames(r.payload).iterator.zipWithIndex.map { case (png, idx) =>
          val (w, h, rgb) = MediaCodec.decodePng(png)
          (r.media_id, idx.toLong, dhash56(w, h, rgb))
        }
      }
    }.toDF("media_id", "frame_idx", "dhash")
  }

  /** KEYFRAME extraction — the sampling step after shot detection:
    * one representative frame per shot (its first), the frames a
    * vision-model training pipeline actually keeps from a video. A
    * shot STARTS at frame 0 and at every [[shotBoundaries]] cut
    * (consecutive dHash Hamming ≥ `threshold`), so
    * shot_id = (running count of starts) − 1 and the keyframes are
    * exactly the start frames. Single-frame media yield their one
    * frame as shot 0's keyframe.
    *
    * Plan: same per-partition hash pass as [[shotBoundaries]]; the
    * lag and the running sum share ONE window spec (one exchange +
    * sort at frame grain, bounded per medium — never corpus-wide).
    */
  def keyframes(media: Dataset[MediaRow], threshold: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameDhashes(media)
      .withColumn("_prev", lag(col("dhash"), 1).over(w))
      .withColumn("_is_start",
        when(col("_prev").isNull, 1L)
          .when(bit_count(expr("_prev ^ dhash")) >= threshold, 1L)
          .otherwise(0L))
      .withColumn("shot_id", sum(col("_is_start")).over(w) - lit(1L))
      .filter(col("_is_start") === 1L)
      .select(col("media_id"), col("shot_id"), col("frame_idx"))
  }

  /** Deterministic frame sampling: every nth byte-slice of the payload
    * as a "frame" (the partitioned explode shape video frame
    * extraction uses; the slicing here is byte-level since the
    * container ships no video decoder).
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 16, everyNth: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyNth == 0)
        .map { case (frame, idx) => (r.media_id, idx, frame) }
    }.toDF("media_id", "frame_idx", "frame_payload")
  }

  /** REAL image resize: decode the PNG payload, nearest-neighbor scale
    * to (targetWidth, targetHeight), re-encode as PNG. Same
    * per-partition batch shape as [[extractFeatures]]; output meta
    * carries the new dimensions and the payload is a decodable PNG of
    * exactly those pixels (gated end-to-end by m02).
    */
  def resize(media: Dataset[MediaRow], targetWidth: Int, targetHeight: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetWidth > 0 && targetHeight > 0, "target dims must be positive")
    media.mapPartitions { rows =>
      rows.map { r =>
        require(isDecodableImage(r.meta.format),
          s"resize needs a decodable image payload, got ${r.meta.format}")
        val (w, h, rgb) = MediaCodec.decodeImage(r.meta.format, r.payload)
        val scaled = MediaCodec.scaleNearest(w, h, rgb, targetWidth, targetHeight)
        // output is ALWAYS lossless PNG (a resize artifact must carry
        // exactly the scaled pixels, whatever the input codec was)
        MediaRow(r.media_id,
          r.meta.copy(format = PngFormat, width = targetWidth, height = targetHeight),
          MediaCodec.encodePng(targetWidth, targetHeight, scaled))
      }
    }
  }

  /** Decode each payload and report (width, height, pixel checksum) —
    * the verification surface: running it AFTER [[resize]] proves the
    * emitted payloads are real images carrying exactly the scaled
    * pixels, not pass-through bytes.
    */
  def decodedStats(media: Dataset[MediaRow]): Dataset[DecodedStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = MediaCodec.decodeImage(r.meta.format, r.payload)
        DecodedStats(r.media_id, w, h, MediaCodec.pixelChecksum(rgb))
      }
    }
  }

  /** Media near-dup detection: features → cosine pairs (composition with
    * the similarity operators; this is the 100 TB dedup path for
    * non-text modalities).
    */
  def mediaDupPairs(media: Dataset[MediaRow], minSim: Double = 0.999): DataFrame =
    Similarity.cosineDupPairs(
      extractFeatures(media).toDF().withColumnRenamed("media_id", "vec_id"), minSim)

  // ---------------------------------------------------------------------
  // Perceptual hashing (dHash): the image-dedup primitive — byte-exact
  // dedup misses re-encodes/resizes, embedding dedup needs a model; the
  // difference hash catches "same picture, different file" with pure
  // integer pixel arithmetic, which also makes it SQL-replayable and
  // therefore gateable (m06/d15).
  // ---------------------------------------------------------------------

  /** Integer Rec.601-style luma of a packed 0xRRGGBB pixel —
    * (299·r + 587·g + 114·b) div 1000, truncating, non-negative.
    */
  private[graft] def grayLuma(rgb: Int): Int =
    (((rgb >> 16) & 255) * 299 + ((rgb >> 8) & 255) * 587 + (rgb & 255) * 114) / 1000

  /** 56-bit difference hash: nearest-neighbor scale to an 8×8 luma
    * grid, bit j = (y·7 + x) set iff gray(x+1, y) > gray(x, y) — the
    * classic dHash with a 7-comparison row so the hash stays a
    * POSITIVE long (bit 55 max), keeping every downstream sum/shift
    * exact in both engines (the t16 overflow-bound principle).
    */
  private[graft] def dhash56(w: Int, h: Int, rgb: Array[Int]): Long = {
    val g = MediaCodec.scaleNearest(w, h, rgb, 8, 8).map(grayLuma)
    var hsh = 0L
    var j = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 7) {
        if (g(y * 8 + x + 1) > g(y * 8 + x)) hsh |= 1L << j
        j += 1
        x += 1
      }
      y += 1
    }
    hsh
  }

  /** Class-seeded synthetic PNG fixture: raster seed `id % classes`
    * (so docs share images — the duplicate structure dHash exists to
    * find), one noise level per `id div classes` perturbing the (0,0)
    * red channel (a near-dup, not an exact dup: the perturbation moves
    * at most one hash bit). REAL ImageIO PNGs, SQL-replayable pixels —
    * [[syntheticPng]]'s proof shape with controlled duplication.
    */
  def syntheticPngClasses(docs: DataFrame, idCol: String = "doc_id",
      classes: Int = 50, noiseLevels: Int = 3)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val img = Math.floorMod(id, classes.toLong)
        val w = (8 + Math.floorMod(img, 9L)).toInt
        val h = (8 + Math.floorMod(img, 5L)).toInt
        val rgb = syntheticRaster(img, w, h)
        val nz = Math.floorMod(id / classes, noiseLevels.toLong).toInt
        val r0 = ((((rgb(0) >> 16) & 255) + 40 * nz) % 256) << 16
        rgb(0) = r0 | (rgb(0) & 0xFFFF)
        MediaRow(id, MediaMeta("image", PngFormat, w, h),
          MediaCodec.encodePng(w, h, rgb))
      }
    }
  }

  /** Deterministic synthetic JPEG per id: [[syntheticPng]]'s dims with
    * a SOLID gray raster g = 28 + (id·37 mod 200) — REAL baseline
    * JPEGs from the JDK encoder. Solid rasters are the deterministic
    * island of a lossy codec: every 8×8 block is DC-only (AC
    * coefficients are exactly zero for a constant block, and edge
    * padding replicates the same constant), so the DECODED raster is
    * uniform whatever the quantization did to the level — dims,
    * dhash = 0, contrast = 0 and the extreme-pixel fractions are all
    * oracle-replayable invariants even though pixel values are not.
    * g ∈ [28, 227] keeps any DC drift away from the <16 / >239
    * extreme bands.
    */
  def syntheticJpeg(docs: DataFrame, idCol: String = "doc_id")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + Math.floorMod(id, 9L)).toInt
        val h = (8 + Math.floorMod(id, 5L)).toInt
        val g = (28 + Math.floorMod(id * 37, 200L)).toInt
        val rgb = Array.fill(w * h)((g << 16) | (g << 8) | g)
        MediaRow(id, MediaMeta("image", JpegFormat, w, h),
          MediaCodec.encodeJpeg(w, h, rgb))
      }
    }
  }

  /** Container metadata without decode ([[MediaCodec.sniffMeta]]) over
    * a mixed-container corpus: one narrow header-only pass emitting
    * (media_id, container, width, height, bit_depth, n_channels). The
    * container comes from MAGIC-BYTE sniffing, never `meta.format` —
    * the declared format of crawled bytes is untrusted input. This is
    * the scan that sizes/filters an image corpus BEFORE any decode is
    * paid for (drop tiny/huge/deep-color payloads at O(header) cost);
    * at 100 TB it is the difference between a metadata pass and a
    * decompression pass over the whole corpus.
    */
  def containerMeta(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (c, w, h, depth, ch) = MediaCodec.sniffMeta(r.payload)
        (r.media_id, c, w, h, depth, ch)
      }
    }.toDF("media_id", "container", "width", "height", "bit_depth", "n_channels")
  }

  /** Per-image 56-bit dHash over REAL decoded payloads — one codec pass
    * per partition, narrow, output (media_id, dhash).
    */
  def imageDhash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = MediaCodec.decodeImage(r.meta.format, r.payload)
        (r.media_id, dhash56(w, h, rgb))
      }
    }.toDF("media_id", "dhash")
  }

  /** Near-dup image pairs by banded Hamming join over dHashes — the
    * d04/d10 SimHash pairing machinery applied to the image modality.
    * `maxDist + 1` bands of 56/(maxDist+1) bits: two hashes within
    * `maxDist` agree on ≥ 1 full band (pigeonhole), so candidates come
    * from equi-joins on (band, band-bits) — never an all-pairs product
    * — and are verified with an exact `bit_count(xor)`. All band
    * extraction is shift/mask built-ins (codegen'd, no UDF).
    */
  def dhashPairs(hashes: DataFrame, maxDist: Int = 3,
      idCol: String = "media_id", hashCol: String = "dhash"): DataFrame =
    hammingPairs(hashes, bits = 56, maxDist = maxDist, idCol, hashCol)

  /** Near-dup pairs by banded Hamming join over any ≤ 62-bit hash
    * column — the shared engine behind [[dhashPairs]] (56-bit image
    * dHash) and [[audioFingerprint]] pairing (31-bit energy-profile
    * fingerprints). `maxDist + 1` DISJOINT bands covering all `bits`
    * (band b = bits [bits·b/bands, bits·(b+1)/bands)): two hashes
    * within `maxDist` must agree on ≥ 1 full band (pigeonhole), so
    * candidates come from equi-joins on (band, band-bits) — never an
    * all-pairs product — verified with an exact `bit_count(xor)`.
    * Shift/mask built-ins only (codegen'd, no UDF).
    */
  def hammingPairs(hashes: DataFrame, bits: Int, maxDist: Int,
      idCol: String, hashCol: String): DataFrame = {
    val banded = bandExtract(hashes, bits, maxDist, idCol, hashCol)
    val a = banded.select(col("band"), col("bv"),
      col("id").as("id_a"), col("h").as("h_a"))
    val b = banded.select(col("band"), col("bv"),
      col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("band", "bv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(h_a ^ h_b)").cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** The one banding definition both pairing shapes share (so band
    * boundaries can never drift between them): explode each hash into
    * `min(maxDist+1, bits)` disjoint bands → (id, h, band, bv).
    */
  private def bandExtract(hashes: DataFrame, bits: Int, maxDist: Int,
      idCol: String, hashCol: String): DataFrame = {
    require(bits > 0 && bits <= 62, s"bits $bits out of range")
    require(maxDist >= 0 && maxDist < bits, s"maxDist $maxDist out of range")
    val bands = math.min(maxDist + 1, bits)
    val bandStructs = (0 until bands).map { b =>
      val lo = bits * b / bands
      val hi = bits * (b + 1) / bands
      struct(lit(b).as("band"),
        shiftright(col("h"), lo)
          .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bv"))
    }
    hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .select(col("id"), col("h"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("h"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
  }

  /** Incremental banded-Hamming pairs: NEW hashes vs an existing
    * corpus index plus new-vs-new — but never corpus-vs-corpus (the
    * [[graft.ext.Dedup.minhashDedupNewPairs]] ingest shape on the
    * fingerprint modality). Batch rows supersede corpus rows sharing
    * an id (anti-join up front, so no self-pairs and no stale
    * orientation flips). Per batch the cost is O(|new| · bucket
    * fan-in): the corpus side only ever flows through band extraction
    * — in production a PRE-BANDED persisted index — and the candidate
    * join probes it with the batch's bands. Output rows are
    * (id_new, id_other, dist), new-new pairs once (id_new < id_other).
    */
  def hammingPairsNew(newHashes: DataFrame, corpusHashes: DataFrame,
      bits: Int, maxDist: Int, idCol: String, hashCol: String): DataFrame = {
    val corpusOnly = corpusHashes
      .join(newHashes.select(col(idCol)), Seq(idCol), "left_anti")
    def band(df: DataFrame): DataFrame =
      bandExtract(df, bits, maxDist, idCol, hashCol)
    val newBanded = band(newHashes)
    val allBanded = band(corpusOnly).withColumn("_new", lit(false))
      .union(newBanded.withColumn("_new", lit(true)))
    val a = newBanded.select(col("band"), col("bv"),
      col("id").as("id_new"), col("h").as("h_a"))
    val b = allBanded.select(col("band"), col("bv"),
      col("id").as("id_other"), col("h").as("h_b"), col("_new"))
    a.join(b, Seq("band", "bv"))
      // corpus partner: any; new partner: orient once (id_new < id_other)
      .filter(!col("_new") || col("id_new") < col("id_other"))
      .filter(col("id_new") =!= col("id_other"))
      .select(col("id_new"), col("id_other"),
        expr("bit_count(h_a ^ h_b)").cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Class-seeded synthetic WAV fixture ([[syntheticWav]]'s proof
    * shape with controlled duplication, the audio twin of
    * [[syntheticPngClasses]]): PCM seed `id % classes`, one noise
    * level per `id div classes` folded into sample 0 INSIDE the mod
    * (so the perturbed sample stays a valid short and both engines
    * replay it exactly).
    */
  def syntheticWavClasses(docs: DataFrame, idCol: String = "doc_id",
      classes: Int = 50, noiseLevels: Int = 3)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val img = Math.floorMod(id, classes.toLong)
        val nz = Math.floorMod(id / classes, noiseLevels.toLong)
        val n = (512 + Math.floorMod(img, 384L)).toInt
        // per-class chirp: class-dependent step + quadratic sweep, so
        // energy profiles (and hence fingerprints) separate classes —
        // a plain linear ramp gives every class the same delta-sign
        // profile and the fingerprint would match everything
        val samples = Array.tabulate(n) { i =>
          val base =
            if (i == 0) img * 31 + 101 * nz
            else img * 31 + i.toLong * (257 + img * 13) + 3L * i * i
          (Math.floorMod(base, 65536L) - 32768L).toShort
        }
        MediaRow(id, MediaMeta("audio", WavFormat, 0, 0), AudioCodec.encodeWav(samples))
      }
    }
  }

  /** Silence-padded synthetic WAV fixture for the trim family: the
    * [[syntheticWavClasses]] chirp wrapped in `id % 7` leading and
    * `id % 5` trailing noise-floor samples (`(id + i) % 3 − 1` ∈
    * {−1, 0, 1} — nonzero but far below any trim threshold), so trims
    * have real work on both ends and the whole padded stream replays
    * from id arithmetic.
    */
  def syntheticWavPadded(docs: DataFrame, idCol: String = "doc_id",
      classes: Int = 50, noiseLevels: Int = 3)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val img = Math.floorMod(id, classes.toLong)
        val nz = Math.floorMod(id / classes, noiseLevels.toLong)
        val n = (512 + Math.floorMod(img, 384L)).toInt
        val lead = Math.floorMod(id, 7L).toInt
        val trail = Math.floorMod(id, 5L).toInt
        val samples = new Array[Short](lead + n + trail)
        var i = 0
        while (i < samples.length) {
          val v: Long =
            if (i < lead || i >= lead + n) Math.floorMod(id + i, 3L) - 1L
            else {
              val j = i - lead
              val base =
                if (j == 0) img * 31 + 101 * nz
                else img * 31 + j.toLong * (257 + img * 13) + 3L * j * j
              Math.floorMod(base, 65536L) - 32768L
            }
          samples(i) = v.toShort
          i += 1
        }
        MediaRow(id, MediaMeta("audio", WavFormat, 0, 0), AudioCodec.encodeWav(samples))
      }
    }
  }

  /** Per-payload silence BOUNDS at `threshold` — one decode pass
    * emitting the edit [[trimSilence]] will make: `(media_id,
    * n_samples, lead, trail, kept_peak)` where lead/trail count the
    * samples before the first / after the last with `|s| > threshold`
    * (an all-quiet clip reports lead = n, trail = 0, kept_peak = 0).
    * All integers — replayable positionally in SQL, which is what
    * puts the m16 trim chain under the hash gate.
    */
  def silenceBounds(media: Dataset[MediaRow], threshold: Long): DataFrame = {
    import media.sparkSession.implicits._
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    media.mapPartitions { rows =>
      rows.map { r =>
        val s = AudioCodec.decodeWav(r.payload)
        var first = -1; var last = -1
        var i = 0
        while (i < s.length) {
          if (math.abs(s(i).toLong) > threshold) {
            if (first < 0) first = i
            last = i
          }
          i += 1
        }
        if (first < 0) (r.media_id, s.length.toLong, s.length.toLong, 0L, 0L)
        else {
          var peak = 0L
          var j = first
          while (j <= last) {
            val v = math.abs(s(j).toLong)
            if (v > peak) peak = v
            j += 1
          }
          (r.media_id, s.length.toLong, first.toLong,
            (s.length - 1 - last).toLong, peak)
        }
      }
    }.toDF("media_id", "n_samples", "lead", "trail", "kept_peak")
  }

  /** Leading/trailing silence TRIM — the speech-pipeline edit next to
    * [[normalizeAudio]]'s gain: drop every sample before the first and
    * after the last with `|s| > threshold`, re-encode the kept slice
    * losslessly. An all-quiet payload trims to the EMPTY clip (zero
    * samples — a valid WAV with data length 0, the honest answer for
    * noise-floor audio; downstream length gates drop it). Interior
    * quiet runs are untouched — trim is an EDGE edit, not a gate. One
    * decode+encode per row, payloads never shuffle; [[silenceBounds]]
    * is the decision's audit twin (m16 joins the two, pinning
    * n_out = n − lead − trail and peak_out = kept_peak).
    */
  def trimSilence(media: Dataset[MediaRow], threshold: Long): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    media.mapPartitions { rows =>
      rows.map { r =>
        require(r.meta.format == WavFormat,
          s"trimSilence needs a $WavFormat payload, got ${r.meta.format}")
        val s = AudioCodec.decodeWav(r.payload)
        var first = -1; var last = -1
        var i = 0
        while (i < s.length) {
          if (math.abs(s(i).toLong) > threshold) {
            if (first < 0) first = i
            last = i
          }
          i += 1
        }
        val kept =
          if (first < 0) new Array[Short](0)
          else java.util.Arrays.copyOfRange(s, first, last + 1)
        r.copy(payload = AudioCodec.encodeWav(kept))
      }
    }
  }

  /** Energy-profile audio fingerprint (Chromaprint-flavored, integer
    * end to end): decode the WAV, take the first `windows · window`
    * samples (every payload must cover them), per-window energy
    * `Σ s²`, bit j set iff energy(j+1) > energy(j) — a
    * `windows - 1`-bit non-negative long. The robust-to-small-noise
    * sketch that blocks audio near-dup pairing the way dHash blocks
    * image pairing.
    */
  def audioFingerprint(media: Dataset[MediaRow], window: Int = 16,
      windows: Int = 32): DataFrame = {
    import media.sparkSession.implicits._
    require(window > 0 && windows > 1 && windows <= 63, "bad fingerprint shape")
    media.mapPartitions { rows =>
      rows.map { r =>
        val s = AudioCodec.decodeWav(r.payload)
        require(s.length >= window * windows,
          s"payload ${r.media_id} has ${s.length} samples, needs ${window * windows}")
        val e = Array.tabulate(windows) { w =>
          var acc = 0L
          var i = w * window
          val hi = i + window
          while (i < hi) { val v = s(i).toLong; acc += v * v; i += 1 }
          acc
        }
        var fp = 0L
        var j = 0
        while (j < windows - 1) {
          if (e(j + 1) > e(j)) fp |= 1L << j
          j += 1
        }
        (r.media_id, fp)
      }
    }.toDF("media_id", "afp")
  }

  /** Per-image QUALITY gate — the gopherRules of the image modality:
    * decode the PNG once, compute integer luma per pixel (the shared
    * Rec.601 truncating formula the dHash uses) and emit the
    * structural keep/drop metrics of an image curation pipeline:
    *
    *   - `mean_luma`: Σ luma div n — exposure proxy, gated to a band
    *     (too dark / blown-out images drop)
    *   - `contrast`: max − min luma — flat images (solid fills,
    *     placeholder tiles) drop below `minContrast`
    *   - `dark_micro` / `bright_micro`: fraction of pixels at the
    *     extremes (luma < 16 / > 239) — crush/clip damage
    *
    * All integer, truncating div on non-negative operands — the table
    * and the decision hash-match the oracle's raster replay. One
    * decode per row in a mapPartitions (the codec boundary); payload
    * bytes never shuffle.
    */
  def imageQualityRules(media: Dataset[MediaRow], minContrast: Long = 150L,
      lumaMin: Long = 64L, lumaMax: Long = 192L,
      extremeMaxMicro: Long = 40000L): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = MediaCodec.decodeImage(r.meta.format, r.payload)
        val n = (w * h).toLong
        require(n > 0, s"payload ${r.media_id} decodes to an empty raster")
        var sum = 0L; var mn = 255L; var mx = 0L; var dark = 0L; var bright = 0L
        var i = 0
        while (i < rgb.length) {
          val l = grayLuma(rgb(i)).toLong
          sum += l
          if (l < mn) mn = l
          if (l > mx) mx = l
          if (l < 16L) dark += 1
          if (l > 239L) bright += 1
          i += 1
        }
        val meanLuma = sum / n
        val contrast = mx - mn
        val darkMicro = dark * 1000000L / n
        val brightMicro = bright * 1000000L / n
        val keep =
          if (contrast >= minContrast && meanLuma >= lumaMin &&
            meanLuma <= lumaMax && darkMicro <= extremeMaxMicro &&
            brightMicro <= extremeMaxMicro) 1L else 0L
        (r.media_id, n, meanLuma, contrast, darkMicro, brightMicro, keep)
      }
    }.toDF("media_id", "n_pixels", "mean_luma", "contrast", "dark_micro",
      "bright_micro", "keep")
  }

  /** Per-clip audio QUALITY gate — the gopherRules of the audio
    * modality: decode the full clip once and emit the structural
    * keep/drop metrics every speech/audio curation pipeline runs
    * before any model-based scoring:
    *
    *   - `peak`: max |sample| (a whole-clip near-zero peak = dead air)
    *   - `clip_count` / `clip_micro`: samples at the 16-bit rails
    *     (|s| ≥ 32767) — clipping / hard-limiting damage
    *   - `energy_per_sample`: Σ s² div n — integer loudness proxy
    *   - `silence_micro`: fraction of samples under `silenceAbs`
    *
    * plus `keep` = not clipped (≤ clipMaxMicro), not mostly silence
    * (≤ silenceMaxMicro), and audible (peak ≥ minPeak). All integer
    * arithmetic (truncating div on non-negative operands), so the
    * whole table — including the decision — is cross-engine exact.
    * One decode per row inside a mapPartitions (the codec boundary,
    * same shape as [[audioFingerprint]]); output is narrow, payload
    * bytes never shuffle.
    */
  def audioQualityRules(media: Dataset[MediaRow], silenceAbs: Int = 1024,
      clipMaxMicro: Long = 10000L, silenceMaxMicro: Long = 500000L,
      minPeak: Long = 256L): DataFrame = {
    import media.sparkSession.implicits._
    require(silenceAbs > 0, "silenceAbs must be positive")
    media.mapPartitions { rows =>
      rows.map { r =>
        val s = AudioCodec.decodeWav(r.payload)
        require(s.nonEmpty, s"payload ${r.media_id} decodes to zero samples")
        var energy = 0L; var peak = 0L; var clip = 0L; var silent = 0L
        var i = 0
        while (i < s.length) {
          val v = math.abs(s(i).toLong)
          energy += v * v
          if (v > peak) peak = v
          if (v >= 32767L) clip += 1
          if (v < silenceAbs) silent += 1
          i += 1
        }
        val n = s.length.toLong
        val clipMicro = clip * 1000000L / n
        val silenceMicro = silent * 1000000L / n
        val keep =
          if (clipMicro <= clipMaxMicro && silenceMicro <= silenceMaxMicro &&
            peak >= minPeak) 1L else 0L
        (r.media_id, n, peak, clip, clipMicro, energy / n, silenceMicro, keep)
      }
    }.toDF("media_id", "n_samples", "peak", "clip_count", "clip_micro",
      "energy_per_sample", "silence_micro", "keep")
  }

  /** Minimal per-payload audio report — (media_id, n_samples, peak,
    * energy), all exact integers; the before/after measurement the m15
    * normalization gate joins on. One decode per row, narrow.
    */
  def audioStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val s = AudioCodec.decodeWav(r.payload)
        var energy = 0L; var peak = 0L
        var i = 0
        while (i < s.length) {
          val v = math.abs(s(i).toLong)
          energy += v * v
          if (v > peak) peak = v
          i += 1
        }
        (r.media_id, s.length.toLong, peak, energy)
      }
    }.toDF("media_id", "n_samples", "peak", "energy")
  }

  /** Peak normalization — the loudness-leveling TRANSFORM of the audio
    * family (the m13-resize analogue for sound): decode, find the peak
    * magnitude, rescale every sample to `s' = s · targetPeak / peak`
    * with TRUNCATING integer division (toward zero — the convention
    * BOTH engines share: JVM `/` on longs and DuckDB/Spark-SQL integer
    * division all truncate, so negative samples replay exactly; floor
    * division would round them the other way and split the hash),
    * re-encode losslessly. Contracts: `|s'| ≤ targetPeak` by
    * construction; a peak already AT target reproduces samples
    * bit-identically (gain 1 is exact); an all-zero payload passes
    * through unchanged (no gain is defined for silence — pass-through
    * beats an arbitrary choice, and the quality gate upstream drops
    * silence anyway). One decode+encode per row, payloads never
    * shuffle.
    */
  def normalizeAudio(media: Dataset[MediaRow],
      targetPeak: Int = 28000): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(targetPeak > 0 && targetPeak <= 32767,
      s"targetPeak must be in [1, 32767], got $targetPeak")
    media.mapPartitions { rows =>
      rows.map { r =>
        require(r.meta.format == WavFormat,
          s"normalizeAudio needs a $WavFormat payload, got ${r.meta.format}")
        val s = AudioCodec.decodeWav(r.payload)
        var peak = 0L
        var i = 0
        while (i < s.length) {
          val v = math.abs(s(i).toLong)
          if (v > peak) peak = v
          i += 1
        }
        if (peak == 0L) r
        else {
          val out = new Array[Short](s.length)
          var j = 0
          while (j < s.length) {
            out(j) = (s(j).toLong * targetPeak / peak).toShort
            j += 1
          }
          r.copy(payload = AudioCodec.encodeWav(out))
        }
      }
    }
  }

  // ---------------------------------------------------------------------
  // PNG metadata: tEXt chunks inserted/parsed at the BYTE level per the
  // PNG spec (length + type + data + CRC32 over type||data) — real
  // format work, not a library accessor; tagged payloads stay valid
  // images (ImageIO still decodes them, pinned in spec).
  // ---------------------------------------------------------------------

  object PngText {
    private val Signature = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

    private def crc(chunkType: Array[Byte], data: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32()
      c.update(chunkType); c.update(data)
      c.getValue.toInt
    }

    /** Insert `tEXt` chunks (Latin-1 `key\0value`, per spec) right
      * after IHDR. The rest of the byte stream is untouched, so the
      * image data and any prior metadata survive verbatim.
      */
    def addText(png: Array[Byte], entries: Seq[(String, String)]): Array[Byte] = {
      require(png.length > 33 && png.take(8).sameElements(Signature), "not a PNG")
      // IHDR is mandated first: 8 sig + 4 len + 4 type + 13 data + 4 crc
      val ihdrEnd = 8 + 4 + 4 + 13 + 4
      val out = new ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.write(png, 0, ihdrEnd)
      entries.foreach { case (k, v) =>
        val tpe = "tEXt".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val data = k.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          Array(0.toByte) ++ v.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        dos.writeInt(data.length); dos.write(tpe); dos.write(data)
        dos.writeInt(crc(tpe, data))
      }
      dos.write(png, ihdrEnd, png.length - ihdrEnd)
      dos.flush()
      out.toByteArray
    }

    /** Walk the chunk stream and return every `tEXt` (key, value),
      * CRC-VERIFIED — a corrupted chunk throws rather than yielding
      * silent garbage.
      */
    def readText(png: Array[Byte]): Seq[(String, String)] = {
      require(png.length > 8 && png.take(8).sameElements(Signature), "not a PNG")
      val dis = new java.io.DataInputStream(new ByteArrayInputStream(png, 8, png.length - 8))
      val found = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (!done) {
        val len = dis.readInt()
        val tpe = new Array[Byte](4); dis.readFully(tpe)
        val data = new Array[Byte](len); dis.readFully(data)
        val storedCrc = dis.readInt()
        val typeStr = new String(tpe, java.nio.charset.StandardCharsets.ISO_8859_1)
        if (typeStr == "tEXt") {
          require(storedCrc == crc(tpe, data), s"tEXt chunk CRC mismatch")
          val sep = data.indexOf(0.toByte)
          require(sep > 0, "malformed tEXt chunk: no key separator")
          found += ((new String(data, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1),
            new String(data, sep + 1, data.length - sep - 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)))
        }
        if (typeStr == "IEND") done = true
      }
      found.toSeq
    }
  }

  /** [[syntheticPng]] with deterministic provenance tags in real tEXt
    * chunks — the metadata a curation pipeline filters on (source,
    * license) carried INSIDE the payload the way real image corpora
    * ship it.
    */
  def syntheticPngTagged(docs: DataFrame, idCol: String = "doc_id")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    syntheticPng(docs, idCol).mapPartitions { rows =>
      rows.map { r =>
        val tags = Seq(
          "source" -> s"src_${Math.floorMod(r.media_id, 7L)}",
          "license" -> s"cc${Math.floorMod(r.media_id, 3L)}")
        r.copy(payload = PngText.addText(r.payload, tags))
      }
    }
  }

  /** Explode each payload's tEXt metadata to (media_id, key, value)
    * rows — the m05 gate surface (CRC-verified parse of the real chunk
    * stream; values replay from id arithmetic in SQL).
    */
  def extractPngText(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      PngText.readText(r.payload).map { case (k, v) => (r.media_id, k, v) }
    }.toDF("media_id", "key", "value")
  }

  // ---------------------------------------------------------------------
  // Audio modality: byte-level RIFF/WAVE codec, same opaque-binary
  // plumbing as the image path. javax.sound's AudioSystem runs a
  // synchronized service-provider registry scan on EVERY call, so 32
  // concurrent tasks serialize on the JDK lock and per-row cost grows
  // super-linearly with parallelism×rows (the r11 audio_gate probe arm
  // measured 3.54 per-row at ×10). WAV PCM is a RIFF container — a
  // 44-byte canonical header plus little-endian samples — so the codec
  // parses/emits it directly with zero shared state, the same pattern
  // PngText uses for tEXt chunks. Parity against AudioSystem is
  // spec-pinned in MultimodalSpec.
  // ---------------------------------------------------------------------

  val WavFormat = "audio/wav"

  case class AudioFrame(media_id: Long, frame_idx: Int, n_samples: Int,
      energy: Long, zero_crossings: Long, peak: Int)

  object AudioCodec {
    @inline private def i32le(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    @inline private def i16le(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline private def readI32le(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    @inline private def readU16le(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    @inline private def tag(b: Array[Byte], off: Int): String =
      if (off + 4 <= b.length) new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII) else ""

    /** Encode signed 16-bit mono PCM as a real RIFF/WAVE payload
      * (canonical 44-byte header + little-endian samples). Lossless:
      * [[decodeWav]] round-trips the exact samples. Pure byte
      * arithmetic — safe to call per row from 32 concurrent tasks.
      */
    def encodeWav(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      i32le(out, 4, 36 + dataSize)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      i32le(out, 16, 16)            // PCM fmt chunk size
      i16le(out, 20, 1)             // audio format: PCM
      i16le(out, 22, 1)             // channels: mono
      val sr = sampleRate.toInt
      i32le(out, 24, sr)            // sample rate
      i32le(out, 28, sr * 2)        // byte rate = sr * blockAlign
      i16le(out, 32, 2)             // block align
      i16le(out, 34, 16)            // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      i32le(out, 40, dataSize)
      var i = 0
      while (i < samples.length) {
        i16le(out, 44 + 2 * i, samples(i).toInt)
        i += 1
      }
      out
    }

    /** Decode a WAVE payload back to its 16-bit mono PCM samples. A
      * real chunk-walking parse (the header, not trust, decides the
      * layout): finds `fmt ` and `data` wherever they sit, skips
      * unknown chunks with RIFF word alignment, and rejects any
      * non-PCM / non-16-bit / non-mono layout loudly — so payloads
      * written by other WAV encoders (including javax.sound) decode
      * identically, spec-pinned.
      */
    def decodeWav(payload: Array[Byte]): Array[Short] = {
      require(payload.length >= 44 && tag(payload, 0) == "RIFF" && tag(payload, 8) == "WAVE",
        s"not a RIFF/WAVE payload (${payload.length} bytes)")
      var off = 12
      var audioFormat = -1; var channels = -1; var bits = -1
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= payload.length && (audioFormat < 0 || dataOff < 0)) {
        val id = tag(payload, off)
        val size = readI32le(payload, off + 4)
        require(size >= 0 && off + 8 + size <= payload.length, s"corrupt RIFF chunk '$id' at $off: size $size")
        if (id == "fmt ") {
          require(size >= 16, s"fmt chunk too short: $size")
          audioFormat = readU16le(payload, off + 8)
          channels = readU16le(payload, off + 10)
          bits = readU16le(payload, off + 22)
        } else if (id == "data") {
          dataOff = off + 8; dataLen = size
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      require(audioFormat >= 0 && dataOff >= 0, "missing fmt/data chunk")
      require(audioFormat == 1 && bits == 16 && channels == 1,
        s"unsupported PCM layout: format=$audioFormat bits=$bits channels=$channels")
      val n = dataLen / 2
      Array.tabulate(n)(i => readU16le(payload, dataOff + 2 * i).toShort)
    }
  }

  /** Deterministic synthetic waveform per id, encoded as a REAL WAV:
    * `512 + id%384` samples of `s(i) = (id·31 + i·17) mod 65536 −
    * 32768` — pure integer arithmetic over (id, i), so every decoded
    * frame statistic replays in SQL (the m02/m03 proof shape on the
    * audio axis). The variable length exercises the partial tail
    * frame.
    */
  def syntheticWav(docs: DataFrame, idCol: String = "doc_id")(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (512 + Math.floorMod(id, 384L)).toInt
        val samples = Array.tabulate(n)(i =>
          (Math.floorMod(id * 31 + i.toLong * 17, 65536L) - 32768L).toShort)
        MediaRow(id, MediaMeta("audio", WavFormat, 0, 0), AudioCodec.encodeWav(samples))
      }
    }
  }

  /** Frame-level audio features over a decoded WAV payload: per window
    * of `frame` samples — energy `Σ s²`, zero crossings (sign flips
    * between CONSECUTIVE samples within the frame; 0 counts as
    * non-negative), and peak `max |s|`. All integers, exact — the
    * feature set a speech/music filter thresholds on (silence
    * trimming, clipping detection) with no float anywhere, so the m04
    * gate compares integers only. Same per-partition batch shape as
    * every codec op here; ≤ n/frame rows out per payload.
    */
  def extractAudioFrames(media: Dataset[MediaRow], frame: Int = 256): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    require(frame > 0, "frame must be positive")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        require(r.meta.format == WavFormat,
          s"extractAudioFrames needs a $WavFormat payload, got ${r.meta.format}")
        val s = AudioCodec.decodeWav(r.payload)
        val nFrames = (s.length + frame - 1) / frame
        (0 until nFrames).iterator.map { fi =>
          val lo = fi * frame
          val hi = math.min(lo + frame, s.length)
          var energy = 0L; var zc = 0L; var peak = 0
          var i = lo
          while (i < hi) {
            val v = s(i).toInt
            energy += v.toLong * v
            if (i > lo && ((s(i - 1) < 0) != (v < 0))) zc += 1
            val a = math.abs(v)
            if (a > peak) peak = a
            i += 1
          }
          AudioFrame(r.media_id, fi, hi - lo, energy, zc, peak)
        }
      }
    }
  }
}
