package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * IMAGE decoding is REAL: PNG/JPEG/GIF/BMP bytes are decoded with the
  * JDK's `javax.imageio` into true width/height and a 4×4 grid-luminance
  * feature vector. MULTI-FRAME decoding is REAL for animated GIF and for
  * MJPEG-in-AVI video ([[decodeFrames]]: one row per actual frame with
  * per-frame features; [[aviJpegFrames]] walks the RIFF chunk tree and
  * decodes each frame's JPEG bytes). AUDIO decoding is REAL for WAV/PCM
  * including the μ-law/a-law/8-bit telephony encodings the JDK can
  * transcode: RIFF bytes are decoded with the JDK's `javax.sound.sampled`
  * into per-segment RMS amplitude features. Bytes no in-JDK decoder
  * understands (mp4/webm video, compressed audio, corrupt media) fall back to
  * `byteStrideFeatures`, a deterministic byte-level fingerprint, with
  * null decoded dimensions — so the pipeline never fails on an
  * undecodable row and a richer decoder (JNI/ONNX) swaps in by replacing
  * one function.
  *
  * Scale notes: media rows are large → `binary` payloads should ride in
  * their own column so column pruning skips them unless needed; feature
  * extraction is mapPartitions (one decoder init per partition, batched
  * rows through it — the JVM analogue of `mapInPandas` batch processing).
  */
object Multimodal {

  val FeatureDim = 16

  /** media envelope: payload + typed metadata (the typed-metadata analogue
    * of the reference's schemaless payload dicts).
    */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Build a synthetic media table from any (id, text) source: payload =
    * utf-8 bytes, metadata derived deterministically. Test fixture path.
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol).cast("long"), lit(64)) * 16 + 16).cast("int").as("width"),
      (pmod(col(idCol).cast("long"), lit(48)) * 16 + 16).cast("int").as("height"),
      (length(col(textCol)) * 10).cast("long").as("duration_ms"))

  /** Fallback fingerprint for bytes no decoder understands: feature j =
    * scaled byte-sum of the j-th stride of the payload. Deterministic, in
    * [0, 1) — keeps undecodable rows flowing instead of failing the batch.
    */
  private[operators] def byteStrideFeatures(content: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var j = 0
    while (j < FeatureDim) {
      var acc = 0L
      var i = j
      while (i < content.length) { acc += (content(i) & 0xFF); i += FeatureDim }
      out(j) = (acc % 1000L) / 1000.0f
      j += 1
    }
    out
  }

  /** Magic-byte sniff for the formats the in-JDK decoders handle (PNG,
    * JPEG, GIF, BMP). Attempting `ImageIO.read` on arbitrary bytes is
    * expensive — it probes the whole reader registry and, with the default
    * disk cache, creates a temp file per call — so non-image payloads are
    * rejected here with a 3-byte comparison instead.
    */
  private[operators] def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && {
      val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF; val b2 = bytes(2) & 0xFF
      (b0 == 0x89 && b1 == 0x50 && b2 == 0x4E) || // PNG
      (b0 == 0xFF && b1 == 0xD8 && b2 == 0xFF) || // JPEG
      (b0 == 0x47 && b1 == 0x49 && b2 == 0x46) || // GIF
      (b0 == 0x42 && b1 == 0x4D)                  // BMP
    }

  /** Real image decode via the JDK's ImageIO: None when the bytes are not
    * a recognizable image (magic-byte mismatch, ImageIO returns null) or
    * the decode throws.
    *
    * Per-task-work fast path (r21, guide §1.2 step 2): `ImageIO.read`
    * consults the provider registry and creates + disposes a fresh
    * ImageReader per call — measurable constant cost per payload that
    * also contends on shared registry state across 32 task threads.
    * Readers are thread-confined (ThreadLocal, one per format per task
    * thread — the jpegEncoderFor reuse pattern on the decode side) and
    * reused via setInput; selection still goes through
    * `ImageIO.getImageReaders` on first use, so WHICH reader decodes is
    * unchanged, and the read call replicates `ImageIO.read`'s exact
    * invocation (setInput(iis, true, true) + read(0, defaultParam)) —
    * pixel-identity is spec-pinned against ImageIO.read in
    * OperatorsSuite. A reader that throws is disposed and re-created on
    * the next payload of its format; reader count is bounded by
    * threads × formats (the acknowledged task-end-reclaim class).
    */
  private val threadReaders =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
      override def initialValue(): java.util.HashMap[String, javax.imageio.ImageReader] =
        new java.util.HashMap()
    }

  private def imageFormatOf(bytes: Array[Byte]): String = {
    val b0 = bytes(0) & 0xFF
    if (b0 == 0x89) "png"
    else if (b0 == 0xFF) "jpeg"
    else if (b0 == 0x47) "gif"
    else "bmp"
  }

  private[graft] def tryDecodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(bytes)) None
    else {
      val fmt = imageFormatOf(bytes)
      val cache = threadReaders.get()
      // setUseCache(false) call sites make ImageIO.createImageInputStream
      // return exactly this class; constructing it directly skips one
      // registry consult per payload
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        var r = cache.get(fmt)
        if (r == null) {
          val it = javax.imageio.ImageIO.getImageReaders(iis)
          if (!it.hasNext) return None
          r = it.next()
          cache.put(fmt, r)
        }
        r.setInput(iis, true, true)
        Option(r.read(0, r.getDefaultReadParam))
      } catch {
        case scala.util.control.NonFatal(_) =>
          Option(cache.remove(fmt)).foreach { rr =>
            try rr.dispose() catch { case scala.util.control.NonFatal(_) => () }
          }
          None
      } finally {
        // release the cached reader's reference to this payload's stream
        // (a reader otherwise pins its last input between payloads — r21
        // ADVICE); the reader object itself stays cached for reuse
        Option(cache.get(fmt)).foreach { rr =>
          try rr.setInput(null) catch { case scala.util.control.NonFatal(_) => () }
        }
        try iis.close() catch { case scala.util.control.NonFatal(_) => () }
      }
    }

  /** The one-shot `ImageIO.read` form — the pixel-identity spec's
    * reference implementation, not on any query path.
    */
  private[graft] def tryDecodeImageJdk(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(bytes)) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** RIFF/AVI magic-byte sniff (RIFF....AVI ). */
  private[graft] def looksLikeAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** REAL video-frame extraction for MJPEG-in-AVI — the one video
    * container decodable with nothing but the JDK, because its frames ARE
    * JPEGs: walk the RIFF chunk tree (word-aligned chunks, `LIST movi` /
    * `rec ` recursion, `idx1` and header lists skipped), collect the
    * `##dc`/`##db` stream chunks whose payload starts with the JPEG SOI
    * marker, cap at `maxFrames`. Returns raw per-frame JPEG bytes;
    * malformed sizes/truncated chunks end the walk cleanly (decoded truth
    * only, never an exception on hostile bytes). mp4/webm stay with the
    * byte-stride fallback — their codecs (H.264/VP9) have no JDK decoder
    * and a real deployment swaps in JNI/ffmpeg behind this same contract.
    */
  private[graft] def aviJpegFrames(bytes: Array[Byte], maxFrames: Int): Vector[Array[Byte]] = {
    if (!looksLikeAvi(bytes)) return Vector.empty
    val out = Vector.newBuilder[Array[Byte]]
    var count = 0
    def walk(start: Int, end: Int): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end && count < maxFrames) {
        val size = u32le(bytes, off + 4)
        val dataOff = off + 8
        if (size < 0 || size > Int.MaxValue - 8 || dataOff + size > end) ok = false
        else {
          val dataEnd = dataOff + size.toInt
          val isList = bytes(off) == 'L' && bytes(off + 1) == 'I' &&
            bytes(off + 2) == 'S' && bytes(off + 3) == 'T'
          if (isList && size >= 4) {
            val t = new String(bytes, dataOff, 4, "US-ASCII")
            if (t == "movi" || t == "rec ") walk(dataOff + 4, dataEnd)
          } else {
            // stream-data chunk ids are '##dc' (compressed video) / '##db'
            // (uncompressed); only JPEG-payload chunks are MJPEG frames
            val c2 = bytes(off + 2); val c3 = bytes(off + 3)
            val isFrame = (c2 == 'd' && (c3 == 'c' || c3 == 'b')) &&
              size >= 3 && (bytes(dataOff) & 0xFF) == 0xFF && (bytes(dataOff + 1) & 0xFF) == 0xD8
            if (isFrame) {
              out += java.util.Arrays.copyOfRange(bytes, dataOff, dataEnd)
              count += 1
            }
          }
          off = dataEnd + (size.toInt & 1) // RIFF chunks are word-aligned
        }
      }
    }
    val riffEnd = math.min(bytes.length.toLong, 8L + u32le(bytes, 4)).toInt
    walk(12, riffEnd)
    out.result()
  }

  /** RIFF/WAVE magic-byte sniff — same rationale as [[looksLikeImage]]:
    * reject non-audio payloads with a byte comparison instead of letting
    * AudioSystem probe its provider registry on arbitrary bytes.
    */
  private[graft] def looksLikeWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Real audio decode via the JDK's javax.sound.sampled: WAV/RIFF →
    * RMS amplitude (in [0, 1]) of each of `FeatureDim` equal time
    * segments — the cheap audio envelope feature. Non-16-bit-PCM payloads
    * the JDK can TRANSCODE (μ-law, a-law, 8-bit and unsigned PCM — the
    * telephony formats real crawled audio actually carries) are converted
    * to signed 16-bit PCM first via `AudioSystem`'s conversion chain.
    * None for anything the in-JDK codecs can neither read nor convert
    * (mp3/ogg, corrupt headers, zero samples), which then takes the
    * byte-stride fallback.
    */
  private[graft] def tryDecodeAudio(bytes: Array[Byte]): Option[Array[Float]] =
    tryDecodeAudioSegs(bytes, FeatureDim)

  /** Parsed canonical-WAV layout: fmt fields + the first data chunk.
    * Conservative by design — anything non-canonical (missing/short fmt,
    * extensible format, truncated chunk headers) returns None and the
    * caller falls back to the JDK's own reader, so the fast paths below
    * can never CHANGE a decode, only skip the `AudioSystem` overhead on
    * the well-formed common case.
    */
  private[graft] final case class WavInfo(
      format: Int, channels: Int, sampleRate: Float, bits: Int,
      blockAlign: Int, dataOff: Int, dataLen: Int) {
    /** Header frame size matches the packed layout the fast paths index
      * by (channels · bits/8). A padded-frame WAV (blockAlign larger) is
      * legal RIFF but must take the JDK chain, which honors the header's
      * frameSize — the fast paths would mis-stride it (r21 ADVICE).
      */
    def canonicalFrames: Boolean = blockAlign == channels * (bits / 8)
  }

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private[graft] def parseWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (!looksLikeWav(bytes)) return None
    val end = math.min(bytes.length.toLong, 8L + u32le(bytes, 4)).toInt
    var off = 12
    var fmtCode = -1
    var channels = 0
    var rate = 0f
    var bits = 0
    var blockAlign = 0
    while (off + 8 <= end) {
      val size = u32le(bytes, off + 4)
      val body = off + 8
      if (size < 0 || body + size > bytes.length.toLong) {
        // truncated chunk: only a data chunk may be short (readers clamp
        // it to EOF); anything else is non-canonical → fall back
        if (fmtCode >= 0 && bytes(off) == 'd' && bytes(off + 1) == 'a' &&
            bytes(off + 2) == 't' && bytes(off + 3) == 'a')
          return Some(WavInfo(fmtCode, channels, rate, bits, blockAlign, body,
            math.max(0, bytes.length - body)))
        return None
      }
      val sz = size.toInt
      if (bytes(off) == 'f' && bytes(off + 1) == 'm' &&
          bytes(off + 2) == 't' && bytes(off + 3) == ' ') {
        if (sz < 16) return None
        fmtCode = u16le(bytes, body)
        channels = u16le(bytes, body + 2)
        rate = u32le(bytes, body + 4).toFloat
        blockAlign = u16le(bytes, body + 12)
        bits = u16le(bytes, body + 14)
        if (channels <= 0 || rate <= 0f) return None
      } else if (bytes(off) == 'd' && bytes(off + 1) == 'a' &&
          bytes(off + 2) == 't' && bytes(off + 3) == 'a') {
        if (fmtCode < 0) return None
        return Some(WavInfo(fmtCode, channels, rate, bits, blockAlign, body, sz))
      }
      off = body + sz + (sz & 1)
    }
    None
  }

  /** μ-law → signed-16-bit lookup, derived at first use by running the
    * JDK's OWN conversion chain over all 256 code points — bit-identical
    * to `AudioSystem`'s decode by construction (G.711 companding is
    * memoryless per sample), so the table-driven fast path cannot drift
    * from the fallback it replaces. One 256-sample conversion per JVM.
    */
  private lazy val ulawToPcm: Array[Short] = {
    val src = new Array[Byte](256)
    var i = 0
    while (i < 256) { src(i) = i.toByte; i += 1 }
    val ulawFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val target = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(target,
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(src), ulawFmt, 256L))
    val out = try ais.readAllBytes() finally ais.close()
    Array.tabulate(256)(j => ((out(2 * j + 1).toInt << 8) | (out(2 * j) & 0xFF)).toShort)
  }

  /** signed-16-bit → μ-law lookup (index = sample + 32768), derived the
    * same way from the JDK's own encoder over all 65536 sample values —
    * one 128 KiB conversion per JVM, bit-identical by construction.
    */
  private lazy val pcmToUlaw: Array[Byte] = {
    val src = new Array[Byte](65536 * 2)
    var s = 0
    while (s < 65536) {
      val v = s - 32768
      src(2 * s) = (v & 0xFF).toByte
      src(2 * s + 1) = ((v >> 8) & 0xFF).toByte
      s += 1
    }
    val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ulawFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(ulawFmt,
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(src), pcmFmt, 65536L))
    try ais.readAllBytes() finally ais.close()
  }

  /** The shared segment-RMS loop over n samples accessed by index —
    * arithmetic identical to the original in-line loop (same iteration
    * order, same divisor), so fast-path and JDK-path envelopes agree to
    * the last float bit.
    */
  private def rmsSegments(n: Int, nSegs: Int, sample: Int => Double): Option[Array[Float]] =
    if (n == 0) None
    else {
      val out = new Array[Float](nSegs)
      var s = 0
      while (s < nSegs) {
        val i0 = s * n / nSegs
        val i1 = math.max(i0 + 1, (s + 1) * n / nSegs)
        var acc = 0.0
        var i = i0
        while (i < i1 && i < n) {
          val v = sample(i)
          acc += v * v
          i += 1
        }
        out(s) = math.sqrt(acc / math.max(1, math.min(i1, n) - i0)).toFloat
        s += 1
      }
      Some(out)
    }

  /** [[tryDecodeAudio]] with a caller-chosen segment count — the 65-segment
    * form feeds [[audioHash64]] (64 adjacent-RMS comparisons), the
    * FeatureDim form the feature vector.
    *
    * Per-task-work fast paths (r21, guide §1.2 step 2): canonical 16-bit
    * PCM and μ-law WAVs — the two formats this engine's fixtures and the
    * telephony re-encode path actually produce — decode via a direct RIFF
    * parse + (for μ-law) the JDK-derived [[ulawToPcm]] table, skipping
    * `AudioSystem`'s per-call provider lookup and stream chain, which
    * serialize on shared registry state under 32 concurrent tasks
    * (measured: ~110-300 µs per clip single-threaded, dominating the
    * audio queries' wall time). Sample values and the RMS arithmetic are
    * identical by construction; anything [[parseWav]] deems non-canonical
    * takes the unchanged JDK path (spec-pinned equal on both branches).
    */
  private[graft] def tryDecodeAudioSegs(bytes: Array[Byte], nSegs: Int): Option[Array[Float]] =
    if (!looksLikeWav(bytes)) None
    else parseWav(bytes) match {
      case Some(w) if w.format == 1 && w.bits == 16 && w.canonicalFrames =>
        val len = math.max(0, math.min(w.dataLen, bytes.length - w.dataOff))
        val frameSize = 2 * w.channels
        val n = len / frameSize * w.channels
        val off = w.dataOff
        rmsSegments(n, nSegs,
          i => ((bytes(off + 2 * i + 1).toInt << 8) | (bytes(off + 2 * i) & 0xFF)) / 32768.0)
      case Some(w) if w.format == 7 && w.bits == 8 && w.canonicalFrames =>
        val len = math.max(0, math.min(w.dataLen, bytes.length - w.dataOff))
        val n = len / w.channels * w.channels
        val off = w.dataOff
        val tab = ulawToPcm
        rmsSegments(n, nSegs, i => tab(bytes(off + i) & 0xFF) / 32768.0)
      case _ => decodeAudioSegsJdk(bytes, nSegs)
    }

  /** The original `AudioSystem` decode chain — the fallback for every
    * WAV [[parseWav]] classifies as non-canonical or non-PCM16/μ-law
    * (a-law, 8-bit PCM, unsigned PCM, extensible headers).
    */
  private[graft] def decodeAudioSegsJdk(bytes: Array[Byte], nSegs: Int): Option[Array[Float]] =
    try {
      val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f0 = ais0.getFormat
      val isPcm16 =
        f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f0.getSampleSizeInBits == 16
      val ais =
        if (isPcm16) ais0
        else {
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            f0.getSampleRate, 16, f0.getChannels,
            f0.getChannels * 2, f0.getSampleRate, false)
          if (!javax.sound.sampled.AudioSystem.isConversionSupported(target, f0)) {
            ais0.close(); return None
          }
          javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais0)
        }
      try {
        val fmt = ais.getFormat
        val data = ais.readAllBytes()
        val n = data.length / 2
        val big = fmt.isBigEndian
        rmsSegments(n, nSegs, i => {
          val lo = if (big) data(2 * i + 1) & 0xFF else data(2 * i) & 0xFF
          val hi = if (big) data(2 * i).toInt else data(2 * i + 1).toInt
          ((hi << 8) | lo) / 32768.0
        })
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** gw×gh grid mean luminance (Rec. 601 weights), row-major, each in
    * [0, 1] — the classic cheap perceptual thumbnail feature. The 4×4
    * form is the FeatureDim = 16 feature vector; the 9×8 / 8×8 forms
    * feed [[dhash64]] / [[ahash64]].
    */
  private def gridLuminance(
      img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    // Whole-raster pixel fetch, once per image (r21): per-pixel
    // getRGB(x, y) pays a bounds check + SampleModel dispatch + color
    // conversion PER CALL (w·h calls per grid, twice per image for the
    // dhash+ahash pair). The packed values are identical by the getRGB
    // contract — default-sRGB ints either way — and for the interleaved
    // 3-byte BGR layout JPEG/BMP decodes produce, the raster bytes map
    // straight to the same ints (sRGB ComponentColorModel is the identity
    // on 8-bit components; spec-pinned against getRGB in OperatorsSuite).
    val rgb: Array[Int] = {
      val raster = img.getRaster
      val bgrFast = img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
        (raster.getSampleModel match {
          case sm: java.awt.image.PixelInterleavedSampleModel =>
            sm.getPixelStride == 3 &&
              java.util.Arrays.equals(sm.getBandOffsets, Array(2, 1, 0))
          case _ => false
        })
      if (bgrFast) {
        val sm = raster.getSampleModel.asInstanceOf[java.awt.image.PixelInterleavedSampleModel]
        val db = raster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte]
        val data = db.getData
        val scan = sm.getScanlineStride
        // raster origin offset: translated child rasters don't appear on
        // decode paths, but compute the base offset defensively
        val base = db.getOffset +
          (-raster.getSampleModelTranslateY) * scan +
          (-raster.getSampleModelTranslateX) * 3
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var o = base + y * scan
          var i = y * w
          val end = i + w
          while (i < end) {
            out(i) = 0xFF000000 | ((data(o + 2) & 0xFF) << 16) |
              ((data(o + 1) & 0xFF) << 8) | (data(o) & 0xFF)
            o += 3
            i += 1
          }
          y += 1
        }
        out
      } else img.getRGB(0, 0, w, h, null, 0, w)
    }
    val out = new Array[Float](gw * gh)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        val x0 = gx * w / gw; val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
        val y0 = gy * h / gh; val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
        var acc = 0.0
        var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val p = rgb(y * w + x)
            acc += (0.299 * ((p >> 16) & 0xFF) +
              0.587 * ((p >> 8) & 0xFF) +
              0.114 * (p & 0xFF)) / 255.0
            n += 1
            x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = if (n == 0) 0.0f else (acc / n).toFloat
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash — Krawetz's "Kind of Like That",
    * 2013; public domain family with aHash/pHash): 9×8 grid luminance,
    * bit (y·8 + x) set iff cell (x, y) is brighter than its RIGHT
    * neighbor. Comparing adjacent cells makes the hash invariant to any
    * monotone global pixel map (brightness/contrast shifts, gamma) and
    * to integer upscales (grid cells average identical pixel blocks),
    * and robust to mild re-encode noise on natural images — exactly the
    * re-encoded/resized duplicate class CDC chunking (different bytes)
    * and text dedup are structurally blind to.
    */
  private[graft] def dhash64(img: java.awt.image.BufferedImage): Long = {
    val g = gridLuminance(img, 9, 8)
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x) > g(y * 9 + x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 64-bit average hash (aHash): 8×8 grid luminance, bit i set iff cell
    * i is brighter than the grid mean. Coarser than [[dhash64]] (a global
    * brightness shift near the mean can flip many bits) but cheap and a
    * useful second signal for band-verify ensembles.
    */
  private[graft] def ahash64(img: java.awt.image.BufferedImage): Long = {
    val g = gridLuminance(img, 8, 8)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += g(i); i += 1 }
    mean /= 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (g(i) > mean) h |= 1L << i
      i += 1
    }
    h
  }

  /** Perceptual hashes over media rows: (media_id, dhash, ahash), one row
    * per payload that DECODES as an image (still image, or the first
    * MJPEG-AVI frame — the video-thumbnail convention); undecodable rows
    * yield no row (decoded truth only, like [[decodeFrames]] — audit them
    * through [[extractFeatures]]'s fallback). Same scale shape as
    * [[extractFeatures]]: mapPartitions, one reader registry per
    * partition, 16 bytes of hash per row through the exchange — the
    * binary payloads never shuffle. Pair generation over the hash column
    * is [[graft.operators.Dedup.imageNearDupPairs]].
    */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          tryDecodeImage(bytes)
            .orElse(aviJpegFrames(bytes, 1).headOption.flatMap(tryDecodeImage))
            .map(img => Row(r.getLong(0), dhash64(img), ahash64(img)))
        }
      }(enc)
  }

  /** Feature extraction over media rows: partition-local, batched — one
    * decoder context per partition, rows streamed through in groups of
    * `batchSize` (the mapInPandas batch shape). Output adds the DECODED
    * width/height (null when the bytes didn't decode as an image — the
    * envelope metadata may lie; the pixels don't).
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("decoded_width", IntegerType, nullable = true),
      StructField("decoded_height", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("media_type"), col("content"))
      .mapPartitions { rows =>
        // decoder init happens HERE, once per partition (ImageIO's reader
        // registry is JVM-static; a JNI/ONNX context would be allocated here).
        // In-memory ImageInputStreams only — the default disk cache writes a
        // temp file per decode, a syscall tax with no benefit for byte[] input.
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]]("content")
            // decode preference: still image → MJPEG-AVI first frame →
            // WAV audio → byte-stride fallback; the magic-byte sniffs make
            // the chain one comparison per non-matching format
            tryDecodeImage(bytes)
              .orElse(aviJpegFrames(bytes, 1).headOption.flatMap(tryDecodeImage)) match {
              case Some(img) =>
                Row(r.getLong(0), r.getString(1), img.getWidth, img.getHeight,
                  gridLuminance(img, 4, 4).toSeq)
              case None =>
                val feat = tryDecodeAudio(bytes).getOrElse(byteStrideFeatures(bytes))
                Row(r.getLong(0), r.getString(1), null, null, feat.toSeq)
            }
          }
        }
      }(enc)
  }

  /** REAL frame decode for multi-frame media the JDK can read (animated
    * GIF via the ImageIO multi-image reader; MJPEG-in-AVI video via
    * [[aviJpegFrames]] + per-frame JPEG decode): one output row per
    * actually-decoded frame, with the frame's true dimensions and
    * per-frame grid-luminance features. Single-frame stills (PNG/JPEG/
    * BMP, or a one-frame GIF) yield exactly one row; bytes no reader
    * understands yield ZERO rows (audit those through
    * [[extractFeatures]]'s fallback or [[frameSample]]'s metadata plan —
    * this operator's contract is decoded truth only). `maxFrames` caps
    * runaway animations so one hostile payload can't monopolize a task.
    *
    * Same scale shape as [[extractFeatures]]: mapPartitions, one reader
    * registry per partition, frames materialized per row before the
    * reader is disposed. A production video path (mp4/webm) swaps the
    * reader for a JNI/ffmpeg context behind the same row contract.
    */
  def decodeFrames(media: DataFrame, maxFrames: Int = 32): DataFrame = {
    require(maxFrames > 0, "decodeFrames: maxFrames must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("decoded_width", IntegerType, nullable = false),
      StructField("decoded_height", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]]("content")
          if (looksLikeAvi(bytes)) {
            // MJPEG-AVI: one row per JPEG stream chunk that decodes;
            // frame_idx numbers the decoded sequence
            aviJpegFrames(bytes, maxFrames).iterator
              .flatMap(tryDecodeImage)
              .zipWithIndex
              .map { case (img, i) =>
                Row(id, i, img.getWidth, img.getHeight, gridLuminance(img, 4, 4).toSeq)
              }
          } else {
            imageReaderFrames(bytes, maxFrames).zipWithIndex.map { case (img, i) =>
              Row(id, i, img.getWidth, img.getHeight, gridLuminance(img, 4, 4).toSeq)
            }
          }
        }
      }(enc)
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * timestamp (every `everyMs`) — pure relational explode, no decode.
    */
  def frameSample(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))).as("frame_ts_ms"))

  /** Resize metadata transform (decode-free plumbing): target box with
    * aspect preserved, integer math only.
    */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame =
    media.filter(col("media_type") === "image")
      .withColumn("scale_num", lit(maxDim))
      .withColumn("scale_den", greatest(col("width"), col("height")))
      .select(col("media_id"), col("width"), col("height"),
        (col("width") * col("scale_num") / col("scale_den")).cast("int").as("out_width"),
        (col("height") * col("scale_num") / col("scale_den")).cast("int").as("out_height"))

  private def md5Bytes(seed: Array[Byte], extra: Byte): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(seed)
    md.update(extra)
    md.digest()
  }

  /** Thread-confined ImageWriter reuse for the default-param write paths
    * (the [[tryDecodeImage]] reader-reuse pattern on the encode side):
    * `ImageIO.write` consults the registry and creates + disposes a
    * writer per call. Selection still goes through
    * `getImageWritersByFormatName` (same first provider), the write call
    * replicates `ImageIO.write`'s exact invocation (default param), and
    * the JDK writers are deterministic for fixed input — byte-identity
    * spec-pinned in OperatorsSuite.
    */
  private val threadWriters =
    new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageWriter]] {
      override def initialValue(): java.util.HashMap[String, javax.imageio.ImageWriter] =
        new java.util.HashMap()
    }

  private[graft] def writeImage(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val cache = threadWriters.get()
    var w = cache.get(format)
    if (w == null) {
      w = javax.imageio.ImageIO.getImageWritersByFormatName(format).next()
      cache.put(format, w)
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), null)
      ios.flush()
    } catch {
      case scala.util.control.NonFatal(e) =>
        Option(cache.remove(format)).foreach { ww =>
          try ww.dispose() catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    } finally {
      try ios.close() catch { case scala.util.control.NonFatal(_) => () }
    }
    baos.toByteArray
  }

  private def writeBmp(img: java.awt.image.BufferedImage): Array[Byte] =
    writeImage(img, "bmp")

  /** `ImageIO.write` one-shot form — the byte-identity spec's reference. */
  private[graft] def writeImageJdk(
      img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** Deterministic NOISE-image fixture from any (id, text) source: an
    * 18×16 24-bit grayscale BMP whose 9×8 grid of 2×2 cells takes gray
    * values from the md5 chain of the TEXT (md5(text), md5(text‖0x01),
    * …) — identical texts yield byte-identical images; distinct texts
    * yield independent 72-byte cell vectors, so dHash collisions across
    * distinct texts are ~n²/2⁶⁵ (none on any fixture here, and the
    * oracle gate would catch one loudly). BMP is lossless, so the whole
    * encode → ImageIO decode → grid-luminance → dHash path is exactly
    * reproducible — the image analogue of [[syntheticMedia]], built for
    * the exact-regime oracle (`image_neardup_exact`): perceptual pairs
    * over this fixture at Hamming 0 ≡ identical-text pairs, which IS
    * SQL. Test/oracle fixture path, not a production operator.
    */
  def syntheticImages(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val seed = r.getString(1).getBytes("UTF-8")
          // 5 chained digests = 80 bytes ≥ 72 grid cells
          val chain = Array.tabulate(5)(i => md5Bytes(seed, i.toByte)).flatten
          val img = new java.awt.image.BufferedImage(
            18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var cy = 0
          while (cy < 8) {
            var cx = 0
            while (cx < 9) {
              val v = chain(cy * 9 + cx) & 0xFF
              val rgb = (v << 16) | (v << 8) | v
              img.setRGB(cx * 2, cy * 2, rgb); img.setRGB(cx * 2 + 1, cy * 2, rgb)
              img.setRGB(cx * 2, cy * 2 + 1, rgb); img.setRGB(cx * 2 + 1, cy * 2 + 1, rgb)
              cx += 1
            }
            cy += 1
          }
          Row(r.getLong(0), "image", writeBmp(img))
        }
      }(enc)
  }

  /** Deterministic SMOOTH-image fixture: a 72×64 grayscale sinusoid
    * plaid whose frequencies/phases derive from the md5 of the text —
    * the natural-image stand-in for perceptual-hash robustness work
    * (adjacent dHash grid cells differ by a real luminance gradient, so
    * JPEG quantization noise doesn't flip the comparisons the way it
    * does on per-pixel noise). Grid cells are 8×8 px = exactly one JPEG
    * block. Test fixture path.
    */
  def syntheticSmoothImages(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val d = md5Bytes(r.getString(1).getBytes("UTF-8"), 0.toByte)
          Row(r.getLong(0), "image", writeBmp(smoothPlaid(d)))
        }
      }(enc)
  }

  /** The shared 72×64 sinusoid-plaid renderer behind the smooth fixtures:
    * three plaid components parameterized by 16 digest bytes — enough
    * parameter entropy that two DISTINCT digests land within dHash radius
    * only at real-corpus rates (a 2-component first cut measured 0.5% of
    * all cross pairs inside Hamming ≤ 10 — a fixture-density artifact
    * that turned the band join's ×10 curve quadratic). Each dHash grid
    * cell spans exactly one 8×8 JPEG block, so quantization noise doesn't
    * flip neighbor comparisons the way it does on per-pixel noise.
    */
  private def smoothPlaid(d: Array[Byte]): java.awt.image.BufferedImage = {
    def u(i: Int) = ((d(i) & 0xFF) * 256 + (d(i + 1) & 0xFF)) / 65536.0
    val fx = 0.7 + 3.8 * u(0); val fy = 0.7 + 3.8 * u(2)
    val ph = 2.0 * math.Pi * u(4)
    val fx2 = 0.7 + 3.8 * u(6); val ph2 = 2.0 * math.Pi * u(8)
    val fd = 0.7 + 3.8 * u(10); val ph3 = 2.0 * math.Pi * u(12)
    val img = new java.awt.image.BufferedImage(
      72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 72) {
        val s = math.sin(2.0 * math.Pi * (fx * x / 72.0 + fy * y / 64.0) + ph) +
          0.6 * math.sin(2.0 * math.Pi * (fx2 * (x + y) / 72.0) + ph2) +
          0.45 * math.sin(2.0 * math.Pi * (fd * (x - 2 * y) / 64.0) + ph3)
        val v = math.max(0, math.min(255, (128 + 62 * s).toInt))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  /** REAL JPEG re-encode: decode each image payload, re-encode at
    * `quality` ∈ (0, 1], emit (media_id, media_type, content) with the
    * new bytes — the format-normalization step real image-ingest
    * pipelines run, and the generator of the dominant near-duplicate
    * class in crawled image corpora (same picture, different bytes —
    * invisible to CDC/content-hash dedup, caught by
    * [[graft.operators.Dedup.imageNearDupPairs]]). Rows that don't
    * decode as images are dropped (decoded truth only). mapPartitions,
    * one writer per partition batch; the JDK's JPEG codec is
    * deterministic for fixed input+quality.
    */
  def reencodeJpeg(media: DataFrame, quality: Float = 0.75f): DataFrame = {
    require(quality > 0f && quality <= 1f, "reencodeJpeg: quality must be in (0, 1]")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val encode = jpegEncoderFor(quality)
        rows.flatMap { r =>
          tryDecodeImage(r.getAs[Array[Byte]](1))
            .map(img => Row(r.getLong(0), "image", encode(img)))
        }
        // the writer inside `encode` is partition-scoped and never
        // disposed explicitly: Iterator has no close hook, ImageWriter
        // instances are cheap, and the task end reclaims them.
      }(enc)
  }

  private val mediaSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Partition-scoped JPEG encoder at an explicit `quality`: ONE JDK
    * ImageWriter reused across the partition's rows (writer creation is
    * the expensive part of the codec setup), alpha stripped because the
    * JPEG writer rejects ARGB. Shared by the still and video re-encode
    * paths.
    */
  private def jpegEncoderFor(
      quality: Float): java.awt.image.BufferedImage => Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    img => {
      val rgb =
        if (img.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) img
        else {
          val c = new java.awt.image.BufferedImage(
            img.getWidth, img.getHeight,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = c.createGraphics()
          g.drawImage(img, 0, 0, null)
          g.dispose()
          c
        }
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(rgb, null, null), param)
      ios.close()
      baos.toByteArray
    }
  }

  /** REAL video re-encode: walk each MJPEG-AVI payload's frames
    * ([[aviJpegFrames]]), decode, re-encode every frame's JPEG at
    * `quality`, rebuild the container ([[buildMjpegAvi]]) — the
    * normalization/transcode step that generates the dominant video
    * near-duplicate class (same footage, different bytes: invisible to
    * content-hash dedup, caught by
    * [[graft.operators.Dedup.videoNearDupPairs]]). Rows that are not
    * decodable MJPEG-AVI, or decode to zero frames, are dropped (decoded
    * truth only — the [[reencodeJpeg]] contract on the video container).
    */
  def reencodeVideo(
      media: DataFrame, quality: Float = 0.75f, maxFrames: Int = 32): DataFrame = {
    require(quality > 0f && quality <= 1f, "reencodeVideo: quality must be in (0, 1]")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val encode = jpegEncoderFor(quality)
        rows.flatMap { r =>
          val frames = aviJpegFrames(r.getAs[Array[Byte]](1), maxFrames)
            .flatMap(tryDecodeImage).map(encode)
          if (frames.isEmpty) None
          else Some(Row(r.getLong(0), "video", buildMjpegAvi(frames)))
        }
      }(enc)
  }

  /** Deterministic SMOOTH-video fixture: `nFrames` 72×64 sinusoid-plaid
    * frames per video ([[smoothPlaid]] — JPEG-robust luminance gradients,
    * one 8×8 JPEG block per dHash grid cell), frame i's plaid parameters
    * from the md5 of the text salted with i, JPEG-encoded and wrapped by
    * [[buildMjpegAvi]]. The production-shape fixture for the video
    * re-encode census (`video_neardup`); the exact-regime oracle stays on
    * the noise fixture [[syntheticVideos]], whose per-pixel noise is
    * byte-reproducible but NOT quality-shift robust.
    */
  def syntheticSmoothVideos(
      df: DataFrame, idCol: String, textCol: String, nFrames: Int = 3): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val encode = jpegEncoderFor(0.9f)
        rows.map { r =>
          val text = r.getString(1)
          val frames = (0 until nFrames).map { fi =>
            encode(smoothPlaid(md5Bytes(text.getBytes("UTF-8"), fi.toByte)))
          }
          Row(r.getLong(0), "video", buildMjpegAvi(frames))
        }
      }(enc)
  }

  /** All frames the JDK image stack can decode from one payload — the
    * multi-image reader loop (animated GIF: one BufferedImage per stored
    * frame; stills: exactly one), capped at `maxFrames`; empty on
    * non-image/corrupt bytes (decoded truth only). Shared by
    * [[decodeFrames]] and [[perceptualFrameHashes]] so BOTH frame
    * consumers see animated GIFs frame-by-frame, not just frame 0.
    */
  private def imageReaderFrames(
      bytes: Array[Byte], maxFrames: Int): Iterator[java.awt.image.BufferedImage] = {
    if (!looksLikeImage(bytes)) return Iterator.empty
    // same thread-confined reader reuse as [[tryDecodeImage]] (selection
    // via getImageReaders on first use, fresh setInput per payload);
    // frames materialize (strict Range.map) before the input closes
    val fmt = imageFormatOf(bytes)
    val cache = threadReaders.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var reader = cache.get(fmt)
      if (reader == null) {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Iterator.empty
        reader = readers.next()
        cache.put(fmt, reader)
      }
      reader.setInput(iis)
      val n = math.min(reader.getNumImages(true), maxFrames)
      (0 until n).map(reader.read).iterator
    } catch {
      case scala.util.control.NonFatal(_) =>
        Option(cache.remove(fmt)).foreach { rr =>
          try rr.dispose() catch { case scala.util.control.NonFatal(_) => () }
        }
        Iterator.empty
    } finally {
      try iis.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Per-FRAME perceptual hashes for multi-frame media: one row
    * (media_id, frame_idx, dhash) per actually-decoded frame — MJPEG-AVI
    * stream chunks, animated-GIF frames, or a single row for stills;
    * undecodable payloads yield no rows (decoded truth only, the
    * [[decodeFrames]] contract with a dHash instead of the feature
    * vector). Feeds [[graft.operators.Dedup.videoNearDupPairs]]: video
    * near-dup = enough frames within Hamming radius of the other video's
    * frames. Scale shape: partition-local decode, ≤ maxFrames × 12 bytes
    * per video through the exchanges.
    */
  def perceptualFrameHashes(media: DataFrame, maxFrames: Int = 32): DataFrame = {
    require(maxFrames > 0 && maxFrames <= 1024,
      "perceptualFrameHashes: maxFrames must be in [1, 1024]")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames =
            if (looksLikeAvi(bytes))
              aviJpegFrames(bytes, maxFrames).iterator.flatMap(tryDecodeImage)
            else imageReaderFrames(bytes, maxFrames)
          frames.zipWithIndex.map { case (img, i) => Row(id, i, dhash64(img)) }
        }
      }(enc)
  }

  /** Minimal MJPEG-AVI container: RIFF('AVI ', LIST('movi', one `00dc`
    * chunk per JPEG frame)). Enough structure for [[aviJpegFrames]]'
    * chunk walk (headers are optional to it by design — it keys on the
    * `##dc` + JPEG-SOI signature); real players want an hdrl, but the
    * fixture's consumer is this engine's own decode path. Word-aligned
    * chunks per the RIFF rule.
    */
  private[graft] def buildMjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val chunksSize = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val listSize = 4 + chunksSize // 'movi' + chunks
    ascii("RIFF"); u32(4 + 8 + listSize); ascii("AVI ")
    ascii("LIST"); u32(listSize); ascii("movi")
    frames.foreach { f =>
      ascii("00dc"); u32(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0) // word alignment pad
    }
    out.toByteArray
  }

  /** Deterministic MJPEG-AVI fixture from any (id, text) source:
    * `nFrames` noise frames per video, frame i's pixels from the md5
    * chain of text‖i, JPEG-encoded and wrapped by [[buildMjpegAvi]].
    * The JDK's JPEG codec is deterministic for fixed input, so identical
    * texts yield byte-identical videos and identical per-frame dHashes —
    * the video analogue of [[syntheticImages]], built for the
    * exact-regime oracle (`video_neardup_exact`). Test/oracle fixture.
    */
  def syntheticVideos(
      df: DataFrame, idCol: String, textCol: String, nFrames: Int = 3): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val text = r.getString(1)
          val frames = (0 until nFrames).map { fi =>
            writeImage(noiseFrame(text, fi), "jpg")
          }
          Row(r.getLong(0), "video", buildMjpegAvi(frames))
        }
      }(enc)
  }

  /** Frame i of the deterministic noise-video fixtures: an 18×16
    * grayscale grid (2×2 pixel blocks) whose values come from the md5
    * chain of text‖i — byte-reproducible per (text, frame) and
    * independent across distinct texts (full dHash entropy, so
    * cross-text collisions stay at n²/2⁶⁴ rates). Shared by the AVI and
    * animated-GIF fixture builders.
    */
  private def noiseFrame(text: String, fi: Int): java.awt.image.BufferedImage = {
    val seed = (text + "\u0000" + fi).getBytes("UTF-8")
    val chain = Array.tabulate(5)(i => md5Bytes(seed, i.toByte)).flatten
    val img = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val v = chain(cy * 9 + cx) & 0xFF
        val rgb = (v << 16) | (v << 8) | v
        img.setRGB(cx * 2, cy * 2, rgb); img.setRGB(cx * 2 + 1, cy * 2, rgb)
        img.setRGB(cx * 2, cy * 2 + 1, rgb); img.setRGB(cx * 2 + 1, cy * 2 + 1, rgb)
        cx += 1
      }
      cy += 1
    }
    img
  }

  /** [[syntheticVideos]] on the ANIMATED-GIF container: the same
    * deterministic noise frames written through the JDK GIF sequence
    * writer (prepareWriteSequence/writeToSequence — each frame stored
    * whole, no delta coding). The GIF writer is deterministic for fixed
    * input, so identical texts yield byte-identical payloads — the
    * exact-regime oracle fixture for the multi-IMAGE reader decode path
    * (`video_neardup_gif_exact`), the container [[buildMjpegAvi]] cannot
    * exercise.
    */
  def syntheticGifVideos(
      df: DataFrame, idCol: String, textCol: String, nFrames: Int = 3): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        rows.map { r =>
          val text = r.getString(1)
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          (0 until nFrames).foreach { fi =>
            writer.writeToSequence(
              new javax.imageio.IIOImage(noiseFrame(text, fi), null, null),
              writer.getDefaultWriteParam)
          }
          writer.endWriteSequence()
          ios.close()
          Row(r.getLong(0), "video", baos.toByteArray)
        }
      }(enc)
  }

  /** 64-bit audio envelope-difference hash (the dHash idea on the time
    * axis): the clip is cut into 65 equal segments; bit i is set iff
    * segment i's RMS amplitude exceeds segment i+1's. Comparing ADJACENT
    * segments makes the hash invariant to any positive gain (all RMS
    * values scale together) and to lossless re-encodes, and robust to
    * transcodes whose error is small next to real envelope variation —
    * the μ-law/a-law telephony re-encodes the JDK can actually produce
    * (quantization noise averages out of a segment's RMS).
    */
  private[graft] def audioHash64(env: Array[Float]): Long = {
    require(env.length == 65, s"audioHash64: need 65 segments, got ${env.length}")
    var h = 0L
    var i = 0
    while (i < 64) {
      if (env(i) > env(i + 1)) h |= 1L << i
      i += 1
    }
    h
  }

  /** Perceptual hashes for audio rows: (media_id, audio_hash), one row
    * per payload the in-JDK audio stack decodes (WAV/PCM incl. the
    * μ-law/a-law/8-bit transcodes); undecodable rows yield no row
    * (decoded truth only — the audio twin of [[perceptualHashes]]).
    * Same scale shape: partition-local decode, 8 bytes of hash per row
    * through the exchange. Pair generation is
    * [[graft.operators.Dedup.audioNearDupPairs]].
    */
  def perceptualAudioHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("audio_hash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          tryDecodeAudioSegs(r.getAs[Array[Byte]](1), 65)
            .map(env => Row(r.getLong(0), audioHash64(env)))
        }
      }(enc)
  }

  /** Deterministic PCM-WAV fixture from any (id, text) source: 2080
    * mono 16-bit samples at 8 kHz seeded from the md5 of the TEXT
    * (java.util.Random's LCG is pinned by its javadoc, so the bytes are
    * cross-JVM deterministic); every sample is EVEN, so an exact half
    * gain stays integer (the gain-invariance spec asserts hash
    * EQUALITY, not a bound). WAV is lossless: identical texts yield
    * byte-identical payloads and the whole encode → javax.sound decode
    * → envelope → hash path is exactly reproducible — the audio
    * analogue of [[syntheticImages]], built for the exact-regime oracle
    * (`audio_neardup_exact`). Test/oracle fixture path.
    */
  def syntheticAudioWav(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        rows.map { r =>
          val d = md5Bytes(r.getString(1).getBytes("UTF-8"), 0.toByte)
          var seed = 0L
          var i = 0
          while (i < 8) { seed = (seed << 8) | (d(i) & 0xFFL); i += 1 }
          val rnd = new java.util.Random(seed)
          val n = 2080 // 65 segments × 32 samples
          val data = new Array[Byte](n * 2)
          var s = 0
          while (s < n) {
            val v = (rnd.nextInt(30000) - 15000) * 2 // even, |v| < 2^15
            data(2 * s) = (v & 0xFF).toByte
            data(2 * s + 1) = ((v >> 8) & 0xFF).toByte
            s += 1
          }
          Row(r.getLong(0), "audio", writeWav(data, n))
        }
      }(enc)
  }

  /** Canonical 44-byte-header PCM16 WAV writer — byte-identical to
    * `AudioSystem.write(..., Type.WAVE)` for 16-bit signed LE mono/stereo
    * input (spec-pinned in OperatorsSuite against the JDK writer), without
    * the per-call provider lookup + stream copy that serialize under 32
    * concurrent tasks (~105 µs/clip single-threaded, the synth stage's
    * dominant cost at sf0.1).
    */
  private[graft] def writeWavPcm16(
      pcmLe16: Array[Byte], channels: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = pcmLe16.length
    val out = new Array[Byte](44 + dataLen)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def u32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def u16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    val blockAlign = 2 * channels
    ascii(0, "RIFF"); u32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); u32(16, 16); u16(20, 1); u16(22, channels)
    u32(24, sampleRate); u32(28, sampleRate * blockAlign); u16(32, blockAlign)
    u16(34, 16)
    ascii(36, "data"); u32(40, dataLen)
    System.arraycopy(pcmLe16, 0, out, 44, dataLen)
    out
  }

  private def writeWav(pcmLe16: Array[Byte], nSamples: Int): Array[Byte] =
    writeWavPcm16(pcmLe16, channels = 1, sampleRate = 8000)

  /** The JDK-writer form of [[writeWav]] — kept as the byte-equality
    * spec's reference implementation, not called on any query path.
    */
  private[graft] def writeWavJdk(pcmLe16: Array[Byte], nSamples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcmLe16), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL μ-law re-encode: decode each WAV payload, transcode to 8-bit
    * μ-law through the JDK's conversion chain, emit the re-encoded WAV —
    * the telephony-path duplicate class (same clip, different bytes and
    * HALF the bit depth: invisible to content-hash dedup, caught by
    * [[graft.operators.Dedup.audioNearDupPairs]] because μ-law
    * quantization noise averages out of segment RMS). Rows the audio
    * stack can't decode are dropped (decoded truth only) — the audio
    * twin of [[reencodeJpeg]].
    */
  def reencodeUlaw(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("media_type", StringType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          reencodeUlawBytes(r.getAs[Array[Byte]](1))
            .map(b => Row(r.getLong(0), "audio", b))
        }
      }(enc)
  }

  /** One payload through the μ-law transcode. Fast path (r21): canonical
    * 16-bit PCM input — samples map through the JDK-derived [[pcmToUlaw]]
    * table and the ULAW container is written directly (46-byte header:
    * 18-byte fmt chunk with cbSize = 0, exactly the JDK WaveFileWriter
    * layout — spec-pinned byte-identical against [[reencodeUlawJdk]] in
    * OperatorsSuite), skipping the per-clip AudioSystem conversion chain
    * + writer (~300 µs single-threaded, serialized across concurrent
    * tasks by the shared provider registry). Non-canonical / non-PCM16
    * inputs take the unchanged JDK chain.
    */
  private[graft] def reencodeUlawBytes(bytes: Array[Byte]): Option[Array[Byte]] =
    if (!looksLikeWav(bytes)) None
    else parseWav(bytes) match {
      case Some(w) if w.format == 1 && w.bits == 16 && w.canonicalFrames =>
        val len = math.max(0, math.min(w.dataLen, bytes.length - w.dataOff))
        val frames = len / (2 * w.channels)
        val nS = frames * w.channels
        val ul = new Array[Byte](nS)
        val off = w.dataOff
        val tab = pcmToUlaw
        var i = 0
        while (i < nS) {
          val v = (bytes(off + 2 * i + 1).toInt << 8) | (bytes(off + 2 * i) & 0xFF)
          ul(i) = tab(v + 32768)
          i += 1
        }
        Some(writeWavUlaw(ul, w.channels, w.sampleRate.toInt))
      case _ => reencodeUlawJdk(bytes)
    }

  /** The original `AudioSystem` μ-law transcode chain — the fallback for
    * non-canonical / non-PCM16 inputs, and the byte-equality spec's
    * reference for the fast path above.
    */
  private[graft] def reencodeUlawJdk(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val ulaw = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.ULAW,
          src.getFormat.getSampleRate, 8, src.getFormat.getChannels,
          src.getFormat.getChannels, src.getFormat.getSampleRate, false)
        if (!javax.sound.sampled.AudioSystem.isConversionSupported(ulaw, src.getFormat))
          None
        else {
          val conv = javax.sound.sampled.AudioSystem.getAudioInputStream(ulaw, src)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            conv, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          Some(baos.toByteArray)
        }
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** μ-law WAV container, byte-identical to the JDK WaveFileWriter's ULAW
    * layout (verified against a header dump and spec-pinned): 18-byte fmt
    * chunk (format 7, cbSize 0), no fact chunk, no odd-length pad.
    */
  private def writeWavUlaw(
      ulawBytes: Array[Byte], channels: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = ulawBytes.length
    val out = new Array[Byte](46 + dataLen)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def u32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    def u16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    ascii(0, "RIFF"); u32(4, 38 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); u32(16, 18); u16(20, 7); u16(22, channels)
    u32(24, sampleRate); u32(28, sampleRate * channels); u16(32, channels)
    u16(34, 8); u16(36, 0)
    ascii(38, "data"); u32(42, dataLen)
    System.arraycopy(ulawBytes, 0, out, 46, dataLen)
    out
  }
}
