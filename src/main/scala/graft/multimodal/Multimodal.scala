package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride through the
 * engine as opaque `binary` columns with a typed metadata struct, and
 * decode/feature-extraction runs batched per partition.
 *
 * Codec routing: image-mime payloads decode for REAL via the JDK's
 * `javax.imageio` ([[ImageCodec]] — actual PNG/JPEG/GIF/BMP byte
 * parsing: dimensions + a sampled-luminance feature grid), audio-mime
 * payloads via `javax.sound.sampled` ([[AudioCodec]] — actual
 * WAV/AIFF/AU container parsing: sample rate, channels, frame count,
 * strided-amplitude features), and video-mime payloads via
 * [[VideoCodec]] — a REAL container-header probe (MP4 box walk,
 * Matroska EBML walk, AVI RIFF walk, pure ByteBuffer) for true
 * dimensions, duration and declared frame count. Per-frame PIXEL
 * decode is real for MJPEG-in-AVI ([[sampleFramesDecoded]] — each
 * frame chunk is a complete JPEG `javax.imageio` handles); for other
 * video codecs (which the JDK lacks) frame features come from
 * [[sampleFrames]]'s deterministic derivation. Unrecognized mimes fall
 * to [[StubCodec]]'s deterministic fake. Everything around the codecs
 * — the asset schema, the partition-batched execution shape (one codec
 * context per partition, not per row, exactly the shape a
 * JNI/FFmpeg/Pillow binding needs), the metadata projection — is real
 * and tested.
 */
object Multimodal {

  /** Canonical asset schema: id + mime + opaque payload + source info. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("source", StringType)
  ))

  final case class Asset(asset_id: Long, mime: String, payload: Array[Byte], source: String)

  /** Decoded features: dimensions/duration + a tiny feature vector. */
  final case class DecodedAsset(
      asset_id: Long, mime: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /**
   * STUB CODEC — deterministic fake. A real deployment replaces this
   * object only; the Spark plumbing in [[decodeAssets]] is unchanged.
   * "Decode" derives dimensions from byte length and a feature vector
   * from a rolling byte hash, so results are stable for tests/oracles.
   */
  object StubCodec {
    def decode(a: Asset): DecodedAsset = {
      val len = if (a.payload == null) 0 else a.payload.length
      val w = 64 + (len % 577)          // fake width
      val h = 64 + ((len * 31) % 577)   // fake height
      val frames = if (a.mime != null && a.mime.startsWith("video")) 1 + len % 32 else 1
      var acc = 1469598103934665603L    // FNV-1a over the payload
      var i = 0
      while (i < len) { acc ^= a.payload(i); acc *= 1099511628211L; i += 1 }
      val feats = Array.tabulate(8)(j => ((acc >>> (j * 8)) & 0xFF).toFloat / 255f)
      DecodedAsset(a.asset_id, a.mime, len, w, h, frames, feats)
    }
  }

  /**
   * REAL image decode via the JDK's `javax.imageio` — parses the actual
   * payload bytes (PNG/JPEG/GIF/BMP): true pixel dimensions plus an
   * 8-float feature vector of mean luminances over a 4×2 grid (strided
   * sampling, so a 4k image costs ~thousands of pixel reads, not
   * millions). Unreadable bytes yield the (-1, -1, 0 frames, empty
   * features) error row — decode failures are DATA at 100 TB (a few
   * per million crawled images), never exceptions that kill the task.
   */
  object ImageCodec {
    // ImageIO's default useCache=true spills every read through a
    // FileCacheImageInputStream temp file — a per-row disk round trip
    // for a payload that is ALREADY a byte array in memory. Disable
    // once per JVM (executor-wide; the flag is global and we never
    // want the disk path).
    javax.imageio.ImageIO.setUseCache(false)

    /** Mean luminance over a 4×2 grid, strided so cost is bounded —
      * shared by still images and per-frame video decode. */
    private[multimodal] def lumGrid(img: java.awt.image.BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      val stride = math.max(1, math.min(w, h) / 64)
      Array.tabulate(8) { j =>
        val gx = j % 4
        val gy = j / 4
        val x1 = math.max(gx * w / 4 + 1, (gx + 1) * w / 4)
        val y1 = math.max(gy * h / 2 + 1, (gy + 1) * h / 2)
        var s = 0L
        var n = 0
        var y = gy * h / 2
        while (y < y1) {
          var x = gx * w / 4
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16 & 0xFF) + (rgb >> 8 & 0xFF) + (rgb & 0xFF)) / 3
            n += 1
            x += stride
          }
          y += stride
        }
        (s.toFloat / math.max(n, 1)) / 255f
      }
    }

    def decode(a: Asset): DecodedAsset = {
      val len = if (a.payload == null) 0 else a.payload.length
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        if (img == null) throw new java.io.IOException("unrecognized format")
        DecodedAsset(a.asset_id, a.mime, len, img.getWidth, img.getHeight,
          1, lumGrid(img))
      } catch {
        case _: Exception =>
          DecodedAsset(a.asset_id, a.mime, len, -1, -1, 0, Array.empty)
      }
    }
  }

  /**
   * REAL audio decode via the JDK's `javax.sound.sampled` — parses the
   * actual container bytes (WAV/AIFF/AU): sample rate (as `width`),
   * channel count (as `height`), PCM frame count (as `n_frames`), plus
   * an 8-float feature vector of mean |amplitude| over 8 time segments
   * (strided sampling honoring the container's endianness and sample
   * width — WAV is 16-bit LE, AIFF 16-bit BE, 8-bit either signedness;
   * non-linear encodings keep real metadata with zero features).
   * Unreadable bytes yield the same (-1, -1, 0, empty) error row as
   * [[ImageCodec]] — decode failures are DATA, never exceptions.
   */
  object AudioCodec {
    /** Header frame count when specified, else derived from the PCM
      * actually read. A header claiming more frames than Int holds
      * cannot be true of a ≤2 GB in-memory payload — that is the
      * corrupt-header case, and the require routes it to [[decode]]'s
      * error row rather than letting `toInt` wrap into a
      * negative-or-small count that masquerades as real metadata. */
    private[multimodal] def frameCount(headerFrames: Long, pcmLen: Int,
        frameSize: Int): Int = {
      require(headerFrames <= Int.MaxValue, "frame count overflows Int")
      if (headerFrames >= 0) headerFrames.toInt else pcmLen / frameSize
    }

    def decode(a: Asset): DecodedAsset = {
      val len = if (a.payload == null) 0 else a.payload.length
      try {
        // the stream API, not byte arithmetic: AudioInputStream starts AT
        // the data chunk, so trailing metadata chunks (LIST/INFO, id3 —
        // common from DAW exports) can't shift the sample windows the way
        // an end-of-container offset guess would
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        val fmt = ais.getFormat
        val rate = math.round(fmt.getSampleRate)
        val channels = fmt.getChannels
        val pcm = ais.readAllBytes()
        val frameSize = math.max(fmt.getFrameSize, 1)
        // header frame count when specified; else (legal e.g. for AU
        // streaming writers: data size 0xFFFFFFFF) derive it from the
        // actual PCM read — never let the -1 sentinel masquerade as data
        val headerFrames = ais.getFrameLength
        val nFrames = frameCount(headerFrames, pcm.length, frameSize)
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        val big = fmt.isBigEndian
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        // amplitude features for the linear-PCM widths (16-bit either
        // endianness — WAV is LE, AIFF is BE — and 8-bit signed or
        // unsigned); other encodings (mu-law, float) keep the REAL
        // container metadata and zero features rather than garbage
        val nSamples =
          if (bits == 16) pcm.length / 2
          else if (bits == 8) pcm.length
          else 0
        def sample(i: Int): Int =
          if (bits == 16) {
            val b0 = pcm(i * 2) & 0xFF
            val b1 = pcm(i * 2 + 1) & 0xFF
            val v = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
            math.abs(v.toShort.toInt)
          } else if (signed) math.abs(pcm(i).toInt) << 8
          else if (unsigned) math.abs((pcm(i) & 0xFF) - 128) << 8
          else 0
        val feats =
          if (nSamples <= 0 || !(signed || unsigned)) Array.fill(8)(0f)
          else {
            val stride = math.max(1, nSamples / 4096)
            Array.tabulate(8) { seg =>
              var s = 0L
              var n = 0
              var i = (seg.toLong * nSamples / 8).toInt
              val end = ((seg + 1).toLong * nSamples / 8).toInt
              while (i < end) {
                s += sample(i)
                n += 1
                i += stride
              }
              (s.toFloat / math.max(n, 1)) / 32768f
            }
          }
        DecodedAsset(a.asset_id, a.mime, len, rate, channels, nFrames, feats)
      } catch {
        case _: Exception =>
          DecodedAsset(a.asset_id, a.mime, len, -1, -1, 0, Array.empty)
      }
    }
  }

  /**
   * REAL video container probe — container METADATA is plain
   * structured bytes and parses with nothing but ByteBuffer (and for
   * MJPEG-in-AVI the JDK can decode the frames themselves — see
   * [[sampleFramesDecoded]]):
   *
   *  - MP4 / ISO BMFF (`ftyp` at byte 4): a box walk — recursing
   *    through `moov → trak → mdia → minf → stbl` — reads the movie
   *    timescale + duration from `mvhd`, the presentation dimensions
   *    from the video trak's `tkhd` (16.16 fixed point), and the frame
   *    count from that trak's `stsz` sample count.
   *  - Matroska / WebM (EBML magic `1A45DFA3`): an EBML walk —
   *    `Segment → Info` for TimecodeScale (default 10⁶ ns) + Duration,
   *    `Segment → Tracks → TrackEntry → Video` for PixelWidth /
   *    PixelHeight. Matroska does not declare a frame count in the
   *    header, so `n_frames` stays 0 (honest "not declared", while
   *    width = -1 still marks the error row).
   *  - AVI (RIFF `AVI `): a RIFF chunk walk — `LIST hdrl → avih` for
   *    dwMicroSecPerFrame/dwTotalFrames/dwWidth/dwHeight; `LIST movi`
   *    holds the frame chunks themselves ([[aviVideoFrames]]).
   *
   * Output mapping: `width`/`height` = true pixels, `n_frames` = the
   * container-declared sample count (MP4) or 0 (MKV), `features` =
   * `[durationSeconds]`. Unreadable bytes yield the same
   * (-1, -1, 0, empty) error row as the other codecs — a truncated or
   * lying container is DATA at 100 TB, never a task failure.
   */
  object VideoCodec {
    import java.nio.ByteBuffer

    private final class Probe {
      var timescale = 0L; var duration = 0L   // MP4 mvhd
      var w = 0; var h = 0; var frames = 0    // video trak
      var tcScaleNs = 1000000L                // MKV TimecodeScale
      var durTicks = 0.0                      // MKV Duration (float)
    }

    def decode(a: Asset): DecodedAsset = {
      val len = if (a.payload == null) 0 else a.payload.length
      try {
        val p = a.payload
        val probe =
          if (isMp4(p)) parseMp4(p)
          else if (isEbml(p)) parseMkv(p)
          else if (isAvi(p)) parseAvi(p)
          else throw new java.io.IOException("unrecognized container")
        if (probe.w <= 0 || probe.h <= 0)
          throw new java.io.IOException("no video track")
        val durSec =
          if (probe.timescale > 0) probe.duration.toDouble / probe.timescale
          else probe.durTicks * probe.tcScaleNs / 1e9
        DecodedAsset(a.asset_id, a.mime, len, probe.w, probe.h,
          probe.frames, Array(durSec.toFloat))
      } catch {
        case _: Exception =>
          DecodedAsset(a.asset_id, a.mime, len, -1, -1, 0, Array.empty)
      }
    }

    private def isMp4(p: Array[Byte]): Boolean =
      p != null && p.length >= 12 && p(4) == 'f' && p(5) == 't' &&
        p(6) == 'y' && p(7) == 'p'

    private def isEbml(p: Array[Byte]): Boolean =
      p != null && p.length >= 4 && (p(0) & 0xFF) == 0x1A &&
        (p(1) & 0xFF) == 0x45 && (p(2) & 0xFF) == 0xDF &&
        (p(3) & 0xFF) == 0xA3

    private[multimodal] def isAvi(p: Array[Byte]): Boolean =
      p != null && p.length >= 12 && p(0) == 'R' && p(1) == 'I' &&
        p(2) == 'F' && p(3) == 'F' && p(8) == 'A' && p(9) == 'V' &&
        p(10) == 'I' && p(11) == ' '

    // ---- AVI (RIFF) ----------------------------------------------------

    /** Iterate sibling RIFF chunks in [start, end): (fourcc, payloadStart,
      * payloadEnd). Sizes are LITTLE-endian; chunks pad to even offsets. */
    private def walkRiff(bb: ByteBuffer, start: Int, end: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var off = start
      while (off + 8 <= end) {
        val tp = new String(Array(bb.get(off), bb.get(off + 1),
          bb.get(off + 2), bb.get(off + 3)), "ASCII")
        val size = java.lang.Integer.reverseBytes(bb.getInt(off + 4)).toLong &
          0xFFFFFFFFL
        val payloadStart = off + 8
        val payloadEnd = (payloadStart + size).min(end.toLong).toInt
        if (payloadEnd < payloadStart) return // corrupt: stop
        f(tp, payloadStart, payloadEnd)
        off = payloadEnd + (payloadEnd & 1) // even padding
      }
    }

    private def u32le(bb: ByteBuffer, off: Int): Long =
      java.lang.Integer.reverseBytes(bb.getInt(off)).toLong & 0xFFFFFFFFL

    /** AVI main-header probe: `LIST hdrl → avih` carries
      * dwMicroSecPerFrame / dwTotalFrames / dwWidth / dwHeight — all
      * the metadata the MP4/MKV probes expose, from the one container
      * whose frames the JDK can also DECODE when the codec is MJPEG
      * (each `NNdc` chunk is a complete JPEG — see [[aviVideoFrames]]). */
    private def parseAvi(p: Array[Byte]): Probe = {
      val bb = ByteBuffer.wrap(p)
      val probe = new Probe
      walkRiff(bb, 12, p.length) { (tp, s, e) =>
        if (tp == "LIST" && e - s >= 4 &&
            new String(Array(bb.get(s), bb.get(s + 1), bb.get(s + 2),
              bb.get(s + 3)), "ASCII") == "hdrl")
          walkRiff(bb, s + 4, e) { (t2, s2, e2) =>
            if (t2 == "avih" && e2 - s2 >= 40) {
              val usPerFrame = u32le(bb, s2)
              val frames = u32le(bb, s2 + 16)
              val w = u32le(bb, s2 + 32)
              val h = u32le(bb, s2 + 36)
              // u32 fields above Int.MaxValue are corrupt headers —
              // route to the error row (same discipline as
              // AudioCodec.frameCount), never let toInt wrap into a
              // negative count that masquerades as real metadata
              require(frames <= Int.MaxValue && w <= Int.MaxValue &&
                h <= Int.MaxValue, "avih u32 field overflows Int")
              probe.frames = frames.toInt
              probe.w = w.toInt
              probe.h = h.toInt
              probe.timescale = 1000000L
              probe.duration = usPerFrame * probe.frames
            }
          }
      }
      probe
    }

    /** Byte ranges (offset, length) of the video frame chunks
      * (`NNdc`/`NNdb`) inside `LIST movi`, in presentation order. For
      * an MJPEG AVI each range is one complete JPEG image. Only the
      * FIRST video stream's chunks are returned (stream number = index
      * of the first `strl` whose `strh.fccType == "vids"`). */
    private[multimodal] def aviVideoFrames(p: Array[Byte]): IndexedSeq[(Int, Int)] = {
      if (!isAvi(p)) return IndexedSeq.empty
      val bb = ByteBuffer.wrap(p)
      var streamIdx = -1
      var idx = 0
      val frames = IndexedSeq.newBuilder[(Int, Int)]
      def listType(s: Int, e: Int): String =
        if (e - s >= 4) new String(Array(bb.get(s), bb.get(s + 1),
          bb.get(s + 2), bb.get(s + 3)), "ASCII") else ""
      walkRiff(bb, 12, p.length) { (tp, s, e) =>
        val lt = if (tp == "LIST") listType(s, e) else ""
        if (lt == "hdrl") walkRiff(bb, s + 4, e) { (t2, s2, e2) =>
          if (t2 == "LIST" && listType(s2, e2) == "strl") {
            walkRiff(bb, s2 + 4, e2) { (t3, s3, e3) =>
              if (t3 == "strh" && e3 - s3 >= 4 && streamIdx < 0 &&
                  new String(Array(bb.get(s3), bb.get(s3 + 1),
                    bb.get(s3 + 2), bb.get(s3 + 3)), "ASCII") == "vids")
                streamIdx = idx
            }
            idx += 1
          }
        }
        else if (lt == "movi" && streamIdx >= 0) {
          val tag = f"$streamIdx%02d"
          // frames may be DIRECT children of movi or grouped inside
          // 'LIST rec ' interleave chunks (the layout interleaved
          // writers produce) — walk both, or a standard interleaved
          // MJPEG AVI would silently fall back to derived features
          def walkMovi(from: Int, to: Int): Unit =
            walkRiff(bb, from, to) { (t2, s2, e2) =>
              if (t2 == "LIST" && listType(s2, e2) == "rec ")
                walkMovi(s2 + 4, e2)
              else if (t2.startsWith(tag) &&
                  (t2.endsWith("dc") || t2.endsWith("db")) && e2 > s2)
                frames += ((s2, e2 - s2))
            }
          walkMovi(s + 4, e)
        }
      }
      frames.result()
    }

    /** The first `vids` stream's BITMAPINFOHEADER when the AVI is
      * UNCOMPRESSED — `biCompression == 0` (BI_RGB) at 24/32 bpp, the
      * `DIB ` codec family: every frame chunk is a raw bottom-up
      * BGR(X) bitmap decodable with byte arithmetic alone, no codec.
      * Returns (width, height, bytesPerPixel, topDown) — a NEGATIVE
      * biHeight means top-down row order. None for compressed streams
      * (MJPEG dispatches on the JPEG SOI instead) and for palettized
      * or exotic depths. */
    private[multimodal] def aviDibFormat(
        p: Array[Byte]): Option[(Int, Int, Int, Boolean)] = {
      if (!isAvi(p)) return None
      val bb = ByteBuffer.wrap(p)
      var found: Option[(Int, Int, Int, Boolean)] = None
      var sawVids = false
      def listType(s: Int, e: Int): String =
        if (e - s >= 4) new String(Array(bb.get(s), bb.get(s + 1),
          bb.get(s + 2), bb.get(s + 3)), "ASCII") else ""
      walkRiff(bb, 12, p.length) { (tp, s, e) =>
        if (tp == "LIST" && listType(s, e) == "hdrl")
          walkRiff(bb, s + 4, e) { (t2, s2, e2) =>
            if (t2 == "LIST" && listType(s2, e2) == "strl" && found.isEmpty &&
                !sawVids) {
              var thisVids = false
              walkRiff(bb, s2 + 4, e2) { (t3, s3, e3) =>
                if (t3 == "strh" && e3 - s3 >= 4 &&
                    new String(Array(bb.get(s3), bb.get(s3 + 1),
                      bb.get(s3 + 2), bb.get(s3 + 3)), "ASCII") == "vids")
                  thisVids = true
                else if (t3 == "strf" && thisVids && e3 - s3 >= 40) {
                  sawVids = true
                  val w = java.lang.Integer.reverseBytes(bb.getInt(s3 + 4))
                  val hRaw = java.lang.Integer.reverseBytes(bb.getInt(s3 + 8))
                  val bitCount = ((bb.get(s3 + 14) & 0xFF) |
                    ((bb.get(s3 + 15) & 0xFF) << 8))
                  val compression = u32le(bb, s3 + 16)
                  if (compression == 0L && w > 0 && hRaw != 0 &&
                      (bitCount == 24 || bitCount == 32))
                    found = Some((w, math.abs(hRaw), bitCount / 8, hRaw < 0))
                }
              }
            }
          }
      }
      found
    }

    /** Decode one raw `DIB ` frame chunk into a BufferedImage so the
      * ONE luminance definition ([[ImageCodec.lumGrid]]) serves stills,
      * MJPEG frames, and uncompressed frames alike. Rows pad to 4-byte
      * boundaries; bottom-up unless `topDown`. None when the chunk is
      * shorter than the geometry demands (mid-stream corruption —
      * DATA, the codec-family contract). */
    private[multimodal] def dibFrameImage(p: Array[Byte], off: Int,
        len: Int, w: Int, h: Int, bytesPP: Int,
        topDown: Boolean): Option[java.awt.image.BufferedImage] = {
      val rowStride = ((w * bytesPP + 3) / 4) * 4
      if (len < rowStride.toLong * h) return None
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val srcRow = off + (if (topDown) y else h - 1 - y) * rowStride
        var x = 0
        while (x < w) {
          val i = srcRow + x * bytesPP // BGR(X) byte order
          img.setRGB(x, y, ((p(i + 2) & 0xFF) << 16) |
            ((p(i + 1) & 0xFF) << 8) | (p(i) & 0xFF))
          x += 1
        }
        y += 1
      }
      Some(img)
    }

    // ---- MP4 / ISO BMFF ------------------------------------------------

    private def parseMp4(p: Array[Byte]): Probe = {
      val bb = ByteBuffer.wrap(p) // BIG_ENDIAN by default
      val probe = new Probe
      walkBoxes(bb, 0, p.length) { (tp, s, e) =>
        if (tp == "moov") walkBoxes(bb, s, e) { (t2, s2, e2) =>
          if (t2 == "mvhd") mvhd(bb, s2, probe)
          else if (t2 == "trak") trak(bb, s2, e2, probe)
        }
      }
      probe
    }

    /** Iterate sibling boxes in [start, end): (type, payloadStart,
      * payloadEnd). size==1 ⇒ 64-bit largesize; size==0 ⇒ to end. */
    private def walkBoxes(bb: ByteBuffer, start: Int, end: Int)(
        f: (String, Int, Int) => Unit): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size32 = bb.getInt(off).toLong & 0xFFFFFFFFL
        val tp = new String(Array(bb.get(off + 4), bb.get(off + 5),
          bb.get(off + 6), bb.get(off + 7)), "ASCII")
        val (payloadStart, boxEnd) =
          if (size32 == 1L && off + 16 <= end)
            (off + 16, off + bb.getLong(off + 8).min(end - off).toInt)
          else if (size32 == 0L) (off + 8, end)
          else (off + 8, off + size32.min((end - off).toLong).toInt)
        // boxEnd == payloadStart is a LEGAL empty box (e.g. 'free');
        // only a size smaller than its own header is corrupt
        if (boxEnd < payloadStart || boxEnd > end) return // corrupt: stop
        f(tp, payloadStart, boxEnd)
        off = boxEnd
      }
    }

    private def mvhd(bb: ByteBuffer, s: Int, probe: Probe): Unit = {
      val version = bb.get(s) & 0xFF
      if (version == 1) {
        probe.timescale = bb.getInt(s + 20).toLong & 0xFFFFFFFFL
        probe.duration = bb.getLong(s + 24)
      } else {
        probe.timescale = bb.getInt(s + 12).toLong & 0xFFFFFFFFL
        probe.duration = bb.getInt(s + 16).toLong & 0xFFFFFFFFL
      }
    }

    /** One trak: tkhd dims + (if it is the video trak) its stsz count. */
    private def trak(bb: ByteBuffer, s: Int, e: Int, probe: Probe): Unit = {
      var w = 0; var h = 0; var frames = 0
      walkBoxes(bb, s, e) { (tp, s2, e2) =>
        if (tp == "tkhd") {
          val version = bb.get(s2) & 0xFF
          val dimOff = if (version == 1) s2 + 88 else s2 + 76
          if (dimOff + 8 <= e2) {
            w = bb.getInt(dimOff) >>> 16  // 16.16 fixed point
            h = bb.getInt(dimOff + 4) >>> 16
          }
        } else if (tp == "mdia") walkBoxes(bb, s2, e2) { (t3, s3, e3) =>
          if (t3 == "minf") walkBoxes(bb, s3, e3) { (t4, s4, e4) =>
            if (t4 == "stbl") walkBoxes(bb, s4, e4) { (t5, s5, _) =>
              if (t5 == "stsz") frames = bb.getInt(s5 + 8)
            }
          }
        }
      }
      if (w > 0 && h > 0 && (probe.w <= 0 || w * h > probe.w * probe.h)) {
        probe.w = w; probe.h = h; probe.frames = frames
      }
    }

    // ---- Matroska / WebM (EBML) ----------------------------------------

    private val Segment = 0x18538067L
    private val Info = 0x1549A966L
    private val TimecodeScale = 0x2AD7B1L
    private val DurationId = 0x4489L
    private val Tracks = 0x1654AE6BL
    private val TrackEntry = 0xAEL
    private val Video = 0xE0L
    private val PixelWidth = 0xB0L
    private val PixelHeight = 0xBAL

    private def parseMkv(p: Array[Byte]): Probe = {
      val probe = new Probe
      walkEbml(p, 0, p.length) { (id, s, e) =>
        if (id == Segment) walkEbml(p, s, e) { (id2, s2, e2) =>
          if (id2 == Info) walkEbml(p, s2, e2) { (id3, s3, e3) =>
            if (id3 == TimecodeScale) probe.tcScaleNs = uint(p, s3, e3)
            else if (id3 == DurationId) probe.durTicks = ebmlFloat(p, s3, e3)
          }
          else if (id2 == Tracks) walkEbml(p, s2, e2) { (id3, s3, e3) =>
            if (id3 == TrackEntry) walkEbml(p, s3, e3) { (id4, s4, e4) =>
              if (id4 == Video) walkEbml(p, s4, e4) { (id5, s5, e5) =>
                if (id5 == PixelWidth) probe.w = uint(p, s5, e5).toInt
                else if (id5 == PixelHeight) probe.h = uint(p, s5, e5).toInt
              }
            }
          }
        }
      }
      probe
    }

    /** Iterate sibling EBML elements in [start, end): (id, payloadStart,
      * payloadEnd). Unknown size (all value bits set) extends to end. */
    private def walkEbml(p: Array[Byte], start: Int, end: Int)(
        f: (Long, Int, Int) => Unit): Unit = {
      var off = start
      while (off < end) {
        val (id, idLen) = vint(p, off, end, keepMarker = true)
        if (idLen == 0) return
        val (size, szLen) = vint(p, off + idLen, end, keepMarker = false)
        if (szLen == 0) return
        val payloadStart = off + idLen + szLen
        // all-ones size = "unknown", runs to the enclosing end
        val unknown = size == (1L << (7 * szLen)) - 1
        val payloadEnd =
          if (unknown) end
          else (payloadStart + size).min(end.toLong).toInt
        if (payloadEnd < payloadStart) return
        f(id, payloadStart, payloadEnd)
        off = payloadEnd
      }
    }

    /** EBML variable-length integer at `off`: (value, byteLen); (0, 0)
      * on truncation. IDs keep the length-marker bit, sizes strip it. */
    private def vint(p: Array[Byte], off: Int, end: Int,
        keepMarker: Boolean): (Long, Int) = {
      if (off >= end) return (0L, 0)
      val first = p(off) & 0xFF
      if (first == 0) return (0L, 0)
      val len = Integer.numberOfLeadingZeros(first) - 24 + 1
      if (len > 8 || off + len > end) return (0L, 0)
      var v = (if (keepMarker) first else first & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (p(off + i) & 0xFF); i += 1 }
      (v, len)
    }

    private def uint(p: Array[Byte], s: Int, e: Int): Long = {
      var v = 0L
      var i = s
      while (i < e && i - s < 8) { v = (v << 8) | (p(i) & 0xFF); i += 1 }
      v
    }

    private def ebmlFloat(p: Array[Byte], s: Int, e: Int): Double = {
      val bb = ByteBuffer.wrap(p, s, e - s)
      if (e - s == 4) bb.getFloat.toDouble
      else if (e - s == 8) bb.getDouble
      else 0.0
    }
  }

  /**
   * Batched decode: `mapPartitions` so a real codec can amortize its
   * init (library handles, GPU context) across a whole partition — the
   * Scala-side analog of `mapInPandas` batch shape. Input partitioning is
   * preserved; no shuffle. Image-mime rows hit the real [[ImageCodec]],
   * audio-mime rows the real [[AudioCodec]], video-mime rows the real
   * [[VideoCodec]] container probe (or its -1 error row for
   * unparseable containers); only unrecognized mimes fall to the
   * deterministic stub.
   */
  def decodeAssets(assets: Dataset[Asset])(implicit spark: SparkSession): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real impl: open codec context once here, close at iterator end
      it.map { a =>
        if (a.mime != null && a.mime.startsWith("image")) ImageCodec.decode(a)
        else if (a.mime != null && a.mime.startsWith("audio")) AudioCodec.decode(a)
        else if (a.mime != null && a.mime.startsWith("video")) VideoCodec.decode(a)
        else StubCodec.decode(a)
      }
    }
  }

  /** Resized asset: target dims + the (stub-)transcoded payload. */
  final case class ResizedAsset(
      asset_id: Long, mime: String, width: Int, height: Int,
      payload: Array[Byte])

  /**
   * Batched resize — same partition-batched shape as [[decodeAssets]]
   * (real impl: one scaler context per partition). The stub "transcode"
   * is a deterministic byte-fold so output size tracks target area;
   * partitioning is preserved, no shuffle.
   */
  def resizeAssets(assets: Dataset[Asset], width: Int, height: Int)(
      implicit spark: SparkSession): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real impl: init scaler (e.g. libswscale) once here
      it.map { a =>
        val src = if (a.payload == null) Array.emptyByteArray else a.payload
        val out = if (src.isEmpty) Array.emptyByteArray else {
          val outLen = math.min(math.max(1, width * height / 64), src.length)
          // long math: i * src.length overflows Int at video-sized payloads
          Array.tabulate[Byte](outLen)(i => src((i.toLong * src.length / outLen).toInt))
        }
        ResizedAsset(a.asset_id, a.mime, width, height, out)
      }
    }
  }

  /** One sampled frame of a (video) asset. */
  final case class Frame(
      asset_id: Long, frame_index: Int, features: Array[Float])

  /** THE derived per-frame feature rule (deterministic perturbation of
    * the asset's features by frame index) — one definition shared by
    * [[sampleFrames]] and [[sampleFramesDecoded]]'s non-MJPEG
    * fallback, so the mixed-corpus path and the pure-derived path can
    * never drift apart for identical assets. */
  private def derivedFrames(d: DecodedAsset, everyN: Int): Iterator[Frame] =
    (0 until d.n_frames by everyN).iterator.map { f =>
      Frame(d.asset_id, f,
        d.features.map(v => (v + f.toFloat / 100f) % 1f))
    }

  /**
   * REAL per-frame pixel decode, for the one video codec the JDK can
   * fully handle: MJPEG-in-AVI, where every frame chunk is a complete
   * JPEG that `javax.imageio` decodes. Every `everyN`-th video chunk
   * of each AVI payload becomes a Frame row whose features are the
   * TRUE luminance grid of that frame's pixels (the [[ImageCodec]]
   * grid). Non-AVI video payloads (MP4/MKV — codecs the JDK lacks)
   * fall back to the [[sampleFrames]] derivation over the container
   * probe, so one call covers a mixed corpus. Same partition-batched
   * 1:N shape as [[sampleFrames]]: no shuffle, payload bytes are
   * sliced per frame (no copy of the whole asset per row), and a
   * frame whose bytes fail to decode yields an empty features row
   * (decode failures are DATA, the codec-family contract).
   *
   * The second fully-decodable family is UNCOMPRESSED AVI (`DIB ` —
   * BI_RGB 24/32 bpp): each frame chunk is a raw bottom-up bitmap,
   * decoded with plain byte arithmetic ([[VideoCodec.dibFrameImage]])
   * into the SAME luminance grid, so MJPEG and RGB AVIs in one corpus
   * produce directly comparable frame features.
   *
   * Codec dispatch is per ASSET, not per frame: an AVI whose video
   * chunks are neither JPEGs (no SOI marker on the first chunk) nor
   * raw BI_RGB bitmaps (Xvid, cinepak) routes to the SAME
   * derived-feature fallback as MP4/MKV, instead of emitting
   * all-empty rows — a mixed-container corpus must not systematically
   * degrade one container type. Empty features remain only for
   * mid-stream corruption INSIDE a genuine MJPEG or DIB stream.
   */
  def sampleFramesDecoded(assets: Dataset[Asset], everyN: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import spark.implicits._
    def isJpegSoi(p: Array[Byte], off: Int, len: Int): Boolean =
      len >= 2 && (p(off) & 0xFF) == 0xFF && (p(off + 1) & 0xFF) == 0xD8
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val p = a.payload
        val ranges = if (p != null) VideoCodec.aviVideoFrames(p)
                     else IndexedSeq.empty
        val mjpeg = ranges.nonEmpty &&
          isJpegSoi(p, ranges.head._1, ranges.head._2)
        val dib = if (ranges.nonEmpty && !mjpeg) VideoCodec.aviDibFormat(p)
                  else None
        if (mjpeg) {
          (0 until ranges.length by everyN).iterator.map { f =>
            val (off, len) = ranges(f)
            val feats =
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(p, off, len))
                if (img == null) Array.empty[Float]
                else ImageCodec.lumGrid(img)
              } catch { case _: Exception => Array.empty[Float] }
            Frame(a.asset_id, f, feats)
          }
        } else if (dib.isDefined) {
          val (w, h, bpp, topDown) = dib.get
          (0 until ranges.length by everyN).iterator.map { f =>
            val (off, len) = ranges(f)
            val feats = VideoCodec.dibFrameImage(p, off, len, w, h, bpp, topDown)
              .map(ImageCodec.lumGrid).getOrElse(Array.empty[Float])
            Frame(a.asset_id, f, feats)
          }
        } else {
          // non-AVI (or frameless, or compressed-codec) video: the
          // derived-feature fallback
          derivedFrames(VideoCodec.decode(a), everyN)
        }
      }
    }
  }

  /**
   * Frame sampling: every `everyN`-th frame of each decoded asset,
   * emitted as its own row (1:N via the partition iterator — the
   * Scala-side `flatMap` analog of a Pandas-UDF iterator; no shuffle,
   * output rows carry per-frame features derived from the asset's).
   * Non-video assets (n_frames = 1) emit exactly frame 0.
   */
  def sampleFrames(decoded: Dataset[DecodedAsset], everyN: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import spark.implicits._
    decoded.mapPartitions { it =>
      // real impl: seek + decode frame f; the stub perturbs the asset
      // features deterministically per frame index (derivedFrames)
      it.flatMap(derivedFrames(_, everyN))
    }
  }

  /** Wrap any table with an id + a string column as binary assets (the
    * test-data path: documents.text bytes stand in for media payloads). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String,
      mime: String = "text/plain")(implicit spark: SparkSession): Dataset[Asset] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("asset_id"),
        lit(mime).as("mime"),
        col(textCol).cast("binary").as("payload"),
        lit("testdata").as("source"))
      .as[Asset]
  }
}
