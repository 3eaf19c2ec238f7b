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
 * parsing: dimensions + a sampled-luminance feature grid), and
 * audio-mime payloads via `javax.sound.sampled` ([[AudioCodec]] —
 * actual WAV/AIFF/AU container parsing: sample rate, channels, frame
 * count, strided-amplitude features). Only video still goes through
 * [[StubCodec]] (no video libraries beyond the JDK in this
 * environment): a deterministic fake "decode" from the bytes.
 * Everything around all three — the asset schema, the partition-batched
 * execution shape (one codec context per partition, not per row,
 * exactly the shape a JNI/FFmpeg/Pillow binding needs), the metadata
 * projection — is real and tested.
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

    def decode(a: Asset): DecodedAsset = {
      val len = if (a.payload == null) 0 else a.payload.length
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        if (img == null) throw new java.io.IOException("unrecognized format")
        val w = img.getWidth
        val h = img.getHeight
        val stride = math.max(1, math.min(w, h) / 64)
        val feats = Array.tabulate(8) { j =>
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
        DecodedAsset(a.asset_id, a.mime, len, w, h, 1, feats)
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
   * Batched decode: `mapPartitions` so a real codec can amortize its
   * init (library handles, GPU context) across a whole partition — the
   * Scala-side analog of `mapInPandas` batch shape. Input partitioning is
   * preserved; no shuffle. Image-mime rows hit the real [[ImageCodec]],
   * audio-mime rows the real [[AudioCodec]]; everything else (video)
   * the deterministic stub.
   */
  def decodeAssets(assets: Dataset[Asset])(implicit spark: SparkSession): Dataset[DecodedAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real impl: open codec context once here, close at iterator end
      it.map { a =>
        if (a.mime != null && a.mime.startsWith("image")) ImageCodec.decode(a)
        else if (a.mime != null && a.mime.startsWith("audio")) AudioCodec.decode(a)
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
      it.flatMap { d =>
        (0 until d.n_frames by everyN).iterator.map { f =>
          // real impl: seek + decode frame f; stub perturbs the asset
          // features deterministically per frame index
          Frame(d.asset_id, f,
            d.features.map(v => (v + f.toFloat / 100f) % 1f))
        }
      }
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
