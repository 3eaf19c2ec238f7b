package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("binary asset plumbing: schema, partition-batched decode, determinism") {
    implicit val s = spark
    val docs = Tables.load(spark, sf0001, "documents").limit(50)
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    assert(assets.schema.fieldNames.toSeq ===
      Seq("asset_id", "mime", "payload", "source"))
    val decoded = Multimodal.decodeAssets(assets)
    val rows = decoded.collect()
    assert(rows.length === 50)
    // deterministic: same payload ⇒ same features
    val again = Multimodal.decodeAssets(assets).collect()
    assert(rows.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
    // fake decode is length-derived
    rows.foreach { r =>
      assert(r.width === 64 + r.byte_len % 577)
      assert(r.features.length === 8)
    }
    // no shuffle: decode preserves input partitioning
    assert(decoded.rdd.getNumPartitions === assets.rdd.getNumPartitions)
  }

  test("ImageCodec decodes real PNG/JPEG bytes: true dimensions, luminance grid, error rows") {
    implicit val s = spark
    import spark.implicits._
    def render(w: Int, h: Int, fmt: String)(color: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    // 40×20 PNG, left half black / right half white — the 4×2 feature
    // grid must read dark/dark/bright/bright per row
    val bw = render(40, 20, "png")((x, _) => if (x < 20) 0x000000 else 0xFFFFFF)
    val gray = render(8, 8, "jpg")((_, _) => 0x808080)
    val assets = Seq(
      Multimodal.Asset(1L, "image/png", bw, "t"),
      Multimodal.Asset(2L, "image/jpeg", gray, "t"),
      Multimodal.Asset(3L, "image/png", "not an image".getBytes("UTF-8"), "t")
    ).toDS()
    val d = Multimodal.decodeAssets(assets).collect().sortBy(_.asset_id)
    // real dimensions parsed from the payload bytes, not derived from length
    assert(d(0).width === 40 && d(0).height === 20 && d(0).n_frames === 1)
    assert(d(0).byte_len === bw.length)
    val f = d(0).features
    assert(f(0) < 0.2 && f(1) < 0.2 && f(2) > 0.8 && f(3) > 0.8, f.toSeq)
    assert(f(4) < 0.2 && f(5) < 0.2 && f(6) > 0.8 && f(7) > 0.8, f.toSeq)
    assert(d(1).width === 8 && d(1).height === 8)
    assert(d(1).features.forall(v => v > 0.3 && v < 0.7), d(1).features.toSeq)
    // unreadable bytes are an error ROW, not a task failure
    assert(d(2).width === -1 && d(2).height === -1 && d(2).features.isEmpty)
  }

  test("AudioCodec decodes real WAV bytes: rate, channels, frames, amplitude features") {
    implicit val s = spark
    import spark.implicits._
    // render a real 16-bit mono WAV: first half silence, second half
    // a loud square wave — the 8 time-segment features must read
    // quiet/quiet/quiet/quiet then loud/loud/loud/loud
    val rate = 8000
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- nFrames / 2 until nFrames) {
      val v: Short = if (i % 2 == 0) 20000 else -20000
      pcm(i * 2) = (v & 0xFF).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val assets = Seq(
      Multimodal.Asset(1L, "audio/wav", wav, "t"),
      Multimodal.Asset(2L, "audio/wav", "not audio".getBytes("UTF-8"), "t")
    ).toDS()
    val d = Multimodal.decodeAssets(assets).collect().sortBy(_.asset_id)
    // real container metadata parsed from the payload bytes
    assert(d(0).width === rate && d(0).height === 1 && d(0).n_frames === nFrames)
    assert(d(0).byte_len === wav.length)
    val f = d(0).features
    assert(f.take(4).forall(_ < 0.05), f.toSeq)  // silent half
    assert(f.drop(4).forall(_ > 0.5), f.toSeq)   // square-wave half
    // unreadable bytes are an error ROW, not a task failure
    assert(d(1).width === -1 && d(1).height === -1 && d(1).features.isEmpty)
  }

  test("AudioCodec frame-count overflow routes to the error path, never wraps") {
    // normal cases: header count wins; -1 sentinel derives from PCM read
    assert(Multimodal.AudioCodec.frameCount(4000L, 8000, 2) === 4000)
    assert(Multimodal.AudioCodec.frameCount(-1L, 8000, 2) === 4000)
    // a header claiming more frames than Int holds (multi-day capture or
    // corrupt size field) must throw — decode's catch turns that into
    // the (-1,-1,0) error row — not toInt-wrap into plausible metadata
    intercept[IllegalArgumentException] {
      Multimodal.AudioCodec.frameCount(Int.MaxValue + 1L, 8000, 2)
    }
    intercept[IllegalArgumentException] {
      Multimodal.AudioCodec.frameCount(0xFFFFFFF0L, 8000, 1)
    }
  }

  test("AudioCodec honors AIFF's big-endian samples (same signal, same features)") {
    implicit val s = spark
    import spark.implicits._
    // identical signal to the WAV test, but written as AIFF: 16-bit
    // BIG-endian PCM. A codec hardwired to little-endian would read
    // swapped bytes and see a loud 'silent' half.
    val rate = 8000
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- nFrames / 2 until nFrames) {
      val v: Short = if (i % 2 == 0) 20000 else -20000
      pcm(i * 2) = ((v >> 8) & 0xFF).toByte // big-endian byte order
      pcm(i * 2 + 1) = (v & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    val d = Multimodal.decodeAssets(
      Seq(Multimodal.Asset(1L, "audio/aiff", aiff, "t")).toDS()).head()
    assert(d.width === rate && d.height === 1 && d.n_frames === nFrames)
    val f = d.features
    assert(f.take(4).forall(_ < 0.05), f.toSeq)  // silent half
    assert(f.drop(4).forall(_ > 0.5), f.toSeq)   // square-wave half
  }

  test("resize keeps ids, sets target dims, bounds payload by target area") {
    implicit val s = spark
    val docs = Tables.load(spark, sf0001, "documents").limit(20)
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    val resized = Multimodal.resizeAssets(assets, 32, 32).collect()
    assert(resized.length === 20)
    resized.foreach { r =>
      assert(r.width === 32 && r.height === 32)
      assert(r.payload.length <= math.max(1, 32 * 32 / 64))
    }
    // deterministic
    val again = Multimodal.resizeAssets(assets, 32, 32).collect()
    assert(resized.map(_.payload.toSeq).toSeq === again.map(_.payload.toSeq).toSeq)
  }

  test("resize survives null/empty payloads and video-scale targets") {
    implicit val s = spark
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "image/png", null, "t"),
      Multimodal.Asset(2L, "image/png", Array.emptyByteArray, "t"),
      Multimodal.Asset(3L, "video/mp4", Array.fill[Byte](100000)(7), "t")
    ).toDS()
    // 1920x1080: outLen up to 32400 — the i*srcLen product needs long math
    val r = Multimodal.resizeAssets(assets, 1920, 1080).collect()
      .sortBy(_.asset_id)
    assert(r(0).payload.isEmpty && r(1).payload.isEmpty)
    assert(r(2).payload.nonEmpty && r(2).payload.forall(_ === 7.toByte))
  }

  // ---- synthetic container builders (real byte layouts, tiny files) ----

  private def u32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def mp4Box(tp: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    u32(8L + body.length) ++ tp.getBytes("ASCII") ++ body
  }

  /** Minimal-but-real ISO BMFF: ftyp + moov{mvhd, video trak{tkhd dims,
    * stbl/stsz count}, audio trak{0×0 tkhd, its own stsz}}. */
  private def mp4Bytes(w: Int, h: Int, timescale: Long, duration: Long,
      frames: Int, audioFrames: Int = 999): Array[Byte] = {
    def trakOf(tw: Int, th: Int, n: Int) = mp4Box("trak",
      mp4Box("tkhd", Array.fill[Byte](76)(0),
        u32(tw.toLong << 16), u32(th.toLong << 16)),
      mp4Box("mdia", mp4Box("minf", mp4Box("stbl",
        mp4Box("stsz", Array.fill[Byte](8)(0), u32(n.toLong))))))
    mp4Box("ftyp", "isom".getBytes("ASCII"), u32(0)) ++
      mp4Box("moov",
        mp4Box("mvhd", Array.fill[Byte](12)(0), u32(timescale), u32(duration)),
        trakOf(w, h, frames),
        trakOf(0, 0, audioFrames))
  }

  private def ebmlBytes(v: Long): Array[Byte] = {
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    Array.tabulate[Byte](n)(i => ((v >>> ((n - 1 - i) * 8)) & 0xFF).toByte)
  }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    assert(body.length < 127)
    ebmlBytes(id) ++ Array((0x80 | body.length).toByte) ++ body
  }

  /** Minimal-but-real Matroska: EBML header + Segment{Info{
    * TimecodeScale, Duration float32}, Tracks{TrackEntry{Video{
    * PixelWidth, PixelHeight}}}}. */
  private def mkvBytes(w: Int, h: Int, durTicks: Float,
      tcScaleNs: Long = 1000000L): Array[Byte] = {
    val durF = java.nio.ByteBuffer.allocate(4).putFloat(durTicks).array()
    el(0x1A45DFA3L) ++
      el(0x18538067L,
        el(0x1549A966L, el(0x2AD7B1L, ebmlBytes(tcScaleNs)),
          el(0x4489L, durF)),
        el(0x1654AE6BL, el(0xAEL, el(0xE0L,
          el(0xB0L, ebmlBytes(w.toLong)), el(0xBAL, ebmlBytes(h.toLong))))))
  }

  test("VideoCodec probes real MP4 boxes: dims, duration, frame count, error rows") {
    implicit val s = spark
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "video/mp4",
        mp4Bytes(640, 360, timescale = 1000L, duration = 7500L, frames = 13), "t"),
      Multimodal.Asset(2L, "video/mp4", "not a video".getBytes("UTF-8"), "t")
    ).toDS()
    val d = Multimodal.decodeAssets(assets).collect().sortBy(_.asset_id)
    // true presentation dims from the VIDEO trak's tkhd — the 0×0
    // audio trak (with its own 999-sample stsz) must not win
    assert(d(0).width === 640 && d(0).height === 360)
    assert(d(0).n_frames === 13)
    assert(d(0).features.toSeq === Seq(7.5f)) // mvhd duration/timescale
    // unreadable bytes are an error ROW, not a task failure
    assert(d(1).width === -1 && d(1).height === -1 && d(1).n_frames === 0)
    assert(d(1).features.isEmpty)
  }

  test("VideoCodec handles version-1 headers and 64-bit largesize boxes") {
    implicit val s = spark
    import spark.implicits._
    def u64(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def mp4BoxLarge(tp: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      u32(1L) ++ tp.getBytes("ASCII") ++ u64(16L + body.length) ++ body
    }
    // version-1 mvhd: 64-bit times, timescale 600, duration 3000 → 5 s
    val mvhd1 = mp4Box("mvhd", Array[Byte](1, 0, 0, 0),
      Array.fill[Byte](16)(0), u32(600L), u64(3000L))
    // version-1 tkhd: dims after the 64-bit header layout
    val trak1 = mp4Box("trak",
      mp4Box("tkhd", Array[Byte](1, 0, 0, 0), Array.fill[Byte](84)(0),
        u32(1920L << 16), u32(1080L << 16)),
      mp4Box("mdia", mp4Box("minf", mp4Box("stbl",
        mp4Box("stsz", Array.fill[Byte](8)(0), u32(250L))))))
    // moov itself rides a size==1 box with 64-bit largesize
    val bytes = mp4Box("ftyp", "isom".getBytes("ASCII"), u32(0)) ++
      mp4BoxLarge("moov", mvhd1, trak1)
    val d = Multimodal.decodeAssets(Seq(
      Multimodal.Asset(1L, "video/mp4", bytes, "t")).toDS()).head()
    assert(d.width === 1920 && d.height === 1080)
    assert(d.n_frames === 250)
    assert(d.features.toSeq === Seq(5.0f))
  }

  test("VideoCodec walks past legal empty boxes ('free' with size 8)") {
    implicit val s = spark
    import spark.implicits._
    // an empty 'free' box sits between ftyp and moov — the walk must
    // step over it, not stop
    val bytes = mp4Box("ftyp", "isom".getBytes("ASCII"), u32(0)) ++
      mp4Box("free") ++
      mp4Box("moov",
        mp4Box("mvhd", Array.fill[Byte](12)(0), u32(1000L), u32(2000L)),
        mp4Box("trak",
          mp4Box("tkhd", Array.fill[Byte](76)(0),
            u32(320L << 16), u32(240L << 16)),
          mp4Box("mdia", mp4Box("minf", mp4Box("stbl",
            mp4Box("stsz", Array.fill[Byte](8)(0), u32(48L)))))))
    val d = Multimodal.decodeAssets(Seq(
      Multimodal.Asset(1L, "video/mp4", bytes, "t")).toDS()).head()
    assert(d.width === 320 && d.height === 240 && d.n_frames === 48)
  }

  test("VideoCodec probes real Matroska EBML: dims, scaled duration, honest frame count") {
    implicit val s = spark
    import spark.implicits._
    val d = Multimodal.decodeAssets(Seq(
      Multimodal.Asset(1L, "video/webm",
        mkvBytes(1280, 720, durTicks = 4000f), "t")).toDS()).head()
    assert(d.width === 1280 && d.height === 720)
    // 4000 ticks × 1 ms/tick = 4 s
    assert(d.features.toSeq === Seq(4.0f))
    // Matroska headers do not declare a frame count: 0, NOT an error
    // (width −1 is what marks errors)
    assert(d.n_frames === 0)
  }

  // ---- AVI (RIFF little-endian) builder --------------------------------

  private def le32(v: Long): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def riffChunk(tp: String, body: Array[Byte]): Array[Byte] = {
    val c = tp.getBytes("ASCII") ++ le32(body.length.toLong) ++ body
    if (body.length % 2 == 1) c :+ 0.toByte else c
  }

  private def riffList(listType: String, parts: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("ASCII") ++ parts.flatten)

  /** Minimal-but-real MJPEG AVI: RIFF{hdrl{avih, strl{strh vids/MJPG}},
    * movi{00dc = one complete JPEG per frame}}. */
  private def aviBytes(w: Int, h: Int, usPerFrame: Long,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes("ASCII") ++ "MJPG".getBytes("ASCII") ++
      Array.fill[Byte](48)(0)
    val hdrl = riffList("hdrl", riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh)))
    val movi = riffList("movi", frames.map(riffChunk("00dc", _)): _*)
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** A real JPEG of a solid gray level (0..255), via javax.imageio. */
  private def jpegOfGray(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(level, level, level))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AVI probe + REAL MJPEG frame decode: true per-frame pixel features") {
    implicit val s = spark
    import spark.implicits._
    // three frames at distinct brightness levels — if the decode is
    // real, the luminance features must track the planted levels
    val levels = Seq(40, 128, 220)
    val avi = aviBytes(48, 32, usPerFrame = 40000L,
      levels.map(jpegOfGray(48, 32, _)))
    val assets = Seq(
      Multimodal.Asset(1L, "video/x-msvideo", avi, "t"),
      Multimodal.Asset(2L, "video/mp4",
        mp4Bytes(320, 240, 1000L, 2000L, frames = 3), "t")).toDS()

    // container probe: avih dims/frames, duration = us/frame × frames
    val d = Multimodal.decodeAssets(assets).collect().sortBy(_.asset_id)
    assert(d(0).width === 48 && d(0).height === 32 && d(0).n_frames === 3)
    assert(math.abs(d(0).features.head - 0.12f) < 1e-6) // 3 × 40 ms

    val frames = Multimodal.sampleFramesDecoded(assets, everyN = 1)
      .collect().groupBy(_.asset_id)
    // AVI side: real pixels — every grid cell of a solid frame sits at
    // the planted level (JPEG of a solid color is lossless-ish: ±2/255)
    val got = frames(1L).sortBy(_.frame_index)
    assert(got.map(_.frame_index).toSeq === Seq(0, 1, 2))
    got.zip(levels).foreach { case (fr, lvl) =>
      assert(fr.features.length === 8)
      fr.features.foreach(f =>
        assert(math.abs(f - lvl / 255f) < 0.02f,
          s"frame ${fr.frame_index}: feature $f vs level ${lvl / 255f}"))
    }
    // MP4 side: falls back to the derived features of sampleFrames
    val mp4Derived = Multimodal.sampleFrames(
      Multimodal.decodeAssets(assets.filter(_.asset_id == 2L)), 1)
      .collect().sortBy(_.frame_index).map(_.features.toSeq).toSeq
    assert(frames(2L).sortBy(_.frame_index).map(_.features.toSeq).toSeq
      === mp4Derived)

    // everyN strides the REAL frames too
    val strided = Multimodal.sampleFramesDecoded(
      assets.filter(_.asset_id == 1L), everyN = 2).collect()
    assert(strided.map(_.frame_index).sorted.toSeq === Seq(0, 2))
  }

  test("rec-interleaved AVI decodes its frames (grandchildren of movi)") {
    implicit val s = spark
    import spark.implicits._
    // interleaved writers group frames inside 'LIST rec ' chunks: the
    // walker must recurse into them or a standard interleaved MJPEG
    // AVI silently falls back to derived features
    val levels = Seq(60, 200)
    val frames = levels.map(jpegOfGray(32, 32, _))
    val avih = le32(40000L) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(32L) ++ le32(32L) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes("ASCII") ++ "MJPG".getBytes("ASCII") ++
      Array.fill[Byte](48)(0)
    val hdrl = riffList("hdrl", riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh)))
    val movi = riffList("movi",
      frames.map(fr => riffList("rec ", riffChunk("00dc", fr))): _*)
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("ASCII") ++ le32(body.length.toLong) ++ body

    val got = Multimodal.sampleFramesDecoded(
        Seq(Multimodal.Asset(7L, "video/x-msvideo", avi, "t")).toDS(), 1)
      .collect().sortBy(_.frame_index)
    assert(got.map(_.frame_index).toSeq === Seq(0, 1))
    got.zip(levels).foreach { case (fr, lvl) =>
      assert(fr.features.length === 8)
      fr.features.foreach(f => assert(math.abs(f - lvl / 255f) < 0.02f))
    }
  }

  // ---- uncompressed (DIB / BI_RGB) AVI builder -------------------------

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  /** Uncompressed AVI: strh vids/`DIB ` + strf BITMAPINFOHEADER
    * (biCompression = 0), frames as raw BGR(X) rows padded to 4-byte
    * stride, `00db` chunks. */
  private def dibAviBytes(w: Int, h: Int, bitCount: Int, topDown: Boolean,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = le32(40000L) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes("ASCII") ++ "DIB ".getBytes("ASCII") ++
      Array.fill[Byte](48)(0)
    val strf = le32(40L) ++ le32(w.toLong) ++
      le32(if (topDown) -h.toLong else h.toLong) ++ le16(1) ++
      le16(bitCount) ++ le32(0L) ++ Array.fill[Byte](20)(0)
    val hdrl = riffList("hdrl", riffChunk("avih", avih),
      riffList("strl", riffChunk("strh", strh), riffChunk("strf", strf)))
    val movi = riffList("movi", frames.map(riffChunk("00db", _)): _*)
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("ASCII") ++ le32(body.length.toLong) ++ body
  }

  /** One raw frame: gray level per (x, y) in IMAGE orientation (y = 0
    * is the top row), laid out in the container's row order. */
  private def dibFrame(w: Int, h: Int, bitCount: Int, topDown: Boolean)(
      lvl: (Int, Int) => Int): Array[Byte] = {
    val bypp = bitCount / 8
    val stride = ((w * bypp + 3) / 4) * 4
    val out = Array.fill[Byte](stride * h)(0)
    for (y <- 0 until h; x <- 0 until w) {
      val row = if (topDown) y else h - 1 - y
      val i = row * stride + x * bypp
      val l = lvl(x, y).toByte
      out(i) = l; out(i + 1) = l; out(i + 2) = l
    }
    out
  }

  test("uncompressed DIB AVI: true per-frame luminance from raw bitmaps") {
    implicit val s = spark
    import spark.implicits._
    val (w, h) = (20, 10) // stride = 60 at 24bpp — exercises padding
    // frame 0/1 solid; frame 2 a split — bright TOP half, dark BOTTOM
    // half in image orientation, so a row-order bug (reading the
    // bottom-up rows as top-down) flips the grid halves and fails
    val fs24 = Seq(
      dibFrame(w, h, 24, topDown = false)((_, _) => 40),
      dibFrame(w, h, 24, topDown = false)((_, _) => 220),
      dibFrame(w, h, 24, topDown = false)((_, y) => if (y < h / 2) 200 else 50))
    val assets = Seq(
      Multimodal.Asset(1L, "video/x-msvideo",
        dibAviBytes(w, h, 24, topDown = false, fs24), "t"),
      // 32bpp BGRX and a NEGATIVE biHeight (top-down rows) — both
      // must land on identical features for identical pixel content
      Multimodal.Asset(2L, "video/x-msvideo",
        dibAviBytes(w, h, 32, topDown = true,
          Seq(dibFrame(w, h, 32, topDown = true)((_, y) =>
            if (y < h / 2) 200 else 50))), "t")).toDS()
    val got = Multimodal.sampleFramesDecoded(assets, everyN = 1)
      .collect().groupBy(_.asset_id)
    val a1 = got(1L).sortBy(_.frame_index)
    assert(a1.map(_.frame_index).toSeq === Seq(0, 1, 2))
    Seq(40, 220).zip(a1).foreach { case (lvl, fr) =>
      assert(fr.features.length === 8)
      fr.features.foreach(f => assert(math.abs(f - lvl / 255f) < 1e-3f,
        s"frame ${fr.frame_index}: $f vs ${lvl / 255f}"))
    }
    // split frame: grid cells 0-3 are the top half, 4-7 the bottom
    val split = a1(2).features
    split.take(4).foreach(f => assert(math.abs(f - 200 / 255f) < 1e-3f, f))
    split.drop(4).foreach(f => assert(math.abs(f - 50 / 255f) < 1e-3f, f))
    // 32bpp top-down variant sees the same pixels
    assert(got(2L).head.features.toSeq === split.toSeq)
    // a truncated frame chunk is DATA: empty features, no exception
    val corrupt = dibAviBytes(w, h, 24, topDown = false,
      Seq(fs24.head, fs24.head.take(30)))
    val cf = Multimodal.sampleFramesDecoded(
        Seq(Multimodal.Asset(3L, "video/x-msvideo", corrupt, "t")).toDS(), 1)
      .collect().sortBy(_.frame_index)
    assert(cf(0).features.nonEmpty && cf(1).features.isEmpty)
    // everyN strides DIB frames like MJPEG ones
    val strided = Multimodal.sampleFramesDecoded(
      assets.filter(_.asset_id == 1L), everyN = 2).collect()
    assert(strided.map(_.frame_index).sorted.toSeq === Seq(0, 2))
  }

  test("non-MJPEG AVI routes to the derived fallback, never all-empty rows") {
    implicit val s = spark
    import spark.implicits._
    // an AVI whose 00dc chunks are NOT JPEGs (no FFD8 SOI — an Xvid-
    // style bitstream): per-asset codec dispatch must send it down the
    // same derived-feature path as MP4/MKV, not emit empty features
    // for every frame of exactly one container type
    val junkFrames = Seq.fill(3)(Array.fill[Byte](64)(0x42))
    val avi = aviBytes(48, 32, usPerFrame = 40000L, junkFrames)
    val assets = Seq(Multimodal.Asset(5L, "video/x-msvideo", avi, "t")).toDS()
    val got = Multimodal.sampleFramesDecoded(assets, everyN = 1)
      .collect().sortBy(_.frame_index)
    val derived = Multimodal.sampleFrames(
      Multimodal.decodeAssets(assets), 1)
      .collect().sortBy(_.frame_index)
    assert(got.map(_.features.toSeq).toSeq ===
      derived.map(_.features.toSeq).toSeq)
    assert(got.forall(_.features.nonEmpty))
  }

  test("sampleFrames emits every Nth declared frame; non-video emits frame 0 only") {
    implicit val s = spark
    import spark.implicits._
    val vids = Seq(5, 13, 1).zipWithIndex.map { case (n, i) =>
      Multimodal.Asset(i.toLong, "video/mp4",
        mp4Bytes(320, 240, 1000L, 1000L, frames = n), "t")
    }.toDS()
    val decoded = Multimodal.decodeAssets(vids)
    val byAsset = Multimodal.sampleFrames(decoded, everyN = 4)
      .collect().groupBy(_.asset_id)
    decoded.collect().foreach { d =>
      val expected = (0 until d.n_frames by 4).toSeq
      assert(byAsset(d.asset_id).map(_.frame_index).toSeq.sorted === expected)
    }
    // text mime ⇒ stub decode ⇒ n_frames = 1 ⇒ exactly one frame each
    val docs = Tables.load(spark, sf0001, "documents").limit(30)
    val texts = Multimodal.decodeAssets(
      Multimodal.assetsFromText(docs, "doc_id", "text"))
    val tf = Multimodal.sampleFrames(texts, everyN = 4)
    assert(tf.collect().forall(_.frame_index === 0))
    assert(tf.count() === 30)
  }
}
