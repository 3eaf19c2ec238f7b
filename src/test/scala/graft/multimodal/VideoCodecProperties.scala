package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}

/** Fuzz the container probe: ARBITRARY bytes — including ones that
  * start with valid magic and then lie about sizes — must produce a
  * row (real metadata or the error row), never an exception. At
  * 100 TB, every malformed payload that could throw is a task-killer;
  * the probe's contract is total. */
object VideoCodecProperties extends Properties("videocodec") {

  private val rawBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)

  /** Random bytes behind a valid MP4 magic: the box walk sees
    * plausible headers with arbitrary (often lying) sizes. */
  private val mp4ish: Gen[Array[Byte]] = rawBytes.map { tail =>
    Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("ASCII") ++ tail
  }

  /** Random bytes behind the EBML magic: vint/size parsing over
    * garbage. */
  private val ebmlish: Gen[Array[Byte]] = rawBytes.map { tail =>
    Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte) ++ tail
  }

  private def totalDecode(payload: Array[Byte]): Boolean = {
    val d = Multimodal.VideoCodec.decode(
      Multimodal.Asset(1L, "video/mp4", payload, "t"))
    // either real metadata (positive dims) or the canonical error row
    (d.width > 0 && d.height > 0) ||
      (d.width == -1 && d.height == -1 && d.n_frames == 0 &&
        d.features.isEmpty)
  }

  property("raw bytes never throw") = Prop.forAll(rawBytes)(totalDecode)
  property("mp4-magic garbage never throws") = Prop.forAll(mp4ish)(totalDecode)
  property("ebml-magic garbage never throws") = Prop.forAll(ebmlish)(totalDecode)
}
