package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Media, MediaRecord}

/** MJPEG-in-AVI: container round-trip, truncation robustness, palette
  * dHash distinctness after lossy JPEG (the property the q170 oracle's
  * arithmetic prediction rests on), and the clipped-copy subset law.
  */
class VideoSpec extends AnyFunSuite with SparkSpec {

  private def frames3: Seq[Array[Byte]] =
    Seq(0, 17, 42).map(k => Media.jpegBytes(Media.paletteFrame(k)))

  test("aviBytes -> aviFrames round-trip returns the exact frame bytes") {
    val fs = frames3
    val avi = Media.aviBytes(fs, 88, 48)
    val back = Media.aviFrames(avi)
    assert(back.size == 3)
    back.zip(fs).foreach { case (b, f) => assert(b.sameElements(f)) }
    // every frame decodes, with the source dimensions
    back.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 88 && img.getHeight == 48)
    }
  }

  test("byte truncation yields exactly the complete-chunk prefix; garbage yields nothing") {
    val fs = frames3
    val avi = Media.aviBytes(fs, 88, 48)
    // walking every cut length must never throw and must yield 0..3 frames,
    // monotone in the cut position
    var prev = 0
    (0 to avi.length by 97).foreach { cut =>
      val got = Media.aviFrames(avi.take(cut)).size
      assert(got >= prev && got <= 3, s"cut=$cut got=$got prev=$prev")
      prev = got
    }
    assert(Media.aviFrames(avi).size == 3)
    assert(Media.aviFrames("not a riff at all".getBytes("UTF-8")).isEmpty)
    assert(Media.aviFrames(Array.empty[Byte]).isEmpty)
  }

  test("all 64 palette frames keep distinct real-pixel dHashes after JPEG round-trip") {
    val hashes = (0 until Media.VideoPalette).map { k =>
      val jpeg = Media.jpegBytes(Media.paletteFrame(k))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      Media.dhashOf(img)
    }
    assert(hashes.distinct.size == Media.VideoPalette,
      s"palette dHash collision: ${hashes.groupBy(identity).filter(_._2.size > 1).keys}")
    // and the decoded hash equals the pre-encode hash: lossy JPEG must not
    // move any gradient on the uniform-cell palette
    (0 until Media.VideoPalette).foreach { k =>
      assert(hashes(k) == Media.dhashOf(Media.paletteFrame(k)),
        s"palette $k: JPEG round-trip changed the dHash")
    }
  }

  test("decodeVideoFrames: clipped copy's frame set is a strict prefix subset of the original") {
    import spark.implicits._
    val media = Media.syntheticMjpegAvi(
      Seq((1L, 5, 6), (2L, 5, 3)).toDF("id", "s", "n"),
      col("id"), col("s"), col("n"))
      .select(col("media_id"), lit("video/avi").as("declared_mime"), col("payload"))
      .as[MediaRecord]
    val rows = Media.decodeVideoFrames(media)
      .select(col("media_id"), col("dhash")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val full = rows.filter(_._1 == 1L).map(_._2).toSet
    val clip = rows.filter(_._1 == 2L).map(_._2).toSet
    assert(full.size == 6 && clip.size == 3, s"got ${full.size}/${clip.size}")
    assert(clip.subsetOf(full), "clipped frames must all appear in the original")
    val pairs = Media.frameOverlapPairs(
      Media.decodeVideoFrames(media)
        .select(col("media_id"), col("dhash").as("frame_hash")),
      minShared = 2, minContainment = 0.5)
      .select(col("id_a"), col("id_b"), col("containment")).collect()
    assert(pairs.length == 1 && pairs.head.getDouble(2) == 1.0,
      "the clipped re-upload must pair with its original at containment 1.0")
  }
}
