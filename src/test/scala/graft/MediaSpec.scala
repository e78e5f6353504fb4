package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media
import graft.multimodal.Media.{MediaFile, StubCodec}

/** Exercises the multimodal plumbing end to end: binary columns through
  * mapPartitions feature extraction and frame sampling. The codec is a
  * deterministic stub (see Media.StubCodec); everything around it —
  * schema, batching, outputs — is asserted for real.
  */
class MediaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  val files = Seq(
    MediaFile(1L, "image/fake", Array.tabulate(300)(i => (i % 251).toByte), 1920, 1080, 0),
    MediaFile(2L, "image/fake", "hello world".getBytes("UTF-8"), 100, 400, 0),
    MediaFile(3L, "audio/fake", Array.fill(1024)(7.toByte), 0, 0, 44100),
    MediaFile(4L, "video/fake", Array.tabulate(1000)(_.toByte), 640, 480, 0))

  test("feature extraction: checksum, histogram, thumbnail dims") {
    val out = Media.extractFeatures(files.toDS()).collect()
      .map(f => f.media_id -> f).toMap
    assert(out.size == 4)
    assert(out(1L).n_bytes == 300)
    assert(out(1L).histogram.sum == 300)      // every byte lands in a bucket
    assert(out(1L).thumb_w == 64 && out(1L).thumb_h == 36)  // 16:9 bound
    assert(out(2L).thumb_w == 16 && out(2L).thumb_h == 64)  // portrait
    assert(out(2L).checksum ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out(3L).histogram(0) == 1024)      // all 0x07 → bucket 0
  }

  test("frame sampling: every Nth fixed-size chunk") {
    val frames = Media.sampleFrames(files.filter(_.media_id == 4L).toDS(),
      frameSize = 100, everyN = 2).collect()
    assert(frames.length == 5)                // 10 chunks, every 2nd
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3, 4))
    assert(frames.forall(_.getInt(2) == 100))
  }

  test("stub codec boundary cases") {
    assert(StubCodec.thumbDims(0, 0) == (0, 0))
    assert(StubCodec.thumbDims(64, 64) == (64, 64))
    assert(StubCodec.sampleFrames(Array[Byte](), 10, 2).isEmpty)
  }
}
