package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("BMP codec round-trips dimensions through a real LE header") {
    val pixels = "hello multimodal world".getBytes("UTF-8")
    val bmp = Multimodal.BmpCodec.encode(17, 3, pixels)
    assert(bmp.length == 54 + pixels.length)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val (w, h, off) = Multimodal.BmpCodec.decode(bmp)
    assert(w == 17 && h == 3 && off == 54)
    // pixel data preserved after the header
    assert(bmp.slice(54, 54 + pixels.length).sameElements(pixels))
    // a non-BMP payload must fail loudly, not decode as zeros
    intercept[IllegalArgumentException] {
      Multimodal.BmpCodec.decode("not an image".getBytes("UTF-8"))
    }
  }

  test("WAV codec round-trips PCM fields through a real RIFF chunk walk") {
    val data = "pcm sample bytes".getBytes("UTF-8")
    val wav = Multimodal.WavCodec.encode(8000, 1, 8, data)
    assert(wav.length == 44 + data.length)
    val w = Multimodal.WavCodec.decode(wav)
    assert(w.channels == 1 && w.sampleRate == 8000)
    assert(w.dataOffset == 44 && w.dataLength == data.length)
    assert(wav.slice(44, 44 + data.length).sameElements(data))
    // the decoder walks chunks, not fixed offsets: splice a foreign
    // chunk between fmt and data and the same fields must fall out
    val fmtEnd = 12 + 8 + 16
    val foreign = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    foreign.put("fact".getBytes("US-ASCII")).putInt(4).putInt(0)
    val spliced = wav.take(fmtEnd) ++ foreign.array() ++ wav.drop(fmtEnd)
    // fix the RIFF size for the inserted 12 bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 36 + 12 + data.length)
    val w2 = Multimodal.WavCodec.decode(spliced)
    assert(w2.channels == 1 && w2.sampleRate == 8000)
    assert(w2.dataOffset == 44 + 12 && w2.dataLength == data.length)
    // a non-WAVE payload must fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode("RIFFnope not audio".getBytes("UTF-8"))
    }
  }

  test("documents -> mixed BMP/WAV assets -> features: per-kind dispatch") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a" * 130, "web", 130L),
      (2L, "", "web", 0L), // empty text → 1x1 BMP, header only
      (3L, "b" * 50, "web", 50L)) // doc_id % 3 == 0 → WAV
      .toDF("doc_id", "text", "source", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(docs))
      .collect().sortBy(_.asset_id)
    assert(feats(0).kind == "image/bmp")
    assert(feats(0).width == 1 + 130 % 64 && feats(0).height == 1 + 130 / 64)
    assert(feats(0).n_bytes == 54 + 130)
    assert(feats(1).width == 1 && feats(1).height == 1 && feats(1).n_bytes == 54)
    assert(feats(2).kind == "audio/wav")
    assert(feats(2).width == 1 && feats(2).height == 50) // (channels, samples)
    assert(feats(2).n_bytes == 44 + 50)
  }
}
