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

  test("documents -> BMP assets -> features: real parse, empty doc safe") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "a" * 130, "web", 130L),
      (2L, "", "web", 0L)) // empty text → 1x1 BMP, header only
      .toDF("doc_id", "text", "source", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.assetsFromDocuments(docs))
      .collect().sortBy(_.asset_id)
    assert(feats(0).width == 1 + 130 % 64 && feats(0).height == 1 + 130 / 64)
    assert(feats(0).n_bytes == 54 + 130)
    assert(feats(1).width == 1 && feats(1).height == 1 && feats(1).n_bytes == 54)
  }
}
