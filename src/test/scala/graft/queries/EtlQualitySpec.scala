package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed examples for the repetition-based quality filters —
  * the DuckDB oracle proves Spark/SQL agreement at corpus scale; this
  * pins the METRIC DEFINITIONS to worked examples a reviewer can check
  * by hand. */
class EtlQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("etl-quality-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("q_quality_repetition: hand-computed Gopher-style metrics") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("repdocs").toString
    // doc 1: words a,a,a,a,b → 2 distinct of 5, top word a×4,
    //        bigrams (a a)×3 (a b)×1 → top bigram 3 of 4
    // doc 2: 10 distinct words → no repetition at all
    // doc 3: byte-identical to doc 1 → must inherit its metrics via the
    //        distinct-content factoring, not recompute
    // doc 4: five distinct words — every metric sits EXACTLY at a
    //        threshold (top_w*5 == n, top_bg*4 == n-1); the rules are
    //        strictly-exceeds, so it must keep
    Seq((1L, "a a a a b"), (2L, "x y z w v u t s q r"), (3L, "a a a a b"),
        (4L, "p q r s t"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_quality_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L).getLong(1) == 5L)
    assert(got(1L).getDouble(2) == 0.6) // dup_word_frac = 3/5
    assert(got(1L).getDouble(3) == 0.8) // top_word_frac = 4/5
    assert(got(1L).getDouble(4) == 0.75) // top_bigram_frac = 3/4
    assert(got(1L).getString(5) == "drop")
    assert(got(2L).getLong(1) == 10L)
    assert(got(2L).getDouble(2) == 0.0)
    assert(got(2L).getDouble(3) == 0.1)
    assert(got(2L).getDouble(4) == 1.0 / 9.0)
    assert(got(2L).getString(5) == "keep")
    assert(got(3L).getDouble(3) == 0.8 && got(3L).getString(5) == "drop")
    assert(got(4L).getDouble(3) == 0.2 && got(4L).getString(5) == "keep")
  }
}
