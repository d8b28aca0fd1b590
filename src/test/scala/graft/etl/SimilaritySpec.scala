package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("similarity-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("annTopK candidates are a subset scored identically to brute force") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = df.filter(org.apache.spark.sql.functions.col("vec_id") === 7)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val exact = Similarity.cosineTopK(df, query, 50).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annTopK(df, query, 10, hamming = 2).collect()
    assert(ann.nonEmpty)
    // every ANN hit that brute force also ranked must carry the same score
    ann.foreach { r =>
      exact.get(r.getLong(0)).foreach(c => assert(c == r.getDouble(1)))
    }
    // the query vector itself is in its own bucket → rank 1, cos ≈ 1
    assert(ann.head.getLong(0) == 7L && math.abs(ann.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("recall: hamming=2 probes recover most of the true top-10") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = df.filter(org.apache.spark.sql.functions.col("vec_id") === 3)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val exact = Similarity.cosineTopK(df, query, 10).collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(df, query, 10, hamming = 2).collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    info(f"recall@10 = $recall%.2f")
    assert(recall >= 0.3, s"recall $recall") // random unit vectors: LSH
    // recall is modest by nature; the contract is candidates≪corpus
  }
}
