package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd fixed-point dot product must agree bit-for-bit
  * with the built-in HOF formulation it replaces (the oracle-compatible
  * `round(x*1e6)::long` arithmetic), on real embeddings and on crafted
  * negative-half values where rounding modes diverge.
  */
class FixedPointOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("fixed-point-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private val hofDot =
    "aggregate(zip_with(transform(a, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)), " +
      "transform(b, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)), " +
      "(p, q) -> p * q), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  test("matches the HOF round/multiply/sum formulation on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = df.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(df.filter(col("vec_id") === 0)
        .select(col("embedding").as("b"))))
    val diff = pairs.select(
        FixedPointOps.fixedPointDot(col("a"), col("b")).as("native"),
        expr(hofDot).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0)
  }

  test("rounding agrees with SQL ROUND on a random negative/positive sweep") {
    // exact ±0.5 is unreachable through float→double·1e6 (0.5/1e6 needs
    // 5^-6 in the mantissa), so agreement across a dense random sweep —
    // including near-half values — is the full requirement.
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(99L)
    val vals = Array.fill(2000)((rnd.nextFloat() - 0.5f) * 2f)
    val df = Seq((vals, Array.fill(2000)(1.0f))).toDF("a", "b")
    val native = df.select(FixedPointOps.fixedPointDot(col("a"), col("b")))
      .head().getLong(0)
    val hof = df.select(expr(hofDot)).head().getLong(0)
    assert(native == hof)
    val model = vals.map(x => FixedPointDot.scale(x) * 1000000L).sum
    assert(native == model)
  }

  test("participates in whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(FixedPointOps.fixedPointNormSq(col("embedding")).as("n"))
    val p = df.queryExecution.executedPlan.toString()
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(p.contains("*(1) Project [fixed_point_dot"), s"plan:\n$p")
    assert(df.agg(sum("n")).head().getLong(0) > 0)
  }

  test("SQL registration") {
    FixedPointOps.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_fp")
    val r = spark.sql(
      "SELECT fixed_point_dot(embedding, embedding) AS d FROM emb_fp LIMIT 1")
      .head().getLong(0)
    assert(r > 0)
  }
}
