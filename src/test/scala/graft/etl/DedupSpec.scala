package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("dedup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("connected components: chains, triangles, singletons-by-absence") {
    val ss = spark
    import ss.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    assert(Seq(20L, 21L).forall(got(_) == 20L))
  }

  test("docs shorter than the shingle length don't crash and become singletons") {
    val ss = spark
    import ss.implicits._
    // "ab" and "" are shorter than shingleLen=8: sequence() would throw
    // "Illegal sequence boundaries" without the length pre-filter
    val df = Seq((1L, "ab"), (2L, ""), (3L, "a longer document about spark"),
      (4L, "a longer document about spark")).toDF("id", "text")
    val verdict = Dedup.dedup(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(verdict.length == 4)
    assert(verdict(0) == ((1L, 1L, true)) && verdict(1) == ((2L, 2L, true)))
    assert(verdict(2)._2 == 3L && verdict(3)._2 == 3L) // identical docs cluster
  }

  test("degenerate-bucket cap bounds candidate pairs on boilerplate corpora") {
    val ss = spark
    import ss.implicits._
    // 50 identical docs → one bucket of 50 → 1225 pairs uncapped
    val boiler = (0L until 50L).map(i => (i, "the same boilerplate text everywhere"))
    val distinctDocs = Seq((100L, "a genuinely different document about query engines"),
      (101L, "a genuinely different document about query engine"))
    val df = (boiler ++ distinctDocs).toDF("id", "text")
    val uncapped = Dedup.candidatePairs(df).count()
    assert(uncapped >= 1225)
    val capped = Dedup.candidatePairs(df, maxBucket = Some(10))
    // boilerplate bucket dropped; the real near-dup pair survives
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 101L)))
    assert(capped.count() < 50)
  }

  test("end-to-end dedup: planted near-duplicates cluster to one canonical") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(4242L)
    val vocab = Seq("spark", "query", "window", "batch", "stream", "merge",
      "sort", "join", "filter", "vector", "table", "scan")
    def doc() = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 20).map(_ => doc())
    // docs 0..19 distinct; 100..119 = near-copies of 0..19 (one word edited)
    val rows =
      bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      bases.zipWithIndex.map { case (t, i) =>
        (100L + i, t.replaceFirst("spark", "sparkk")) }
    val df = rows.toDF("id", "text")
    val verdict = Dedup.dedup(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = verdict.map(v => v._1 -> v).toMap
    // each near-copy clusters with its base, base is canonical
    val paired = (0 until 20).count { i =>
      byId(100L + i)._2 == i.toLong && byId(i.toLong)._3 &&
        !byId(100L + i)._3
    }
    assert(paired >= 16, s"only $paired/20 near-copies clustered with their base")
    // distinct bases must NOT merge into one giant cluster
    val clusters = verdict.map(_._2).distinct.length
    assert(clusters >= 15, s"over-merging: only $clusters clusters")
  }
}
