package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: the distinct-content-factored operators
  * (multiplicity-weighted statistics) must equal a brute-force direct
  * computation on duplicate-heavy random corpora. The DuckDB oracle
  * proves this at the fixed sf corpora; this property run re-proves
  * the weighting algebra (N = Σ nm, df = Σ nm[tf>0], tf = Σ m·c,
  * cnt = Σ nm·c, span n_docs = Σ nm) on corpora with adversarial
  * duplication the fixtures don't exercise. Seed is fixed and logged —
  * failures reproduce. */
class FactoredEquivalenceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val seed = 20260814L

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("factored-equivalence-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  /** Random corpus with heavy duplication: ~1/3 of docs are copies of
    * earlier docs (fresh doc_id, possibly different source). */
  private def randomCorpus(rnd: scala.util.Random, nDocs: Int): Seq[(Long, String, String)] = {
    val vocab = Vector("dup", "vector", "query", "the", "a", "table", "scan",
      "merge", "row", "batch", "spark", "filter")
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
    for (id <- 0 until nDocs) {
      val src = s"src${rnd.nextInt(4)}"
      if (id > 0 && rnd.nextInt(3) == 0) {
        val copyOf = out(rnd.nextInt(out.size))
        out += ((id.toLong, copyOf._2, src))
      } else {
        val n = 1 + rnd.nextInt(80)
        val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        out += ((id.toLong, text, src))
      }
    }
    out.toSeq
  }

  private def writeCorpus(rows: Seq[(Long, String, String)]): String = {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eqdocs").toString
    rows.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(t: String): Seq[String] = t.split(" ").filter(_.nonEmpty).toSeq

  test("winnow banding from the selection store equals the from-text scan") {
    import org.apache.spark.sql.functions.col
    // the winnow-match store's banding is a content-key LOOKUP against
    // the persisted selection store; it must equal re-winnowing the
    // text — including docs too short to fill a window (no selections,
    // no bands, either path)
    val rnd = new scala.util.Random(seed)
    val corpus = randomCorpus(rnd, 60)
    val dir = writeCorpus(corpus)
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val fromText = rows(EtlQueries.winnowBandsOf(src))
    val fromStore = rows(EtlQueries.winnowStoreBandsOf(spark, dir)(src))
    assert(fromText.nonEmpty, "corpus must produce winnow fingerprints")
    assert(fromStore === fromText, s"seed $seed")
  }

  test("vocab coverage counts equal brute force under heavy duplication") {
    val rnd = new scala.util.Random(seed)
    for (round <- 1 to 3) {
      val corpus = randomCorpus(rnd, 60)
      val dir = writeCorpus(corpus)
      val expected = corpus.flatMap(d => words(d._2))
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val got = graft.SparkEntry.queries("q_vocab_coverage")(spark, dir)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      got.foreach { case (w, cnt) =>
        assert(expected(w) == cnt, s"round $round seed $seed word $w") }
    }
  }

  test("substring-dup report equals brute force under heavy duplication") {
    val rnd = new scala.util.Random(seed + 1)
    for (round <- 1 to 3) {
      // longer docs so 32-token windows exist
      val corpus = randomCorpus(rnd, 40).map { case (id, t, s) =>
        (id, (t + " " + t + " " + t).trim, s) }
      val dir = writeCorpus(corpus)
      val expected = corpus
        .flatMap { case (id, t, _) =>
          val w = words(t)
          (0 to w.length - 32).map(i => (w.slice(i, i + 32).mkString(" "), id)) }
        .groupBy(_._1)
        .map { case (span, occ) =>
          span -> (occ.map(_._2).distinct.size.toLong, occ.size.toLong,
            occ.map(_._2).min) }
        .filter(_._2._1 >= 2)
      val got = graft.SparkEntry.queries("q_substring_dup")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String) =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got.size == expected.size,
        s"round $round seed $seed: ${got.size} vs ${expected.size}")
      expected.foreach { case (span, v) =>
        assert(got(h(span)) == v, s"round $round seed $seed span '$span'") }
    }
  }

  test("tf-idf per-source tf equals brute force under cross-source duplication") {
    val rnd = new scala.util.Random(seed + 2)
    for (round <- 1 to 3) {
      val corpus = randomCorpus(rnd, 60)
      val dir = writeCorpus(corpus)
      val tfExpected = corpus
        .flatMap { case (_, t, s) => words(t).map(w => (s, w)) }
        .groupBy(identity).map { case (k, o) => k -> o.size.toLong }
      val dfExpected = tfExpected.keys.groupBy(_._2).map { case (w, ks) =>
        w -> ks.size.toLong }
      val got = graft.SparkEntry.queries("q_tfidf_source")(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      got.foreach { case ((src, w), (tf, df)) =>
        assert(tfExpected((src, w)) == tf, s"round $round seed $seed tf $src/$w")
        assert(dfExpected(w) == df, s"round $round seed $seed df $w")
      }
    }
  }

  test("BM25 scores equal the direct per-doc formula under duplication") {
    val rnd = new scala.util.Random(seed + 3)
    for (round <- 1 to 3) {
      val corpus = randomCorpus(rnd, 50)
      val dir = writeCorpus(corpus)
      val terms = Seq("dup", "vector", "query")
      def tf(t: String, term: String): Long = {
        val padded = " " + t + " "
        val pat = " " + term + " "
        ((padded.length - padded.replace(pat, "").length) / pat.length).toLong
      }
      def dl(t: String): Long = t.count(_ == ' ').toLong + 1
      val n = corpus.size.toDouble
      val avgdl = corpus.map(d => dl(d._2)).sum.toDouble / corpus.size
      val dfs = terms.map(term => corpus.count(d => tf(d._2, term) > 0).toDouble)
      val expected = corpus.flatMap { case (id, t, _) =>
        val tfs = terms.map(term => tf(t, term))
        if (tfs.sum == 0) None
        else {
          // the EXACT operation order of the query's formula
          val score = tfs.zip(dfs).map { case (tfi, dfi) =>
            (n - dfi + 0.5) / (dfi + 0.5) * (tfi * 2.2) /
              (tfi + 1.2 * (0.25 + 0.75 * dl(t) / avgdl))
          }.reduce(_ + _)
          Some(id -> score)
        }
      }.toMap
      val got = graft.SparkEntry.queries("q_bm25")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getDouble(2))
      got.foreach { case (id, score) =>
        assert(expected(id) == score,
          s"round $round seed $seed doc $id: ${expected(id)} vs $score (bit-exact)") }
      // and the emitted rows are the true top-k of the expected map
      val topExpected = expected.toSeq
        .sortBy { case (id, sc) => (-sc, id) }.take(15).map(_._1)
      assert(got.map(_._1).toSeq == topExpected, s"round $round seed $seed ranking")
    }
  }
}
