package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedPointDot

/** Adversarial checks of the deterministic spherical k-means
  * ([[KMeans]]) and the queries built on it (q_semdedup, q_ann_kmivf):
  * the quantization contract, NaN-greatest assignment semantics, and a
  * full independent Scala re-derivation of assignment and the SemDeDup
  * keep rule from raw data. */
class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("kmeans-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def emb: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** The model: exact integer-grid arithmetic mirroring the engine. */
  private def scaleVec(v: Array[Float]): Array[Long] =
    v.map(FixedPointDot.scale)
  private def modelCos(a: Array[Long], b: Array[Long]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = a.map(x => x * x).sum
    val nb = b.map(x => x * x).sum
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  private def collectEmb(): Map[Long, Array[Float]] =
    emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap

  test("quantizedCentroids: grid means of a hand-built assignment") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (0L, Array(0.5f, -0.25f)),
      (0L, Array(0.25f, 0.25f)),
      (3L, Array(-1.0f, 0.0000015f))
    ).toDF("cluster", "embedding")
    val cents = KMeans.quantizedCentroids(df).map(c => c.id -> c).toMap
    assert(cents.keySet == Set(0L, 3L))
    // cluster 0: mean of (500000, 250000) = 375000; (-250000, 250000) = 0
    assert(scaleVec(cents(0L).coords).toSeq == Seq(375000L, 0L))
    // cluster 3: single member; 0.0000015f scales to round(1.5)=2
    assert(scaleVec(cents(3L).coords).toSeq == Seq(-1000000L, 2L))
    assert(cents(3L).normSq == 1000000L * 1000000L + 4L)
  }

  test("assign: nearest centroid by exact cosine; exact ties take the smallest id") {
    val sp = spark; import sp.implicits._
    val cents = Seq(
      KMeans.Centroid(2L, Array(1f, 0f), 1000000L * 1000000L),
      KMeans.Centroid(5L, Array(0f, 1f), 1000000L * 1000000L))
    val df = Seq(
      (1L, Array(0.9f, 0.1f)),   // → 2
      (2L, Array(-0.1f, 0.8f)),  // → 5
      (3L, Array(0.5f, 0.5f))    // exactly equidistant → smallest id = 2
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        KMeans.assign(col("embedding"), cents).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 5L, 3L -> 2L))
  }

  test("assignL2: nearest centroid by exact squared-L2; ties take the " +
       "smallest id; zero sub-vectors assign without any NaN case") {
    val sp = spark; import sp.implicits._
    val cents = Seq(
      KMeans.Centroid(0L, Array(1f, 0f), 1000000L * 1000000L),
      KMeans.Centroid(1L, Array(-1f, 0f), 1000000L * 1000000L),
      KMeans.Centroid(2L, Array(0f, 0f), 0L))
    val df = Seq(
      (1L, Array(0.9f, 0.1f)),   // → 0 (closest by L2)
      (2L, Array(-0.4f, 0f)),    // → 2: |x−c2|²=0.16 < |x−c1|²=0.36
      (3L, Array(-0.5f, 3f)),    // exactly equidistant from c1 and c2
                                 // (and farther from c0) → smaller id 1
      (4L, Array(0f, 0f))        // the cosine-undefined case: → 2 exactly
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        KMeans.assignL2(col("embedding"), cents).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("PQ coding matches a brute-force L2 model per sub-space, and the " +
       "ADC score is exact for codebook-reconstructed vectors") {
    val vecs = collectEmb()
    val (pqM, pqSub, pqK) = (8, 8, 16)
    // train per sub-space exactly as q_ann_pq's store does
    val books = (0 until pqM).map { sIdx =>
      val sub = emb.select(col("vec_id"),
        slice(col("embedding"), sIdx * pqSub + 1, pqSub).as("embedding"))
      val c0 = KMeans.quantizedCentroids(
        sub.withColumn("cluster", col("vec_id") % pqK))
      val c1 = KMeans.quantizedCentroids(
        sub.withColumn("cluster",
          KMeans.assignL2(col("embedding"), c0)))
      val codes = sub.select(col("vec_id"),
          KMeans.assignL2(col("embedding"), c1).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (c1, codes)
    }
    // every sub-code = the model's argmin of |c|² − 2x·c (score ASC, id ASC)
    books.zipWithIndex.foreach { case ((cents, codes), sIdx) =>
      val scaled = cents.map(c => c.id -> (scaleVec(c.coords), c.normSq))
      vecs.foreach { case (vid, v) =>
        val sv = scaleVec(v.slice(sIdx * pqSub, sIdx * pqSub + pqSub))
        val best = scaled.map { case (cid, (cs, cn)) =>
          (cn - 2 * sv.zip(cs).map { case (x, y) => x * y }.sum, cid)
        }.min._2
        assert(codes(vid) == best, s"vec $vid sub $sIdx")
      }
    }
    // ADC identity: for a query built by CONCATENATING one codeword per
    // sub-space, the ADC score of any vector COINCIDES with the exact
    // fixed-point cosine between the query and that vector's
    // reconstruction — ADC loses only the quantization residual, never
    // the arithmetic
    val q = books.map(_._1.head.coords).reduce(_ ++ _)
    val qs = scaleVec(q)
    val qnn = qs.map(x => x * x).sum
    vecs.keys.take(5).foreach { vid =>
      val rec = books.zipWithIndex.flatMap { case ((cents, codes), sIdx) =>
        cents.find(_.id == codes(vid)).get.coords
      }.toArray
      val adot = books.zipWithIndex.map { case ((cents, codes), sIdx) =>
        val c = cents.find(_.id == codes(vid)).get
        val sub = qs.slice(sIdx * pqSub, sIdx * pqSub + pqSub)
        sub.zip(scaleVec(c.coords)).map { case (x, y) => x * y }.sum
      }.sum
      val cns = books.map { case (cents, codes) =>
        cents.find(_.id == codes(vid)).get.normSq }.sum
      val adc = adot.toDouble /
        (math.sqrt(cns.toDouble) * math.sqrt(qnn.toDouble))
      assert(adc == modelCos(qs, scaleVec(rec)), s"vec $vid")
    }
  }

  test("assign matches a brute-force exact-arithmetic model on the fixture") {
    val vecs = collectEmb()
    // train exactly as the queries do: two Lloyd passes from vec_id % 8
    val e = emb.select(col("vec_id"), col("embedding"))
    val c0 = KMeans.quantizedCentroids(
      e.withColumn("cluster", col("vec_id") % 8))
    val c1 = KMeans.quantizedCentroids(
      e.withColumn("cluster", KMeans.assign(col("embedding"), c0)))
    val assigned = e.select(col("vec_id"),
        KMeans.assign(col("embedding"), c1).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned.size == vecs.size)
    val centScaled = c1.map(c => c.id -> scaleVec(c.coords))
    assigned.foreach { case (vid, cl) =>
      val sv = scaleVec(vecs(vid))
      // model argmax: cos DESC (NaN greatest), id ASC
      val best = centScaled.map { case (cid, cs) => (modelCos(sv, cs), cid) }
        .minBy { case (cos, cid) =>
          (if (cos.isNaN) Double.NegativeInfinity else -cos, cid)
        }._2
      assert(cl == best, s"vec $vid: engine=$cl model=$best")
    }
  }

  test("q_semdedup keep rule re-derived independently from raw data") {
    val out = graft.SparkEntry.queries("q_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val vecs = collectEmb()
    assert(out.length == vecs.size)
    val cluster = out.map(t => t._1 -> t._2).toMap
    out.foreach { case (vid, cl, kept) =>
      val sv = scaleVec(vecs(vid))
      val hasEarlierDup = vecs.keys.exists { other =>
        other < vid && cluster(other) == cl && {
          val cos = modelCos(scaleVec(vecs(other)), sv)
          !cos.isNaN && cos >= 0.3
        }
      }
      assert(kept == !hasEarlierDup, s"vec $vid kept=$kept")
    }
    // non-degenerate on the fixture: something kept AND something dropped
    assert(out.exists(_._3) && out.exists(!_._3))
  }

  test("q_semdedup factored algebra ≡ direct rule on a random DUPLICATE-heavy corpus") {
    // the driver fixtures contain no bit-identical embeddings, so the
    // factored form's in-group branch (selfdup ∧ id > rid) never fires
    // there — this corpus makes every factoring branch carry weight
    val sp = spark; import sp.implicits._
    val seed = System.nanoTime()
    info(s"seed=$seed")
    val rnd = new scala.util.Random(seed)
    val distinct = Array.fill(40)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    // duplicate multiplicities 1..4, shuffled ids so rids are non-trivial
    val rows = rnd.shuffle(distinct.toSeq.flatMap(v =>
      Seq.fill(1 + rnd.nextInt(4))(v))).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val dir = java.nio.file.Files.createTempDirectory("semdedup-prop").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    assert(rows.length > distinct.length, "corpus must contain duplicates")

    val out = graft.SparkEntry.queries("q_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == rows.length)
    val vecs = rows.toMap
    val cluster = out.map(t => t._1 -> t._2).toMap
    // identical embeddings must co-cluster (assignment is a pure
    // function of the vector)
    rows.groupBy(_._2.toSeq).values.foreach { g =>
      assert(g.map(r => cluster(r._1)).toSet.size == 1)
    }
    var inGroupDrops = 0
    out.foreach { case (vid, cl, kept) =>
      val sv = scaleVec(vecs(vid))
      val dups = rows.filter { case (u, uv) =>
        u < vid && cluster(u) == cl && {
          val cos = modelCos(scaleVec(uv), sv)
          !cos.isNaN && cos >= 0.3
        }
      }
      assert(kept == dups.isEmpty, s"vec $vid kept=$kept (seed=$seed)")
      if (dups.exists(_._2.toSeq == vecs(vid).toSeq)) inGroupDrops += 1
    }
    assert(inGroupDrops > 0, "duplicate groups must exercise the selfdup branch")
  }

  test("q_ann_kmivf: candidates only from probed clusters, scored like brute force") {
    val out = graft.SparkEntry.queries("q_ann_kmivf")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.nonEmpty && out.length <= 10)
    assert(out.map(_._2).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
    val vecs = collectEmb()
    val q = scaleVec(vecs(0L))
    out.foreach { case (vid, cos) =>
      assert(vid != 0L)
      assert(cos == modelCos(scaleVec(vecs(vid)), q),
        s"vec $vid rerank must equal the exact cosine")
    }
    // IVF is a subset ranking: every returned score is a true cosine,
    // and the probe bound keeps candidates ≪ corpus (recall traded)
    val semdedup = graft.SparkEntry.queries("q_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = out.map { case (vid, _) => semdedup(vid) }.toSet
    assert(probed.size <= 2, s"results span ${probed.size} clusters > probes")
  }

  test("q_ann_ivfpq: the three-tier funnel — probed clusters only, ADC " +
       "scores from codes, exact rerank equals brute force") {
    val out = graft.SparkEntry.queries("q_ann_ivfpq")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty && out.length <= 10)
    // final ordering is by the EXACT rerank score, not the ADC one
    assert(out.map(_._3).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
    val vecs = collectEmb()
    val q = scaleVec(vecs(0L))
    out.foreach { case (vid, _, cos) =>
      assert(vid != 0L)
      assert(cos == modelCos(scaleVec(vecs(vid)), q),
        s"vec $vid rerank must equal the exact cosine")
    }
    // candidates stay inside the probed coarse cells
    val clusters = graft.SparkEntry.queries("q_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map { case (vid, _, _) => clusters(vid) }.toSet.size <= 2)
    // every approx score is the ADC value of the vector's own codes:
    // retrain the sub-codebooks exactly as the store does and recompute
    val (pqM, pqSub, pqK) = (8, 8, 16)
    val books = (0 until pqM).map { sIdx =>
      val sub = emb.select(col("vec_id"),
        slice(col("embedding"), sIdx * pqSub + 1, pqSub).as("embedding"))
      val c0 = KMeans.quantizedCentroids(
        sub.withColumn("cluster", col("vec_id") % pqK))
      val c1 = KMeans.quantizedCentroids(
        sub.withColumn("cluster", KMeans.assignL2(col("embedding"), c0)))
      val codes = sub.select(col("vec_id"),
          KMeans.assignL2(col("embedding"), c1).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (c1, codes)
    }
    val qnn = q.map(x => x * x).sum
    out.foreach { case (vid, approx, _) =>
      val adot = books.zipWithIndex.map { case ((cents, codes), sIdx) =>
        val c = cents.find(_.id == codes(vid)).get
        q.slice(sIdx * pqSub, sIdx * pqSub + pqSub)
          .zip(scaleVec(c.coords)).map { case (x, y) => x * y }.sum
      }.sum
      val cns = books.map { case (cents, codes) =>
        cents.find(_.id == codes(vid)).get.normSq }.sum
      assert(approx == adot.toDouble /
        (math.sqrt(cns.toDouble) * math.sqrt(qnn.toDouble)),
        s"vec $vid ADC score mismatch")
    }
  }
}
