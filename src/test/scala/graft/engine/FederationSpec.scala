package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Two single-writer engines on DISJOINT roots serving one federated
  * SQL view — the write-scale-out shape of SCALE.md "Multi-writer
  * federation". Placement is deterministic ([[Federation.ownerOf]]),
  * each root keeps its own advisory lock and version history, and the
  * federated view returns exactly the union of the members' merged
  * point surfaces.
  */
class FederationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("federation-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("two engines on disjoint roots serve one federated SQL view") {
    val mk = () => new Btrdb(spark,
      Files.createTempDirectory("fedspec").toString,
      sBuckets = 4, tBucketPw = 12, bufferCommitThreshold = 1L,
      pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12, commitRangePw = 8)
    val engines = Seq("w0" -> mk(), "w1" -> mk())

    // deterministic placement routes each stream to exactly one writer;
    // draw from a candidate pool until each writer owns three streams
    val byOwner = (0 until 100).map(i => s"fed-u$i")
      .groupBy(u => Federation.ownerOf(u, engines.size))
    val uuids = (byOwner(0).take(3) ++ byOwner(1).take(3)).toIndexedSeq
    val placed = uuids.groupBy(u => Federation.ownerOf(u, engines.size))
    assert(placed.keySet == Set(0, 1) && placed.values.forall(_.size == 3))
    placed.foreach { case (owner, us) =>
      us.foreach { u =>
        val db = engines(owner)._2
        db.createStream(u, s"fed/${engines(owner)._1}", Map("u" -> u))
        val base = u.last.toLong * 1000
        db.insert(u, spark.createDataFrame(
          (0L until 32L).map(t => (base + t, t * 1.0))).toDF("time", "value"))
        db.flush(u)
      }
    }

    // each root holds its own advisory lock — both writers live at once
    engines.foreach { case (_, e) => assert(e.store.exists(Btrdb.LockFile)) }

    Federation.registerViews(spark, "fed", engines)
    val total = spark.sql("SELECT count(*) AS n FROM fed_points").head().getLong(0)
    assert(total == 6 * 32, s"federated view must union both roots, got $total")
    // engine column separates the members; sids collide across roots by
    // design — (engine, sid) is the federated identity
    val perEngine = spark.sql(
      "SELECT engine, count(*) AS n FROM fed_points GROUP BY engine")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perEngine == placed.map { case (o, us) =>
      engines(o)._1 -> us.size * 32L })
    // the federated catalog resolves uuid -> (engine, sid)
    val cat = spark.sql(
      "SELECT engine, sid, uuid FROM fed_catalog ORDER BY uuid").collect()
    assert(cat.length == 6)
    assert(cat.map(_.getString(2)).toSeq == uuids.sorted)
    // a member-scoped query returns exactly that member's data
    val one = spark.sql(
      s"""SELECT count(*) AS n FROM fed_points
         |WHERE engine = 'w0'""".stripMargin).head().getLong(0)
    assert(one == placed(0).size * 32L)
    engines.foreach(_._2.close())
  }
}
