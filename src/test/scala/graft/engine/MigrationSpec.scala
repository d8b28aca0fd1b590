package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[Federation.migrate]]: moving a live stream between two federation
  * roots with its version history intact, while the federated read
  * surface never counts the stream at both homes.
  */
class MigrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("migration-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def mkDb() = new Btrdb(spark,
    Files.createTempDirectory("migspec").toString,
    sBuckets = 4, tBucketPw = 12, bufferCommitThreshold = 1L,
    pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12, commitRangePw = 8)

  private def ins(db: Btrdb, uuid: String, pts: Seq[(Long, Double)]): Unit = {
    db.insert(uuid, spark.createDataFrame(pts).toDF("time", "value"))
    db.flush(uuid)
  }

  private def pinned(db: Btrdb, uuid: String, v: Long): Set[(Long, Double, Long)] =
    db.pointsAt(uuid, v).select("time", "value", "version").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

  private def fedCount(engines: Seq[(String, Btrdb)]): Long =
    Federation.pointsView(engines).count()

  test("a live stream moves roots with version history and no double count") {
    val from = mkDb(); val to = mkDb()
    val engines = Seq("w0" -> from, "w1" -> to)
    val uuid = "mig-u1"
    from.createStream(uuid, "mig/a", Map("site" -> "s1"),
      Map("owner" -> "team-a"))
    // four generations: three inserts and an interleaved delete
    ins(from, uuid, (0L until 64L).map(t => (t, t * 1.0)))
    ins(from, uuid, (64L until 128L).map(t => (t, t * 2.0)))
    from.deleteRange(uuid, 16L, 48L)
    ins(from, uuid, Seq((300L, 7.5), (301L, 8.5)))
    val srcMajor = from.version(uuid)._1
    assert(srcMajor == 4L)
    val srcByVersion = (1L to srcMajor).map(v => v -> pinned(from, uuid, v)).toMap
    val baseline = fedCount(engines)

    // phase 1 done by hand (migrate resumes): the stream exists at the
    // target under the marker with one generation replayed — federated
    // reads and the target's own view must NOT see it yet
    to.createStream(uuid, "mig/a", Map("site" -> "s1"),
      Map("owner" -> "team-a", Btrdb.MigratingInAnnotation -> "1"))
    to.replayInsert(uuid, 1L, from.generationRows(uuid, 1L, upTo = false))
    assert(fedCount(engines) == baseline,
      "a mid-migration stream must not inflate the federated view")
    assert(to.pointsView().filter(col("sid") === to.sidOf(uuid)).count() == 0,
      "the target's own view must hide a migrating-in stream")
    // the target's pyramid substitution frame must hide it too
    assert(to.pyramidPartialsFor(None, None, None, 8, needExactSum = false)
      .forall(_.filter(col("sid") === to.sidOf(uuid)).count() == 0))

    val report = Federation.migrate(uuid, from, to)
    assert(report.uuid == uuid && report.major == srcMajor)

    // source: tombstoned, hidden from its views
    assert(from.catalog.filter(col("uuid") === uuid && col("tombstoned"))
      .count() == 1)
    assert(from.pointsView().filter(col("sid") === report.fromSid).count() == 0)

    // target: live, marker cleared, metadata carried over
    val (desc, maj, minor) = to.streamInfo(uuid)
    assert(maj == srcMajor && minor == 0L)
    assert(desc.collection == "mig/a" && desc.tags == Map("site" -> "s1"))
    assert(desc.annotations == Map("owner" -> "team-a"))

    // every pinned version answers at the target exactly as it did at
    // the source (delete anti-filters included)
    (1L to srcMajor).foreach { v =>
      assert(pinned(to, uuid, v) == srcByVersion(v), s"version $v differs")
    }

    // the federated surface holds the same points as before the move,
    // now attributed to the new home
    assert(fedCount(engines) == baseline)
    val homes = Federation.pointsView(engines)
      .filter(col("time") >= 300L && col("time") < 302L)
      .select("engine").distinct().collect().map(_.getString(0)).toSeq
    assert(homes == Seq("w1"))
    from.close(); to.close()
  }

  test("a compacted history migrates with its collapsed floor intact") {
    val from = mkDb(); val to = mkDb()
    val uuid = "mig-u2"
    from.createStream(uuid, "mig/b", Map("site" -> "s2"))
    ins(from, uuid, (0L until 32L).map(t => (t, 1.0)))
    from.deleteRange(uuid, 0L, 8L)
    from.compact(uuid) // collapses versions 1-2 into one record at 2
    ins(from, uuid, Seq((100L, 5.0)))
    val srcMajor = from.version(uuid)._1
    assert(srcMajor == 3L)
    val srcAt = (1L to srcMajor).map(v => v -> pinned(from, uuid, v)).toMap
    assert(srcAt(1L).isEmpty, "pins below the compacted floor read empty")

    Federation.migrate(uuid, from, to)
    (1L to srcMajor).foreach { v =>
      assert(pinned(to, uuid, v) == srcAt(v), s"version $v differs")
    }
    assert(to.rawValues(uuid, 0L, 1000L).count() == 25L)
    from.close(); to.close()
  }

  test("migrate resumes idempotently after a cutover crash") {
    val from = mkDb(); val to = mkDb()
    val uuid = "mig-u3"
    from.createStream(uuid, "mig/c", Map("site" -> "s3"))
    ins(from, uuid, (0L until 16L).map(t => (t, 3.0)))

    // run the full protocol by hand up to the crash point: replay and
    // parity done, source tombstoned, marker still set at the target
    to.createStream(uuid, "mig/c", Map("site" -> "s3"),
      Map(Btrdb.MigratingInAnnotation -> "1"))
    to.replayInsert(uuid, 1L, from.generationRows(uuid, 1L, upTo = false))
    from.obliterate(uuid)

    val report = Federation.migrate(uuid, from, to)
    assert(report.major == 1L && report.npoints == 16L)
    val (desc, _, _) = to.streamInfo(uuid)
    assert(!desc.annotations.contains(Btrdb.MigratingInAnnotation))
    assert(to.pointsView().filter(col("sid") === desc.sid).count() == 16L)
    from.close(); to.close()
  }

  test("the source write fence rejects writes mid-migration and lifts on abort") {
    val from = mkDb(); val to = mkDb()
    val uuid = "mig-u4"
    from.createStream(uuid, "mig/d", Map("site" -> "s4"))
    ins(from, uuid, (0L until 8L).map(t => (t, 1.0)))

    // the fence itself: inserts and deletes are rejected while up
    from.beginMigrationOut(uuid)
    val eIns = intercept[IllegalArgumentException] {
      from.insert(uuid, spark.createDataFrame(Seq((100L, 9.0)))
        .toDF("time", "value"))
    }
    assert(eIns.getMessage.contains("migrating out"))
    val eDel = intercept[IllegalArgumentException] {
      from.deleteRange(uuid, 0L, 4L)
    }
    assert(eDel.getMessage.contains("migrating out"))
    from.endMigrationOut(uuid)

    // abort path: the target already holds a live NON-migrating stream
    // with the same uuid — migrate throws after raising the fence, and
    // the fence must lift so the source stays writable
    to.createStream(uuid, "mig/d", Map("site" -> "s4"))
    intercept[IllegalArgumentException] { Federation.migrate(uuid, from, to) }
    from.insert(uuid, spark.createDataFrame(Seq((100L, 9.0)))
      .toDF("time", "value"))
    from.flush(uuid)
    assert(from.rawValues(uuid, 0L, 1000L).count() == 9L)
    from.close(); to.close()
  }

  test("migrate repairs orphan rows from a crash inside a replayed commit") {
    val from = mkDb(); val to = mkDb()
    val uuid = "mig-u5"
    from.createStream(uuid, "mig/e", Map("site" -> "s5"))
    ins(from, uuid, (0L until 32L).map(t => (t, 2.0)))
    ins(from, uuid, (32L until 48L).map(t => (t, 4.0)))

    // crash simulation: generation 1 replays fully, then its commit
    // record (written after the point append) and pyramid fold
    // (written after the commit record) are removed — exactly the
    // state a crash between the points-parquet append and the
    // commit-file write leaves (rows at version 1, major still 0, no
    // rollup). Without repair, resume re-appends generation 1 and the
    // duplicated rows fail parity FOREVER.
    to.createStream(uuid, "mig/e", Map("site" -> "s5"),
      Map(Btrdb.MigratingInAnnotation -> "1"))
    to.replayInsert(uuid, 1L, from.generationRows(uuid, 1L, upTo = false))
    val toRoot = to.root
    to.close()
    val commitDir = java.nio.file.Paths.get(toRoot, "commits")
    val deleted = java.nio.file.Files.list(commitDir).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
    assert(deleted.nonEmpty)
    deleted.foreach(p => java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).toArray.foreach(c =>
          rmTree(c.asInstanceOf[java.nio.file.Path]))
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(toRoot, "pyramid"))

    val to2 = new Btrdb(spark, toRoot, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L, pyramidLevels = Seq(4, 8),
      pyramidWBucketPw = 12, commitRangePw = 8)
    assert(to2.version(uuid)._1 == 0L, "orphaned generation must be invisible")

    val report = Federation.migrate(uuid, from, to2)
    assert(report.major == 2L && report.npoints == 48L)
    assert(to2.rawValues(uuid, 0L, 1000L).count() == 48L)
    // no duplicated rows at version 1 after the repair+resume
    assert(to2.pointsAt(uuid, 1L).count() == 32L)
    from.close(); to2.close()
  }
}
