package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Reader-vs-writer isolation on a live root: the advisory lock gates
  * only the commit-log/catalog WRITER — read-only sessions
  * (`lockRoot = false`) attach to a locked root freely and read
  * correct snapshots while the owner ingests, deletes, flushes and
  * compacts.
  *
  * The contract this pins:
  *   - a VERSION-PINNED read is exact and immutable no matter what the
  *     owner commits afterwards (new point files carry higher version
  *     numbers, which the pin's `version <=` filter excludes — no
  *     refresh needed);
  *   - a LATEST read from a foreign session is eventually consistent:
  *     it converges after `refreshCommits`/`refreshStaging` once the
  *     owner's operation completes (mid-flush there is a bounded skew
  *     window — readers wanting exactness pin a version, as the
  *     reference's pinned-generation readers do);
  *   - pins below a compaction floor read EMPTY, never delete-unaware
  *     rows (the documented time-travel-forfeited contract).
  */
class ReaderIsolationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("reader-isolation-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("read-only session reads correct snapshots while the owner writes") {
    val root = Files.createTempDirectory("readeriso").toString
    val owner = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L, pyramidLevels = Seq(4, 8),
      pyramidWBucketPw = 12, commitRangePw = 8)
    val uuid = "u-iso"
    owner.createStream(uuid, "iso/a", Map("k" -> "v"))
    owner.insert(uuid, spark.createDataFrame(
      (0L until 64L).map(t => (t, 1.0))).toDF("time", "value"))

    // a second WRITER fails fast; a READER attaches freely
    intercept[IllegalStateException] {
      new Btrdb(spark, root, sBuckets = 4, tBucketPw = 12,
        pyramidLevels = Seq(4, 8), pyramidWBucketPw = 12)
    }
    val reader = new Btrdb(spark, root, sBuckets = 4, tBucketPw = 12,
      bufferCommitThreshold = 1L, pyramidLevels = Seq(4, 8),
      pyramidWBucketPw = 12, commitRangePw = 8, lockRoot = false)
    assert(reader.rawValues(uuid, 0, 4096).count() == 64)
    assert(reader.version(uuid) == (1L, 0L))

    // owner keeps writing: read-during-ingest — the reader's PINNED
    // read of v1 is exact and immutable without any refresh
    owner.insert(uuid, spark.createDataFrame(
      (100L until 164L).map(t => (t, 2.0))).toDF("time", "value"))
    owner.deleteRange(uuid, 0L, 32L) // v3
    val pinned = reader.rawValues(uuid, 0, 4096, version = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(pinned == (0L until 64L),
      "pinned v1 must see exactly v1's points, ignoring the owner's later commits")
    // v2 rows exist in the shared point log but the pin excludes them
    assert(!pinned.contains(100L))

    // latest reads CONVERGE after a refresh: delete applied, v2 visible
    reader.refreshCommits(); reader.refreshStaging()
    val latest = reader.rawValues(uuid, 0, 4096).collect().map(_.getLong(0)).toSeq
    assert(latest == (32L until 64L) ++ (100L until 164L))
    assert(reader.version(uuid)._1 == 3L)

    // read-during-compact: pins survive until the floor moves; after
    // compaction the reader (refreshed) sees the identical latest
    // snapshot, and pins below the floor read empty rather than
    // resurrecting deleted rows
    owner.compact(uuid)
    reader.refreshCommits()
    assert(reader.rawValues(uuid, 0, 4096).collect()
      .map(_.getLong(0)).toSeq == latest,
      "compaction must not change the latest-visible snapshot")
    assert(reader.rawValues(uuid, 0, 4096, version = 1).count() == 0,
      "pins below the compaction floor read empty")

    // reader never wrote: the root's lock still belongs to the owner
    assert(owner.store.readString(Btrdb.LockFile).isDefined)
    reader.close() // no-op on the lock
    assert(owner.store.readString(Btrdb.LockFile).isDefined)
    owner.close()
  }
}
