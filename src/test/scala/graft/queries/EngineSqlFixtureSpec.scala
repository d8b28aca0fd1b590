package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The engine-SQL fixture root's lifecycle: each (JVM, session) gets
  * its own root under the scratch dir, crash leftovers from dead JVMs
  * are reaped, and a sibling root with a LIVE heartbeat lock is never
  * touched — a hash-only path previously let a concurrent run
  * deleteRecursive a live root (lock included) out from under the
  * session using it. */
class EngineSqlFixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val scratch = Files.createTempDirectory("gsqlscratch").toString
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    sys.props("graft.sql.scratch") = scratch
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("engine-sql-fixture-spec")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.sql.scratch")
    spark.stop()
  }

  test("prebuild reaps stale orphans, spares live roots, builds its own") {
    // a dead JVM's leftover: no lock file, embedded pid provably dead
    // (way above pid_max, so ProcessHandle.of is empty)
    val orphan = Paths.get(scratch, "graft_sql_root_dead0_p999999999_s1")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("marker"), "stale")
    // a live sibling: engine.lock with a FRESH mtime (heartbeat analog)
    val live = Paths.get(scratch, "graft_sql_root_live0_p2_s2")
    Files.createDirectories(live)
    Files.writeString(live.resolve(graft.engine.Btrdb.LockFile), "other-jvm")
    // a lock-less root whose embedded pid is ALIVE (pid 1 always is):
    // the window between root creation and the engine's first lock
    // write, or a JVM paused past the heartbeat margin — deleting it
    // would be cross-process data loss keyed on wall clock, so the
    // reaper must demand a provably-dead pid too
    val paused = Paths.get(scratch, "graft_sql_root_wait0_p1_s3")
    Files.createDirectories(paused)
    Files.writeString(paused.resolve("marker"), "mid-create")

    EngineSqlQueries.prebuild(spark, sfDir)

    assert(!Files.exists(orphan),
      "lock-less orphan of a dead pid must be reaped")
    assert(Files.exists(live.resolve(graft.engine.Btrdb.LockFile)),
      "a root with a live heartbeat lock must never be touched")
    assert(Files.exists(paused.resolve("marker")),
      "a lock-less root whose pid is alive must be spared")
    val own = Files.list(Paths.get(scratch)).toArray.map(_.toString)
      .filter(p => p.contains("graft_sql_root_") && p.contains("_p") &&
        p.contains("_s") && !p.contains("_p999999999_") &&
        !p.endsWith("_p2_s2") && !p.endsWith("_p1_s3"))
    assert(own.nonEmpty, s"expected a per-(jvm,session) fixture root in $scratch")
    assert(own.head.contains(s"_p${ProcessHandle.current().pid()}_"),
      "root path must carry the owning JVM's pid")

    // the fixture is usable end-to-end: the pyramid-backed SQL query
    // runs and the substitution fires against the freshly built root
    val q = EngineSqlQueries.defs("q_sql_pyramid").build(spark, sfDir)
    assert(q.count() > 0)
  }
}
