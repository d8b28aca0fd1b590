package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Horizontal WRITE scale-out: N single-writer engine roots serving one
  * federated read surface.
  *
  * The reference spreads its write path across nodes by murmur3-MASH
  * stream placement (/root/reference/internal/configprovider/
  * cluster_leader.go:15-37, clustering.go:65-96): every node owns a
  * hash range and accepts writes only for streams in it. This engine
  * keeps the reference's per-root single-writer contract (advisory
  * lock, commit log, catalog) and federates ABOVE it, the same shape:
  *
  *   - each writer owns one root and the DISJOINT set of streams that
  *     [[ownerOf]] places there — no commit-log or catalog contention,
  *     no cross-writer coordination, each root's lock/versioning story
  *     unchanged;
  *   - readers union the members' merged point views into one SQL
  *     surface ([[registerViews]]). Each member contributes its own
  *     partition-pruned scan; the union adds no shuffle (unions are
  *     free in Spark — the scans just schedule side by side), so read
  *     cost is identical to querying the roots separately;
  *   - stream identity across the federation is (engine, sid) — or the
  *     uuid, which [[ownerOf]] makes globally unique-per-root. The
  *     views carry an `engine` column for exactly that reason.
  *
  * See SCALE.md "Multi-writer federation" for the 100 TB sizing note.
  */
object Federation {

  /** Write placement: which of `n` writers owns `uuid` — deterministic
    * murmur3 hash placement, the analog of the reference's MASH ring.
    * Every client computes the same owner with no coordination; `n`
    * changes are a resharding event (as they are in the reference). */
  def ownerOf(uuid: String, n: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(uuid), n)

  /** The federated latest-version point surface: every member's merged
    * point view ([[Btrdb.pointsView]]) tagged with its engine name.
    * One subplan per member, each partition-pruned independently. */
  def pointsView(engines: Seq[(String, Btrdb)]): DataFrame = {
    require(engines.nonEmpty, "federation needs at least one engine")
    engines.map { case (name, e) =>
      e.pointsView().withColumn("engine", lit(name))
    }.reduce(_ unionByName _)
  }

  /** Register the federation as plain SQL: `<prefix>_points`
    * (engine, sid, time, value) and `<prefix>_catalog` (live stream
    * descriptors, engine-tagged). Stat-shaped aggregates over the
    * union view are served from EVERY member's rollup pyramid — the
    * Catalyst rule ([[graft.plans.PyramidSubstitution]]) unions the
    * members' pyramid partials and pays one final combine, the same
    * shape as the reference answering stat queries from pre-aggregated
    * cores on every node (/root/reference/qtree/qtree.go:863-944 under
    * MASH placement). Queries that filter or group on `engine` — or
    * hit a member with staged points / delete debt / off-grid values
    * (for avg/sum) — fall back to merge-on-read unchanged. */
  def registerViews(spark: SparkSession, prefix: String,
                    engines: Seq[(String, Btrdb)]): Unit = {
    pointsView(engines).createOrReplaceTempView(s"${prefix}_points")
    engines.map { case (name, e) =>
      e.catalog.filter(!col("tombstoned")).drop("tombstoned")
        .withColumn("engine", lit(name))
    }.reduce(_ unionByName _)
      .createOrReplaceTempView(s"${prefix}_catalog")
    graft.plans.PyramidSubstitution.registerFederation(
      spark, s"${prefix}_points", engines.map(_._2))
  }
}
