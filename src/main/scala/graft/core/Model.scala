package graft.core

/** Core data model of the engine.
  *
  * Mirrors the reference's value domain (BTrDB: the only payload is a
  * stream of (time int64 ns, value float64) points identified by a
  * stream id and versioned by commit generation):
  *   - RawPoint   ~ `Record`     /root/reference/qtree/qtree_utils.go:36-39
  *   - StatPoint  ~ `StatRecord` /root/reference/qtree/qtree.go:796-802
  *   - ChangedRange              /root/reference/quasar.go:393-396
  *   - StreamDesc ~ `LookupResult` /root/reference/internal/mprovider/metaprovider.go:49-55
  */
final case class RawPoint(sid: Long, time: Long, value: Double, version: Long)

/** Result row of both window queries: window start time + (count,min,mean,max). */
final case class StatPoint(time: Long, count: Long, min: Double, mean: Double, max: Double)

/** Half-open [start, end) time interval that differs between two versions. */
final case class ChangedRange(sid: Long, start: Long, end: Long)

/** Stream descriptor. Tags are immutable at create; annotations are CAS-mutable. */
final case class StreamDesc(
    uuid: Array[Byte],
    sid: Long,
    collection: String,
    tags: Map[String, String],
    annotations: Map[String, String],
    annotationVersion: Long,
    tombstoned: Boolean)

/** One commit in the engine's commit log (insert or delete interval).
  * kind: "insert" | "delete". For deletes, [tmin, tmax) is the deleted
  * half-open interval; for inserts it is the closed [min(time), max(time)]
  * envelope of the batch (used for changed-range queries and rollup
  * invalidation — the analog of CGeneration in
  * /root/reference/internal/bstore/blocktypes.go:111).
  */
final case class Commit(
    sid: Long,
    version: Long,
    kind: String,
    tmin: Long,
    tmax: Long,
    nPoints: Long)

object TimeConsts {
  /** Valid time domain, end-exclusive (reference /root/reference/quasar.go:36-37). */
  val MinimumTime: Long = -(16L << 56)
  val MaximumTime: Long = 48L << 56
  /** Sentinel "latest" version (reference /root/reference/internal/bstore/blockstore.go:70). */
  val LatestGeneration: Long = Long.MaxValue

  val NsPerSecond: Long = 1000000000L
  val NsPerDay: Long = 86400L * NsPerSecond
  val NsPerWeek: Long = 7L * NsPerDay
}
