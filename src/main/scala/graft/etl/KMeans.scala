package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedPointDot
import graft.functions.FixedPointOps.{fixedPointDot, fixedPointNormSq}

/** Deterministic spherical k-means over an embedding column — the
  * coarse quantizer behind SemDeDup-style semantic deduplication and a
  * real IVF index (centroid lists probed by the query's nearest
  * centroids).
  *
  * Engine-portability is by construction, the same discipline as
  * [[Similarity]]: every Lloyd step quantizes its centroids back onto
  * the µs fixed-point grid (`round(mean·1e6)` as an integer), so the
  * assignment dot products are EXACT Long arithmetic
  * ([[graft.functions.FixedPointDot]]) and a plain-SQL oracle
  * reproduces every assignment bit-for-bit. Cosines divide exact
  * integer dots by sqrt'd exact integer norms — the identical IEEE
  * expression tree in Spark and DuckDB.
  *
  * Scale shape (100 TB): one Lloyd step is one map-side scaled
  * posexplode + a k·dim-row aggregate (centroids are PLAN CONSTANTS —
  * k·dim is bounded by design, like a query vector), and assignment is
  * a pure projection over literal centroids: no shuffle, no driver
  * loop over data. Iteration count is fixed (training passes are
  * jobs, not convergence loops — the MLlib k-means shape).
  */
object KMeans {

  /** µs fixed-point scale — THE shared constant behind
    * [[FixedPointDot.scale]]. */
  val Scale: Long = FixedPointDot.Scale

  /** One centroid: cluster id, fixed-point-exact float coordinates
    * (scale-rounds back to the integer grid bit-for-bit), and the
    * exact integer squared norm Σ qc². */
  final case class Centroid(id: Long, coords: Array[Float], normSq: Long)

  /** One Lloyd step's centroids from an assignment frame
    * (`cluster`, `embedding`): per (cluster, dim), the mean of the
    * µs-scaled integer coordinates, rounded back onto the integer
    * grid — `round(sum(sv)/n)` with sv = round(f·1e6). The k·dim
    * aggregate is collected (bounded: centroids are the next step's
    * plan constants); empty clusters simply produce no centroid.
    * Every quantized coordinate is guarded to round-trip through
    * float exactly (|qc| < 2²³ — µs-scaled unit-ish embeddings are
    * orders of magnitude inside the bound). Exactness of the mean
    * also needs |Σ sv| < 2⁵³ per (cluster, dim) so the Long→Double
    * cast is lossless: ~10⁹ unit-scaled members per cluster; beyond
    * that, normalize inputs or split clusters (k is the knob). */
  def quantizedCentroids(assigned: DataFrame): Seq[Centroid] = {
    val rows = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("i", "f")))
      .select(col("cluster"), col("i"),
        round(col("f").cast("double") * Scale, 0).cast("long").as("sv"))
      .groupBy("cluster", "i")
      .agg(sum("sv").as("s"), count(lit(1)).as("n"))
      .collect()
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (cid, rs) =>
      val dim = rs.map(_.getInt(1)).max + 1
      val coords = new Array[Float](dim)
      rs.foreach { r =>
        val q = FixedPointDot.roundHalfAway(r.getLong(2).toDouble / r.getLong(3))
        val f = (q.toDouble / Scale).toFloat
        require(FixedPointDot.scale(f) == q,
          s"centroid coordinate $q exceeds the float-exact fixed-point range")
        coords(r.getInt(1)) = f
      }
      Centroid(cid, coords, coords.map { f =>
        val q = FixedPointDot.scale(f); q * q
      }.sum)
    }
  }

  /** Trained centroids as a persistable frame — (cluster, i, q) with q
    * the µs-grid integer coordinate. Lossless by construction:
    * [[quantizedCentroids]] guards every coordinate to round-trip
    * float↔grid exactly, so [[centroidsFromRows]] rebuilds the same
    * centroids bit-for-bit. This is the artifact form a
    * [[DerivedState]]-backed index persists across sessions. */
  def centroidRows(spark: org.apache.spark.sql.SparkSession,
                   cents: Seq[Centroid]): DataFrame = {
    import spark.implicits._
    cents.flatMap(c => c.coords.zipWithIndex.map { case (f, i) =>
      (c.id, i, FixedPointDot.scale(f))
    }).toDF("cluster", "i", "q")
  }

  /** Inverse of [[centroidRows]] — collect is bounded by k·dim (the
    * centroids are plan constants by design). */
  def centroidsFromRows(df: DataFrame): Seq[Centroid] = {
    val rows = df.select("cluster", "i", "q").collect()
    rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (cid, rs) =>
      val dim = rs.map(_.getInt(1)).max + 1
      val coords = new Array[Float](dim)
      rs.foreach(r => coords(r.getInt(1)) =
        (r.getLong(2).toDouble / Scale).toFloat)
      Centroid(cid, coords, coords.map { f =>
        val q = FixedPointDot.scale(f); q * q
      }.sum)
    }
  }

  /** Exact-arithmetic cosine of `emb` against one quantized centroid:
    * integer dot over the fixed-point grid, then the same
    * `CAST(dot) / (sqrt(CAST(nn)) * sqrt(CAST(cn)))` IEEE tree the SQL
    * oracle evaluates (`math.sqrt` and SQL `sqrt` are both
    * correctly-rounded, so the literal equals the oracle's term). */
  def cosineTo(emb: Column, c: Centroid): Column =
    fixedPointDot(emb, typedlit(c.coords)).cast("double") /
      (sqrt(fixedPointNormSq(emb).cast("double")) *
        lit(math.sqrt(c.normSq.toDouble)))

  /** Nearest-centroid assignment as a PURE PROJECTION: an array of
    * (cos, -id) structs reduced with `array_max`. Spark's struct
    * ordering is field-lexicographic with SQL NaN-greatest double
    * semantics — exactly `ORDER BY cos DESC, id ASC` row_number = 1 in
    * the oracle; exact cosine ties take the smaller centroid id on
    * both engines. Zero-norm embeddings are REJECTED (ANSI double
    * division raises on a zero divisor — the data contract is
    * non-degenerate vectors, same as every cosine operator here). No
    * shuffle, no per-row lambda: one codegen'd fixed-point loop per
    * centroid. */
  def assign(emb: Column, cents: Seq[Centroid]): Column = {
    require(cents.nonEmpty, "assign needs at least one centroid")
    val scored = cents.map(c =>
      struct(cosineTo(emb, c).as("cos"), lit(-c.id).as("nid")))
    -array_max(array(scored: _*)).getField("nid")
  }

  /** Nearest-centroid assignment under SQUARED L2 distance — the
    * product-quantization sub-space rule (PQ codebooks minimize
    * reconstruction error, not angle, and a sub-vector may be
    * near-zero where a cosine is undefined). Minimizing
    * |x−c|² = |x|² − 2x·c + |c|² over c needs only the EXACT Long
    * score |c|² − 2x·c on the fixed-point grid: no division, no
    * floats, no NaN case at all — `array_min` over (score, id)
    * structs is `ORDER BY score ASC, id ASC` row_number = 1 in the
    * oracle, bit-for-bit. Same scale shape as [[assign]]: a pure
    * projection over plan-constant centroids. */
  def assignL2(emb: Column, cents: Seq[Centroid]): Column = {
    require(cents.nonEmpty, "assignL2 needs at least one centroid")
    val scored = cents.map(c =>
      struct((lit(c.normSq) -
        lit(2L) * fixedPointDot(emb, typedlit(c.coords))).as("d"),
        lit(c.id).as("id")))
    array_min(array(scored: _*)).getField("id")
  }
}
