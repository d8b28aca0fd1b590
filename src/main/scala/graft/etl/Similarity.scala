package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedPointDot
import graft.functions.FixedPointOps.{fixedPointDot, fixedPointNormSq}

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  * exact cosine top-k as the baseline, and a random-hyperplane LSH /
  * IVF-style bucketed variant as the scale path (probe the query's
  * bucket and its Hamming neighbors, exact-rerank only the candidates).
  *
  * Hyperplanes are DETERMINISTIC hash-derived integer vectors (a
  * Knuth-multiplicative LCG over the plane×dim index), so the same
  * signatures are computable bit-for-bit in any engine — the DuckDB
  * oracles replicate them in plain SQL. Cosine scores use the engine's
  * native fixed-point dot product ([[graft.functions.FixedPointDot]]) —
  * exact integer arithmetic, one codegen'd loop per row.
  *
  * Scale knobs (see SCALE.md): `bits` per band sizes the bucket
  * population N/2^bits; at 10⁹ vectors, bits≈22 holds expected bucket
  * size ~240 and a hamming≤1 probe rereads (1+bits)/2^bits ≈ 5.5e-6 of
  * the corpus.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane j over `dim` dims: integer
    * coefficients in [-1000, 1000] from a multiplicative hash —
    * reproducible in SQL as ((x*2654435761) % 2^32) % 2001 - 1000 with
    * x = j*dim + i + 1. Stored as c/1e6 floats so the fixed-point dot
    * (which scales by 1e6 and rounds) recovers c exactly. */
  def hyperplane(j: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      val x = (j.toLong * dim + i + 1)
      (((x * 2654435761L) % 4294967296L) % 2001L - 1000L) / 1e6f
    }

  /** LSH signature of one band: `bits` hyperplane sign bits packed into
    * a long. Band g uses hyperplanes [g·bits, (g+1)·bits). */
  def hyperplaneBucket(embedding: Column, bits: Int, dim: Int,
                       band: Int = 0): Column =
    (0 until bits).map { j =>
      when(fixedPointDot(embedding,
        typedlit(hyperplane(band * bits + j, dim))) >= 0, 1L << j)
        .otherwise(0L)
    }.reduce(_ + _).cast("long")

  /** Driver-side hyperplane signature of a query vector — the same
    * integer arithmetic as [[hyperplaneBucket]]. */
  def hyperplaneBucketOf(query: Array[Float], bits: Int,
                         band: Int = 0): Long =
    (0 until bits).map { j =>
      val h = hyperplane(band * bits + j, query.length)
      val dot = query.indices.map(i =>
        FixedPointDot.scale(query(i)) * FixedPointDot.scale(h(i))).sum
      if (dot >= 0) 1L << j else 0L
    }.sum

  /** Sign-quantization bucket over the first `bits` dimensions (the
    * simplest quantizer; kept for the bucket-histogram query — prefer
    * [[hyperplaneBucket]], which mixes ALL dimensions). */
  def signBucket(embedding: Column, bits: Int = 8): Column =
    (0 until bits)
      .map(d => when(element_at(embedding, d + 1) >= 0f, 1L << d).otherwise(0L))
      .reduce(_ + _).cast("long")

  /** Cosine of each row's `embedding` against one query vector. */
  def cosine(df: DataFrame, query: Array[Float]): DataFrame =
    df.withColumn("cos",
      graft.functions.FixedPointOps.exactCosine(col("embedding"), typedlit(query)))

  /** Exact brute-force cosine top-k — the recall-1.0 baseline. */
  def cosineTopK(df: DataFrame, query: Array[Float], k: Int,
                 idCol: String = "vec_id"): DataFrame =
    cosine(df, query)
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** IVF-style ANN: candidates = rows whose random-hyperplane bucket is
    * within `hamming` bits of the query's bucket; exact rerank on
    * candidates. Average candidate fraction ≈
    * Σ_{i≤hamming} C(bits,i) / 2^bits — the knob that bounds scan cost
    * at corpus scale. */
  def annTopK(df: DataFrame, query: Array[Float], k: Int,
              bits: Int = 8, hamming: Int = 1,
              idCol: String = "vec_id"): DataFrame = {
    val qBucket = hyperplaneBucketOf(query, bits)
    cosine(df.withColumn("bucket",
        hyperplaneBucket(col("embedding"), bits, query.length))
        .filter(expr(s"bit_count(bucket ^ ${qBucket}L) <= $hamming")), query)
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Banded near-duplicate candidate pairs: ids sharing any band's full
    * hyperplane signature (the embedding-side analog of
    * [[Dedup.candidatePairs]]'s MinHash bands — linear in bucket sizes,
    * never all-pairs). */
  def candidatePairs(df: DataFrame, bands: Int, bits: Int, dim: Int,
                     idCol: String = "vec_id",
                     maxBucket: Option[Int] = None): DataFrame = {
    val sigs0 = (0 until bands).map(g =>
        df.select(col(idCol), lit(g).as("band"),
          hyperplaneBucket(col("embedding"), bits, dim, g).as("sig")))
      .reduce(_ unionByName _)
    // degenerate-bucket guard (see Dedup.candidatePairs): a cap bounds
    // the B² blowup of a pathological signature at corpus scale
    val sigs = maxBucket match {
      case None => sigs0
      case Some(cap) =>
        val ok = sigs0.groupBy("band", "sig")
          .agg(count(lit(1)).as("_n")).filter(col("_n") <= cap)
          .select("band", "sig")
        sigs0.join(ok, Seq("band", "sig"), "left_semi")
    }
    sigs.select(col(idCol).as("a"), col("band"), col("sig"))
      .join(sigs.select(col(idCol).as("b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }
}
