package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FixedPointOps.{fixedPointDot, fixedPointNormSq}

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  * exact cosine top-k as the baseline, and a sign-LSH / IVF-style
  * bucketed variant as the scale path (probe the query's bucket and
  * its Hamming neighbors, exact-rerank only the candidates).
  *
  * Cosine scores use the engine's native fixed-point dot product
  * ([[graft.functions.FixedPointDot]]) — exact integer arithmetic, one
  * codegen'd loop per row, deterministic across engines.
  */
object Similarity {

  /** Sign-quantization bucket over the first `bits` dimensions. */
  def signBucket(embedding: Column, bits: Int = 8): Column =
    (0 until bits)
      .map(d => when(element_at(embedding, d + 1) >= 0f, 1L << d).otherwise(0L))
      .reduce(_ + _).cast("long")

  /** Cosine of each row's `embedding` against one query vector. */
  def cosine(df: DataFrame, query: Array[Float]): DataFrame = {
    val q = typedlit(query)
    df.withColumn("cos",
      fixedPointDot(col("embedding"), q).cast("double") /
        (sqrt(fixedPointNormSq(col("embedding")).cast("double")) *
          sqrt(fixedPointNormSq(q).cast("double"))))
  }

  /** Exact brute-force cosine top-k — the recall-1.0 baseline. */
  def cosineTopK(df: DataFrame, query: Array[Float], k: Int,
                 idCol: String = "vec_id"): DataFrame =
    cosine(df, query)
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** IVF-style ANN: candidates = rows whose sign bucket is within
    * `hamming` bits of the query's bucket; exact rerank on candidates.
    * Average candidate fraction ≈ Σ_{i≤hamming} C(bits,i) / 2^bits —
    * the knob that bounds scan cost at corpus scale. */
  def annTopK(df: DataFrame, query: Array[Float], k: Int,
              bits: Int = 8, hamming: Int = 1,
              idCol: String = "vec_id"): DataFrame = {
    val qBucket = (0 until bits)
      .map(d => if (query(d) >= 0f) 1L << d else 0L).sum
    cosine(df.withColumn("bucket", signBucket(col("embedding"), bits))
        .filter(expr(s"bit_count(bucket ^ ${qBucket}L) <= $hamming")), query)
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
