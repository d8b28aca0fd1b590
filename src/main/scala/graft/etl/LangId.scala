package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character n-gram language identification, Cavnar–Trenkle style
  * ("N-Gram-Based Text Categorization", 1994): build a rank-ordered
  * trigram profile per language from labeled text, then score each
  * document against every profile and pick the best match.
  *
  * Deviation from the paper, chosen for exact cross-engine
  * reproducibility (the DuckDB oracle must hash-match): instead of the
  * paper's out-of-place rank distance, a document scores
  * Σ count(g in doc) × (topK + 1 − rank_L(g)) per language L — a
  * count-weighted rank-order similarity. All arithmetic is integer;
  * ranking and argmax tie-breaks are total orders (count DESC, gram ASC
  * / score DESC, lang ASC), so results are bit-deterministic.
  *
  * Scale shape (100 TB corpus): the trigram explode is narrow; profile
  * building is one groupBy over (lang, gram) — bounded by alphabet³ per
  * language, not corpus size; profiles are a few thousand rows and
  * BROADCAST into the scoring join; scoring is one groupBy per
  * (doc, candidate-lang). No stage scales worse than the corpus itself.
  */
object LangId {

  /** Trigrams of `lower(textCol)`, one row per position, positions
    * capped at `maxPos`. Input needs (id, lang?, textCol); docs shorter
    * than 3 chars yield no rows. */
  def trigrams(docs: DataFrame, textCol: String, maxPos: Int): DataFrame = {
    val t = lower(col(textCol))
    docs.filter(length(t) >= 3)
      .withColumn("_t", t)
      .withColumn("p",
        explode(sequence(lit(1), least(length(col("_t")) - 2, lit(maxPos)))))
      .withColumn("g", expr("substring(_t, p, 3)"))
      .drop("_t", "p")
  }

  /** Rank-ordered top-`topK` trigram profile per language:
    * (plang, g, rnk) with rnk 1-based by (count DESC, g ASC). */
  def profiles(labeledGrams: DataFrame, topK: Int): DataFrame =
    rankProfiles(labeledGrams.groupBy(col("lang").as("plang"), col("g"))
      .agg(count(lit(1)).as("c")), topK)

  /** [[profiles]] over grams carrying a multiplicity `w` — the
    * distinct-text training form: k identical sample docs contribute
    * weight k per occurrence, which sums to EXACTLY the per-occurrence
    * row count the unweighted form ranks by (same tie-break, same
    * profile). */
  def profilesWeighted(weightedGrams: DataFrame, topK: Int): DataFrame =
    rankProfiles(weightedGrams.groupBy(col("lang").as("plang"), col("g"))
      .agg(sum("w").as("c")), topK)

  private def rankProfiles(counts: DataFrame, topK: Int): DataFrame =
    counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy("plang").orderBy(col("c").desc, col("g").asc)))
      .filter(col("rnk") <= topK)
      .select("plang", "g", "rnk")

  /** Predicted language per doc id: count-weighted rank-order score
    * against every profile, argmax with (score DESC, plang ASC)
    * tie-break. Docs matching no profile gram get no row — callers
    * default them (the oracle uses COALESCE).
    *
    * Plan shape: the profile is ≤ topK × #languages rows, so it
    * BROADCASTS into the gram stream and each occurrence contributes
    * its rank weight directly — Σ_g count(d,g)·w(g) ≡ Σ_occ w(g), so
    * no per-(doc, gram) pre-aggregation (a corpus-sized shuffle on a
    * wide string key) is ever needed. The only shuffle is the final
    * groupBy over (doc, candidate-language) — #docs × #languages rows
    * at most, with map-side partial aggregation. */
  def classify(grams: DataFrame, prof: DataFrame, topK: Int): DataFrame = {
    grams.join(broadcast(prof), "g")
      .groupBy("doc_id", "plang")
      .agg(sum(lit(topK + 1) - col("rnk")).as("s"))
      // argmax by (score DESC, plang ASC) as a hash aggregate: min of
      // (−score, plang) is the same total order, without the sort-based
      // window shuffle a row_number() would cost at corpus scale
      .groupBy("doc_id")
      .agg(min(struct((-col("s")).as("ns"), col("plang"))).as("m"))
      .select(col("doc_id"), col("m.plang").as("pred"))
  }
}
