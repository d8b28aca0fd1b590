package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Embedding-similarity queries: norms, cosine near-dup stores,
  * ANN (brute/LSH/IVF/k-means-IVF/SQ8), recall reporting.
  *
  * One slice of [[EtlQueries.defs]] — the registry, fixtures, memo
  * machinery and shared helpers all live on [[EtlQueries]]; this trait
  * only contributes its family's `QueryDef` entries (split per the
  * round-16 review: one 4.3k-line file hides boundary bugs). */
private[queries] trait EtlEmbedDefs { this: EtlQueries.type =>

  private[queries] lazy val embedDefs: Map[String, QueryDef] = Map(

    // ---- Embedding similarity ----------------------------------------

    // L2 norms via exact fixed-point arithmetic (order-independent sums).
    "q_embed_norm" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings)
         |SELECT vec_id, sqrt(CAST(SUM(v * v) AS DOUBLE)) / $Scale AS norm
         |FROM sc GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
      emb(s, dir).select(col("vec_id"),
          (sqrt(graft.functions.FixedPointOps.fixedPointNormSq(col("embedding"))
            .cast("double")) / Scale).as("norm"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-k against one query vector — the exact
    // baseline an ANN index is graded against.
    "q_ann_topk" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings),
         |q AS (SELECT i, v AS qv FROM sc WHERE vec_id = 0),
         |dots AS (
         |  SELECT sc.vec_id, SUM(sc.v * q.qv) AS dot, SUM(sc.v * sc.v) AS nn
         |  FROM sc JOIN q ON sc.i = q.i GROUP BY sc.vec_id),
         |qn AS (SELECT nn AS qnn FROM dots WHERE vec_id = 0)
         |SELECT vec_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM dots, qn WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      // native codegen'd fixed-point dot (graft.functions.FixedPointDot):
      // same arithmetic as the oracle's scaled-int unnest/join, one fused
      // loop per row instead of interpreted lambdas + array allocs
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val base = emb(s, dir)
      val q = base.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
      base.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },

    // Sign-LSH bucketing over the first 8 dims — the scale path that
    // bounds ANN candidate sets; reported as a bucket histogram.
    "q_ann_lsh" -> QueryDef {
      val bitsSql = (0 until 8)
        .map(d => s"CASE WHEN embedding[${d + 1}] >= 0 THEN ${1 << d} ELSE 0 END")
        .mkString(" + ")
      s"""SELECT CAST($bitsSql AS BIGINT) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS cnt, CAST(MIN(vec_id) AS BIGINT) AS first_vec
         |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin
    } { (s, dir) =>
      val bits = (0 until 8)
        .map(d => when(element_at(col("embedding"), d + 1) >= 0f, 1L << d).otherwise(0L))
        .reduce(_ + _)
      emb(s, dir).select(bits.cast("long").as("bucket"), col("vec_id"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), min("vec_id").as("first_vec"))
        .orderBy("bucket")
    },

    // Embedding-cosine near-duplicate pairs: banded RANDOM-HYPERPLANE
    // signatures (2 bands × 8 bits, deterministic LCG coefficients over
    // ALL 64 dims — computable bit-for-bit in SQL) gate the candidate
    // pairs, exact fixed-point cosine reranks, keep pairs above
    // threshold. Candidate volume scales as Σ bucket², tuned by bits
    // (SCALE.md) — never all-pairs.
    "q_dedup_embcos" -> QueryDef(embcosPairsOracleSql) { (s, dir) =>
      // Same factoring as q_dedup_minhash: signatures and cosines are
      // pure functions of the embedding, so LSH + rerank run on
      // distinct vectors and the full pair set expands afterwards —
      // cross pairs inherit their rep pair's exact fixed-point cosine,
      // intra pairs get the self-cosine computed by the IDENTICAL
      // formula (≈1.0 up to the same sqrt rounding the direct form
      // produces; a zero vector's NaN self-cosine is KEPT by
      // `NaN >= 0.2` under Spark's and DuckDB's shared NaN-greatest
      // ordering — consistently on both sides and in the oracle, so
      // the forms still agree row-for-row). Identical output, compute
      // ∝ distinct vectors + output (359 s → output-bound at the 100×
      // replica, SCALE.md). Keys are the raw array — codegen-hashed in
      // the exchange; see the note above replacing embKey.
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val g = embGroups(s, dir)
      val repPairs = embCosPairs(s, dir)
      val selfCos = g.select(col("rid"),
          exactCosine(col("embedding"), col("embedding")).as("cos"))
        .filter(col("cos") >= 0.2)
      expandPairs(embMembers(s, dir), repPairs, selfCos).orderBy("a", "b")
    },

    // The FEDERATED form of the pair report: the rep-level pairs come
    // from the merged member stores ([[fedEmbCosPairs]] — member pair
    // attributes + cross-member candidates scored through the shared
    // admission threshold, mapped to canonical rep ids), and must
    // expand to exactly the rows the single-store report produces —
    // which serving q_dedup_embcos's oracle VERBATIM proves. The
    // expansion frames (membership, self-cosines) are pure corpus
    // functions shared with the single-store form; the federated
    // evidence is the pair set and its stored-dot cosines.
    "q_dedup_embcos_fed" -> QueryDef(embcosPairsOracleSql) { (s, dir) =>
      import graft.functions.FixedPointOps.exactCosine
      val g = embGroups(s, dir)
      val selfCos = g.select(col("rid"),
          exactCosine(col("embedding"), col("embedding")).as("cos"))
        .filter(col("cos") >= 0.2)
      expandPairs(embMembers(s, dir), fedEmbCosPairs(s, dir), selfCos)
        .orderBy("a", "b")
    },

    // The duplicate-heavy-corpus form of embedding dedup: collapse
    // bit-identical embeddings to one representative (min vec_id) with
    // a multiplicity FIRST, then run the same banded LSH + exact rerank
    // over representatives only. Pair-emission over the raw corpus is
    // OUTPUT-bound — k identical copies of a vector contribute k²/2
    // pairs, so a replicated/crawled corpus makes q_dedup_embcos
    // quadratic in duplication (measured: 359 s at 100× vs 4.6 s at
    // 10×, SCALE.md round-7) while this form stays linear: the LSH join
    // sees each distinct vector once and multiplicities ride along as
    // counts.
    "q_dedup_embcos_rep" -> QueryDef(
      s"""WITH g AS (
         |  SELECT MIN(vec_id) AS vec_id, COUNT(*) AS n, embedding
         |  FROM embeddings GROUP BY embedding),
         |${embcosPairsSql("g")}
         |SELECT c.a, c.b, c.cos, ga.n AS na, gb.n AS nb
         |FROM cpairs c
         |JOIN g ga ON ga.vec_id = c.a JOIN g gb ON gb.vec_id = c.b
         |WHERE c.cos >= 0.2
         |ORDER BY c.a, c.b""".stripMargin) { (s, dir) =>
      val g = embGroups(s, dir)
      embCosPairs(s, dir)
        .join(g.select(col("rid").as("a"), col("n").as("na")), "a")
        .join(g.select(col("rid").as("b"), col("n").as("nb")), "b")
        .select("a", "b", "cos", "na", "nb").orderBy("a", "b")
    },

    // Embedding-cosine dedup CLUSTERING — the action an embedding
    // near-dup pipeline executes, symmetric with q_dedup_cluster on
    // the text side: connected components over the thresholded cosine
    // candidate graph (reps = distinct embeddings), every vector
    // labeled (cluster = min vec_id reachable, is_canonical).
    // Identical-embedding members inherit their rep's component;
    // vectors in no surviving pair are their own singleton. Reads the
    // fixture-memoized groups + candidate graph; the oracle reproduces
    // the fixpoint with a recursive CTE over the same banded pipeline.
    "q_embcos_cluster" -> QueryDef(embcosClusterOracleSql) { (s, dir) =>
      embClusters(s, dir)
        .withColumn("is_canonical",
          (col("vec_id") === col("cluster")).cast("long"))
        .orderBy("vec_id")
    },

    // The FEDERATED form: two member stores (vec_id parity split),
    // merged with cross-member pairs scored from the members' feats
    // indexes through the shared cosine-threshold admission predicate
    // ([[fedEmbClusters]]). Served under q_embcos_cluster's oracle
    // VERBATIM — labels included — because the merge's canonical rep
    // (global min rid per content) and CC labels (min reachable) are
    // exactly the single-store definitions. This is the thresholded
    // counterpart of q_dedup_fed: there, bucket co-membership IS the
    // edge; here the merge must also reproduce the admission decision
    // across members.
    "q_embcos_fed" -> QueryDef(embcosClusterOracleSql) { (s, dir) =>
      fedEmbClusters(s, dir)
        .select(col("doc_id").as("vec_id"), col("cluster"))
        .withColumn("is_canonical",
          (col("vec_id") === col("cluster")).cast("long"))
        .orderBy("vec_id")
    },

    // IVF-style two-stage ANN: coarse quantization to a RANDOM-
    // HYPERPLANE bucket (8 deterministic hash-derived planes over all 64
    // dims — not fixed sign bits of a dim prefix), probe the query's
    // bucket plus Hamming-distance-1 neighbors, exact cosine rerank only
    // on those candidates. Candidate fraction ≈ (1+bits)/2^bits; `bits`
    // is the corpus-scale knob (SCALE.md).
    "q_ann_ivf" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings),
         |${hyperplaneSql(nPlanes = 8)},
         |bk AS (
         |  SELECT vec_id,
         |    SUM(CASE WHEN b = 1
         |        THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS bucket
         |  FROM bits GROUP BY vec_id),
         |qb AS (SELECT bucket AS qbucket FROM bk WHERE vec_id = 0),
         |cand AS (
         |  SELECT bk.vec_id FROM bk, qb
         |  WHERE bk.vec_id <> 0 AND bit_count(xor(bk.bucket, qb.qbucket)) <= 1),
         |q AS (SELECT i, v AS qv FROM sc WHERE vec_id = 0),
         |dots AS (
         |  SELECT sc.vec_id, SUM(sc.v * q.qv) AS dot, SUM(sc.v * sc.v) AS nn
         |  FROM sc JOIN q ON sc.i = q.i
         |  WHERE sc.vec_id IN (SELECT vec_id FROM cand) OR sc.vec_id = 0
         |  GROUP BY sc.vec_id),
         |qn AS (SELECT nn AS qnn FROM dots WHERE vec_id = 0)
         |SELECT vec_id,
         |  CAST(dot AS DOUBLE) / (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM dots, qn WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val base = emb(s, dir).withColumn("bucket",
        graft.etl.Similarity.hyperplaneBucket(col("embedding"), bits = 8, dim = 64))
      val qrow = base.filter(col("vec_id") === 0)
        .select(col("bucket").as("qbucket"), col("embedding").as("qemb"))
      base.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qrow))
        .filter(expr("bit_count(bucket ^ qbucket) <= 1"))
        .select(col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(5)
    },

    // SemDeDup (semantic dedup, Abbas et al. 2023 shape): spherical
    // k-means coarse-clusters the embeddings, then near-duplicate
    // pruning runs WITHIN each cluster only — the all-pairs cosine
    // that is quadratic in the corpus becomes quadratic in a bounded
    // cluster size (k is the scale knob). Complements the LSH dedup
    // family: k-means groups by global geometry, so semantically-close
    // pairs that land in different LSH buckets still meet; pairs split
    // across cluster boundaries are the documented recall trade every
    // SemDeDup deployment makes. Keep rule: a vector is dropped iff a
    // SMALLER-id member of its cluster sits within the cosine bar
    // (deterministic greedy keep-first; the oracle's NOT isnan guard
    // documents that a degenerate NaN cosine could never mark a
    // duplicate — the engine side rejects zero-norm vectors outright
    // under ANSI division).
    // Training (two Lloyd passes) is fixture-memoized like the SQ8
    // codes; the oracle unrolls the identical passes in SQL.
    "q_semdedup" -> QueryDef(
      s"""WITH $kmeansSql,
         |pairs AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM a2 x JOIN a2 y
         |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         |pd AS (
         |  SELECT pairs.a, pairs.b, SUM(sa.v * sb.v) AS dot
         |  FROM pairs
         |  JOIN sc sa ON sa.vec_id = pairs.a
         |  JOIN sc sb ON sb.vec_id = pairs.b AND sb.i = sa.i
         |  GROUP BY pairs.a, pairs.b),
         |pc AS (
         |  SELECT pd.b,
         |    CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
         |  FROM pd
         |  JOIN norms na ON na.vec_id = pd.a
         |  JOIN norms nb ON nb.vec_id = pd.b),
         |dropped AS (
         |  SELECT DISTINCT b FROM pc
         |  WHERE cos >= $SemDedupTau AND NOT isnan(cos))
         |SELECT a2.vec_id, a2.cluster,
         |  a2.vec_id NOT IN (SELECT b FROM dropped) AS kept
         |FROM a2 ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // Factored over DISTINCT embeddings (the oracle specifies the
      // direct per-vector rule; this computes the identical booleans):
      // assignment and pairwise cosines are pure functions of the
      // embedding, so the within-cluster pairing runs over group REPS
      // and per-member verdicts follow by algebra —
      //   drop(v ∈ g) ⟺ (selfCos(g) ≥ τ ∧ v > rid_g)          [in-group
      //     peer: rid_g < v and identical-vector cosine]
      //       ∨ (min{rid_g' : repCos(g,g') ≥ τ, same cluster} < v)
      //     [cross-group peer: g' has a member < v iff its min does]
      // A duplicate-heavy corpus pays the quadratic-in-cluster-size
      // stage once per DISTINCT vector (replica-invariant, like the
      // rest of the dedup family); cluster size stays the k knob.
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val cents = kmeansCentroids(s, dir)
      val g = embGroups(s, dir)
      val reps = g.select(col("rid"), col("embedding"),
        graft.etl.KMeans.assign(col("embedding"), cents).as("cluster"))
      val selfCos = exactCosine(col("embedding"), col("embedding"))
      val pairCos = exactCosine(col("ea"), col("eb"))
      val adjMin = reps
        .select(col("cluster"), col("rid").as("ra"), col("embedding").as("ea"))
        .join(reps.select(col("cluster"), col("rid").as("rb"),
          col("embedding").as("eb")), "cluster")
        .filter(col("ra") =!= col("rb"))
        .select(col("ra"), col("rb"), pairCos.as("cos"))
        .filter(col("cos") >= SemDedupTau && !isnan(col("cos")))
        .groupBy("ra").agg(min("rb").as("adjmin"))
        .withColumnRenamed("ra", "rid")
      val flags = reps
        .select(col("rid"), col("cluster"),
          (selfCos >= SemDedupTau && !isnan(selfCos)).as("selfdup"))
        .join(adjMin, Seq("rid"), "left_outer")
      emb(s, dir).join(g.select("embedding", "rid"), "embedding")
        .select(col("rid"), col("vec_id"))
        .join(flags, "rid")
        .select(col("vec_id"), col("cluster"),
          not((col("selfdup") && col("vec_id") > col("rid")) ||
            (col("adjmin").isNotNull && col("adjmin") < col("vec_id")))
            .as("kept"))
        .orderBy("vec_id")
    },

    // k-means IVF ANN — the real IVF structure (centroid lists, not
    // hyperplane buckets): probe the query's nearest `KmIvfProbes`
    // centroids, exact-rerank only their member lists. Candidate cost
    // = probes/k of the corpus ON AVERAGE but adapts to geometry
    // (dense regions get dense lists), vs the hyperplane variant's
    // fixed bucket fractions. Reads the fixture-memoized trained
    // centroids + assignment; probe selection stays in-frame (an
    // 8-row sort), never a driver-side argmax over data.
    "q_ann_kmivf" -> QueryDef(
      s"""WITH $kmeansSql,
         |probe AS (
         |  SELECT cluster FROM (
         |    SELECT cluster,
         |      ROW_NUMBER() OVER (ORDER BY cos DESC, cluster) AS rn
         |    FROM s1 WHERE vec_id = 0) t
         |  WHERE rn <= $KmIvfProbes),
         |cand AS (
         |  SELECT a2.vec_id FROM a2
         |  JOIN probe ON probe.cluster = a2.cluster
         |  WHERE a2.vec_id <> 0),
         |qv AS (SELECT i, v FROM sc WHERE vec_id = 0),
         |cd AS (
         |  SELECT sc.vec_id, SUM(sc.v * qv.v) AS dot
         |  FROM sc JOIN qv ON qv.i = sc.i
         |  WHERE sc.vec_id IN (SELECT vec_id FROM cand)
         |  GROUP BY sc.vec_id),
         |qn AS (SELECT nn AS qnn FROM norms WHERE vec_id = 0)
         |SELECT cd.vec_id,
         |  CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM cd JOIN norms ON norms.vec_id = cd.vec_id, qn
         |ORDER BY cos DESC, cd.vec_id LIMIT $KmIvfTopK""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
      val cents = kmeansCentroids(s, dir)
      val qf = emb(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qemb"))
      val probe = qf.select(explode(array(cents.map(c =>
          struct(graft.etl.KMeans.cosineTo(col("qemb"), c).as("cos"),
            lit(c.id).as("cluster"))): _*)).as("p"))
        .select(col("p.cos").as("cos"), col("p.cluster").as("cluster"))
        .orderBy(col("cos").desc, col("cluster"))
        .limit(KmIvfProbes)
        .select("cluster")
      kmeansAssignments(s, dir)
        .join(broadcast(probe), "cluster")
        .filter(col("vec_id") =!= 0)
        .join(emb(s, dir).select("vec_id", "embedding"), "vec_id")
        .crossJoin(broadcast(qf))
        .select(col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(KmIvfTopK)
    },

    // IVF recall report — the measure-don't-guess loop for the k-means
    // coarse quantizer (the analog of q_minhash_acc for banding): for a
    // deterministic probe set of query vectors, what fraction of the
    // EXACT cosine top-10 lives inside the nprobe nearest centroids'
    // cells, per nprobe? This is candidate recall — the rerank is exact
    // cosine, so reachability is the only loss an IVF probe introduces.
    // Ground truth (|queries| brute passes) is an EVAL-ONLY cost: the
    // serving path stays q_ann_kmivf's probe-then-rerank. Shares the
    // memoized centroids/assignments with every other IVF consumer.
    "q_ann_recall" -> QueryDef(
      s"""WITH $kmeansSql,
         |qs AS (SELECT vec_id AS qid FROM embeddings
         |       WHERE vec_id % $RecallQueryMod = 0
         |         AND vec_id < $RecallQueryCap),
         |cr AS (
         |  SELECT s1.vec_id AS qid, s1.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY s1.vec_id
         |      ORDER BY cos DESC, cluster) AS crn
         |  FROM s1 JOIN qs ON qs.qid = s1.vec_id),
         |qd AS (
         |  SELECT q.vec_id AS qid, sc.vec_id, SUM(sc.v * q.v) AS dot
         |  FROM sc JOIN sc q ON q.i = sc.i
         |  JOIN qs ON qs.qid = q.vec_id
         |  WHERE sc.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, sc.vec_id),
         |gt AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qd.qid, qd.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qd.qid ORDER BY
         |        CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE))
         |          * sqrt(CAST(n2.nn AS DOUBLE))) DESC, qd.vec_id) AS rn
         |    FROM qd
         |    JOIN norms n1 ON n1.vec_id = qd.qid
         |    JOIN norms n2 ON n2.vec_id = qd.vec_id) t
         |  WHERE rn <= $RecallK),
         |np AS (SELECT unnest([1, 2, 4]) AS nprobe),
         |hit AS (
         |  SELECT np.nprobe,
         |    CASE WHEN cr.crn <= np.nprobe THEN 1 ELSE 0 END AS hit
         |  FROM gt
         |  JOIN a2 ON a2.vec_id = gt.vec_id
         |  JOIN cr ON cr.qid = gt.qid AND cr.cluster = a2.cluster
         |  CROSS JOIN np)
         |SELECT CAST(nprobe AS BIGINT) AS nprobe,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(hit) AS BIGINT) AS hits,
         |  CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall
         |FROM hit GROUP BY nprobe ORDER BY nprobe""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.exactCosine
      import s.implicits._
      val cents = kmeansCentroids(s, dir)
      val qs = emb(s, dir)
        .filter(col("vec_id") % RecallQueryMod === 0 &&
          col("vec_id") < RecallQueryCap)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      // centroid rank per query: K centroids broadcast as literals
      val cr = qs.select(col("qid"), explode(array(cents.map(c =>
          struct(graft.etl.KMeans.cosineTo(col("qemb"), c).as("cos"),
            lit(c.id).as("cluster"))): _*)).as("p"))
        .select(col("qid"), col("p.cluster").as("cluster"),
          col("p.cos").as("cos"))
        .withColumn("crn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("cluster"))))
        .select("qid", "cluster", "crn")
      // exact ground truth per query — computed in this timed body
      // (the brute pass is the recall eval's cost; see [[annGroundTruth]])
      val gt = annGroundTruth(s, dir)
      val np = Seq(1L, 2L, 4L).toDF("nprobe")
      // gt and cr are capped by construction (≤ RecallQueryCap/Mod
      // probes × RecallK rows / × K centroids) — broadcast them so the
      // corpus-sized assignment index is probed, never sorted/shuffled
      broadcast(gt).join(kmeansAssignments(s, dir), "vec_id")
        .join(broadcast(cr), Seq("qid", "cluster"))
        .crossJoin(broadcast(np))
        .select(col("nprobe"),
          when(col("crn") <= col("nprobe"), 1L).otherwise(0L).as("hit"))
        .groupBy("nprobe")
        .agg(count(lit(1)).as("n_pairs"), sum("hit").as("hits"))
        .select(col("nprobe"), col("n_pairs"), col("hits"),
          (col("hits").cast("double") / col("n_pairs")).as("recall"))
        .orderBy("nprobe")
    },

    // Product-quantization ANN — the COMPRESSION half of the
    // billion-vector recipe (IVF-PQ, Jégou et al. 2011; the coarse
    // half is q_ann_kmivf's centroid lists): every vector stores as m
    // per-sub-space codes (m·log₂k = 12 bits here; 8–16 BYTES in
    // production vs 256 bytes of floats), codebooks trained by the
    // same deterministic fixed-point Lloyd passes as the IVF coarse
    // quantizer but under SQUARED-L2 assignment — the PQ objective,
    // and exact Long scores with no NaN case. Query-time ranking is
    // ADC (asymmetric distance computation): the query precomputes
    // its m×k dot table against the codebooks ONCE, and each
    // candidate's approximate cosine is m array lookups over the wide
    // code frame — a pure projection with the table riding a one-row
    // broadcast; the only exchange is the top-k. |x̃|² = Σ_s |c_s|²
    // EXACTLY (sub-spaces are disjoint dims), so the ADC score is
    // integer arithmetic up to one final IEEE division and the oracle
    // replays training, coding and ranking bit-for-bit.
    "q_ann_pq" -> QueryDef(
      s"""WITH ${pqSql()},
         |qd AS (
         |  SELECT c1.sub, c1.cluster, SUM(sq.v * c1.q) AS qdot
         |  FROM sq JOIN c1 ON c1.i = sq.i
         |  WHERE sq.vec_id = 0
         |  GROUP BY c1.sub, c1.cluster),
         |qn AS (SELECT SUM(v * v) AS qnn FROM sq WHERE vec_id = 0),
         |adc AS (
         |  SELECT a2.vec_id, SUM(qd.qdot) AS adot, SUM(cn1.cn) AS cns
         |  FROM a2
         |  JOIN qd ON qd.sub = a2.sub AND qd.cluster = a2.cluster
         |  JOIN cn1 ON cn1.sub = a2.sub AND cn1.cluster = a2.cluster
         |  WHERE a2.vec_id <> 0
         |  GROUP BY a2.vec_id)
         |SELECT vec_id,
         |  CAST(adot AS DOUBLE) /
         |    (sqrt(CAST(cns AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE)))
         |    AS approx_cos
         |FROM adc, qn
         |ORDER BY approx_cos DESC, vec_id LIMIT $PqTopK""".stripMargin) { (s, dir) =>
      val (qRow, adot, cns) = pqAdc(s, dir)
      pqCodes(s, dir).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qRow))
        .select(col("vec_id"),
          (adot.cast("double") /
            (sqrt(cns.cast("double")) * sqrt(col("qnn").cast("double"))))
            .as("approx_cos"))
        .orderBy(col("approx_cos").desc, col("vec_id"))
        .limit(PqTopK)
    },

    // IVF-PQ, the COMPOSED serving path (the exact topology a
    // billion-vector deployment runs, Jégou et al. 2011): the coarse
    // quantizer prunes the corpus to the probed centroid lists
    // (q_ann_kmivf's structure), ADC ranks ONLY those candidates from
    // their m-code compressed forms (q_ann_pq's structure), and the
    // ADC shortlist alone pays an exact full-precision rerank — the
    // three-tier funnel (corpus → nprobe/k of it → PqRerank exact
    // dots) that makes the full-vector scan disappear at 100 TB. The
    // output carries BOTH scores: approx_cos pins the ADC arithmetic
    // inside the funnel, cos the exact rerank. Both trained indexes
    // are the persisted artifacts every other ANN consumer reads —
    // nothing trains at query time.
    "q_ann_ivfpq" -> QueryDef(
      s"""WITH $kmeansSql,
         |${pqSql("p")},
         |probe AS (
         |  SELECT cluster FROM (
         |    SELECT cluster,
         |      ROW_NUMBER() OVER (ORDER BY cos DESC, cluster) AS rn
         |    FROM s1 WHERE vec_id = 0) t
         |  WHERE rn <= $KmIvfProbes),
         |cand AS (
         |  SELECT a2.vec_id FROM a2
         |  JOIN probe ON probe.cluster = a2.cluster
         |  WHERE a2.vec_id <> 0),
         |qd AS (
         |  SELECT pc1.sub, pc1.cluster, SUM(psq.v * pc1.q) AS qdot
         |  FROM psq JOIN pc1 ON pc1.i = psq.i
         |  WHERE psq.vec_id = 0
         |  GROUP BY pc1.sub, pc1.cluster),
         |qn2 AS (SELECT nn AS qnn FROM norms WHERE vec_id = 0),
         |adc AS (
         |  SELECT pa2.vec_id, SUM(qd.qdot) AS adot, SUM(pcn1.cn) AS cns
         |  FROM pa2
         |  JOIN cand ON cand.vec_id = pa2.vec_id
         |  JOIN qd ON qd.sub = pa2.sub AND qd.cluster = pa2.cluster
         |  JOIN pcn1 ON pcn1.sub = pa2.sub AND pcn1.cluster = pa2.cluster
         |  GROUP BY pa2.vec_id),
         |short AS (
         |  SELECT vec_id,
         |    CAST(adot AS DOUBLE) /
         |      (sqrt(CAST(cns AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE)))
         |      AS approx_cos
         |  FROM adc, qn2
         |  ORDER BY approx_cos DESC, vec_id LIMIT $PqRerank),
         |qv AS (SELECT i, v FROM sc WHERE vec_id = 0),
         |ex AS (
         |  SELECT sc.vec_id, SUM(sc.v * qv.v) AS dot
         |  FROM sc JOIN qv ON qv.i = sc.i
         |  JOIN short ON short.vec_id = sc.vec_id
         |  GROUP BY sc.vec_id)
         |SELECT ex.vec_id, short.approx_cos,
         |  CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn AS DOUBLE))) AS cos
         |FROM ex
         |JOIN short ON short.vec_id = ex.vec_id
         |JOIN norms ON norms.vec_id = ex.vec_id, qn2
         |ORDER BY cos DESC, ex.vec_id LIMIT $KmIvfTopK""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.exactCosine
      import graft.functions.FixedPointDot.scale
      // DRIVER-ORCHESTRATED funnel (round-20 verdict item 7): the old
      // body chained tier 1 → 2 → 3 as broadcast subtrees, paying ~5
      // sequential job latencies for data-tiny tiers. The query VECTOR
      // is one bounded row — collect it, replay the coarse probe on
      // the driver with the SAME fixed-point arithmetic the engine
      // expressions run ([[graft.functions.FixedPointDot.scale]] is
      // the exact function the codegen calls; sqrt/division are the
      // identical IEEE trees), and collect the PqRerank-bounded ADC
      // shortlist — so one job computes the shortlist and one job
      // reranks it. Funnel semantics are intact: the corpus is pruned
      // to the probed cells, only candidates pay ADC, only the
      // shortlist pays exact dots; every collect is constant-bounded
      // (1 row; PqRerank rows) — the catalog-metadata collect class.
      val cents = kmeansCentroids(s, dir)
      val qemb = emb(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val qscaled = qemb.map(scale)
      val qnn = qscaled.map(v => v * v).sum
      // tier 1: coarse probe — exact cosine vs the K trained centroids,
      // ORDER BY cos DESC, cluster ASC (NaN-greatest, like the column
      // tree; real corpora have no zero-norm vectors, same contract as
      // KMeans.assign)
      val probeIds = cents.map { c =>
        val dot = c.coords.iterator.zipWithIndex
          .map { case (f, i) => scale(f) * qscaled(i) }.sum
        val cos = dot.toDouble /
          (math.sqrt(qnn.toDouble) * math.sqrt(c.normSq.toDouble))
        (cos, c.id)
      }.sortWith { case ((ca, ia), (cb, ib)) =>
        val cmp = java.lang.Double.compare(cb, ca) // NaN-greatest desc
        cmp < 0 || (cmp == 0 && ia < ib)
      }.take(KmIvfProbes).map(_._2)
      // tier 2: ADC over the probed cells' compressed codes only — the
      // query's per-sub-space dot tables are driver-computed literals
      // (bit-identical to fixedPointDot over the collected vector), so
      // the shortlist is ONE job over the code frame
      val bySub = pqCentroids(s, dir)
      def qdots(sIdx: Int): Array[Long] = {
        val m = bySub(sIdx).map(c => c.id.toInt -> c).toMap
        (0 until PqK).map(m.get(_).fold(0L) { c =>
          c.coords.iterator.zipWithIndex
            .map { case (f, i) => scale(f) * qscaled(sIdx * PqSub + i) }
            .sum
        }).toArray
      }
      def cnorms(sIdx: Int): Array[Long] = {
        val m = bySub(sIdx).map(c => c.id.toInt -> c).toMap
        (0 until PqK).map(m.get(_).fold(0L)(_.normSq)).toArray
      }
      val adot = (0 until PqM).map(sIdx =>
        element_at(typedlit(qdots(sIdx)), col(s"c$sIdx").cast("int") + 1))
        .reduce(_ + _)
      val cns = (0 until PqM).map(sIdx =>
        element_at(typedlit(cnorms(sIdx)), col(s"c$sIdx").cast("int") + 1))
        .reduce(_ + _)
      val cand = kmeansAssignments(s, dir)
        .filter(col("cluster").isin(probeIds: _*) && col("vec_id") =!= 0)
        .select("vec_id")
      val short = pqCodes(s, dir).join(cand, "vec_id")
        .select(col("vec_id"),
          (adot.cast("double") /
            (sqrt(cns.cast("double")) * lit(math.sqrt(qnn.toDouble))))
            .as("approx_cos"))
        .orderBy(col("approx_cos").desc, col("vec_id"))
        .limit(PqRerank)
        .collect()
      val approxByVec = short.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // tier 3: exact full-precision rerank of the shortlist alone —
      // the returned frame is one scan of PqRerank vectors
      emb(s, dir)
        .filter(col("vec_id").isin(approxByVec.keys.toSeq: _*))
        .select(col("vec_id"),
          element_at(typedlit(approxByVec), col("vec_id")).as("approx_cos"),
          exactCosine(col("embedding"), typedlit(qemb)).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(KmIvfTopK)
    },

    // PQ rerank-margin recall — the measure-don't-guess loop for
    // PqRerank (the q_ann_recall analog for the compression tier): for
    // the same deterministic probe query set, what fraction of the
    // EXACT cosine top-10 sits inside the ADC ranking's top-R, per
    // R ∈ {5, 10, 20}? This is the only loss ADC introduces (the
    // rerank is exact), so the margin the funnel needs is read off
    // the table instead of assumed. Ground truth (|queries| brute
    // passes) is an EVAL-ONLY cost; the serving path stays
    // q_ann_ivfpq's funnel. Per-query ADC tables ride a broadcast
    // (m·k rows per query); the melted code frame joins them with no
    // per-query scan of the float vectors.
    "q_ann_pq_recall" -> QueryDef(
      s"""WITH ${pqSql()},
         |nrm AS (SELECT vec_id, SUM(v * v) AS nn FROM sq GROUP BY vec_id),
         |qs AS (SELECT vec_id AS qid FROM embeddings
         |       WHERE vec_id % $RecallQueryMod = 0
         |         AND vec_id < $RecallQueryCap),
         |qtab AS (
         |  SELECT q.vec_id AS qid, c1.sub, c1.cluster, SUM(q.v * c1.q) AS qdot
         |  FROM sq q JOIN qs ON qs.qid = q.vec_id
         |  JOIN c1 ON c1.i = q.i
         |  GROUP BY q.vec_id, c1.sub, c1.cluster),
         |vc AS (
         |  SELECT a2.vec_id, SUM(cn1.cn) AS cns
         |  FROM a2 JOIN cn1 ON cn1.sub = a2.sub AND cn1.cluster = a2.cluster
         |  GROUP BY a2.vec_id),
         |ad AS (
         |  SELECT qtab.qid, a2.vec_id, SUM(qtab.qdot) AS adot
         |  FROM a2 JOIN qtab ON qtab.sub = a2.sub AND qtab.cluster = a2.cluster
         |  WHERE a2.vec_id <> qtab.qid
         |  GROUP BY qtab.qid, a2.vec_id),
         |ar AS (
         |  SELECT ad.qid, ad.vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY ad.qid ORDER BY
         |      CAST(adot AS DOUBLE) /
         |        (sqrt(CAST(vc.cns AS DOUBLE)) * sqrt(CAST(qn.nn AS DOUBLE)))
         |        DESC, ad.vec_id) AS arn
         |  FROM ad JOIN vc ON vc.vec_id = ad.vec_id
         |  JOIN nrm qn ON qn.vec_id = ad.qid),
         |qd2 AS (
         |  SELECT q.vec_id AS qid, sq.vec_id, SUM(sq.v * q.v) AS dot
         |  FROM sq JOIN sq q ON q.i = sq.i
         |  JOIN qs ON qs.qid = q.vec_id
         |  WHERE sq.vec_id <> q.vec_id
         |  GROUP BY q.vec_id, sq.vec_id),
         |gt AS (
         |  SELECT qid, vec_id FROM (
         |    SELECT qd2.qid, qd2.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY qd2.qid ORDER BY
         |        CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nn AS DOUBLE))
         |          * sqrt(CAST(n2.nn AS DOUBLE))) DESC, qd2.vec_id) AS rn
         |    FROM qd2
         |    JOIN nrm n1 ON n1.vec_id = qd2.qid
         |    JOIN nrm n2 ON n2.vec_id = qd2.vec_id) t
         |  WHERE rn <= $RecallK),
         |rr AS (SELECT unnest([5, 10, 20]) AS rerank)
         |SELECT CAST(rerank AS BIGINT) AS rerank,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(CASE WHEN ar.arn <= rr.rerank THEN 1 ELSE 0 END)
         |    AS BIGINT) AS hits,
         |  CAST(SUM(CASE WHEN ar.arn <= rr.rerank THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*) AS recall
         |FROM gt JOIN ar ON ar.qid = gt.qid AND ar.vec_id = gt.vec_id
         |CROSS JOIN rr
         |GROUP BY rerank ORDER BY rerank""".stripMargin) { (s, dir) =>
      import s.implicits._
      // ADC ranks and exact ground truth both compute in this timed
      // body ([[pqAdcRanks]], [[annGroundTruth]] — round-20 verdict
      // re-attribution); the code frame and codebooks they read are
      // the persisted index artifacts
      val ar = pqAdcRanks(s, dir)
      val gt = annGroundTruth(s, dir)
      val rr = Seq(5L, 10L, 20L).toDF("rerank")
      // gt is capped by construction (≤ 16 probes × RecallK rows):
      // broadcast it so the corpus-wide ADC ranking is probed in place
      // instead of sort-merge-shuffled against a 160-row table
      broadcast(gt).join(ar, Seq("qid", "vec_id"))
        .crossJoin(broadcast(rr))
        .select(col("rerank"),
          when(col("arn") <= col("rerank"), 1L).otherwise(0L).as("hit"))
        .groupBy("rerank")
        .agg(count(lit(1)).as("n_pairs"), sum("hit").as("hits"))
        .select(col("rerank"), col("n_pairs"), col("hits"),
          (col("hits").cast("double") / col("n_pairs")).as("recall"))
        .orderBy("rerank")
    },

    // Matryoshka prefix-dimension ANN (Kusupati et al. 2022) — the
    // TRAINING-FREE compression funnel: MRL-trained embeddings
    // concentrate ranking signal in their prefix dims, so the
    // shortlist ranks on the first MrlDim of 64 dims (a contiguous
    // slice — MrlDim/dim of the scan bytes, no codebooks, no index
    // state, nothing to retrain when the corpus grows) and only the
    // PqRerank survivors pay a full-dim exact rerank — the q_ann_ivfpq
    // funnel shape with zero trained artifacts. Output carries both
    // scores (pre_cos pins the prefix arithmetic, cos the rerank).
    // The fixture embeddings are random, not MRL-trained, so prefix
    // recall here carries the q_ann_pq_recall caveat; the operator's
    // contract is the funnel, which the oracle replays bit-for-bit.
    "q_ann_mrl" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT vec_id, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings),
         |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM sc GROUP BY vec_id),
         |pn AS (SELECT vec_id, SUM(v * v) AS pnn FROM sc
         |       WHERE i < $MrlDim GROUP BY vec_id),
         |qp AS (SELECT i, v FROM sc WHERE vec_id = 0 AND i < $MrlDim),
         |qf AS (SELECT i, v FROM sc WHERE vec_id = 0),
         |pd AS (
         |  SELECT sc.vec_id, SUM(sc.v * qp.v) AS dot
         |  FROM sc JOIN qp ON qp.i = sc.i
         |  WHERE sc.vec_id <> 0 GROUP BY sc.vec_id),
         |qpn AS (SELECT pnn AS v FROM pn WHERE vec_id = 0),
         |qnn AS (SELECT nn AS v FROM norms WHERE vec_id = 0),
         |short AS (
         |  SELECT pd.vec_id,
         |    CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(pn.pnn AS DOUBLE)) * sqrt(CAST(qpn.v AS DOUBLE)))
         |      AS pre_cos
         |  FROM pd JOIN pn ON pn.vec_id = pd.vec_id, qpn
         |  ORDER BY pre_cos DESC, pd.vec_id LIMIT $PqRerank),
         |ex AS (
         |  SELECT sc.vec_id, SUM(sc.v * qf.v) AS dot
         |  FROM sc JOIN qf ON qf.i = sc.i
         |  JOIN short ON short.vec_id = sc.vec_id
         |  GROUP BY sc.vec_id)
         |SELECT ex.vec_id, short.pre_cos,
         |  CAST(dot AS DOUBLE) /
         |    (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(qnn.v AS DOUBLE))) AS cos
         |FROM ex
         |JOIN short ON short.vec_id = ex.vec_id
         |JOIN norms ON norms.vec_id = ex.vec_id, qnn
         |ORDER BY cos DESC, ex.vec_id LIMIT $PqTopK""".stripMargin) { (s, dir) =>
      import graft.functions.FixedPointOps.exactCosine
      val qf = emb(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("qemb"))
      val short = emb(s, dir).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qf))
        .select(col("vec_id"), col("embedding"),
          exactCosine(slice(col("embedding"), 1, MrlDim),
            slice(col("qemb"), 1, MrlDim)).as("pre_cos"))
        .orderBy(col("pre_cos").desc, col("vec_id"))
        .limit(PqRerank)
      short
        .crossJoin(broadcast(qf))
        .select(col("vec_id"), col("pre_cos"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(PqTopK)
    },
  )

  // ---- family helpers: embedding groups, cosine stores, SQ8, k-means IVF ----

  /** Distinct-embedding groups — (embedding, rid = min vec_id, n) —
    * the embedding analog of [[distinctGroups]], memoized per fixture
    * and read by both cosine-dedup forms. */
  /** rep id → member vec_id map over the embedding groups — memoized
    * with materialization for the same reason as
    * [[EtlQueries.groupMembers]]: [[EtlQueries.expandPairs]] reads it
    * four times per execution. */
  private[queries] lazy val embMemberMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def embMembers(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embMemberMemo, s, dir) {
      emb(s, dir).join(embGroups(s, dir), "embedding")
        .select(col("rid"), col("vec_id").as("id"))
        .memoCheckpoint()
    }

  private[queries] lazy val embGroupMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def embGroups(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embGroupMemo, s, dir) {
      emb(s, dir).groupBy("embedding")
        .agg(min("vec_id").as("rid"), count(lit(1)).as("n"))
        .memoCheckpoint()
    }

  /** Hyperplane band keys over (doc_id, text = ARRAY<FLOAT>) — bkey =
    * band index + full 8-bit signature, so bucket co-membership is
    * EXACTLY co-membership in a (band, sig) bucket of
    * [[graft.etl.Similarity.candidatePairs]] (bands = 2, bits = 8,
    * dim = 64 — the q_dedup_embcos tuning). */
  private[queries] def embedBandsOf(src: DataFrame): DataFrame =
    (0 until 2).map(g => src.select(col("doc_id"),
        concat_ws(":", lit(g), graft.etl.Similarity
          .hyperplaneBucket(col("text"), bits = 8, dim = 64, band = g))
          .as("bkey")))
      .reduce(_ unionByName _)

  /** WEIGHTED feature rows of an embedding — (doc_id, g = dimension,
    * w = µs-fixed-point component, the exact
    * [[graft.functions.FixedPointDot.scale]] rounding): the stored
    * pair score Σ wa·wb is then bit-for-bit the fixed-point dot
    * product every oracle-matched cosine shares. */
  private[queries] def embedGramsOf(src: DataFrame): DataFrame =
    src.select(col("doc_id"), posexplode(col("text")).as(Seq("i", "f")))
      .select(col("doc_id"), col("i").cast("string").as("g"),
        round(col("f").cast("double") * Scale, 0).cast("long").as("w"))

  /** The exact-cosine tree over the STORED pair attributes — the
    * [[graft.functions.FixedPointOps.exactCosine]] shape (cast and
    * operand placement are the bit-parity contract) with the dot from
    * the pair row and the squared norms from fsizes. */
  private[queries] def storedCos: Column =
    col("jac_num").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))

  /** The PERSISTED embedding near-duplicate store — the
    * [[incrDedupState]] pattern applied to the embedding family via
    * [[graft.etl.DedupState]]'s content genericity: hyperplane band
    * keys, fixed-point components as weighted features (the stored
    * pair attribute IS the exact dot product), and a cosine-threshold
    * pair-ADMISSION predicate, so the persisted edge set and the
    * clustering equal the one-shot thresholded build on any batch
    * schedule. */
  private[queries] lazy val embedStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DedupState]
  /** One embedding near-dup store with the family's edge-set identity
    * (bands, weighted grams, content key, admission threshold) — the
    * single-store fixture and both federation members MUST construct
    * through here: the META/parity checks make a drifted copy refuse,
    * but the identity itself should exist once. */
  private[queries] def newEmbedStore(s: SparkSession, root: String)
      : graft.etl.DedupState =
    new graft.etl.DedupState(s, root,
      bandsOf = embedBandsOf,
      gramsOf = Some(embedGramsOf),
      contentCol = "embedding",
      // 128-bit content identity for an array column: digest the
      // deterministic per-component rendering (codegen'd casts, no
      // JSON library in the loop); paid once per NEW distinct
      // vector at store-build time — the priced index work, unlike
      // the per-query digesting the raw-array grouping lesson in
      // [[textKey]]'s note forbids. Per-element null marker because
      // concat_ws SKIPS nulls — without it [1.0, null] and [1.0]
      // would collide to one content key and the store would silently
      // merge distinct vectors (the rendering must partition arrays
      // exactly as the raw-array GROUP BY every oracle uses does)
      keyOf = c => md5(concat_ws(",",
        transform(c, x => coalesce(x.cast("string"), lit("∅"))))
        .cast("binary")),
      pairKeep = Some(storedCos >= 0.2),
      // PINNED admission identity: the default digests the Column's
      // RENDERING (Column.toString), which a Spark upgrade may change
      // for the same logical predicate — permanently refusing to
      // reopen a long-lived store. The explicit string is the
      // Spark-version-stable name of this predicate; bump its version
      // suffix if the THRESHOLD or formula ever changes.
      keepIdentity = Some("embcos:jac/sqrt(na*nb)>=0.2:v1"))
  private[queries] def embedState(s: SparkSession, dir: String)
      : graft.etl.DedupState =
    fixtureMemo(embedStateMemo, s, dir) {
      // ONE fold: batch-schedule invariance is the specs' job
      // (DedupStateSpec's weighted two-batch test, FederatedDedupSpec's
      // parity members), and a DedupState update has a fixed multi-job
      // cost the memo line shouldn't pay twice. First-arrival rep ids
      // in a single whole-corpus batch are the GLOBAL min vec_id per
      // distinct embedding — the same reps [[embGroups]] and every
      // oracle use.
      durableStore(s, dir, "embed", "hyperplane2x8:cos0.2")(
        root => newEmbedStore(s, root)) { st =>
        st.update(emb(s, dir).select(col("vec_id").as("doc_id"),
          col("embedding")))
      }
    }

  /** The PERSISTED federation store over the embedding members — two
    * member stores on a vec_id PARITY split (identical embeddings land
    * reps in BOTH members, exercising the star-edge collapse AND the
    * cross-member admission scoring — parallel vectors straddle the
    * split), folded into one [[graft.etl.FedDedupState]] under a
    * shared durable root; BOTH federated embedding readers (clusters +
    * pair report) are reads of it, the way the single store's pair and
    * label indexes share one fold. */
  private[queries] lazy val fedEmbStoreMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.FedDedupState]
  private[queries] def fedEmbStore(s: SparkSession, dir: String)
      : graft.etl.FedDedupState =
    fixtureMemo(fedEmbStoreMemo, s, dir) {
      durableStore(s, dir, "fed_embed", "hyperplane2x8:cos0.2:parity") {
        root =>
          val a = newEmbedStore(s, s"$root/a")
          val b = newEmbedStore(s, s"$root/b")
          new graft.etl.FedDedupState(s, s"$root/merge", Seq(a, b))
      } { fed =>
        val e = emb(s, dir).select(col("vec_id").as("doc_id"),
          col("embedding"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(e.filter(col("doc_id") % 2 === 0)),
          b.update(e.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
    }

  /** FEDERATED embedding near-dup clusters — a read of the persisted
    * federation store's converged labels ([[fedEmbStore]]). The store's
    * min-label quotient fold over member pairs + star edges +
    * admission-scored cross-member pairs assigns the global-min-rid
    * labels the one-shot thresholded clustering does — which
    * `q_embcos_fed` serving [[embcosClusterOracleSql]] VERBATIM
    * proves (FedStateSpec pins store == one-shot on staged
    * schedules; FederatedDedupSpec covers the one-shot merge itself). */
  private[queries] lazy val fedEmbClustersMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def fedEmbClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedEmbClustersMemo, s, dir) {
      fedEmbStore(s, dir).docClusters().memoCheckpoint()
    }

  /** FEDERATED embedding near-dup PAIR REPORT — (a, b, cos) in
    * canonical rid space: the persisted federation store's pair
    * report (stored dots over the squared norms, admission applied at
    * fold time), composed with the same [[storedCos]] tree the
    * single-store read uses. Must equal [[embCosPairs]] row-for-row —
    * `q_dedup_embcos_fed` serves it under q_dedup_embcos's oracle
    * VERBATIM. */
  private[queries] lazy val fedEmbPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def fedEmbCosPairs(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedEmbPairsMemo, s, dir) {
      fedEmbStore(s, dir).pairReport()
        .select(col("a"), col("b"), storedCos.as("cos"))
        .memoCheckpoint()
    }

  /** The banded-hyperplane candidate graph over the distinct-embedding
    * reps, exact-cosine-reranked and thresholded — (a, b, cos) —
    * memoized per fixture by the same argument as
    * [[corpusBandPairs]]: one candidate graph, every cosine-dedup
    * consumer reads it. Since round 14 this is a READ of the persisted
    * [[embedState]] pair index: the dot is the stored pair attribute,
    * the norms come from fsizes, the threshold was applied at pair
    * admission — no banding, reranking or vector arithmetic happens at
    * query time (the round-13 "every memo family persists" sweep
    * finally reaches the embedding family). Output-bounded, tiny. */
  private[queries] lazy val embPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def embCosPairs(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embPairsMemo, s, dir) {
      val st = embedState(s, dir)
      val sz = st.featSizes()
      st.livePairStats()
        .join(sz.select(col("rid").as("a"), col("n").as("na")), "a")
        .join(sz.select(col("rid").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"), storedCos.as("cos"))
        .memoCheckpoint()
    }

  /** The CONVERGED embedding cluster assignment — (vec_id, cluster)
    * for every vector — the embedding analog of [[dedupClusters]] and
    * memoized by the same argument: the iterative CC fixpoint
    * ([[graft.etl.Dedup.connectedComponents]]) is far too expensive to
    * re-derive per consumer, the fixture is immutable for a run, and
    * every downstream embedding-dedup action (clustering report,
    * filter-by-cluster) reads this one frame. Identical-embedding
    * members inherit their rep's component; vectors in no surviving
    * pair are their own singleton. */
  private[queries] lazy val embClusterMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def embClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(embClusterMemo, s, dir) {
      // the CONVERGED assignment is the store's label index (the CC
      // fixpoint ran incrementally at fold time over the admitted —
      // thresholded — edges); reading it replaces the per-session
      // connectedComponents run entirely. Store rep ids are the global
      // min vec_ids (range-batched fixture), so labels match the
      // oracle's min-reachable-vec_id semantics.
      embedState(s, dir).docClusters()
        .select(col("doc_id").as("vec_id"), col("cluster"))
        // corpus-sized but two longs per row; every consumer reads it
        .memoCheckpoint()
    }

  /** Symmetric-int8 quantized codes of the fixture's embeddings —
    * (vec_id, i, q) with q = round(v·127/gmax) — memoized per
    * (session, fixture): an SQ8 index trains its scale and encodes the
    * corpus ONCE (at 100 TB the codes persist as the index files, 4×
    * smaller than the floats) and every query scores against the
    * stored codes. Re-deriving the explode + scale scan per query was
    * the dominant cost of q_ann_sq8 at the 100× replica. */
  private[queries] lazy val sq8Memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The PERSISTED SQ8 code store: the scale (gmax) TRAINS once per
    * corpus as the store's artifact; new vectors encode against the
    * frozen scale at batch cost — a production quantizer's exact
    * retrain cadence ([[graft.etl.DerivedState.train]] starts a new
    * index generation when the scale must move). */
  private[queries] lazy val sq8StateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private[queries] def scaledComponents(e: DataFrame): DataFrame = e
    .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "f")))
    .select(col("vec_id"), col("i"), col("f").cast("double").as("v"))
  private[queries] lazy val sq8Trainer: DataFrame => DataFrame = corpus =>
    scaledComponents(corpus).agg(max(abs(col("v"))).as("gmax"))
  private[queries] lazy val sq8Derive: (DataFrame, DataFrame) => DataFrame = (rows, gm) =>
    scaledComponents(rows).crossJoin(broadcast(gm))
      .select(col("vec_id"), col("i"),
        round(col("v") * 127 / col("gmax"), 0).cast("long").as("q"))
  private[queries] def newSq8State(s: SparkSession, root: String)
      : graft.etl.DerivedState =
    new graft.etl.DerivedState(s, root,
      "sq8:sym-int8:gmax", "vec_id", sq8Derive, Some(sq8Trainer))
  private[queries] def sq8State(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(sq8StateMemo, s, dir) {
      durableStore(s, dir, "sq8", "sq8:sym-int8:gmax")(
        root => newSq8State(s, root)) { st =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        st.train(e)
        (0 to 1).foreach(i => st.update(e.filter(col("vec_id") % 2 === i)))
      }
    }
  private[queries] def sq8Codes(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(sq8Memo, s, dir) {
      sq8State(s, dir).derived().memoCheckpoint()
    }

  /** FEDERATED SQ8 codes: two member stores (vec_id-parity split) under
    * ONE quantizer — the trainer member (a) trains the scale on the
    * union corpus sample (here the full embedding set, so the merged
    * index is evidence-indistinguishable from the single store); member
    * (b) ADOPTS the frozen artifact frame
    * ([[graft.etl.DerivedState.adopt]]: digest-verified copy, new
    * generation); each encodes only the vectors it owns. The merge
    * ([[graft.etl.DerivedState.federatedDerived]]) REFUSES mismatched
    * artifact digests — the contract that makes a federated q_ann_sq8
    * answerable at all: codes quantized under different scales are
    * mutually incomparable numbers. */
  private[queries] lazy val fedSq8Memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def fedSq8Codes(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedSq8Memo, s, dir) {
      val (a, b) = durableStore(s, dir, "fed_sq8",
        "sq8:sym-int8:gmax:adopt") { root =>
        (newSq8State(s, s"$root/a"), newSq8State(s, s"$root/b"))
      } { case (a, b) =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        a.train(e)
        b.adopt(a)
        inParallel(
          a.update(e.filter(col("vec_id") % 2 === 0)),
          b.update(e.filter(col("vec_id") % 2 === 1)))
      }
      graft.etl.DerivedState.federatedDerived(Seq(a, b)).memoCheckpoint()
    }

  /** Trained spherical-k-means artifacts of the fixture's embeddings —
    * the final QUANTIZED centroids after two fixed Lloyd passes
    * (deterministic init: cluster = vec_id % k) and the converged
    * (vec_id, cluster) assignment — memoized per (session, fixture) by
    * the SQ8 argument: a coarse quantizer trains ONCE per corpus (at
    * 100 TB the centroids and assignment persist as the index files)
    * and every consumer (SemDeDup pruning, IVF probing) reads the
    * trained artifacts instead of re-running the Lloyd passes. */
  private[queries] lazy val kmCentMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Seq[graft.etl.KMeans.Centroid]]
  /** The PERSISTED k-means index store: the two fixed Lloyd passes
    * TRAIN the centroids once per corpus (the store's artifact, saved
    * losslessly via [[graft.etl.KMeans.centroidRows]]); new vectors
    * assign against the frozen centroids at batch cost. Re-clustering
    * is an explicit [[graft.etl.DerivedState.train]] — a new index
    * generation, exactly how a production IVF coarse quantizer
    * retrains. */
  private[queries] lazy val kmStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private[queries] def kmState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(kmStateMemo, s, dir) {
      val trainer: DataFrame => DataFrame = corpus => {
        val c0 = graft.etl.KMeans.quantizedCentroids(
          corpus.withColumn("cluster", col("vec_id") % KMeansK))
        val c1 = graft.etl.KMeans.quantizedCentroids(
          corpus.withColumn("cluster",
            graft.etl.KMeans.assign(col("embedding"), c0)))
        graft.etl.KMeans.centroidRows(s, c1)
      }
      val derive: (DataFrame, DataFrame) => DataFrame = (rows, arts) => {
        val cents = graft.etl.KMeans.centroidsFromRows(arts)
        rows.select(col("vec_id"),
          graft.etl.KMeans.assign(col("embedding"), cents).as("cluster"))
      }
      val fp = s"kmeans:k=$KMeansK:lloyd=2:init=mod"
      durableStore(s, dir, "kmeans", fp)(root =>
        new graft.etl.DerivedState(s, root, fp, "vec_id", derive,
          Some(trainer))) { st =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        st.train(e)
        (0 to 1).foreach(i => st.update(e.filter(col("vec_id") % 2 === i)))
      }
    }
  private[queries] def kmeansCentroids(s: SparkSession, dir: String)
      : Seq[graft.etl.KMeans.Centroid] =
    fixtureMemo(kmCentMemo, s, dir) {
      graft.etl.KMeans.centroidsFromRows(kmState(s, dir).artifacts())
    }
  private[queries] lazy val kmAssignMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def kmeansAssignments(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(kmAssignMemo, s, dir) {
      // two longs per row; read by SemDeDup and every IVF probe
      kmState(s, dir).derived().memoCheckpoint()
    }

  /** DuckDB mirror of the two fixed Lloyd passes ([[kmeansCentroids]]):
    * CTE chain sc→norms→a0→(c0,cn0,d0,s0,a1)→(c1,cn1,d1,s1,a2). cN
    * carries the grid-quantized centroids (`round(sum(v)/n)` — exact
    * integer sums, one IEEE division, SQL ROUND half-away like
    * [[graft.functions.FixedPointDot.scale]]); sN the exact-arithmetic
    * cosines; aN+1 the argmax via `ORDER BY cos DESC, cluster` —
    * NaN-first under DuckDB's NaN-greatest order, exactly Spark's
    * NaN-greatest struct `array_max` in [[graft.etl.KMeans.assign]]. */
  private[queries] def kmeansSql: String = {
    def pass(n: Int, prev: String) =
      s"""c$n AS (
         |  SELECT $prev.cluster, sc.i,
         |    CAST(ROUND(CAST(SUM(sc.v) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS q
         |  FROM sc JOIN $prev ON $prev.vec_id = sc.vec_id
         |  GROUP BY $prev.cluster, sc.i),
         |cn$n AS (SELECT cluster, SUM(q * q) AS cn FROM c$n GROUP BY cluster),
         |d$n AS (
         |  SELECT sc.vec_id, c$n.cluster, SUM(sc.v * c$n.q) AS dot
         |  FROM sc JOIN c$n ON c$n.i = sc.i
         |  GROUP BY sc.vec_id, c$n.cluster),
         |s$n AS (
         |  SELECT d$n.vec_id, d$n.cluster,
         |    CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(nn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS cos
         |  FROM d$n
         |  JOIN norms ON norms.vec_id = d$n.vec_id
         |  JOIN cn$n ON cn$n.cluster = d$n.cluster),
         |a${n + 1} AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id
         |        ORDER BY cos DESC, cluster) AS rn
         |    FROM s$n) t WHERE rn = 1)"""
        .stripMargin
    s"""sc AS (
       |  SELECT vec_id, unnest(range(len(embedding))) AS i,
       |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
       |  FROM embeddings),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM sc GROUP BY vec_id),
       |a0 AS (SELECT vec_id, vec_id % $KMeansK AS cluster FROM embeddings),
       |${pass(0, "a0")},
       |${pass(1, "a1")}"""
      .stripMargin
  }

  /** Exact-cosine ground truth of the recall probes — each probe
    * query's exact top-RecallK as (qid, vec_id) — shared by
    * q_ann_recall and q_ann_pq_recall. Computed IN THE TIMED QUERY
    * BODIES (round-20 verdict re-attribution: an exact top-K per probe
    * is half the recall measurement's ANSWER, not index structure, so
    * precomputing it in the untimed memo phase left the queries' bench
    * lines measuring a join over tiny frames). The probe set is capped
    * ([[RecallQueryCap]]) so the brute pass is a bounded eval cost. */
  private[queries] def annGroundTruth(s: SparkSession, dir: String): DataFrame =
    {
      import graft.functions.FixedPointOps.exactCosine
      val qs = emb(s, dir)
        .filter(col("vec_id") % RecallQueryMod === 0 &&
          col("vec_id") < RecallQueryCap)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      emb(s, dir).select(col("vec_id"), col("embedding"))
        .join(broadcast(qs), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          exactCosine(col("embedding"), col("qemb")).as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .filter(col("rn") <= RecallK)
        .select("qid", "vec_id")
    }

  /** ADC ranking of the whole corpus per probe query — (qid, vec_id,
    * arn): each candidate's rank under the approximate (code-table)
    * cosine. Computed in q_ann_pq_recall's TIMED BODY (the other half
    * of the recall measurement — same re-attribution as
    * [[annGroundTruth]]): per-query ADC tables (m·k rows) ride a
    * broadcast against the MELTED code frame (a store read), one
    * (qid, vec) aggregate, one per-qid rank window. */
  private[queries] def pqAdcRanks(s: SparkSession, dir: String): DataFrame =
    {
      import graft.functions.FixedPointOps.fixedPointDot
      val bySub = pqCentroids(s, dir)
      val qs = emb(s, dir)
        .filter(col("vec_id") % RecallQueryMod === 0 &&
          col("vec_id") < RecallQueryCap)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      // the per-(sub, code) CENTROID norm and the per-qid query norm
      // both ride the ONE broadcast table with the query dot, so the
      // per-vector cns needs no second scan of the code frame (the old
      // `vc` join re-read it) and qnn no separate broadcast join — two
      // joins and a code-frame scan gone, adc arithmetic bit-identical.
      import graft.functions.FixedPointOps.fixedPointNormSq
      val qtab = qs.select(col("qid"),
          fixedPointNormSq(col("qemb")).as("qnn"), explode(array(
          (0 until PqM).flatMap { sIdx => bySub(sIdx).map { c =>
            struct(lit(sIdx).as("sub"), lit(c.id).as("code"),
              fixedPointDot(pqSubCol(col("qemb"), sIdx),
                typedlit(c.coords)).as("qdot"),
              lit(c.normSq).as("cn"))
          }}: _*)).as("t"))
        .select(col("qid"), col("qnn"), col("t.sub"), col("t.code"),
          col("t.qdot"), col("t.cn"))
      val codesL = pqCodes(s, dir).select(col("vec_id"), explode(array(
          (0 until PqM).map(sIdx =>
            struct(lit(sIdx).as("sub"), col(s"c$sIdx").as("code"))): _*))
          .as("t"))
        .select(col("vec_id"), col("t.sub"), col("t.code"))
      codesL.join(broadcast(qtab), Seq("sub", "code"))
        .groupBy("qid", "vec_id")
        .agg(sum("qdot").as("adot"), sum("cn").as("cns"),
          max("qnn").as("qnn"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (col("adot").cast("double") /
            (sqrt(col("cns").cast("double")) *
              sqrt(col("qnn").cast("double")))).as("adc"))
        .withColumn("arn", row_number().over(
          Window.partitionBy("qid").orderBy(col("adc").desc, col("vec_id"))))
        .select("qid", "vec_id", "arn")
    }

  /** Sub-vector of the `sIdx`-th product-quantization sub-space
    * (dims [sIdx·PqSub, sIdx·PqSub + PqSub)). */
  private[queries] def pqSubCol(e: Column, sIdx: Int): Column =
    slice(e, sIdx * PqSub + 1, PqSub)

  /** The PERSISTED product-quantization index store: per-sub-space
    * codebooks train once per corpus — two fixed Lloyd passes under
    * SQUARED-L2 assignment ([[graft.etl.KMeans.assignL2]], the PQ
    * objective), artifacts the flattened (sub·k + cid, i, q) centroid
    * rows — and new vectors CODE against the frozen codebooks at
    * batch cost (derive = m pure projections), the production cadence
    * of a PQ index: re-training is an explicit new generation. */
  private[queries] lazy val pqStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private[queries] def pqState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    fixtureMemo(pqStateMemo, s, dir) {
      val trainer: DataFrame => DataFrame = corpus => {
        val cents = (0 until PqM).flatMap { sIdx =>
          val sub = corpus.select(col("vec_id"),
            pqSubCol(col("embedding"), sIdx).as("embedding"))
          val c0 = graft.etl.KMeans.quantizedCentroids(
            sub.withColumn("cluster", col("vec_id") % PqK))
          val c1 = graft.etl.KMeans.quantizedCentroids(
            sub.withColumn("cluster",
              graft.etl.KMeans.assignL2(col("embedding"), c0)))
          c1.map(c => c.copy(id = sIdx * PqK + c.id))
        }
        graft.etl.KMeans.centroidRows(s, cents)
      }
      val derive: (DataFrame, DataFrame) => DataFrame = (rows, arts) => {
        val bySub = pqCodebooks(arts)
        rows.select(col("vec_id") +:
          (0 until PqM).map(sIdx =>
            graft.etl.KMeans.assignL2(pqSubCol(col("embedding"), sIdx),
              bySub(sIdx)).as(s"c$sIdx")): _*)
      }
      val fp = s"pq:m=$PqM:sub=$PqSub:k=$PqK:lloyd=2:init=mod:l2"
      durableStore(s, dir, "pq", fp)(root =>
        new graft.etl.DerivedState(s, root, fp, "vec_id", derive,
          Some(trainer))) { st =>
        val e = emb(s, dir).select(col("vec_id"), col("embedding"))
        st.train(e)
        (0 to 1).foreach(i => st.update(e.filter(col("vec_id") % 2 === i)))
      }
    }

  /** Flattened artifact rows → per-sub-space codebooks with LOCAL
    * centroid ids (0..k−1). A sub-space may have fewer than k live
    * codewords (an emptied Lloyd cluster trains no centroid) — codes
    * only ever reference live ids. */
  private[queries] def pqCodebooks(arts: DataFrame)
      : Map[Int, Seq[graft.etl.KMeans.Centroid]] =
    graft.etl.KMeans.centroidsFromRows(arts)
      .groupBy(c => (c.id / PqK).toInt)
      .map { case (sIdx, cs) =>
        sIdx -> cs.map(c => c.copy(id = c.id % PqK)).sortBy(_.id)
      }
  private[queries] lazy val pqCentMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      Map[Int, Seq[graft.etl.KMeans.Centroid]]]
  private[queries] def pqCentroids(s: SparkSession, dir: String)
      : Map[Int, Seq[graft.etl.KMeans.Centroid]] =
    fixtureMemo(pqCentMemo, s, dir) {
      pqCodebooks(pqState(s, dir).artifacts())
    }
  private[queries] lazy val pqCodeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  /** The wide code frame (vec_id, c0..c_{m−1}) — the COMPRESSED index
    * a 100 TB ANN serves from: m·log₂k bits a vector. */
  private[queries] def pqCodes(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(pqCodeMemo, s, dir) {
      pqState(s, dir).derived().memoCheckpoint()
    }

  /** DuckDB mirror of the PQ training + coding
    * ([[pqState]]): the [[kmeansSql]] CTE shape per (vec_id, sub)
    * with the L2 score `cn − 2·dot` (exact BIGINT — no division, no
    * NaN order case) replacing the cosine; `${p}a2` carries the final
    * codes. `p` prefixes every CTE name so the chain can share a WITH
    * clause with [[kmeansSql]] (q_ann_ivfpq composes both). */
  private[queries] def pqSql(p: String = ""): String = {
    def pass(n: Int, prev: String) =
      s"""${p}c$n AS (
         |  SELECT $prev.sub, $prev.cluster, ${p}sq.i,
         |    CAST(ROUND(CAST(SUM(${p}sq.v) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS q
         |  FROM ${p}sq JOIN $prev
         |    ON $prev.vec_id = ${p}sq.vec_id AND $prev.sub = ${p}sq.sub
         |  GROUP BY $prev.sub, $prev.cluster, ${p}sq.i),
         |${p}cn$n AS (SELECT sub, cluster, SUM(q * q) AS cn
         |         FROM ${p}c$n GROUP BY sub, cluster),
         |${p}d$n AS (
         |  SELECT ${p}sq.vec_id, ${p}c$n.sub, ${p}c$n.cluster,
         |    SUM(${p}sq.v * ${p}c$n.q) AS dot
         |  FROM ${p}sq JOIN ${p}c$n ON ${p}c$n.i = ${p}sq.i
         |  GROUP BY ${p}sq.vec_id, ${p}c$n.sub, ${p}c$n.cluster),
         |${p}a${n + 1} AS (
         |  SELECT vec_id, sub, cluster FROM (
         |    SELECT ${p}d$n.vec_id, ${p}d$n.sub, ${p}d$n.cluster,
         |      ROW_NUMBER() OVER (PARTITION BY ${p}d$n.vec_id, ${p}d$n.sub
         |        ORDER BY ${p}cn$n.cn - 2 * ${p}d$n.dot ASC, ${p}d$n.cluster) AS rn
         |    FROM ${p}d$n JOIN ${p}cn$n
         |      ON ${p}cn$n.sub = ${p}d$n.sub
         |     AND ${p}cn$n.cluster = ${p}d$n.cluster) t
         |  WHERE rn = 1)""".stripMargin
    s"""${p}sq AS (
       |  SELECT vec_id, i // $PqSub AS sub, i, v FROM (
       |    SELECT vec_id, unnest(range(len(embedding))) AS i,
       |      CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
       |    FROM embeddings) u),
       |${p}a0 AS (SELECT DISTINCT vec_id, sub, vec_id % $PqK AS cluster
       |           FROM ${p}sq),
       |${pass(0, s"${p}a0")},
       |${pass(1, s"${p}a1")}"""
      .stripMargin
  }

  /** The ADC machinery shared by q_ann_pq / q_ann_ivfpq: the query's
    * one-row dot-table frame (per sub-space, the k exact dots as an
    * array, plus the query norm) and the (adot, cns) lookup columns
    * over the wide code frame. Lookup arrays are indexed BY CODEWORD
    * ID (position id+1), so a dead id (an emptied Lloyd cluster trains
    * no centroid) pads with a never-referenced zero instead of
    * shifting its betters. */
  private[queries] def pqAdc(s: SparkSession, dir: String)
      : (DataFrame, Column, Column) = {
    import graft.functions.FixedPointOps.{fixedPointDot, fixedPointNormSq}
    val bySub = pqCentroids(s, dir)
    def slot(sIdx: Int): IndexedSeq[Option[graft.etl.KMeans.Centroid]] = {
      val m = bySub(sIdx).map(c => c.id.toInt -> c).toMap
      (0 until PqK).map(m.get)
    }
    val qRow = emb(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qemb"))
      .select(
        (0 until PqM).map { sIdx =>
          array(slot(sIdx).map {
            case Some(c) => fixedPointDot(pqSubCol(col("qemb"), sIdx),
              typedlit(c.coords))
            case None => lit(0L)
          }: _*).as(s"q$sIdx")
        } :+ fixedPointNormSq(col("qemb")).as("qnn"): _*)
    val adot = (0 until PqM).map(sIdx =>
      element_at(col(s"q$sIdx"), col(s"c$sIdx").cast("int") + 1))
      .reduce(_ + _)
    val cns = (0 until PqM).map(sIdx =>
      element_at(typedlit(slot(sIdx).map(_.fold(0L)(_.normSq)).toArray),
        col(s"c$sIdx").cast("int") + 1))
      .reduce(_ + _)
    (qRow, adot, cns)
  }

  /** Banded hyperplane-signature candidates over `base`
    * (vec_id, embedding) + exact fixed-point cosine, one implementation
    * for the pair and representative forms (SQL mirror:
    * [[embcosPairsSql]]). Emits (a, b, cos) above `threshold`. */
  private[queries] def cosinePairs(base: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.FixedPointOps.{exactCosine, fixedPointDot, fixedPointNormSq}
    val cand = graft.etl.Similarity.candidatePairs(
      base.select("vec_id", "embedding"), bands = 2, bits = 8, dim = 64)
    cand
      .join(base.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(base.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .select(col("a"), col("b"),
        exactCosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The DuckDB mirror of [[cosinePairs]]: CTE chain
    * sc→coef/bits→bk→cand→norms→dots→cpairs over `from`
    * (vec_id, embedding); `cpairs` carries (a, b, cos) unthresholded.
    */
  private[queries] def embcosPairsSql(from: String): String =
    s"""sc AS (
       |  SELECT vec_id, unnest(range(len(embedding))) AS i,
       |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
       |  FROM $from),
       |${hyperplaneSql(nPlanes = 16)},
       |bk AS (
       |  SELECT vec_id, j // 8 AS band,
       |    SUM(CASE WHEN b = 1
       |        THEN (CAST(1 AS BIGINT) << CAST(j % 8 AS INTEGER)) ELSE 0 END) AS sig
       |  FROM bits GROUP BY vec_id, j // 8),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bk x JOIN bk y
       |    ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id),
       |norms AS (SELECT vec_id, SUM(v * v) AS nn FROM sc GROUP BY vec_id),
       |dots AS (
       |  SELECT c.a, c.b, SUM(sa.v * sb.v) AS dot
       |  FROM cand c
       |  JOIN sc sa ON sa.vec_id = c.a
       |  JOIN sc sb ON sb.vec_id = c.b AND sb.i = sa.i
       |  GROUP BY c.a, c.b),
       |cpairs AS (
       |  SELECT d.a, d.b,
       |    CAST(d.dot AS DOUBLE) /
       |      (sqrt(CAST(qa.nn AS DOUBLE)) * sqrt(CAST(qb.nn AS DOUBLE))) AS cos
       |  FROM dots d
       |  JOIN norms qa ON qa.vec_id = d.a JOIN norms qb ON qb.vec_id = d.b)"""
      .stripMargin

  /** The embedding pair-report oracle — shared verbatim by the
    * single-store (`q_dedup_embcos`) and federated
    * (`q_dedup_embcos_fed`) forms: the federated pair report must be
    * evidence-indistinguishable from one store over the union corpus,
    * exact cosines included. */
  private[queries] def embcosPairsOracleSql: String =
    s"""WITH ${embcosPairsSql("embeddings")}
       |SELECT a, b, cos FROM cpairs WHERE cos >= 0.2
       |ORDER BY a, b""".stripMargin

  /** The embedding-clustering oracle — shared verbatim by the
    * single-store (`q_embcos_cluster`) and federated (`q_embcos_fed`)
    * forms, the [[contaminationSql]] pattern: a federated merge is
    * proven by being evidence-indistinguishable from one store over
    * the union corpus, labels included (the merge's canonical rep per
    * content is the global min rid, and CC labels are min-reachable —
    * both exactly the single-store definitions). */
  private[queries] def embcosClusterOracleSql: String =
    s"""WITH RECURSIVE g AS (
       |  SELECT MIN(vec_id) AS vec_id, embedding
       |  FROM embeddings GROUP BY embedding),
       |${embcosPairsSql("g")},
       |edges AS (
       |  SELECT a AS src, b AS dst FROM cpairs WHERE cos >= 0.2
       |  UNION SELECT b AS src, a AS dst FROM cpairs WHERE cos >= 0.2),
       |cc(id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst),
       |repc AS (SELECT id, MIN(lbl) AS cluster FROM cc GROUP BY id),
       |rep AS (
       |  SELECT e.vec_id, g.vec_id AS rid
       |  FROM embeddings e JOIN g ON g.embedding = e.embedding),
       |clusters AS (
       |  SELECT r.vec_id, COALESCE(c.cluster, r.rid) AS cluster
       |  FROM rep r LEFT JOIN repc c ON c.id = r.rid)
       |SELECT vec_id, cluster,
       |  CAST(vec_id = cluster AS BIGINT) AS is_canonical
       |FROM clusters ORDER BY vec_id""".stripMargin
}
