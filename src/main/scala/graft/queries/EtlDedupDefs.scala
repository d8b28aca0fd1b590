package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Deduplication queries: exact, MinHash+LSH (clustering, keep,
  * soft weights, incremental, federated), SimHash, n-gram Jaccard,
  * winnowing fingerprints.
  *
  * One slice of [[EtlQueries.defs]] — the registry, fixtures, memo
  * machinery and shared helpers all live on [[EtlQueries]]; this trait
  * only contributes its family's `QueryDef` entries (split per the
  * round-16 review: one 4.3k-line file hides boundary bugs). */
private[queries] trait EtlDedupDefs { this: EtlQueries.type =>

  private[queries] lazy val dedupDefs: Map[String, QueryDef] = Map(

    // ---- Deduplication ------------------------------------------------

    // Exact dedup: content-hash groupBy; per-source duplicate accounting.
    "q_dedup_exact" -> QueryDef(
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
         |  CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dups
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text").cast("binary"))).as("n_distinct"),
          (count(lit(1)) - countDistinct(md5(col("text").cast("binary")))).as("n_dups"))
        .orderBy("source")
    },

    // MinHash + LSH near-dup candidates: shingle → ONE md5 → 16
    // 2-universal integer lanes (Broder-style (a·h1 + b·h2 + c) mod P,
    // fixed LCG-derived coefficients) → 4 bands of 4 lanes → bucket
    // self-join on the integer lane tuple. One digest per shingle where
    // the first cut computed four, and the band key is 4 longs instead
    // of an md5-of-concat string — the hash volume, not the single
    // shuffle, dominated this query's cost. Everything stays exact
    // int64 (products < 2^53), so DuckDB reproduces it bit-for-bit.
    "q_dedup_minhash" -> QueryDef(
      s"""WITH ${minhashPairsSql("documents")}
         |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin) { (s, dir) =>
      // Identical texts have identical lane minima, so band buckets —
      // and therefore the PAIR SET — factor through distinct texts:
      // hash/band work runs once per distinct text, and the full pair
      // set is recovered by expansion (cross pairs via the rep pair ×
      // both member sets; intra pairs for any text that shingles at
      // all, since it shares every band with its copies). Identical
      // output to banding the raw corpus — the oracle still does — at
      // hash cost ∝ distinct content + output size, where the direct
      // form re-hashed every duplicate (93 s vs ~10 s at the 100×
      // duplicate-heavy replica, SCALE.md). Group/join keys are the
      // 16-byte content digest, never the raw text; the groups and
      // the candidate graph are the fixture-memoized frames every
      // dedup consumer shares.
      val g = distinctGroups(s, dir)
      val shingly = g.filter(length(col("text")) >= ShingleLen)
        .select(col("rid"))
      expandPairs(groupMembers(s, dir), corpusBandPairs(s, dir), shingly)
        .orderBy("a", "b")
    },

    // Replication-invariant MinHash: collapse bit-identical texts to a
    // representative (min doc_id) + multiplicity, then the IDENTICAL
    // lane/band pipeline over representatives only. Pair emission over
    // a duplicate-heavy corpus is output-bound (k copies → k²/2 pairs
    // per group — a crawled corpus at 100× replication put
    // q_dedup_minhash at 92.5 s, SCALE.md round-7); this form's LSH
    // join sees each distinct text once, so its cost and result are
    // invariant under duplication and the counts carry the rest.
    "q_dedup_minhash_rep" -> QueryDef(
      s"""WITH g AS (
         |  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n, text
         |  FROM documents GROUP BY text),
         |${minhashPairsSql("g")}
         |SELECT p.a, p.b, ga.n AS na, gb.n AS nb
         |FROM pairs p
         |JOIN g ga ON ga.doc_id = p.a JOIN g gb ON gb.doc_id = p.b
         |ORDER BY p.a, p.b""".stripMargin) { (s, dir) =>
      val g = distinctGroups(s, dir)
      corpusBandPairs(s, dir)
        .join(g.select(col("rid").as("a"), col("nm").as("na")), "a")
        .join(g.select(col("rid").as("b"), col("nm").as("nb")), "b")
        .select("a", "b", "na", "nb").orderBy("a", "b")
    },

    // Dedup clustering — the step a real pipeline ACTS on: connected
    // components over the rep-level MinHash candidate graph, every doc
    // labeled with its cluster (min doc_id in the component, through
    // exact-duplicate membership) and a keep/drop canonical flag.
    // Spark side: graft.etl.Dedup.connectedComponents — iterative
    // min-label propagation, one join + one groupBy per round,
    // O(cluster diameter) rounds (near-dup clusters are shallow), no
    // corpus-wide collect. The oracle reproduces the fixpoint with a
    // recursive CTE (reachability set → MIN label), which is exact at
    // fixture scale.
    "q_dedup_cluster" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql
         |SELECT doc_id, cluster,
         |  CAST(doc_id = cluster AS BIGINT) AS is_canonical
         |FROM clusters ORDER BY doc_id""".stripMargin) { (s, dir) =>
      dedupClusters(s, dir)
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster")).cast("long"))
        .orderBy("doc_id")
    },

    // Canonical selection over the dedup clusters: the keep/drop
    // decision a pipeline executes — per cluster, KEEP the longest
    // member (the standard near-dup heuristic: the longest variant
    // subsumes its truncations), ties to the smallest doc_id. One
    // window over the cluster assignment; skew is bounded by duplicate
    // group size, and a cluster's members already co-locate on the
    // cluster key.
    "q_dedup_keep" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql
         |SELECT c.doc_id, c.cluster,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY c.cluster
         |    ORDER BY length(d.text) DESC, c.doc_id) = 1 AS BIGINT) AS keep
         |FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
         |ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("len").desc, col("doc_id").asc)
      dedupClusters(s, dir)
        .join(docs(s, dir)
          .select(col("doc_id"), length(col("text")).as("len")), "doc_id")
        .withColumn("keep", (row_number().over(w) === 1).cast("long"))
        .select("doc_id", "cluster", "keep")
        .orderBy("doc_id")
    },

    // Eval-set contamination: corpus docs whose distinct RARE-8-gram
    // set contains ≥ 15% of some probe ("eval") doc's rare grams — the
    // containment check a training pipeline runs against its benchmark
    // suites before training (real checks run 8-13-gram containment;
    // the threshold is the tunable). The probe set here is the
    // deterministic doc_id % 97 slice standing in for an eval suite. Distinct-
    // factored: gram sets are computed once per distinct text (keyed by
    // the content digest) and doc-level hits expand through the member
    // maps; at corpus scale the probe side is a small broadcastable
    // relation (eval suites are thousands of docs), and top-frequency
    // "stopword" grams would be dropped before the join to bound key
    // skew — the fixture's gram distribution doesn't need it.
    "q_contamination" -> QueryDef(contaminationSql) { (s, dir) =>
      contaminationReport(s, dir, contamPostings(s, dir), "single")
    },

    // FEDERATED contamination: the same probe report computed from TWO
    // member decontamination indexes (doc_id-parity split) merged by
    // ContamState.federatedLivePostings — the merge must serve the
    // exact evidence a single store over the union corpus holds, so
    // the oracle is q_contamination's, VERBATIM.
    "q_contam_fed" -> QueryDef(contaminationSql) { (s, dir) =>
      contaminationReport(s, dir, fedContamPostings(s, dir), "fed")
    },


    // Cross-source overlap matrix — which sources copy from each
    // other, the provenance audit that decides whether dedup must run
    // ACROSS source boundaries before mixing. Shared-rare-gram counts
    // per source pair over the SAME df-capped index q_contamination
    // probes (one build, memoized): the pair join is keyed on the
    // gram, and the df cap bounds each gram's fan-out to ≤ cap
    // sources, so the matrix costs Σ_g df_g² ≤ cap · |vocab| — linear
    // in the gram vocabulary, never sources × corpus. Overlap ratio =
    // shared / min(|A|, |B|) (exact ints + one IEEE division).
    "q_source_overlap" -> QueryDef(
      s"""WITH tg AS (
         |  SELECT DISTINCT text, substr(text, CAST(p AS INTEGER), 8) AS g
         |  FROM documents, generate_series(1, $MaxPos, 2) AS s(p)
         |  WHERE p <= length(text) - 7),
         |rare AS (SELECT g FROM tg GROUP BY g HAVING COUNT(*) <= $ContamDfCap),
         |sg AS (
         |  SELECT DISTINCT d.source, t.g
         |  FROM tg t JOIN rare ON rare.g = t.g
         |  JOIN documents d ON d.text = t.text),
         |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM sg GROUP BY source),
         |ov AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS shared
         |  FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
         |  GROUP BY a.source, b.source)
         |SELECT ov.src_a, ov.src_b, ov.shared, za.nv AS na, zb.nv AS nb,
         |  CAST(ov.shared AS DOUBLE) / LEAST(za.nv, zb.nv) AS overlap
         |FROM ov
         |JOIN sz za ON za.source = ov.src_a
         |JOIN sz zb ON zb.source = ov.src_b
         |ORDER BY src_a, src_b""".stripMargin) { (s, dir) =>
      // sources × rare-gram vocab — memoized per corpus (built once at
      // index time with the postings it derives from); the query pays
      // only the pair join, never a per-run disk checkpoint
      val sg = sourceGrams(s, dir)
      val sz = sg.groupBy("source").agg(count(lit(1)).as("nv"))
      sg.select(col("source").as("src_a"), col("g"))
        .join(sg.select(col("source").as("src_b"), col("g")), "g")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
        .join(broadcast(sz.select(col("source").as("src_a"),
          col("nv").as("na"))), "src_a")
        .join(broadcast(sz.select(col("source").as("src_b"),
          col("nv").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("shared"), col("na"), col("nb"),
          (col("shared").cast("double") / least(col("na"), col("nb")))
            .as("overlap"))
        .orderBy("src_a", "src_b")
    },

    // Per-source duplication report: the mixing-decision statistic
    // that tells a pipeline WHERE its duplication lives — per source,
    // the exact-duplicate surplus (docs minus distinct texts) and the
    // near-duplicate exposure (docs whose MinHash cluster has ≥ 2
    // members corpus-wide). Reads the shared memoized distinct-group
    // and cluster-assignment frames; adds two joins and one aggregate.
    "q_dup_report" -> QueryDef(
      s"""WITH RECURSIVE ${clusterCteSql},
         |csz AS (
         |  SELECT cluster, COUNT(*) AS csz FROM clusters GROUP BY cluster),
         |j AS (
         |  SELECT d.source, d.text, s.csz
         |  FROM documents d
         |  JOIN clusters c ON c.doc_id = d.doc_id
         |  JOIN csz s ON s.cluster = c.cluster)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct,
         |  CAST(SUM(CASE WHEN csz >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
         |  CAST(COUNT(*) - COUNT(DISTINCT text) AS DOUBLE) / COUNT(*) AS exact_ratio,
         |  CAST(SUM(CASE WHEN csz >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         |    AS near_ratio
         |FROM j GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val cl = dedupClusters(s, dir)
      // cluster sizes are DOC-level member counts (dedupClusters emits one
      // row per doc): a pure exact-duplicate group has csz >= 2 with no
      // near-dup edge, so n_neardup counts docs whose content is shared,
      // exactly or nearly. Co-partitioned equi-join, deliberately NOT
      // broadcast (too big at corpus scale).
      val csz = cl.groupBy("cluster").agg(count(lit(1)).as("csz"))
      docKeys(s, dir).select("doc_id", "source", "k")
        .join(cl, "doc_id")
        .join(csz, "cluster")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("k").as("n_distinct"),
          sum(when(col("csz") >= 2, 1L).otherwise(0L)).as("n_neardup"))
        .select(col("source"), col("n_docs"), col("n_distinct"), col("n_neardup"),
          ((col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"))
            .as("exact_ratio"),
          (col("n_neardup").cast("double") / col("n_docs")).as("near_ratio"))
        .orderBy("source")
    },

    // SOFT dedup: instead of dropping near-duplicates, weight each doc
    // by the inverse of its cluster's size (the "count each content
    // once" correction from the dedup literature — repeated content
    // contributes one document's worth of gradient split across its
    // copies). Weights are integer MICRO-docs (1e6 div csz) so the
    // per-source sum is an exact order-independent integer — a double
    // 1/csz sum would be partition-order dependent. Reads the shared
    // memoized cluster assignment; one broadcast-free equi-join chain.
    "q_softdedup_weights" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql,
         |csz AS (
         |  SELECT cluster, COUNT(*) AS csz FROM clusters GROUP BY cluster)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(1000000 // s.csz) AS BIGINT) AS eff_microdocs,
         |  CAST(SUM(1000000 // s.csz) AS DOUBLE) / (COUNT(*) * 1000000)
         |    AS eff_ratio
         |FROM documents d
         |JOIN clusters c ON c.doc_id = d.doc_id
         |JOIN csz s ON s.cluster = c.cluster
         |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, dir) =>
      val cl = dedupClusters(s, dir)
      val csz = cl.groupBy("cluster").agg(count(lit(1)).as("csz"))
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(cl, "doc_id")
        .join(csz, "cluster")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("1000000 div csz")).as("eff_microdocs"))
        .select(col("source"), col("n_docs"), col("eff_microdocs"),
          (col("eff_microdocs").cast("double") /
            (col("n_docs") * lit(1000000L))).as("eff_ratio"))
        .orderBy("source")
    },

    // Stratified deterministic sampling — corpus mixing by language
    // with per-stratum rates (down-weight the dominant language), the
    // reproducible-sample primitive every training-data pipeline needs:
    // the keep decision is a pure hash of (doc_id, text), so the same
    // sample falls out on any engine, any partitioning, any run. Pure
    // map-side filter: no shuffle, no state, scales with the scan.
    "q_corpus_sample" -> QueryDef(
      s"""SELECT doc_id, lang,
         |  CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8) AS BIGINT) % 100 AS BIGINT) AS bucket
         |FROM documents
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 8) AS BIGINT) % 100
         |      < CASE WHEN lang = 'en' THEN 20 ELSE 50 END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bucket = pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("text")).cast("binary")), 1, 8), 16, 10).cast("long"),
        lit(100))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"))
        .filter(col("bucket") <
          when(col("lang") === "en", 20).otherwise(50))
        .orderBy("doc_id")
    },

    // SimHash: 16-bit signature; bit j votes from a hex digit of each
    // feature's md5 (parity of the digit's value).
    "q_dedup_simhash" -> QueryDef(
      s"""WITH shingles AS (
         |${shinglesSql()}),
         |bits AS (
         |  SELECT doc_id, j.j,
         |    SUM(CASE WHEN (strpos('0123456789abcdef',
         |          substr(md5(sh), CAST(j.j + 1 AS INTEGER), 1)) - 1) % 2 = 1
         |        THEN 1 ELSE -1 END) AS vote
         |  FROM shingles, generate_series(0, 15) AS j(j)
         |  GROUP BY doc_id, j.j)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // One shuffle: the 16 bit-position votes are 16 agg columns of a
      // single groupBy(doc_id) over the distinct-shingle set (votes are
      // per distinct feature, so distinct matters here, unlike minhash).
      // The signature is a pure function of the text → computed once
      // per distinct text.
      perDistinctText(s, dir) { reps =>
        val sh = shinglesOf(reps)
          .select(col("doc_id"), md5(col("sh").cast("binary")).as("h"))
        val votes = (0 until 16).map(j =>
          sum(when((instr(lit("0123456789abcdef"),
              substring(col("h"), j + 1, 1)) - 1) % 2 === 1, 1L)
            .otherwise(-1L)).as(s"v$j"))
        sh.groupBy("doc_id").agg(votes.head, votes.tail: _*)
          .select(col("doc_id"),
            (0 until 16).map(j => when(col(s"v$j") > 0, 1L << j).otherwise(0L))
              .reduce(_ + _).cast("long").as("simhash"))
      }.orderBy("doc_id")
    },

    // n-gram Jaccard on a doc subset: exact integer |A∩B| and |A∪B| per
    // pair (no float), via equality join of distinct 4-gram sets.
    "q_ngram_jaccard" -> QueryDef(
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 4) AS g
         |  FROM documents, generate_series(1, $MaxPos, 2) AS s(p)
         |  WHERE p <= length(text) - 3 AND doc_id < 40),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS nab
         |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT i.a, i.b, CAST(i.nab AS BIGINT) AS jac_num,
         |  CAST(sa.n + sb.n - i.nab AS BIGINT) AS jac_den
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
         |WHERE i.nab * 4 >= sa.n + sb.n - i.nab
         |ORDER BY i.a, i.b""".stripMargin) { (s, dir) =>
      val grams = docs(s, dir).filter(col("doc_id") < 40 && length(col("text")) >= 4)
        .select(col("doc_id"), col("text"),
          // cap mirrors the oracle's generate_series(1, MaxPos, 2)
          explode(sequence(lit(1),
            least(length(col("text")) - 3, lit(MaxPos)), lit(2))).as("p"))
        .select(col("doc_id"), expr("substring(text, p, 4)").as("g"))
        .distinct()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = grams.select(col("doc_id").as("a"), col("g"))
        .join(grams.select(col("doc_id").as("b"), col("g")), "g")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      inter
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .filter(col("nab") * 4 >= col("na") + col("nb") - col("nab"))
        .select(col("a"), col("b"), col("nab").as("jac_num"),
          (col("na") + col("nb") - col("nab")).as("jac_den"))
        .orderBy("a", "b")
    },

    // The corpus-scale Jaccard form the audit table promises: exact
    // 4-gram |A∩B| / |A∪B| computed ONLY for banded MinHash candidate
    // pairs over the WHOLE corpus (q_ngram_jaccard's bounded-subset
    // equality join would go quadratic on hot grams), reported at the
    // same ≥1/4 threshold. Distinct-factored end to end: banding,
    // gram sets, and the Jaccard itself are text functions, so rep
    // pairs carry their (jac_num, jac_den) through the expansion and
    // intra pairs of identical texts are J = 1 (n, n) by construction.
    "q_ngram_jaccard_lsh" -> QueryDef(
      s"""WITH ${minhashPairsSql("documents")},
         |grams AS (
         |  SELECT DISTINCT doc_id, substr(text, CAST(p AS INTEGER), 4) AS g
         |  FROM documents, generate_series(1, $MaxPos, 2) AS s2(p)
         |  WHERE p <= length(text) - 3),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
         |inter AS (
         |  SELECT pr.a, pr.b, COUNT(*) AS nab
         |  FROM pairs pr
         |  JOIN grams ga ON ga.doc_id = pr.a
         |  JOIN grams gb ON gb.doc_id = pr.b AND gb.g = ga.g
         |  GROUP BY pr.a, pr.b)
         |SELECT i.a, i.b, CAST(i.nab AS BIGINT) AS jac_num,
         |  CAST(sa.n + sb.n - i.nab AS BIGINT) AS jac_den
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b
         |WHERE i.nab * 4 >= sa.n + sb.n - i.nab
         |ORDER BY i.a, i.b""".stripMargin) { (s, dir) =>
      // served from the PERSISTED dedup store: every candidate pair was
      // stored WITH its exact 4-gram Jaccard at pair-emission time
      // ([[graft.etl.DedupState]] `gramsOf` — a pure function of the
      // two contents, priced once per pair ever), so the corpus report
      // is a READ of the pair index + the duplicate-group expansion.
      // No gram is shingled, joined, or intersected at query time —
      // the round-13 form re-read and re-intersected a gram store per
      // invocation, a measured 2× regression.
      val st = incrDedupState(s, dir)
      val members = storeMembers(s, dir)
      val repJac = st.livePairStats()
        .filter(col("jac_num") * 4 >= col("jac_den"))
      // identical texts: A = B, so J = 1 exactly — (n, n) per
      // duplicate group whose content banded at all (the oracle's
      // intra pairs exist iff the content produced band buckets);
      // both the gram-set size and the banded-at-all gate come from
      // the store's per-rep summary (fsizes) — the band index itself
      // is never read here
      val nm = members.groupBy("rid").agg(count(lit(1)).as("nm"))
      val intraCarry = st.featSizes().filter(col("nb") > 0)
        .join(nm.filter(col("nm") >= 2), Seq("rid"), "left_semi")
        .select(col("rid"), col("n").as("jac_num"), col("n").as("jac_den"))
      expandPairs(members, repPairs = repJac, intraCarry = intraCarry)
        .orderBy("a", "b")
    },

    // LSH accuracy report: for every banded candidate pair, the
    // MinHash ESTIMATE (equal lanes / 16) against the EXACT shingle-set
    // Jaccard it estimates, with an integer milli-error — the
    // measure-don't-guess loop for tuning lanes/bands/threshold at
    // corpus scale. Reads the memoized signature matrix and candidate
    // graph; adds only the shingle-set intersection of candidate reps
    // (output-bounded). err_milli = |est − exact|·1000 truncated: the
    // numerator is non-negative, so Spark's `div` (toward zero) and
    // DuckDB's `//` (floor) agree.
    "q_minhash_acc" -> QueryDef({
      val nEqSql = (0 until NumHashes)
        .map(i => s"CASE WHEN ma.l$i = mb.l$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH g AS (
         |  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |${minhashPairsSql("g")},
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
         |inter AS (
         |  SELECT p.a, p.b, COUNT(*) AS nab
         |  FROM pairs p
         |  JOIN shingles x ON x.doc_id = p.a
         |  JOIN shingles y ON y.doc_id = p.b AND y.sh = x.sh
         |  GROUP BY p.a, p.b),
         |eq AS (
         |  SELECT p.a, p.b, $nEqSql AS n_eq
         |  FROM pairs p JOIN mh ma ON ma.doc_id = p.a
         |  JOIN mh mb ON mb.doc_id = p.b)
         |SELECT e.a, e.b, CAST(e.n_eq AS BIGINT) AS n_eq,
         |  CAST(COALESCE(i.nab, 0) AS BIGINT) AS jac_num,
         |  CAST(sa.n + sb.n - COALESCE(i.nab, 0) AS BIGINT) AS jac_den,
         |  CAST(abs(e.n_eq * (sa.n + sb.n - COALESCE(i.nab, 0))
         |           - $NumHashes * COALESCE(i.nab, 0)) * 1000
         |    // ($NumHashes * (sa.n + sb.n - COALESCE(i.nab, 0))) AS BIGINT)
         |    AS err_milli
         |FROM eq e
         |LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
         |JOIN sizes sa ON sa.doc_id = e.a
         |JOIN sizes sb ON sb.doc_id = e.b
         |ORDER BY e.a, e.b""".stripMargin
    }) { (s, dir) =>
      val pairs = corpusBandPairs(s, dir)
      val sig = repSignatures(s, dir)
      val sa = sig.select(col("doc_id").as("a") +:
        (0 until NumHashes).map(i => col(s"l$i").as(s"la$i")): _*)
      val sb = sig.select(col("doc_id").as("b") +:
        (0 until NumHashes).map(i => col(s"l$i").as(s"lb$i")): _*)
      val nEq = (0 until NumHashes)
        .map(i => when(col(s"la$i") === col(s"lb$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      // exact shingle-set sizes/intersection priced for candidate reps
      // only (the same left-semi trim the corpus Jaccard uses); the
      // frame is corpus-memoized ([[minhashAccShingles]]) — one
      // materialization per corpus, not one disk write per run
      val sh = minhashAccShingles(s, dir)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh.select(col("doc_id").as("a"), col("sh")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
        .groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val uni = col("na") + col("nb") - col("nab")
      pairs
        .join(sa, "a").join(sb, "b")
        .withColumn("n_eq", nEq)
        .join(inter, Seq("a", "b"), "left_outer")
        .na.fill(0L, Seq("nab"))
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"), col("n_eq"),
          col("nab").as("jac_num"), uni.as("jac_den"),
          expr(s"abs(n_eq * (na + nb - nab) - $NumHashes * nab) * 1000" +
            s" div ($NumHashes * (na + nb - nab))").as("err_milli"))
        .orderBy("a", "b")
    },
  )

  // ---- family helpers: winnow, minhash/LSH bands, clustering, incremental stores ----

  /** Winnowing fingerprint-index df cap and the shared-fingerprint
    * report bar: a fingerprint hash present in more distinct texts
    * than the cap is boilerplate (dominates the match join, carries no
    * pair evidence — the ContamDfCap argument; this synthetic corpus
    * recombines a small phrase pool, so its fingerprint df tail is far
    * heavier than real prose and the cap sits low). Measured at
    * sf0.01: cap 10 bounds the index to 6.4k rows and the join to 10k
    * grouped pairs; bar 5 reports the top ~0.2%. */
  private[graft] lazy val WinnowDfCap = 10
  private[queries] lazy val WinnowMinShared = 5

  /** DuckDB CTE chain for the winnowing selection (grams → windowed
    * rightmost-min keys → distinct `sel(doc_id, sel)`), mirror of
    * [[winnowKeysOf]]. Callers may retarget the source table by
    * replacing `FROM documents`. */
  private[queries] lazy val winnowSelSql: String =
    s"""grams AS (
       |  SELECT doc_id, g.p AS p,
       |    CAST('0x' || substr(md5(substr(text, CAST(g.p AS INTEGER), 8)), 1, 8)
       |      AS BIGINT) AS h
       |  FROM documents, generate_series(1, $MaxPos) AS g(p)
       |  WHERE g.p <= LEAST(length(text) - 7, $MaxPos)),
       |wins AS (
       |  SELECT doc_id, p,
       |    MIN(h * 4096 + (4096 - p)) OVER (
       |      PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
       |  FROM grams),
       |sel AS (SELECT DISTINCT doc_id, sel FROM wins WHERE p >= 8)""".stripMargin

  /** The winnowing selection over (doc_id, text) rows: distinct
    * (doc_id, sel) keys, sel = h·4096 + (4096 − p) — the rightmost-min
    * tie rule encoded in the key so one windowed MIN does the whole
    * selection. Shared by the per-doc sketch report and the match
    * step. */
  private[queries] def winnowKeysOf(reps: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    reps
      // < 8 grams (len < 15) can fill no window — absent, as in the
      // oracle's p >= 8 guard
      .filter(length(col("text")) >= 15)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - 7, lit(MaxPos)))).as("p"))
      .select(col("doc_id"), col("p"),
        conv(substring(md5(expr("substring(text, p, 8)").cast("binary")),
          1, 8), 16, 10).cast("long").as("h"))
      .withColumn("sel", min(col("h") * 4096L + (lit(4096L) - col("p")))
        .over(W.partitionBy("doc_id").orderBy("p").rowsBetween(-7, 0)))
      .filter(col("p") >= 8)
      .select("doc_id", "sel").distinct()
  }

  /** The PERSISTED winnowing-selection store: (k, sel) per distinct
    * text — a pure per-content derivation (the windowed-MIN sketch),
    * so it appends at batch cost like the word/trigram stores. The
    * fingerprint df cap stays READ-side (it is a corpus fact over the
    * index, index-sized to recompute), but the expensive part — the
    * per-position hash scan + windowed MIN over every distinct text —
    * is priced once per content key, ever. */
  private[queries] lazy val winnowStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DerivedState]
  private[queries] def winnowState(s: SparkSession, dir: String)
      : graft.etl.DerivedState =
    contentStore(winnowStateMemo, s, dir, "winnow",
      s"winnow:w8:k8:maxpos=$MaxPos", (rows, _) =>
        winnowKeysOf(rows.select(col("k").as("doc_id"), col("text")))
          .select(col("doc_id").as("k"), col("sel")))
  /** Winnow FINGERPRINT bands over (doc_id, text) — bkey = sel div
    * 4096 (the hash without the position tie-break), one band row per
    * distinct fingerprint per doc: pure per-content, so the winnow
    * match step can live in a [[graft.etl.DedupState]] with the df cap
    * as the store's bucket cap. The FROM-TEXT definition — specs pin
    * [[winnowStoreBandsOf]] against it. */
  private[graft] def winnowBandsOf(src: DataFrame): DataFrame =
    winnowKeysOf(src)
      .select(col("doc_id"),
        expr("sel div 4096").cast("string").as("bkey"))
      .distinct()

  /** [[winnowBandsOf]] served from the PERSISTED winnow selection
    * store instead of re-winnowing the batch's text: the selections
    * are a pure per-content derivation the [[winnowState]] fold
    * already paid (per-position hash scan + windowed MIN), so the
    * match store's banding is a content-key LOOKUP — the
    * [[fixtureBandsOf]] move, at fold-orchestration level. Docs
    * shorter than the window (no selections in the store) band to
    * nothing, exactly as the from-text path's length guard. Total for
    * any batch whose content the selection store has absorbed — true
    * here by fixture construction and in production by folding the
    * selection store first (the orchestration ORDER contract);
    * FactoredEquivalenceSpec pins store-fed == from-text. */
  private[queries] def winnowStoreBandsOf(s: SparkSession, dir: String)
      : DataFrame => DataFrame = src =>
    src.select(col("doc_id"), textKey.as("k"))
      .join(winnowState(s, dir).derived(), "k")
      .select(col("doc_id"),
        expr("sel div 4096").cast("string").as("bkey"))
      .distinct()

  /** The PERSISTED winnow-match store: the fingerprint df cap
    * (WinnowDfCap) is the bucket cap, so boilerplate fingerprints
    * drop — retroactively, as the corpus grows — and the pair index's
    * live provenance rows ARE the match counts
    * ([[graft.etl.DedupState.livePairCounts]]): n_shared folds at
    * batch cost and un-counts when a fingerprint crosses the cap.
    * Third banding family on the one store (MinHash text bands,
    * hyperplane embedding bands, winnow fingerprints); banding is fed
    * from the winnow SELECTION store ([[winnowStoreBandsOf]]), so the
    * winnowing scan is priced once across both stores. */
  private[queries] lazy val winnowPairStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DedupState]
  private[queries] def winnowPairState(s: SparkSession, dir: String)
      : graft.etl.DedupState =
    fixtureMemo(winnowPairStateMemo, s, dir) {
      durableStore(s, dir, "winnow_pairs",
        s"winnow:w8:k8:cap=$WinnowDfCap")(root =>
        new graft.etl.DedupState(s, root,
          bandsOf = winnowStoreBandsOf(s, dir),
          maxBucket = Some(WinnowDfCap.toLong))) { st =>
        st.update(docs(s, dir).select(col("doc_id"), col("text")))
      }
    }

  /** The FEDERATED winnow-match store: two member match stores
    * (doc_id-parity split — identical content lands reps in BOTH
    * members, exercising the canonical-rid collapse) folded into one
    * [[graft.etl.FedDedupState]], third banding family on the one
    * federation mechanism (MinHash text bands, hyperplane embedding
    * bands, winnow fingerprints). The read is
    * [[graft.etl.FedDedupState.livePairCounts]]: distinct (canonical
    * pair, fingerprint) provenance — exactly the single match store's
    * n_shared, which is what `q_winnow_fed` serving the q_winnow_pairs
    * oracle VERBATIM proves (FedStateSpec pins staged folds ==
    * one-shot on the winnow family). Banding is fed from the shared
    * winnow SELECTION store, so the per-position hash scan is still
    * priced once per distinct text across all three stores. */
  private[queries] lazy val winnowFedStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.FedDedupState]
  private[queries] def winnowFedState(s: SparkSession, dir: String)
      : graft.etl.FedDedupState =
    fixtureMemo(winnowFedStateMemo, s, dir) {
      durableStore(s, dir, "fed_winnow",
        s"winnow:w8:k8:cap=$WinnowDfCap:parity") { root =>
        def member(sub: String) = new graft.etl.DedupState(s, s"$root/$sub",
          bandsOf = winnowStoreBandsOf(s, dir),
          maxBucket = Some(WinnowDfCap.toLong))
        new graft.etl.FedDedupState(s, s"$root/merge",
          Seq(member("a"), member("b")))
      } { fed =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(d.filter(col("doc_id") % 2 === 0)),
          b.update(d.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
    }

  /** The winnow selections re-keyed to rep ids — (doc_id = rid, sel) —
    * shared by the sketch report and the match step. */
  private[queries] lazy val winnowSelMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def winnowSelSet(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(winnowSelMemo, s, dir) {
      winnowState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        .select(col("rid").as("doc_id"), col("sel"))
        .memoCheckpoint()
    }


  /** FEDERATED dedup clusters of the fixture corpus: two member
    * [[graft.etl.DedupState]]s split by doc_id parity (so identical
    * content lands reps in BOTH members — the star-edge collapse is
    * exercised), folded into a PERSISTED incremental federation store
    * ([[graft.etl.FedDedupState]]) and served as a read of its
    * converged labels — the production shape, where a JDBC view
    * refresh reads the fold instead of re-running the ∝-corpus merge.
    * Must equal the one-shot full-corpus clustering, which is exactly
    * what the q_dedup_fed oracle checks (FedStateSpec pins the
    * store == one-shot-merge equivalence on staged schedules). */
  private[queries] lazy val fedClustersMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def fedDocClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(fedClustersMemo, s, dir) {
      val fed = durableStore(s, dir, "fed_dedup", "minhash16x4:parity") {
        root =>
          val bandsOf = fixtureBandsOf(s, dir)
          val a = new graft.etl.DedupState(s, s"$root/a", bandsOf)
          val b = new graft.etl.DedupState(s, s"$root/b", bandsOf)
          new graft.etl.FedDedupState(s, s"$root/merge", Seq(a, b))
      } { fed =>
        val d = docs(s, dir).select(col("doc_id"), col("text"))
        val Seq(a, b) = fed.memberStores
        inParallel(
          a.update(d.filter(col("doc_id") % 2 === 0)),
          b.update(d.filter(col("doc_id") % 2 === 1)))
        fed.fold()
      }
      fed.docClusters().memoCheckpoint()
    }

  /** Plan-guardrail probe ([[graft.queries.PlanSpec]]): the banding
    * pipeline over an arbitrary (doc_id, text) frame, BYPASSING the
    * fixture memo — the memoized frames are materialized RDD scans, so
    * asserting plan shape on the consumers alone would assert nothing
    * about the pipeline that builds them. */
  private[queries] def bandPairsPipeline(src: DataFrame): DataFrame =
    minhashBandPairs(src)

  /** Same probe for the embedding-cosine candidate pipeline (memo
    * bypass; see [[bandPairsPipeline]]). */
  private[queries] def embCosPipeline(base: DataFrame): DataFrame =
    cosinePairs(base, threshold = 0.2)

  /** The 16-lane/4-band MinHash candidate pairs over `src`
    * (doc_id, text) — ONE implementation shared by the pair and
    * representative forms (and mirrored term-for-term by
    * [[minhashPairsSql]]); a tuning change must touch exactly one
    * Spark pipeline and one SQL builder. */
  private[queries] def minhashBandPairs(src: DataFrame): DataFrame =
    bandPairsFromSignatures(minhashSignatures(src))

  /** The per-doc 16-lane MinHash signature matrix over `src`
    * (doc_id, text) — the shingle explode + per-shingle md5 behind it
    * is the most expensive scan of the dedup family, so the result is
    * materialized (17 longs per distinct doc) for its consumers: the
    * band self-join reads it twice, and the LSH accuracy report reads
    * the raw lanes again. */
  private[queries] def minhashSignatures(src: DataFrame): DataFrame = {
    val sh0 = shinglesOf(src, distinctShingles = false)
    val hs = sh0.select(col("doc_id"), md5(col("sh").cast("binary")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
    val aggs = laneCoef.zipWithIndex.map { case ((a, b, c), i) =>
      min((col("h1") * a + col("h2") * b + c) % LaneP).as(s"l$i")
    }
    hs.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .memoCheckpoint()
  }

  /** Band → bucket self-join over a signature matrix. */
  private[queries] def bandPairsFromSignatures(mh: DataFrame): DataFrame = {
    val bandCols = (0 until NumHashes / RowsPerBand).map { g =>
      struct(lit(g).as("band"),
        col(s"l${4 * g}").as("k0"), col(s"l${4 * g + 1}").as("k1"),
        col(s"l${4 * g + 2}").as("k2"), col(s"l${4 * g + 3}").as("k3"))
    }
    val keys = Seq("band", "k0", "k1", "k2", "k3")
    val bands = mh.select(col("doc_id"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("doc_id") +: keys.map(k => col(s"bs.$k").as(k)): _*)
    val a = bands.withColumnRenamed("doc_id", "a")
    val b = bands.withColumnRenamed("doc_id", "b")
    a.join(b, keys).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** The per-doc LSH band BUCKET keys of `src` (doc_id, text) — one
    * row per (doc, band) with `bkey` = md5 of the band's four lanes.
    * Co-membership in a bkey bucket is EXACTLY co-membership in a
    * (band, k0..k3) bucket of [[bandPairsFromSignatures]] (md5 makes
    * key collisions negligible at any corpus size), so a pairing built
    * from these buckets reproduces the global candidate graph. This is
    * the banding function [[graft.etl.DedupState]] persists: the
    * incremental store must speak the same signature scheme as the
    * one-shot pipeline or its components would diverge from the
    * oracle's. */
  private[graft] def bandKeys(src: DataFrame): DataFrame =
    bkeysFromSignatures(minhashSignatures(src))

  /** The band-key digest step of [[bandKeys]], separable so fixtures
    * that already hold the signature matrix ([[repSignatures]]) can
    * band without re-shingling. */
  private[queries] def bkeysFromSignatures(mh: DataFrame): DataFrame = {
    val bandCols = (0 until NumHashes / RowsPerBand).map { g =>
      md5(concat_ws(":", lit(g), col(s"l${4 * g}"), col(s"l${4 * g + 1}"),
        col(s"l${4 * g + 2}"), col(s"l${4 * g + 3}")).cast("binary"))
    }
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
  }

  /** The corpus band keys re-keyed by content digest — (k, bkey) —
    * derived from the MEMOIZED signature matrix (zero extra shingle
    * scans) and shared by every fixture [[graft.etl.DedupState]] via
    * [[fixtureBandsOf]]: the single-store and both federation-member
    * builds band the SAME corpus content, and a real deployment
    * likewise computes a content's signature once, whatever store it
    * lands in. The banding FUNCTION is unchanged ([[bandKeys]] term for
    * term), so the stores' bucket semantics are identical — specs keep
    * exercising the from-text path ([[bandKeys]] itself). */
  private[queries] lazy val bandKeyMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def repBandKeys(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(bandKeyMemo, s, dir) {
      bkeysFromSignatures(repSignatures(s, dir))
        .join(distinctGroups(s, dir).select(col("rid").as("doc_id"),
          col("k")), "doc_id")
        .select("k", "bkey")
        .memoCheckpoint()
    }

  /** Content-keyed lookup banding for fixture stores: joins the batch's
    * texts to [[repBandKeys]] through the content digest — every batch
    * a fixture store ingests is a subset of the fixture corpus, so the
    * lookup is total and exactly equals [[bandKeys]] on the batch. */
  private[queries] def fixtureBandsOf(s: SparkSession, dir: String)
      : DataFrame => DataFrame = src =>
    src.select(col("doc_id"), textKey.as("k"))
      .join(repBandKeys(s, dir), "k")
      .select("doc_id", "bkey")

  /** The distinct char-4-gram rows of `src` (doc_id, text) — stride 2,
    * [[MaxPos]] cap — the gram-feature function the fixture dedup store
    * persists pair-level Jaccard with ([[graft.etl.DedupState]]'s
    * `gramsOf`), and the same shingling `q_ngram_jaccard`'s oracle
    * mirrors with generate_series(1, MaxPos, 2). */
  private[graft] def gram4Of(src: DataFrame): DataFrame =
    src.filter(length(col("text")) >= 4)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          least(length(col("text")) - 3, lit(MaxPos)), lit(2))).as("p"))
      .select(col("doc_id"), expr("substring(text, p, 4)").as("g"))
      .distinct()

  /** The DuckDB mirror of [[minhashBandPairs]]: CTE chain
    * shingles→hs→mh→bands→pairs over `from` (doc_id, text). */
  private[queries] def minhashPairsSql(from: String): String =
    s"""shingles AS (
       |${shinglesSql(from = from)}),
       |hs AS (
       |  SELECT doc_id,
       |    CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS h1,
       |    CAST('0x' || substr(md5(sh), 9, 8) AS BIGINT) AS h2
       |  FROM shingles),
       |mh AS (
       |  SELECT doc_id,
       |$laneSqlExprs
       |  FROM hs GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, l0 AS k0, l1 AS k1, l2 AS k2, l3 AS k3 FROM mh
       |  UNION ALL SELECT doc_id, 1, l4, l5, l6, l7 FROM mh
       |  UNION ALL SELECT doc_id, 2, l8, l9, l10, l11 FROM mh
       |  UNION ALL SELECT doc_id, 3, l12, l13, l14, l15 FROM mh),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
       |    AND a.k2 = b.k2 AND a.k3 = b.k3 AND a.doc_id < b.doc_id)"""
      .stripMargin

  /** DuckDB CTE chain assigning every doc its dedup cluster (shared by
    * `q_dedup_cluster` and `q_dedup_keep`): distinct-text groups →
    * MinHash band pairs → undirected edges → recursive reachability
    * fixpoint → MIN-label per rep → `clusters(doc_id, cluster)`.
    * Callers prepend `WITH RECURSIVE`. */
  private[queries] def clusterCteSql: String =
    s"""g AS (
       |  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
       |${minhashPairsSql("g")},
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION SELECT b AS src, a AS dst FROM pairs),
       |cc(id, lbl) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, c.lbl FROM edges e JOIN cc c ON c.id = e.dst),
       |repc AS (SELECT id, MIN(lbl) AS cluster FROM cc GROUP BY id),
       |rep AS (
       |  SELECT d.doc_id, g.doc_id AS rid
       |  FROM documents d JOIN g ON g.text = d.text),
       |clusters AS (
       |  SELECT r.doc_id, COALESCE(c.cluster, r.rid) AS cluster
       |  FROM rep r LEFT JOIN repc c ON c.id = r.rid)""".stripMargin

  /** (doc_id, cluster) for every doc — the Spark mirror of
    * [[clusterCteSql]]: connected components
    * ([[graft.etl.Dedup.connectedComponents]] — iterative min-label
    * propagation, O(cluster diameter) rounds) over the rep-level
    * MinHash candidate graph, exact-duplicate members inheriting their
    * rep's component, singletons their own id.
    *
    * The CONVERGED assignment is memoized per (session, fixture): it
    * is the frame every downstream dedup action reads (clustering
    * report, keep-selection, and any future filter-by-cluster), and a
    * real pipeline materializes it exactly once — the iterative CC
    * fixpoint is far too expensive to re-derive per consumer. The
    * fixture tables are immutable for a run, so the memo needs no
    * invalidation; stopped sessions' entries are evicted on access
    * ([[fixtureMemo]]). */
  private[queries] lazy val clusterMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def dedupClusters(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(clusterMemo, s, dir) {
      val cc = graft.etl.Dedup.connectedComponents(corpusBandPairs(s, dir))
        .withColumnRenamed("id", "rid")
      groupMembers(s, dir).join(cc, Seq("rid"), "left_outer")
        .select(col("id").as("doc_id"),
          coalesce(col("cluster"), col("rid")).as("cluster"))
        // corpus-sized but two longs per row; every consumer reads it
        .memoCheckpoint()
    }

  /** The PERSISTED incremental dedup state for the fixture's
    * seen/incoming split ([[graft.etl.DedupState]]): initialized with
    * the src0-src9 half as version 1, folded forward with src10-src19
    * as version 2 — each update at cost proportional to its batch, the
    * shape a daily-crawl pipeline runs at 100 TB (the dedup analog of
    * the engine's commit-touched pyramid fold). Memoized per (session,
    * fixture) because the store is the long-lived artifact; its root
    * lives in a temp dir for the session. Uses the SAME banding
    * ([[bandKeys]]) as the memoized one-shot pipeline, so components
    * match the oracle's. */
  /** rep id → member doc_id map read from the PERSISTED dedup store
    * (members ⨝ seenKeys) — memoized with materialization for the same
    * reason as [[EtlQueries.groupMembers]]: the pair expansion reads
    * it four times per execution. */
  private[queries] lazy val storeMemberMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  private[queries] def storeMembers(s: SparkSession, dir: String): DataFrame =
    fixtureMemo(storeMemberMemo, s, dir) {
      val st = incrDedupState(s, dir)
      st.members().select("doc_id", "k")
        .join(st.seenKeys().select("k", "rid"), "k")
        .select(col("rid"), col("doc_id").as("id"))
        .memoCheckpoint()
    }

  private[queries] lazy val dedupStateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.etl.DedupState]
  private[graft] def incrDedupState(s: SparkSession, dir: String)
      : graft.etl.DedupState =
    fixtureMemo(dedupStateMemo, s, dir) {
      // lookup banding ([[fixtureBandsOf]] — the memoized signature
      // index, zero re-shingling) + gram features: the store persists
      // every candidate pair WITH its exact 4-gram Jaccard, so the
      // corpus similarity report (q_ngram_jaccard_lsh) is a read of
      // the pair index
      durableStore(s, dir, "dedup", "minhash16x4:gram4")(root =>
        new graft.etl.DedupState(s, root,
          fixtureBandsOf(s, dir), gramsOf = Some(gram4Of))) { st =>
        // try_cast: a corpus whose source names don't parse (the
        // make_grow 'edge' docs) lands those docs in batch 1 — the
        // split is arbitrary by the store's schedule-invariance
        // contract, but the fold must not throw on it
        val d = docs(s, dir).select(col("doc_id"), col("text"),
          coalesce(expr("try_cast(substr(source, 4, 8) AS INT)"),
            lit(0)).as("sn"))
        st.update(d.filter(col("sn") < 10).select("doc_id", "text"))
        st.update(d.filter(col("sn") >= 10).select("doc_id", "text"))
      }
    }
}
