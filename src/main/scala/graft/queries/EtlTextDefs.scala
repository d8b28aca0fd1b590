package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Text-analysis queries: language-ID, quality scoring, token
  * counting, LM scoring, fingerprinting.
  *
  * One slice of [[EtlQueries.defs]] — the registry, fixtures, memo
  * machinery and shared helpers all live on [[EtlQueries]]; this trait
  * only contributes its family's `QueryDef` entries (split per the
  * round-16 review: one 4.3k-line file hides boundary bugs). */
private[queries] trait EtlTextDefs { this: EtlQueries.type =>

  private[queries] lazy val textDefs: Map[String, QueryDef] = Map(

    // ---- Text analysis ------------------------------------------------

    // Language-ID: Cavnar-Trenkle character-trigram rank-order profiles
    // (graft.etl.LangId) trained on the labeled corpus and scored per
    // doc, reported as a predicted-vs-labeled confusion matrix. NOTE on
    // the fixture: `documents.lang` is statistically independent of the
    // synthetic text (no language-specific tokens exist), so accuracy
    // is chance-level by construction — the query exercises the real
    // classifier machinery (profile build, broadcast score join,
    // deterministic argmax) and LangIdSpec proves classification
    // quality on text that actually carries a signal.
    "q_lang_id" -> QueryDef(
      s"""WITH d AS (
         |  SELECT doc_id, lang, lower(text) AS t FROM documents
         |  WHERE length(text) >= 3),
         |grams AS (
         |  SELECT doc_id, lang, substr(t, CAST(p AS INTEGER), 3) AS g
         |  FROM d, generate_series(1, $LangIdMaxPos) AS s(p)
         |  WHERE p <= length(t) - 2),
         |prof AS (
         |  SELECT * FROM (
         |    SELECT lang AS plang, g,
         |      ROW_NUMBER() OVER (PARTITION BY lang
         |        ORDER BY COUNT(*) DESC, g ASC) AS rnk
         |    FROM grams WHERE doc_id % $LangIdTrainMod = 0
         |    GROUP BY lang, g)
         |  WHERE rnk <= $LangIdTopK),
         |dg AS (SELECT doc_id, g, COUNT(*) AS n FROM grams GROUP BY doc_id, g),
         |score AS (
         |  SELECT dg.doc_id, pr.plang,
         |    SUM(dg.n * (${LangIdTopK + 1} - pr.rnk)) AS s
         |  FROM dg JOIN prof pr ON dg.g = pr.g
         |  GROUP BY dg.doc_id, pr.plang),
         |pred AS (
         |  SELECT doc_id, plang AS pred FROM (
         |    SELECT doc_id, plang,
         |      ROW_NUMBER() OVER (PARTITION BY doc_id
         |        ORDER BY s DESC, plang ASC) AS rn
         |    FROM score)
         |  WHERE rn = 1)
         |SELECT d.lang, COALESCE(p.pred, 'en') AS pred,
         |  CAST(COUNT(*) AS BIGINT) AS cnt
         |FROM d LEFT JOIN pred p ON d.doc_id = p.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // training sampling is keyed by doc_id, so the SAMPLE comes from
      // the raw corpus — but within it, identical (text, lang) rows
      // contribute identical gram rows, so training too collapses to
      // distinct texts with multiplicity weights (exactly the
      // per-occurrence counts); SCORING is a pure function of the
      // text, so each DISTINCT text is scored once and the prediction
      // joins back by the content DIGEST (the text never rides a
      // shuffle as join key). On a duplicate-heavy corpus the ~200×
      // trigram explosion prices distinct content only, in both
      // passes (same confusion matrix either way; the oracle scores
      // per doc and hash-matches this). Train + score are memoized per
      // fixture ([[langPredictions]]) — the corpus's language labels
      // are computed once and every downstream consumer (sampling,
      // mixing, this confusion matrix) reads them.
      docKeys(s, dir).filter(col("len") >= 3)
        .select("doc_id", "lang", "k")
        .join(langPredictions(s, dir), Seq("k"), "left_outer")
        .groupBy(col("lang"), coalesce(col("pred"), lit("en")).as("pred"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "pred")
    },

    // Quality scoring: length/token/stopword features + a rule label.
    "q_text_quality" -> QueryDef {
      val stops = QualityStops.map(p => occSql("' ' || text || ' '", p)).mkString(" + ")
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  $tokenCountSql AS n_tokens,
         |  CAST($stops AS BIGINT) AS n_stop,
         |  CAST($stops AS DOUBLE) / $tokenCountSql AS stop_ratio,
         |  CASE WHEN $tokenCountSql >= $QualityMinTokens
         |        AND ($stops) * $QualityStopMult <= $tokenCountSql
         |       THEN 'keep' ELSE 'drop' END AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    } { (s, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      val stops = QualityStops.map(occurrences(padded, _)).reduce(_ + _)
      val toks = tokenCount(col("text"))
      docs(s, dir).select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          toks.as("n_tokens"),
          stops.as("n_stop"),
          (stops.cast("double") / toks).as("stop_ratio"),
          when(toks >= QualityMinTokens && stops * QualityStopMult <= toks,
            "keep").otherwise("drop").as("quality"))
        .orderBy("doc_id")
    },

    // Repetition-based quality filters (the Gopher/MassiveText rule
    // family, Rae et al. 2021 §A1.1): per doc the duplicate-word
    // fraction, most-common-word fraction and most-common-word-bigram
    // fraction, plus an INTEGER-arithmetic STRICTLY-EXCEEDS keep/drop
    // (a doc at exactly the threshold keeps, so short docs with top_w=1
    // cannot be dropped by rounding) so the verdict
    // can't drift across float formatting. Pure per-text function →
    // factored over distinct content ([[perDistinctText]], replication-
    // invariant like the dedup family); gram counting is explode →
    // groupBy keyed (doc, gram) — map-side combine, one shuffle, no
    // skew (the doc id is in the key), linear in corpus tokens.
    "q_quality_repetition" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '),
         |                             x -> length(x) > 0) AS w
         |  FROM documents),
         |base AS (SELECT doc_id, len(w) AS n, w FROM wl),
         |wrows AS (SELECT doc_id, n, unnest(w) AS word FROM base),
         |wc AS (SELECT doc_id, n, word, COUNT(*) AS c
         |       FROM wrows GROUP BY 1, 2, 3),
         |wstat AS (SELECT doc_id, n, COUNT(*) AS nd, MAX(c) AS top_w
         |          FROM wc GROUP BY 1, 2),
         |brows AS (
         |  SELECT doc_id, unnest(list_transform(range(1, n),
         |    i -> w[i] || ' ' || w[i + 1])) AS bg
         |  FROM base WHERE n >= 2),
         |bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM brows GROUP BY 1, 2),
         |bstat AS (SELECT doc_id, MAX(c) AS top_bg FROM bc GROUP BY 1)
         |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_words,
         |  CAST(s.n - s.nd AS DOUBLE) / s.n AS dup_word_frac,
         |  CAST(s.top_w AS DOUBLE) / s.n AS top_word_frac,
         |  CAST(COALESCE(b.top_bg, 0) AS DOUBLE) / (s.n - 1) AS top_bigram_frac,
         |  CASE WHEN s.top_w * 5 > s.n OR (s.n - s.nd) * 2 > s.n
         |            OR COALESCE(b.top_bg, 0) * 4 > s.n - 1
         |       THEN 'drop' ELSE 'keep' END AS verdict
         |FROM wstat s LEFT JOIN bstat b USING (doc_id)
         |ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      perDistinctText(s, dir) { reps =>
        // ONE pass over the tokenized corpus: words and bigrams explode
        // together as (kind, gram) rows — the text is split once and
        // never rescanned — then two doc-keyed aggregations and a
        // 2-value pivot replace the former word/bigram subplan pair
        // plus their join. sequence(1, 0) is [1, 0] (negative default
        // step), hence the n >= 2 guard inside the if().
        val grams = reps.select(col("doc_id"),
            expr("filter(split(text, ' '), x -> length(x) > 0)").as("w"))
          .select(col("doc_id"), size(col("w")).as("n"), col("w"))
          .select(col("doc_id"), col("n"), explode(expr(
            "concat(transform(w, x -> struct(0 AS kind, x AS g)), " +
              "if(n >= 2, transform(sequence(1, n - 1), " +
              "i -> struct(1 AS kind, concat(element_at(w, i), ' ', " +
              "element_at(w, i + 1)) AS g)), " +
              "array()))")).as("t"))
          .select(col("doc_id"), col("n"),
            col("t.kind").as("kind"), col("t.g").as("g"))
        val pivoted = grams
          .groupBy("doc_id", "n", "kind", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "n", "kind")
          .agg(count(lit(1)).as("nd"), max("c").as("topc"))
          .groupBy("doc_id", "n").pivot("kind", Seq(0, 1))
          .agg(first("nd").as("nd"), first("topc").as("topc"))
        pivoted
          .select(col("doc_id"), col("n").cast("long").as("n_words"),
            ((col("n") - col("0_nd")).cast("double") / col("n"))
              .as("dup_word_frac"),
            (col("0_topc").cast("double") / col("n")).as("top_word_frac"),
            (coalesce(col("1_topc"), lit(0L)).cast("double") /
              (col("n") - 1)).as("top_bigram_frac"),
            when(col("0_topc") * 5 > col("n") ||
              (col("n") - col("0_nd")) * 2 > col("n") ||
              coalesce(col("1_topc"), lit(0L)) * 4 > col("n") - 1,
              "drop").otherwise("keep").as("verdict"))
      }.orderBy("doc_id")
    },

    // Cross-doc line-level boilerplate dedup (the CCNet/RefinedWeb
    // cleanup family: Wenzek et al. 2020 §3.1, Penedo et al. 2023
    // §4.2): a line present in >= LineDfMin DISTINCT DOCS of one
    // source is boilerplate (headers, navigation, license banners) and
    // is dropped from ALL of them — unlike q_substring_strip's spans,
    // boilerplate has no canonical holder. "Line" is the pluggable
    // segmentation: real corpora split on '\n'; this corpus is a flat
    // word stream, so a line is a non-overlapping LineLen-token block
    // ([[lineState]]). The within-doc repetition filters
    // (q_quality_repetition) don't touch this class — the df is
    // CROSS-doc per source. Line hashing is priced once per DISTINCT
    // TEXT via the persisted line store (appends at batch cost); the
    // df aggregate attaches per-source doc multiplicities at read time
    // (df = Σ members over distinct texts containing the line — a doc
    // repeating a line internally still counts once, matching the
    // oracle's COUNT(DISTINCT doc_id)); removal is computed once per
    // DISTINCT (text, source) pair and docs attach by digest join —
    // replication-invariant by construction, and the oracle proves it:
    // it computes the direct per-doc form over a corpus that contains
    // exact duplicates. One groupBy on (source, h) with map-side
    // combine; the boilerplate set is output-bounded (lines crossing
    // the df bar), so its join back to the store rides a small side.
    "q_line_dedup" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT doc_id, source, list_filter(string_split(text, ' '),
         |                                     x -> length(x) > 0) AS w
         |  FROM documents),
         |ln AS (
         |  SELECT doc_id, source, CAST(i AS BIGINT) AS i,
         |    md5(array_to_string(
         |      w[CAST((i - 1) * $LineLen + 1 AS INTEGER):CAST(i * $LineLen AS INTEGER)],
         |      ' ')) AS h
         |  FROM wl, generate_series(1, $MaxLineBlocks) AS g(i)
         |  WHERE (i - 1) * $LineLen < len(w)),
         |df AS (
         |  SELECT source, h FROM ln GROUP BY source, h
         |  HAVING COUNT(DISTINCT doc_id) >= $LineDfMin),
         |drops AS (
         |  SELECT ln.doc_id, ln.i FROM ln
         |  JOIN df ON ln.source = df.source AND ln.h = df.h),
         |da AS (SELECT doc_id, list(i) AS di, COUNT(*) AS nd
         |       FROM drops GROUP BY doc_id),
         |o AS (
         |  SELECT wl.doc_id, wl.w,
         |    COALESCE(da.di, CAST([] AS BIGINT[])) AS di,
         |    COALESCE(da.nd, 0) AS nd
         |  FROM wl LEFT JOIN da ON wl.doc_id = da.doc_id)
         |SELECT doc_id,
         |  CAST(CASE WHEN len(w) = 0 THEN 0
         |            ELSE (len(w) - 1) // $LineLen + 1 END AS BIGINT) AS n_lines,
         |  CAST(nd AS BIGINT) AS n_dropped,
         |  md5(array_to_string(
         |    list_where(w, list_transform(range(1, len(w) + 1),
         |      j -> NOT list_contains(di, (j - 1) // $LineLen + 1))),
         |    ' ')) AS kept_fp
         |FROM o ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // removal variants compute HERE, in the timed body (round-20
      // verdict re-attribution): the line store priced the block
      // hashing once per content key; the boilerplate detection and
      // kept-text fingerprints are the operator's serving work
      docKeys(s, dir).select("doc_id", "k", "source")
        .join(keptBaseStats(s, dir).select("k", "n_lines", "base_fp"), "k")
        // variants are bounded by affected (text, source) pairs —
        // hash-build that side, never sort the doc frame (guide §3.1)
        .join(lineVariants(s, dir).hint("shuffle_hash"),
          Seq("k", "source"), "left_outer")
        .select(col("doc_id"), col("n_lines"),
          coalesce(col("nd"), lit(0L)).as("n_dropped"),
          // key the fallback on ROW PRESENCE (nd), not on fp_kept:
          // an all-boilerplate doc has a variant row whose fp_kept is
          // NULL by the oracle's array_to_string([]) semantics, and
          // that NULL must survive to the output
          when(col("nd").isNotNull, col("fp_kept"))
            .otherwise(col("base_fp")).as("kept_fp"))
        .orderBy("doc_id")
    },

    // Token accounting per source (corpus-level budgeting).
    "q_token_count" -> QueryDef(
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM($tokenCountSql) AS BIGINT) AS total_tokens,
         |  CAST(MAX($tokenCountSql) AS BIGINT) AS max_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text"))).as("total_tokens"),
          max(tokenCount(col("text"))).as("max_tokens"))
        .orderBy("source")
    },

    // BPE-ish subtoken accounting: greedy longest-match over letter
    // runs / single digits / single punctuation (the shape of a byte-
    // pair-encoded vocabulary's pretokenizer), vs whitespace words.
    // Plain character-class regex → identical semantics in Java regex
    // (Spark) and RE2 (DuckDB).
    "q_token_bpeish" -> QueryDef(
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_subtokens,
         |  $tokenCountSql AS n_words
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)"))
            .cast("long").as("n_subtokens"),
          tokenCount(col("text")).as("n_words"))
        .orderBy("doc_id")
    },

    // Rolling-hash fingerprint (Karp-Rabin): fp = Σ ord(c_i)·B^(n-i)
    // mod M over the first 2048 chars — the positional content hash a
    // shift-tolerant dedup layer keys on. Exact 64-bit integer
    // arithmetic on both sides (terms < 2.6e11, ≤2048 of them — no
    // overflow before the final mod).
    "q_fingerprint_roll" -> QueryDef(
      s"""WITH RECURSIVE powers(k, p) AS (
         |  SELECT 0, CAST(1 AS BIGINT)
         |  UNION ALL SELECT k + 1, (p * $RollB) % $RollM FROM powers WHERE k < ${MaxPos - 1}),
         |ch AS (
         |  SELECT doc_id, LEAST(length(text), $MaxPos) AS n, g.i AS i,
         |    ord(substr(text, CAST(g.i AS INTEGER), 1)) AS c
         |  FROM documents, generate_series(1, $MaxPos) AS g(i)
         |  WHERE g.i <= LEAST(length(text), $MaxPos))
         |SELECT ch.doc_id,
         |  CAST(SUM(ch.c * p.p) % $RollM AS BIGINT) AS fp_roll
         |FROM ch JOIN powers p ON p.k = ch.n - ch.i
         |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin) { (s, dir) =>
      // powers table precomputed driver-side and broadcast as a literal
      // array — no sequential dependency in the distributed plan; the
      // hash is a pure function of the text → computed once per
      // distinct text (the 2048-way explode prices distinct content)
      val powers = Array.iterate(1L, MaxPos)(p => p * RollB % RollM)
      val n = least(length(col("text")), lit(MaxPos))
      perDistinctText(s, dir) { reps =>
        reps
          // empty text: sequence(1, 0) is [1, 0] (negative default step)
          // and element_at(powers, 0) THROWS — omit the doc, exactly as
          // the oracle's WHERE g.i <= 0 does
          .filter(length(col("text")) >= 1)
          .select(col("doc_id"), col("text"), n.as("n"),
            explode(sequence(lit(1), n)).as("i"))
          .select(col("doc_id"),
            (ascii(expr("substring(text, i, 1)")).cast("long") *
              element_at(typedlit(powers), (col("n") - col("i") + 1).cast("int")))
              .as("term"))
          .groupBy("doc_id")
          .agg((sum("term") % RollM).as("fp_roll"))
      }.orderBy("doc_id")
    },

    // Document fingerprint: normalized-prefix content hash + length bucket.
    "q_fingerprint" -> QueryDef(
      s"""SELECT doc_id,
         |  md5(substr(replace(text, ' ', ''), 1, 64) ||
         |      ':' || CAST(length(text) // 64 AS VARCHAR)) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          md5(concat(
            substring(replace(col("text"), lit(" "), lit("")), 1, 64),
            lit(":"),
            TimeOpsFloorDiv(length(col("text")), 64).cast("string")).cast("binary")).as("fp"))
        .orderBy("doc_id")
    },

    // Winnowing fingerprint selection (the MOSS scheme): per 8-char
    // gram position a 32-bit hash; in every window of 8 consecutive
    // gram hashes select the minimum, rightmost occurrence winning
    // ties; the distinct selected set is the document's fingerprint
    // sketch, with the guarantee that any shared substring of length
    // ≥ w + k − 1 = 15 produces a shared selected hash. The rightmost
    // tie rule is ENCODED IN THE KEY — min(h·4096 + (4096 − p)) picks
    // the smallest hash and, among equals, the largest position — so
    // one windowed MIN does the whole selection (no argmin self-join;
    // at corpus scale a single per-doc ordered pass). Pure function of
    // text → priced once per distinct text; the oracle computes the
    // unfactored form, which re-keys to the same rows.
    "q_winnow" -> QueryDef(
      s"""WITH $winnowSelSql
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sel,
         |  CAST(COUNT(DISTINCT sel // 4096) AS BIGINT) AS n_fp,
         |  CAST(SUM(sel // 4096) AS BIGINT) AS fp_sum
         |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // reads the PERSISTED winnow store ([[winnowState]]) — the
      // selection scan is priced once per distinct text, ever
      perDistinctText(s, dir) { _ =>
        winnowSelSet(s, dir)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sel"),
            countDistinct(expr("sel div 4096")).as("n_fp"),
            sum(expr("sel div 4096")).as("fp_sum"))
      }.orderBy("doc_id")
    },

    // Winnowing MATCH step (the rest of the MOSS scheme): candidate
    // pairs = distinct texts sharing ≥ WinnowMinShared distinct
    // selected fingerprints. The guarantee makes this the substring-overlap
    // complement to MinHash banding: any shared run of ≥ 15 chars
    // forces a shared fingerprint, so long verbatim overlaps are
    // caught even when whole-document similarity is too low to band.
    // The fingerprint index is df-capped (a hash in > $WinnowDfCap
    // distinct texts is boilerplate — it dominates the join and
    // carries no pair signal, the ContamDfCap argument) so the
    // self-join is bounded by cap × index size. Rep-level report,
    // like q_minhash_acc.
    "q_winnow_pairs" -> QueryDef(
      s"""WITH g0 AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |${winnowSelSql.replace("FROM documents", "FROM g0")},
         |fp AS (SELECT DISTINCT doc_id, sel // 4096 AS f FROM sel),
         |keep AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) <= $WinnowDfCap),
         |fk AS (SELECT fp.doc_id, fp.f FROM fp JOIN keep ON keep.f = fp.f)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM fk a JOIN fk b ON a.f = b.f AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      // since round 14 a READ of the persisted winnow-match store
      // ([[winnowPairState]]): the df-capped fingerprint self-join ran
      // at fold time, its live provenance rows are the match counts —
      // no fingerprint index scan or self-join at query time
      winnowPairState(s, dir).livePairCounts()
        .filter(col("n_shared") >= WinnowMinShared)
        .orderBy("a", "b")
    },

    // FEDERATED winnowing match: the same report served from a
    // TWO-MEMBER federation store (doc_id-parity split, identical
    // content repped in both members) — q_winnow_pairs' oracle
    // VERBATIM, because the federation's distinct (canonical pair,
    // fingerprint) provenance rows are exactly the rows one store over
    // the union corpus holds (banding is pure content; the global df
    // cap counts distinct content). Third banding family proven on the
    // incremental federation mechanism.
    "q_winnow_fed" -> QueryDef(
      s"""WITH g0 AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |${winnowSelSql.replace("FROM documents", "FROM g0")},
         |fp AS (SELECT DISTINCT doc_id, sel // 4096 AS f FROM sel),
         |keep AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) <= $WinnowDfCap),
         |fk AS (SELECT fp.doc_id, fp.f FROM fp JOIN keep ON keep.f = fp.f)
         |SELECT a.doc_id AS a, b.doc_id AS b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM fk a JOIN fk b ON a.f = b.f AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      winnowFedState(s, dir).livePairCounts()
        .filter(col("n_shared") >= WinnowMinShared)
        .orderBy("a", "b")
    },
  )
}
