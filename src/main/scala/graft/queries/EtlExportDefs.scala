package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Retrieval, corpus statistics and training-export queries:
  * BM25, TF-IDF, centroids, SemDeDup, PII, sampling, mixtures,
  * chunking/packing, curation e2e.
  *
  * One slice of [[EtlQueries.defs]] — the registry, fixtures, memo
  * machinery and shared helpers all live on [[EtlQueries]]; this trait
  * only contributes its family's `QueryDef` entries (split per the
  * round-16 review: one 4.3k-line file hides boundary bugs). */
private[queries] trait EtlExportDefs { this: EtlQueries.type =>

  private[queries] lazy val exportDefs: Map[String, QueryDef] = Map(

    // ---- Retrieval, corpus statistics & training export ---------------

    // BM25 keyword retrieval (Robertson-Spärck Jones): the quality-
    // ranking primitive a data pipeline uses to score documents against
    // a probe query (e.g. "educational value" seed terms). idf is the
    // raw Robertson ratio (N - df + 0.5)/(df + 0.5) rather than its
    // log: per term this is a monotone (rank-preserving) function of
    // df — always positive, like Lucene's shifted idf — but the
    // MULTI-term sum is a different aggregate than log-idf BM25, so
    // near-ties between docs matching different term subsets can order
    // differently than textbook BM25 (a doc heavy in common probe
    // terms is rewarded more). That is the deliberate trade for
    // engine-exact arithmetic: every op here is exact-rounded IEEE
    // (+,-,*,/), where libm log's last ulp is engine-dependent and
    // would break the bit-level oracle. Term frequencies come from the
    // replace-length trick — a pure SCAN, no tokenize/explode/shuffle;
    // the corpus statistics (N, avgdl, df per term) reduce to ONE row
    // that cross-joins back broadcast, so the whole query is scan →
    // broadcast → project → top-k: at 100 TB it reads the corpus
    // exactly twice (once for stats, once for scoring) and shuffles
    // only the k winners.
    "q_bm25" -> QueryDef {
      val tfSql = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"    ${occSql("' ' || text || ' '", s" $t ")} AS tf$i" }.mkString(",\n")
      // CAST(tf AS DOUBLE) everywhere tf meets a fractional literal:
      // DuckDB types 2.2 as DECIMAL and BIGINT*DECIMAL stays exact
      // decimal — a DIFFERENT number than Spark's fl(tf)·fl(2.2)
      // double product (bit-divergent in ~1/3 of probed inputs).
      // Forcing the operand to DOUBLE makes both engines evaluate the
      // identical IEEE expression tree.
      val scoreSql = Bm25Terms.indices.map { i =>
        s"(n - df$i + 0.5) / (df$i + 0.5) * (CAST(tf$i AS DOUBLE) * 2.2) / " +
          s"(CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))" }.mkString("\n  + ")
      val dfSql = Bm25Terms.indices.map { i =>
        s"    CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i" }
        .mkString(",\n")
      s"""WITH d AS (
         |  SELECT doc_id, $tokenCountSql AS dl,
         |$tfSql
         |  FROM documents),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         |$dfSql
         |  FROM d)
         |SELECT doc_id,
         |  CAST(${Bm25Terms.indices.map(i => s"tf$i").mkString(" + ")} AS BIGINT) AS hits,
         |  $scoreSql AS score
         |FROM d, st
         |WHERE ${Bm25Terms.indices.map(i => s"tf$i").mkString(" + ")} > 0
         |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    } { (s, dir) =>
      // factored over distinct content: tf and dl are pure functions
      // of the text, so the occurrence scans run once per distinct
      // text; the corpus statistics carry multiplicity as integer
      // weights (N = Σ nm, Σdl = Σ nm·dl, df = Σ nm over texts with
      // tf>0 — integer sums, exactly the direct per-doc values) and
      // each doc inherits its rep's score through the digest re-key.
      // A duplicate-heavy corpus pays the scan for distinct content
      // only (the 100× replica measured 21 s direct).
      val padded = concat(lit(" "), col("text"), lit(" "))
      val g = distinctGroups(s, dir)
      val reps = g.select(
        col("rid") +: col("nm") +: tokenCount(col("text")).as("dl") +:
          Bm25Terms.zipWithIndex.map { case (t, i) =>
            occurrences(padded, s" $t ").as(s"tf$i") }: _*)
      val stAggs =
        sum("nm").cast("double").as("n") +:
          (sum(col("nm") * col("dl")).cast("double") / sum("nm")).as("avgdl") +:
          Bm25Terms.indices.map { i =>
            sum(when(col(s"tf$i") > 0, col("nm")).otherwise(0L))
              .cast("double").as(s"df$i")
          }
      val st = reps.agg(stAggs.head, stAggs.tail: _*)
      val score = Bm25Terms.indices.map { i =>
        (col("n") - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) *
          (col(s"tf$i") * 2.2) /
          (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      }.reduce(_ + _)
      val hits = Bm25Terms.indices.map(i => col(s"tf$i")).reduce(_ + _)
      perDistinctText(s, dir) { r =>
        val pad2 = concat(lit(" "), col("text"), lit(" "))
        r.select(
            col("doc_id") +: tokenCount(col("text")).as("dl") +:
              Bm25Terms.zipWithIndex.map { case (t, i) =>
                occurrences(pad2, s" $t ").as(s"tf$i") }: _*)
          .crossJoin(broadcast(st))
          .filter(hits > 0)
          .select(col("doc_id"), hits.cast("long").as("hits"),
            score.as("score"))
      }
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Bm25TopK)
    },

    // TF-IDF characteristic terms per source — the per-subcorpus
    // signature report a mixing pipeline reads when weighting sources.
    // idf here is the SHIFTED ratio (#sources - df)/df: like log idf
    // it is ZERO for corpus-wide terms — a stopword present in every
    // source can never top a source's signature, which the raw
    // #sources/df ratio got wrong (a high-tf universal term would
    // outrank a source-exclusive one) — and it stays inside exact-
    // rounded IEEE arithmetic, which libm log would not. tf aggregates
    // with map-side combine keyed (source, term); df is vocabulary-
    // bounded so its join side broadcasts; the rank window partitions
    // by source — no single-partition stage anywhere.
    "q_tfidf_source" -> QueryDef(
      s"""WITH w AS (
         |  SELECT source, unnest(list_filter(string_split(text, ' '),
         |                                    x -> length(x) > 0)) AS word
         |  FROM documents),
         |tf AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM w GROUP BY 1, 2),
         |df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |ns AS (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS s FROM documents)
         |SELECT source, rank, word, tf, df, score FROM (
         |  SELECT tf.source, tf.word, tf.tf, df.df,
         |    tf.tf * (ns.s - df.df) / df.df AS score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.source
         |      ORDER BY tf.tf * (ns.s - df.df) / df.df DESC, tf.word ASC) AS BIGINT) AS rank
         |  FROM tf JOIN df USING (word), ns)
         |WHERE rank <= 5
         |ORDER BY source, rank""".stripMargin) { (s, dir) =>
      // factored over distinct content: the tokenize/explode runs once
      // per distinct text (the SHARED memoized unigram frame —
      // [[repWordCounts]]); per-(rep, source) multiplicities (tiny — a
      // crawled duplicate keeps its source) re-weight the per-rep word
      // counts into the exact per-source tf (tf = Σ m·c, an integer
      // sum equal to the direct per-occurrence count). The 100×
      // duplication replica measured 15.3 s direct; the factored form
      // explodes 1% of the rows.
      val g = distinctGroups(s, dir)
      val repWords = repWordCounts(s, dir).select("rid", "word", "c")
      val srcMult = docKeys(s, dir).select("k", "source")
        .join(g.select("k", "rid"), "k")
        .groupBy("rid", "source").agg(count(lit(1)).as("m"))
      // srcMult is corpus-sided (one row per distinct content) — never
      // broadcastable at scale, but per-partition it is narrow, so a
      // SHUFFLED HASH join skips sorting the big word frame (guide
      // §3.1); df rides tf as a WINDOW count over the word partition
      // (= the old groupBy+join-back, bit-identically) so the tf
      // subtree — the expensive corpus-factored aggregate — is planned
      // and executed ONCE instead of twice (the join-back form
      // duplicated it: 13 Exchanges → 6, 2 SortMergeJoins → 0).
      val tf = repWords.join(srcMult.hint("shuffle_hash"), "rid")
        .groupBy("source", "word").agg(sum(col("m") * col("c")).as("tf"))
      val dfW = Window.partitionBy("word")
      // docKeys carries one row per doc with its source — same
      // distinct-source set as the raw table, minus a parquet corpus
      // scan (the ns subtree was the plan's only remaining raw read)
      val ns = docKeys(s, dir)
        .agg(countDistinct("source").cast("double").as("s"))
      val score = col("tf") * (col("s") - col("df")) / col("df")
      val rankW = Window.partitionBy("source")
        .orderBy(score.desc, col("word").asc)
      tf.withColumn("df", count(lit(1)).over(dfW))
        .crossJoin(broadcast(ns))
        .withColumn("score", score)
        .withColumn("rank", row_number().over(rankW).cast("long"))
        .filter(col("rank") <= 5)
        .select("source", "rank", "word", "tf", "df", "score")
        .orderBy("source", "rank")
    },

    // N-gram diversity per source — distinct-trigram ratio, the
    // standard template-and-boilerplate signal a mixing decision reads
    // next to the repetition filters (a low ratio flags a source whose
    // documents recombine the same phrases). Factored over distinct
    // content like q_tfidf_source: trigrams explode once per distinct
    // text; occurrence totals re-weight by the per-(rep, source)
    // multiplicities (Σ m·c ≡ the direct count) while the distinct
    // count is multiplicity-free by definition. Exact integers + one
    // IEEE division.
    "q_ngram_diversity" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT source, list_filter(string_split(text, ' '),
         |                             x -> length(x) > 0) AS w
         |  FROM documents),
         |base AS (SELECT source, len(w) AS n, w FROM wl),
         |g AS (
         |  SELECT source, unnest(list_transform(range(1, n - 1),
         |    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS gram
         |  FROM base WHERE n >= 3),
         |agg AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
         |  FROM g GROUP BY 1)
         |SELECT source, n_grams, n_distinct,
         |  CAST(n_distinct AS DOUBLE) / n_grams AS distinct_ratio
         |FROM agg ORDER BY source""".stripMargin) { (s, dir) =>
      val srcMult = docKeys(s, dir).select("k", "source")
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        .groupBy("rid", "source").agg(count(lit(1)).as("m"))
      // shuffled-hash on the narrow per-rep multiplicity side — never
      // sort the corpus-factored trigram frame (guide §3.1)
      repTriGrams(s, dir).join(srcMult.hint("shuffle_hash"), "rid")
        .groupBy("source")
        .agg(sum(col("m") * col("c")).as("n_grams"),
          countDistinct("gram").as("n_distinct"))
        .select(col("source"), col("n_grams"), col("n_distinct"),
          (col("n_distinct").cast("double") / col("n_grams")).as("distinct_ratio"))
        .orderBy("source")
    },

    // Vocabulary coverage (Zipf report): top-K terms by corpus
    // frequency with the cumulative fraction of all token occurrences
    // they cover — the curve a BPE vocab-size decision reads. The
    // frequency table is vocabulary-bounded; the global top-K is a
    // distributed TakeOrdered (orderBy + limit), and only the K
    // winners enter the single-partition rank/cumsum window. ROWS
    // framing (not RANGE) keeps the running sum per-row under cnt
    // ties on both engines.
    "q_vocab_coverage" -> QueryDef(
      s"""WITH w AS (
         |  SELECT unnest(list_filter(string_split(text, ' '),
         |                            x -> length(x) > 0)) AS word
         |  FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c),
         |top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word ASC LIMIT $VocabTopK),
         |r AS (
         |  SELECT word, cnt,
         |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS BIGINT) AS rank,
         |    CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
         |  FROM top)
         |SELECT rank, word, cnt, cum_cnt, cum_cnt / tot AS coverage
         |FROM r, tot ORDER BY rank""".stripMargin) { (s, dir) =>
      // factored over distinct content: the corpus frequency table is
      // Σ nm·c over the SHARED memoized unigram frame — an integer sum
      // identical to the direct per-occurrence count — so the explode
      // prices distinct content only, once per corpus (9.5 s direct at
      // the 100× duplication replica).
      val c = repWordCounts(s, dir)
        .groupBy("word").agg(sum(col("nm") * col("c")).as("cnt"))
      val tot = c.agg(sum("cnt").cast("double").as("tot"))
      val top = c.orderBy(col("cnt").desc, col("word").asc).limit(VocabTopK)
      val ord = Window.orderBy(col("cnt").desc, col("word").asc)
      top
        .withColumn("rank", row_number().over(ord).cast("long"))
        .withColumn("cum_cnt", sum("cnt")
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("word"), col("cnt"), col("cum_cnt"),
          (col("cum_cnt") / col("tot")).as("coverage"))
        .orderBy("rank")
    },

    // BPE tokenizer training, merge step 1: count adjacent character
    // pairs across the corpus and rank the merge candidates — the
    // primitive a BPE trainer iterates (each round merges the top pair
    // and recounts). The corpus-sized pass is the word-frequency count
    // (distinct-content-factored like q_vocab_coverage); the pair
    // explode then runs over the DISTINCT VOCABULARY only — bounded by
    // vocabulary size × word length, microscopic next to a 100 TB
    // corpus — with each pair weighted by its word's corpus frequency.
    // Exact integer counts; rank ties break on the pair string.
    "q_bpe_merges" -> QueryDef(
      s"""WITH w AS (
         |  SELECT unnest(list_filter(string_split(text, ' '),
         |                            x -> length(x) > 0)) AS word
         |  FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |p AS (
         |  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, cnt
         |  FROM c, generate_series(1, $MaxWordLen - 1) AS g(i)
         |  WHERE i <= length(word) - 1),
         |m AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM p GROUP BY 1),
         |top AS (SELECT pair, cnt FROM m ORDER BY cnt DESC, pair ASC LIMIT $BpeTopK)
         |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank,
         |  pair, cnt
         |FROM top ORDER BY rank""".stripMargin) { (s, dir) =>
      val c = repWordCounts(s, dir)
        .groupBy("word").agg(sum(col("nm") * col("c")).as("cnt"))
      // guard length ≥ 2 BEFORE the sequence: Spark's sequence(1, 0)
      // yields a DESCENDING [1, 0], not the empty series DuckDB emits;
      // the MaxWordLen cap matches the oracle's fixed series bound
      val pairs = c.filter(length(col("word")) >= 2)
        .select(col("word"), col("cnt"),
          explode(sequence(lit(1),
            least(length(col("word")) - 1, lit(MaxWordLen - 1)))).as("i"))
        .select(expr("substring(word, i, 2)").as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("cnt"))
      val ord = Window.orderBy(col("cnt").desc, col("pair").asc)
      pairs.orderBy(col("cnt").desc, col("pair").asc).limit(BpeTopK)
        .withColumn("rank", row_number().over(ord).cast("long"))
        .select("rank", "pair", "cnt").orderBy("rank")
    },

    // BPE tokenizer APPLY — the export a training run actually
    // consumes: the corpus is segmented into token ids under
    // BpeApplyRounds greedy merge rounds trained on the corpus itself
    // ([[bpeApplyMap]]: iterate count-pairs → merge argmax, the full
    // loop q_bpe_merges computes one step of). Per doc: the BPE token
    // count, the exact integer sum of token ids (order-independent
    // checksum pinning every word occurrence's segmentation) and the
    // digest of the ordered id sequence. The expensive loop is
    // VOCABULARY-bounded — merges apply once per distinct word; docs
    // join the word map (broadcast) by multiplicity, factored over
    // distinct content like every token consumer. Word counts come
    // from the persisted unigram store, so the trained merges — and
    // therefore the whole export — are fold-schedule-invariant. The
    // oracle unrolls the merge rounds as chained CTEs over the same
    // vocabulary; merge application is a literal string replace over
    // double-separator symbol strings on BOTH engines, so the
    // left-to-right merge order matches byte-for-byte.
    "q_bpe_apply" -> QueryDef(bpeApplySql) { (s, dir) =>
      val wmap = bpeApplyMap(s, dir)
      perDistinctText(s, dir) { reps =>
        reps.select(col("doc_id"),
            posexplode(expr(
              s"filter(split(text, ' '), $bpeWordFilter)"))
              .as(Seq("pos", "word")))
          .join(broadcast(wmap), "word")
          .groupBy("doc_id")
          .agg(sum("n_syms").as("n_tokens"),
            sum("sum_ids").as("id_sum"),
            md5(expr("concat_ws(' ', transform(" +
              "array_sort(collect_list(struct(pos, id_str)))," +
              " x -> x.id_str))").cast("binary")).as("tok_fp"))
      }.orderBy("doc_id")
    },

    // Per-source token-length decile table — the length-distribution
    // report batch/packing planning reads (sequence budget sizing,
    // truncation-rate estimates). NTILE over (toks, doc_id) is
    // deterministic on both engines (same remainder-to-first-buckets
    // rule, total order); all aggregates are exact integers. One
    // shuffle (the per-source window sort) + one aggregate; at corpus
    // scale an exact decile table per source is a sorted pass — the
    // same cost profile as q_pack's shard windows.
    "q_len_deciles" -> QueryDef(
      s"""WITH d AS (
         |  SELECT source, doc_id, $tokenCountSql AS toks FROM documents),
         |n AS (
         |  SELECT source, toks,
         |    CAST(NTILE($LenNtiles) OVER (PARTITION BY source
         |      ORDER BY toks, doc_id) AS BIGINT) AS decile
         |  FROM d)
         |SELECT source, decile, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(toks) AS BIGINT) AS min_toks,
         |  CAST(MAX(toks) AS BIGINT) AS max_toks,
         |  CAST(SUM(toks) AS BIGINT) AS sum_toks
         |FROM n GROUP BY source, decile
         |ORDER BY source, decile""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy(col("toks"), col("doc_id"))
      docs(s, dir)
        .select(col("source"), col("doc_id"), tokenCount(col("text")).as("toks"))
        .withColumn("decile", ntile(LenNtiles).over(w).cast("long"))
        .groupBy("source", "decile")
        .agg(count(lit(1)).as("n"), min("toks").as("min_toks"),
          max("toks").as("max_toks"), sum("toks").as("sum_toks"))
        .orderBy("source", "decile")
    },

    // Context-window chunking: 256-char windows at stride 192 (64-char
    // overlap) with per-chunk content digests — the splitter that
    // turns documents into model-context-sized training/RAG pieces.
    // Pure function of the text → factored over distinct content
    // ([[perDistinctText]]): a duplicate-heavy corpus chunks each
    // distinct text once. Output-bounded (≈ len/stride chunks per
    // doc); no shuffle beyond the digest re-key join.
    "q_chunk" -> QueryDef(
      s"""SELECT doc_id,
         |  CAST((p - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(length(substr(text, CAST(p AS INTEGER), $ChunkLen)) AS BIGINT) AS n_chars,
         |  md5(substr(text, CAST(p AS INTEGER), $ChunkLen)) AS h
         |FROM documents, generate_series(1, $MaxPos, $ChunkStride) AS g(p)
         |WHERE p <= length(text)
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, dir) =>
      perDistinctText(s, dir) { reps =>
        val chunk = expr(s"substring(text, p, $ChunkLen)")
        reps.filter(length(col("text")) >= 1)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), least(length(col("text")), lit(MaxPos)),
              lit(ChunkStride))).as("p"))
          .select(col("doc_id"),
            TimeOpsFloorDiv(col("p") - 1, ChunkStride).as("chunk_idx"),
            length(chunk).cast("long").as("n_chars"),
            md5(chunk.cast("binary")).as("h"))
      }.orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing for training export: documents are dealt into
    // deterministic shards (doc_id mod), concatenated in doc_id order,
    // and cut into fixed token-budget sequences — the GPT-style "pack
    // then slice every 2048 tokens" export, reported per packed
    // sequence. The only shuffle is the shard partition; the running
    // offset is a window cumsum of exact longs inside each shard.
    // At 100 TB the shard count scales with the cluster (the mod is a
    // knob), and each shard's window is a single ordered pass.
    "q_pack" -> QueryDef(
      s"""WITH d AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    $tokenCountSql AS toks
         |  FROM documents),
         |o AS (
         |  SELECT shard, doc_id, toks,
         |    SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks AS off
         |  FROM d)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(off // $PackBudget AS BIGINT) AS seq,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
         |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
         |FROM o GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        (col("doc_id") % PackShards).as("shard"),
        tokenCount(col("text")).as("toks"))
      val cum = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("off", sum("toks").over(cum) - col("toks"))
        .groupBy(col("shard").cast("long").as("shard"),
          TimeOpsFloorDiv(col("off"), PackBudget).as("seq"))
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard", "seq")
    },

    // PII detection + redaction fingerprint: per-doc email/IPv4 match
    // counts and the digest of the redacted text — the scrub pass a
    // compliance pipeline runs before export. Patterns use character
    // classes only ([.] not \.) so one literal is simultaneously a
    // Java regex and an RE2 regex; the synthetic corpus is PII-free
    // (counts 0, digest = digest of the unchanged text) and
    // TrainingExportSpec proves the detection/redaction semantics on
    // a fixture that does carry PII. n_ip is counted on the
    // EMAIL-REDACTED text — the same text the IP replacement runs
    // on — so counts and fingerprint always reconcile (an IPv4 inside
    // a matched email is consumed by <EMAIL>, and is neither counted
    // nor doubly redacted). Pure per-row scan — no shuffle.
    "q_pii_redact" -> QueryDef(
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ip,
         |  md5(regexp_replace(t1, '$Ipv4Re', '<IP>', 'g')) AS redacted_fp
         |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("t1", regexp_replace(col("text"), EmailRe, "<EMAIL>"))
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$EmailRe', 0)"))
            .cast("long").as("n_email"),
          size(expr(s"regexp_extract_all(t1, '$Ipv4Re', 0)"))
            .cast("long").as("n_ip"),
          md5(regexp_replace(col("t1"), Ipv4Re, "<IP>").cast("binary"))
            .as("redacted_fp"))
        .orderBy("doc_id")
    },

    // Cross-document repeated-substring detection (the signal behind
    // exact-substring dedup, Lee et al. 2021 "Deduplicating Training
    // Data Makes Language Models Better"): every 32-token window is
    // content-hashed and windows appearing in >= 2 distinct docs are
    // reported. Span rows are linear in corpus tokens (position cap
    // mirrors the shingle MaxPos bound); the aggregate is keyed by the
    // 16-byte span hash with map-side combine — the heavy lifting a
    // suffix-array dedup does with a global sort happens here as one
    // hash aggregation, which is the shape that scales on a cluster.
    "q_substring_dup" -> QueryDef(
      s"""WITH wl AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '),
         |                             x -> length(x) > 0) AS w
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i + 31 AS INTEGER)], ' ')) AS h
         |  FROM wl, generate_series(1, 512) AS g(i)
         |  WHERE i <= len(w) - 31)
         |SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_doc
         |FROM sp GROUP BY h
         |HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY first_doc, h""".stripMargin) { (s, dir) =>
      // factored over distinct content: spans are a pure function of
      // the text, so each DISTINCT text is windowed once and its
      // multiplicity nm rides along as a count — n_docs = Σ nm over
      // groups containing the span (every member doc contains it),
      // n_occ = Σ nm·(occurrences within the text), first_doc =
      // min(rid) (rid IS the min member id). Identical output to the
      // direct per-doc form the oracle computes; compute ∝ distinct
      // content + output, so a duplicate-heavy corpus (the replica
      // probe, the crawled-corpus norm) pays nothing for its copies.
      // reads the PERSISTED span store ([[spanState]]: (k, h, c) per
      // distinct text) — the 32-token windowing is priced once per
      // content key, ever; rid/nm attach at read
      spanState(s, dir).derived()
        .join(distinctGroups(s, dir).select("k", "rid", "nm"), "k")
        .groupBy("h")
        .agg(sum("nm").as("n_docs"),
          sum(col("nm") * col("c")).as("n_occ"), min("rid").as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("first_doc", "h")
    },

    // Exact-substring dedup REMOVAL (Lee et al. 2022, the step a
    // production pipeline actually executes after q_substring_dup's
    // detection): every 32-token window shared by >= 2 distinct docs
    // is stripped from every doc EXCEPT the span's canonical holder
    // (the minimum doc_id containing it), greedily left-to-right —
    // accept the leftmost removable span start, jump past its end
    // (start + 32), repeat — so accepted spans are disjoint and each
    // drops exactly 32 tokens. Deterministic by construction: position
    // order breaks all ties, and canonicality is a total function of
    // the span. The dup-span set comes from the PERSISTED span store
    // (appends at batch cost, exactly like detection); removal is
    // priced per DISTINCT TEXT, not per doc: a doc's outcome depends
    // only on (text, is-canonical-per-span), and a non-rep member is
    // canonical for NOTHING (first_doc <= rid < doc_id for every span
    // it carries), so each distinct text has at most TWO removal
    // variants — rep (drop spans first seen in an earlier doc) and
    // member (drop every dup span) — computed once per affected text;
    // docs attach by digest join. Unaffected docs (no dup span) pass
    // through with the rejoined-token digest. No new shuffle class:
    // the dup aggregate and the h-join reuse detection's digest-keyed
    // shuffle family, and the re-windowing (the store keys spans by
    // hash; removal needs offsets) is a per-row map over AFFECTED
    // distinct texts only. The oracle mirrors the greedy walk with a
    // recursive CTE (≤ ceil(512/32) + 1 iterations — accepted starts
    // are >= 32 apart inside the 512-position store cap).
    "q_substring_strip" -> QueryDef(
      """WITH RECURSIVE
        |wl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '),
        |                             x -> length(x) > 0) AS w
        |  FROM documents),
        |sp AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS i,
        |    md5(array_to_string(w[CAST(i AS INTEGER):CAST(i + 31 AS INTEGER)], ' ')) AS h
        |  FROM wl, generate_series(1, 512) AS g(i)
        |  WHERE i <= len(w) - 31),
        |dup AS (
        |  SELECT h, CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |  FROM sp GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        |cand AS (
        |  SELECT sp.doc_id, sp.i FROM sp JOIN dup ON sp.h = dup.h
        |  WHERE sp.doc_id <> dup.first_doc),
        |walk(doc_id, nxt, acc) AS (
        |  SELECT doc_id, 1, CAST([] AS INTEGER[])
        |  FROM (SELECT DISTINCT doc_id FROM cand)
        |  UNION ALL
        |  SELECT doc_id, s + 32, list_append(acc, s) FROM (
        |    SELECT w.doc_id, w.acc,
        |      (SELECT MIN(c.i) FROM cand c
        |       WHERE c.doc_id = w.doc_id AND c.i >= w.nxt) AS s
        |    FROM walk w) WHERE s IS NOT NULL),
        |fin AS (SELECT doc_id, arg_max(acc, len(acc)) AS acc
        |        FROM walk GROUP BY doc_id),
        |o AS (
        |  SELECT wl.doc_id, wl.w,
        |    COALESCE(fin.acc, CAST([] AS INTEGER[])) AS acc
        |  FROM wl LEFT JOIN fin ON wl.doc_id = fin.doc_id)
        |SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(32 * len(acc) AS BIGINT) AS n_dropped,
        |  md5(array_to_string(
        |    list_where(w, list_transform(range(1, len(w) + 1),
        |      j -> len(list_filter(acc, a -> a <= j AND j < a + 32)) = 0)),
        |    ' ')) AS kept_fp
        |FROM o ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // removal variants compute HERE, in the timed body (round-20
      // verdict re-attribution): the span store priced the windowing
      // once per content key; the variant derivation — dup detection,
      // greedy strip, kept-text fingerprints — is the operator's
      // serving work and runs per execution
      docKeys(s, dir).select("doc_id", "k")
        .join(keptBaseStats(s, dir).select("k", "n_tokens", "base_fp"), "k")
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
        // variants are bounded by AFFECTED texts — hash-build that side
        // so the corpus-keyed doc frame is never sorted (guide §3.1)
        .join(substringVariants(s, dir).hint("shuffle_hash"),
          Seq("k"), "left_outer")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(when(col("doc_id") === col("rid"), col("nd_rep"))
            .otherwise(col("nd_all")), lit(0L)).as("n_dropped"),
          // fallback keyed on ROW PRESENCE (nd_all), not the fp: a doc
          // fully covered by accepted spans has a variant row whose fp
          // is NULL (the oracle's array_to_string([]) semantics) and
          // that NULL must survive to the output
          when(col("nd_all").isNotNull,
            when(col("doc_id") === col("rid"), col("fp_rep"))
              .otherwise(col("fp_all")))
            .otherwise(col("base_fp")).as("kept_fp"))
        .orderBy("doc_id")
    },

    // Per-label embedding centroids via exact fixed-point sums — the
    // codebook/centroid-training step an IVF index or a k-means
    // iteration runs at corpus scale: one explode, one (label, dim)
    // aggregate with map-side combine, output bounded by
    // labels × dims. Integer sums make the mean order-independent
    // across partitions (the float-sum alternative is
    // partition-order-dependent and can't hash-match).
    "q_emb_centroid" -> QueryDef(
      s"""WITH sc AS (
         |  SELECT label, unnest(range(len(embedding))) AS i,
         |    CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * $Scale, 0) AS BIGINT) AS v
         |  FROM embeddings)
         |SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
         |  CAST(SUM(v) AS DOUBLE) / COUNT(*) / $Scale AS centroid
         |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      emb(s, dir)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("i", "f")))
        .select(col("label"), col("i").cast("long").as("i"),
          round(col("f").cast("double") * Scale, 0).cast("long").as("v"))
        .groupBy("label", "i")
        .agg((sum("v").cast("double") / count(lit(1)) / Scale).as("centroid"))
        .orderBy("label", "i")
    },

    // Unigram-rarity quality score: per-doc mean scaled inverse token
    // frequency against the corpus unigram distribution — the exact-
    // arithmetic stand-in for the LM-perplexity filter family (CCNet-
    // style): a doc whose tokens are, on average, much rarer than the
    // corpus norm is flagged. A true log-prob perplexity needs libm
    // log (last-ulp engine-dependent); the inverse-frequency mean
    // ranks the same tail and stays hash-exact: per-word tot/cnt is
    // fixed-pointed to an integer so the per-doc sum is exact and
    // order-independent. The unigram table is vocabulary-bounded and
    // BROADCASTS; the per-doc aggregate combines map-side.
    "q_token_rarity" -> QueryDef(
      s"""WITH w AS (
         |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |                                    x -> length(x) > 0)) AS word
         |  FROM documents),
         |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c),
         |sif AS (
         |  SELECT word, CAST(ROUND(tot / cnt * 1000000, 0) AS BIGINT) AS sif
         |  FROM c, tot),
         |d AS (
         |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(s.sif) AS BIGINT) AS ssum
         |  FROM w JOIN sif s USING (word) GROUP BY 1)
         |SELECT doc_id, n AS n_tokens,
         |  CAST(ssum AS DOUBLE) / n / 1000000 AS rarity,
         |  CASE WHEN CAST(ssum AS DOUBLE) / n / 1000000 > 40 THEN 'rare'
         |       ELSE 'common' END AS verdict
         |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // factored over distinct content twice: the unigram table counts
      // each distinct text once with its multiplicity nm as a weight
      // (Σ nm·occ ≡ the direct per-occurrence count — the model MUST
      // see duplication, and does, without re-scanning the copies),
      // and the per-doc score — a pure function of the text given the
      // broadcast table — is computed once per distinct text and
      // re-keyed by digest ([[perDistinctText]]).
      val words = repWordCounts(s, dir)
      val c = words.groupBy("word").agg(sum(col("nm") * col("c")).as("cnt"))
      // Σ_word cnt ≡ Σ nm·c over the base frame (grouped integer sums
      // re-associate exactly), so the scalar total skips the second
      // vocabulary-wide groupBy the c-derived form re-ran per pass
      val tot = words.agg(sum(col("nm") * col("c")).cast("double").as("tot"))
      val sif = c.crossJoin(broadcast(tot))
        .select(col("word"),
          round(col("tot") / col("cnt") * 1000000, 0).cast("long").as("sif"))
      val rarity = col("ssum").cast("double") / col("n") / 1000000
      perDistinctText(s, dir) { _ =>
        // the per-rep score derives from the same memoized unigram
        // frame (n = Σ c, ssum = Σ sif·c — identical to the direct
        // per-occurrence sums), so no second corpus explode exists
        words
          .join(broadcast(sif), "word")
          .select(col("rid").as("doc_id"), col("c"), col("sif"))
          .groupBy("doc_id")
          .agg(sum("c").as("n"), sum(col("sif") * col("c")).as("ssum"))
          .select(col("doc_id"), col("n").as("n_tokens"),
            rarity.as("rarity"),
            when(rarity > 40, "rare").otherwise("common").as("verdict"))
      }.orderBy("doc_id")
    },

    // CCNet-shaped LM quality score: a character-trigram conditional
    // model over the corpus (occurrence counts — the store trains on
    // content weighted by multiplicity, identically), scored as the
    // FIXED-POINT sum Σ ⌊2^20·c3(tri)/c2(prefix)⌋ over each doc's
    // first LmMaxPos trigram positions — exact integer arithmetic end
    // to end, so the oracle reproduces the engine's model and scores
    // bit-for-bit (no libm anywhere). Served from the persisted
    // derived store: the model trains once per corpus, every distinct
    // text scores once against the frozen model, and the model join
    // is broadcastable BY CONSTRUCTION (distinct char trigrams are
    // bounded by alphabet³, not corpus bytes).
    "q_lm_score" -> QueryDef(
      s"""WITH pos AS (
         |  SELECT doc_id, substr(text, CAST(p AS INTEGER), 3) AS g3
         |  FROM (SELECT doc_id, text,
         |          unnest(generate_series(1,
         |            LEAST(length(text) - 2, $LmMaxPos))) AS p
         |        FROM documents WHERE length(text) >= 3) t),
         |c3 AS (SELECT g3, CAST(COUNT(*) AS BIGINT) AS c3
         |       FROM pos GROUP BY 1),
         |c2 AS (SELECT substr(g3, 1, 2) AS g2, CAST(COUNT(*) AS BIGINT) AS c2
         |       FROM pos GROUP BY 1),
         |model AS (
         |  SELECT c3.g3, (c3.c3 * $LmScale) // c2.c2 AS r
         |  FROM c3 JOIN c2 ON c2.g2 = substr(c3.g3, 1, 2))
         |SELECT pos.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_pos,
         |  CAST(SUM(m.r) AS BIGINT) AS lm_fp,
         |  CAST(SUM(m.r) // COUNT(*) AS BIGINT) AS avg_fp
         |FROM pos JOIN model m USING (g3)
         |GROUP BY pos.doc_id ORDER BY pos.doc_id""".stripMargin) { (s, dir) =>
      docKeys(s, dir).filter(col("len") >= 3)
        .select("doc_id", "k")
        .join(lmScores(s, dir), "k")
        .select(col("doc_id"), col("n_pos"), col("lm_fp"),
          expr("lm_fp div n_pos").as("avg_fp"))
        .orderBy("doc_id")
    },

    // End-to-end curation report: the whole batch pipeline — exact
    // dedup (canonical = min doc_id per digest, read from the SAME
    // memoized distinct-groups frame every dedup consumer shares) →
    // quality gate (the q_text_quality rule, verbatim) → per-source
    // token accounting and packed-sequence yield at the PackBudget.
    // This is the one-query answer to "what does this crawl contribute
    // to the training set": one corpus scan, one digest join, one
    // per-source aggregate — no stage that wouldn't fuse at 100 TB.
    "q_curate_e2e" -> QueryDef {
      val stops = s"${occSql("' ' || d.text || ' '", " the ")} + ${occSql("' ' || d.text || ' '", " a ")}"
      s"""WITH g AS (SELECT MIN(doc_id) AS rid, text FROM documents GROUP BY text),
         |d AS (
         |  SELECT d.doc_id, d.source, g.rid,
         |    CAST(length(d.text) - length(replace(d.text, ' ', '')) + 1 AS BIGINT) AS toks,
         |    $stops AS stops
         |  FROM documents d JOIN g ON g.text = d.text),
         |k AS (
         |  SELECT source, toks,
         |    CASE WHEN doc_id = rid AND toks >= 40 AND stops * 5 <= toks
         |         THEN 1 ELSE 0 END AS keep
         |  FROM d)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(keep) AS BIGINT) AS n_kept,
         |  CAST(SUM(keep * toks) AS BIGINT) AS n_tokens,
         |  CAST((SUM(keep * toks) + ${PackBudget - 1}) // $PackBudget AS BIGINT) AS n_seqs
         |FROM k GROUP BY source ORDER BY source""".stripMargin
    } { (s, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      val stops = occurrences(padded, " the ") + occurrences(padded, " a ")
      val toks = tokenCount(col("text"))
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"), textKey.as("k"),
          toks.as("toks"), stops.as("stops"))
        .join(distinctGroups(s, dir).select("k", "rid"), "k")
      d.select(col("source"), col("toks"),
          when(col("doc_id") === col("rid") && col("toks") >= 40 &&
            col("stops") * 5 <= col("toks"), 1L).otherwise(0L).as("keep"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"),
          sum(col("keep") * col("toks")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_kept"), col("n_tokens"),
          TimeOpsFloorDiv(col("n_tokens") + (PackBudget - 1), PackBudget).as("n_seqs"))
        .orderBy("source")
    },

    // Incremental (cross-corpus) dedup: the decision a pipeline makes
    // when NEW crawl data arrives against an already-trained corpus —
    // never re-admit what the model has seen. "Seen" is the src0-src9
    // half of the corpus, incoming is src10-src19; each incoming doc is
    // dup_exact (digest already in the seen index), dup_near (shares a
    // MinHash cluster with a seen doc), or new. Since round 12 this
    // reads the PERSISTED incremental store ([[incrDedupState]]: a
    // graft.etl.DedupState initialized with the seen half, then updated
    // with the incoming batch at cost proportional to the batch) — the
    // production shape, where dedup state is a versioned on-disk index
    // maintained per ingest commit, not a per-session recompute. The
    // oracle is unchanged: it derives the same verdicts from the
    // one-shot full-corpus clustering, which DedupStateSpec proves the
    // incremental store reproduces component-for-component. The
    // seen-digest index joins equi-keyed on the 16-byte digest (at
    // 100 TB this is THE persisted dedup index, a join not a
    // broadcast); the seen-cluster set is output-bounded.
    "q_dedup_incr" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql,
         |sn AS (
         |  SELECT doc_id, text, CAST(substr(source, 4, 8) AS INTEGER) AS sn
         |  FROM documents),
         |seen AS (SELECT DISTINCT text FROM sn WHERE sn < 10),
         |seenc AS (
         |  SELECT DISTINCT c.cluster
         |  FROM clusters c JOIN sn ON sn.doc_id = c.doc_id
         |  WHERE sn.sn < 10)
         |SELECT d.doc_id,
         |  CASE WHEN d.text IN (SELECT text FROM seen) THEN 'dup_exact'
         |       WHEN c.cluster IN (SELECT cluster FROM seenc) THEN 'dup_near'
         |       ELSE 'new' END AS verdict
         |FROM sn d JOIN clusters c ON c.doc_id = d.doc_id
         |WHERE d.sn >= 10
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val st = incrDedupState(s, dir)
      // (doc_id, k, cluster, ver): arrival version 1 = the seen half,
      // 2 = the incoming batch; labels are the post-update (full)
      // components, exactly the oracle's one-shot clustering
      val m = st.members()
      // no checkpoint: the seen-clusters branch and the main branch
      // share identical subplans, so Catalyst reuses the exchange; a
      // per-call checkpoint would leak one block per invocation in a
      // long-lived daemon
      val dcl = m
        .join(st.seenKeys().select("k", "rid"), "k")
        .join(st.labels(), Seq("rid"), "left_outer")
        .select(m("doc_id"), m("k"),
          coalesce(col("cluster"), col("rid")).as("cluster"), m("ver"))
      val seenK = st.seenKeys().filter(col("ver") === 1)
        .select("k").withColumn("seen_exact", lit(1))
      val seenClusters = dcl.filter(col("ver") === 1)
        .select("cluster").distinct()
        .withColumn("seen_near", lit(1))
      dcl.filter(col("ver") === 2)
        .join(seenK, Seq("k"), "left_outer")
        .join(seenClusters, Seq("cluster"), "left_outer")
        .select(col("doc_id"),
          when(col("seen_exact").isNotNull, "dup_exact")
            .when(col("seen_near").isNotNull, "dup_near")
            .otherwise("new").as("verdict"))
        .orderBy("doc_id")
    },

    // FEDERATED dedup: corpus-wide cluster sizes computed from TWO
    // member stores (doc_id-parity split, so identical content has a
    // rep in both members) merged by DedupState.federatedDocClusters.
    // The oracle derives the same sizes from the one-shot full-corpus
    // clustering — the merge must be indistinguishable from a single
    // store over the union corpus. Output is label-independent
    // (per-doc cluster size), so it cannot pass by accident of label
    // arithmetic.
    "q_dedup_fed" -> QueryDef(
      s"""WITH RECURSIVE $clusterCteSql
         |SELECT d.doc_id,
         |  CAST(COUNT(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS csize
         |FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val fc = fedDocClusters(s, dir)
      val sizes = fc.groupBy("cluster").agg(count(lit(1)).as("csize"))
      fc.join(sizes, "cluster")
        .select(col("doc_id"), col("csize"))
        .orderBy("doc_id")
    },

    // Mixture weighting: per-source sampling allocation proportional to
    // tokens^0.75 (the sub-linear upweighting of small sources every
    // multi-corpus training mix uses) against a fixed token budget.
    // t^0.75 is computed as sqrt(t * sqrt(t)) — sqrt is an IEEE
    // exact-rounded op in BOTH engines, where pow(t, 0.75) is a libm
    // call whose last ulp may differ — then fixed-pointed so the
    // normalizing total is an exact integer sum (order-independent
    // across partitions). One tiny aggregate per source; the totals
    // row broadcasts back.
    "q_mix_weights" -> QueryDef(
      s"""WITH t AS (
         |  SELECT source, CAST(SUM($tokenCountSql) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n_tokens,
         |    CAST(ROUND(sqrt(n_tokens * sqrt(n_tokens)) * 1000000, 0) AS BIGINT) AS wq
         |  FROM t),
         |tot AS (SELECT SUM(wq) AS tot FROM w)
         |SELECT source, n_tokens, wq,
         |  CAST(wq AS DOUBLE) / tot AS share,
         |  CAST(ROUND(CAST(wq AS DOUBLE) / tot * 1000000, 0) AS BIGINT) AS alloc_tokens
         |FROM w, tot ORDER BY source""".stripMargin) { (s, dir) =>
      val t = docs(s, dir).groupBy("source")
        .agg(sum(tokenCount(col("text"))).as("n_tokens"))
      val w = t.select(col("source"), col("n_tokens"),
        round(sqrt(col("n_tokens") * sqrt(col("n_tokens"))) * 1000000, 0)
          .cast("long").as("wq"))
      val tot = w.agg(sum("wq").as("tot"))
      w.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"), col("wq"),
          (col("wq").cast("double") / col("tot")).as("share"),
          round(col("wq").cast("double") / col("tot") * 1000000, 0)
            .cast("long").as("alloc_tokens"))
        .orderBy("source")
    },

    // Scalar-quantized (SQ8) ANN scoring: a SYMMETRIC int8 quantizer
    // (q = round(v · 127 / gmax), gmax = corpus abs-max — zero maps to
    // zero, so the quantized dot is an unbiased scaled dot product)
    // scores vectors against the query in the compressed domain —
    // exact int64 sums of int8 products, order-independent and
    // engine-exact — then ranks by quantized COSINE, the same metric
    // as the exact baseline. (An asymmetric per-dim min/max quantizer
    // is the wrong tool for dot/cosine ranking: the per-dim offsets
    // bias the inner product by data-dependent cross terms — measured
    // 0/10 recall on this corpus — while the symmetric form measures
    // 10/10; TrainingExportSpec pins the recall.) This is the memory-
    // bound scale path: codes are 4× smaller than float32, the
    // trained scale (one scalar) and the quantized query broadcast to
    // every executor, and the corpus side never shuffles until the
    // final top-k.
    "q_ann_sq8" -> QueryDef(sq8OracleSql) { (s, dir) =>
      // reads the memoized trained codes ([[sq8Codes]]) — the index is
      // encoded once per corpus; each query is a compressed-domain scan
      sq8TopK(sq8Codes(s, dir))
    },

    // The FEDERATED form of the same query: member stores encode their
    // own vectors under ONE adopted quantizer ([[fedSq8Codes]] — the
    // train-once-distribute artifact contract), and the merged
    // compressed-domain top-k must equal the single-store answer, which
    // is exactly what serving this under q_ann_sq8's oracle VERBATIM
    // proves. The plan is the single-store plan over a two-member
    // union — broadcast query vector, map-side partial aggregation,
    // TakeOrdered top-k; nothing about the merge adds a shuffle.
    "q_ann_sq8_fed" -> QueryDef(sq8OracleSql) { (s, dir) =>
      sq8TopK(fedSq8Codes(s, dir))
    },
  )

  /** DuckDB mirror of [[bpeApplyMap]] + the per-doc export: the
    * BpeApplyRounds merge rounds unroll as chained CTEs (p_r: adjacent
    * symbol-pair counts weighted by word frequency; t_r: the argmax
    * pair, ties to the smaller string; seg_r: literal replace of the
    * double-separator pattern — LEFT JOIN ON TRUE so an exhausted
    * vocabulary no-ops instead of emptying the frame), then token ids
    * by dense rank over the sorted final vocabulary and the same
    * per-doc aggregate the Spark side computes. */
  private[queries] def bpeApplySql: String = {
    val S = "chr(1)"
    val rounds = (1 to BpeApplyRounds).map { r =>
      val p = r - 1
      s"""p$r AS (
         |  SELECT s.cnt, unnest(list_transform(range(1, len(y)),
         |    i -> y[CAST(i AS INTEGER)] || $S || y[CAST(i + 1 AS INTEGER)])) AS pr
         |  FROM (SELECT cnt, list_filter(string_split(seg, $S), x -> x <> '') AS y
         |        FROM seg$p) s
         |  WHERE len(y) >= 2),
         |t$r AS (SELECT pr FROM (SELECT pr, SUM(cnt) AS c FROM p$r GROUP BY pr)
         |        ORDER BY c DESC, pr ASC LIMIT 1),
         |seg$r AS (
         |  SELECT word, cnt,
         |    CASE WHEN t.pr IS NULL THEN seg
         |         ELSE replace(seg, $S || replace(t.pr, $S, $S || $S) || $S,
         |                      $S || replace(t.pr, $S, '') || $S) END AS seg
         |  FROM seg$p LEFT JOIN t$r t ON TRUE),""".stripMargin
    }.mkString("\n")
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '),
       |    $bpeWordFilter) AS w
       |  FROM documents),
       |wx AS (SELECT unnest(w) AS word FROM wl),
       |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM wx GROUP BY 1),
       |seg0 AS (
       |  SELECT word, cnt,
       |    $S || array_to_string(list_transform(range(1, length(word) + 1),
       |      i -> word[CAST(i AS INTEGER)]), $S || $S) || $S AS seg
       |  FROM c),
       |$rounds
       |syms AS (SELECT word, list_filter(string_split(seg, $S), x -> x <> '') AS y
       |         FROM seg$BpeApplyRounds),
       |vocab AS (SELECT DISTINCT unnest(y) AS sym FROM syms),
       |ids AS (SELECT sym, CAST(DENSE_RANK() OVER (ORDER BY sym) AS BIGINT) AS id
       |        FROM vocab),
       |wsym AS (
       |  SELECT word, CAST(i AS BIGINT) AS i, y[CAST(i AS INTEGER)] AS sym
       |  FROM syms, generate_series(1, $MaxWordLen) g(i) WHERE i <= len(y)),
       |wj AS (SELECT ws.word, ws.i, ids.id
       |       FROM wsym ws JOIN ids ON ids.sym = ws.sym),
       |wmap AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_syms,
       |    CAST(SUM(id) AS BIGINT) AS sum_ids,
       |    string_agg(CAST(id AS VARCHAR), ' ' ORDER BY i) AS id_str
       |  FROM wj GROUP BY word),
       |dw AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
       |    i -> struct_pack(pos := i, word := w[CAST(i AS INTEGER)]))) AS s2
       |  FROM wl),
       |dw2 AS (SELECT doc_id, s2.pos AS pos, s2.word AS word FROM dw),
       |d AS (SELECT dw2.doc_id, dw2.pos, m.n_syms, m.sum_ids, m.id_str
       |      FROM dw2 JOIN wmap m ON m.word = dw2.word)
       |SELECT doc_id, CAST(SUM(n_syms) AS BIGINT) AS n_tokens,
       |  CAST(SUM(sum_ids) AS BIGINT) AS id_sum,
       |  md5(string_agg(id_str, ' ' ORDER BY pos)) AS tok_fp
       |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
