package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed examples for the retrieval / corpus-statistics /
  * training-export operators (BM25, TF-IDF, vocab coverage, chunking,
  * packing, PII redaction, SQ8 ANN). The DuckDB oracle proves
  * Spark/SQL agreement at corpus scale; this pins the SEMANTICS to
  * worked examples — including behaviors the synthetic corpus cannot
  * exercise (PII hits) and the approximation quality the oracle can't
  * express (SQ8 recall against the exact baseline). */
class TrainingExportSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("training-export-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("expdocs").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_bpe_merges: pair counts weight by word frequency across duplicates") {
    // words: aa×4 (duplicated doc), ab×2, b×1, aab×1
    // pairs: "aa" = 4 (word aa) + 1 (aab) = 5; "ab" = 2 + 1 = 3; b none
    val dir = writeDocs(Seq(
      (1L, "aa ab aa"), (2L, "aa ab aa"), (3L, "b aab")))
    val got = graft.SparkEntry.queries("q_bpe_merges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "aa", 5L), (2L, "ab", 3L)))
  }

  test("q_len_deciles: NTILE remainder-first sizing, exact integer stats") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("decdocs").toString
    def toks(k: Int) = Seq.fill(k)("w").mkString(" ")
    val rows =
      (1 to 10).map(k => (k.toLong, toks(k), "ten")) ++
        (1 to 25).map(k => (100L + k, toks(k), "quarter")) ++
        (1 to 3).map(k => (200L + k, toks(k), "tiny")) // fewer docs than tiles
    rows.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_len_deciles")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // 10 docs → one per decile, min=max=sum=k
    (1 to 10).foreach(k =>
      assert(got(("ten", k.toLong)) == ((1L, k.toLong, k.toLong, k.toLong))))
    // 25 docs → sizes 3,3,3,3,3,2,2,2,2,2 (remainder to the first buckets)
    val sizes = (1 to 10).map(d => got(("quarter", d.toLong))._1)
    assert(sizes == Seq(3L, 3L, 3L, 3L, 3L, 2L, 2L, 2L, 2L, 2L))
    // deciles partition the ordered lengths: 1-3, 4-6, ..., 16-17, ...
    assert(got(("quarter", 1L)) == ((3L, 1L, 3L, 6L)))
    assert(got(("quarter", 6L)) == ((2L, 16L, 17L, 33L)))
    assert(got(("quarter", 10L)) == ((2L, 24L, 25L, 49L)))
    // fewer docs than tiles: one row per occupied decile, 1..n only
    (1 to 3).foreach(k =>
      assert(got(("tiny", k.toLong)) == ((1L, k.toLong, k.toLong, k.toLong))))
    assert(!got.contains(("tiny", 4L)))
  }

  test("q_ngram_diversity: duplicates weight totals but not the distinct count") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("divdocs").toString
    Seq(
      (1L, "a b c d", "tpl"),   // trigrams: "a b c", "b c d"
      (2L, "a b c d", "tpl"),   // exact duplicate: +2 occurrences, +0 distinct
      (3L, "a b c e", "tpl"),   // "a b c" again, "b c e" new
      (4L, "x y z w", "fresh")  // all distinct
    ).toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_ngram_diversity")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // tpl: 6 occurrences ("a b c"×3, "b c d"×2, "b c e"×1), 3 distinct
    assert(got("tpl") == ((6L, 3L, 3.0 / 6)))
    assert(got("fresh") == ((2L, 2L, 1.0)))
  }

  test("q_source_overlap: copied text links its sources; disjoint sources are absent") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ovdocs").toString
    val t1 = "abcdefghijklmnop" // 5 rare grams (stride 2, p ≤ 9)
    val t2 = "qrstuvwxyz012345"
    val t3 = "ABCDEFGHIJKLMNOP"
    Seq((1L, t1, "a"), (2L, t2, "a"), (3L, t1, "b"), (4L, t3, "c"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_source_overlap")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // only (a, b) share grams — the copied t1; c pairs with nobody
    assert(got.toSeq == Seq(("a", "b", 5L, 10L, 5L, 1.0)))
  }

  test("q_pii_redact: finds and scrubs emails and IPv4s; clean text untouched") {
    val dirty = "contact bob@example.com or 10.0.0.1 for details"
    val clean = "no personal data here at all"
    val dir = writeDocs(Seq((1L, dirty), (2L, clean)))
    val got = graft.SparkEntry.queries("q_pii_redact")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 1L && got(1L).getLong(2) == 1L)
    assert(got(1L).getString(3) ==
      md5hex("contact <EMAIL> or <IP> for details"))
    assert(got(2L).getLong(1) == 0L && got(2L).getLong(2) == 0L)
    assert(got(2L).getString(3) == md5hex(clean))
  }

  test("q_chunk: 256/192 windows cover the text; digests match substrings") {
    // 500 chars -> chunks start at 1, 193, 385 (1-based), lengths
    // 256/256/116; adjacent chunks overlap by 64 chars
    val text = (0 until 500).map(i => ('a' + i % 26).toChar).mkString
    val dir = writeDocs(Seq((7L, text)))
    val rows = graft.SparkEntry.queries("q_chunk")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rows.map(_._2).toSeq == Seq(256L, 256L, 116L))
    assert(rows(0)._3 == md5hex(text.substring(0, 256)))
    assert(rows(1)._3 == md5hex(text.substring(192, 192 + 256)))
    assert(rows(2)._3 == md5hex(text.substring(384)))
    // stride + lengths reconstruct the full text (overlap consistency)
    assert(192 * 2 + 116 == 500)
  }

  test("q_chunk: duplicate texts chunk identically via the distinct-content factoring") {
    val text = "x" * 300
    val dir = writeDocs(Seq((1L, text), (2L, text)))
    val rows = graft.SparkEntry.queries("q_chunk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // both docs present, same chunk set each
    assert(rows.count(_._1 == 1L) == 2 && rows.count(_._1 == 2L) == 2)
    assert(rows.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet ==
      rows.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet)
  }

  test("q_pack: greedy concatenation cuts at the token budget, in doc order") {
    // four docs in shard 0 (doc_id % 16 == 0), 300 tokens each; budget
    // 512 -> offsets 0/300/600/900 -> sequences (0,0,1,1)
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val dir = writeDocs(Seq(0L, 16L, 32L, 48L).map(id => (id, words(300))))
    val rows = graft.SparkEntry.queries("q_pack")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 2L, 600L, 0L, 16L),
      (0L, 1L, 2L, 600L, 32L, 48L)))
  }

  test("q_pack: token totals are conserved across packed sequences") {
    val texts = Seq((1L, "a b c"), (2L, "d e"), (17L, "f g h i"), (33L, "j"))
    val dir = writeDocs(texts)
    val total = texts.map(_._2.split(" ").length.toLong).sum
    val rows = graft.SparkEntry.queries("q_pack")(spark, dir).collect()
    assert(rows.map(_.getLong(3)).sum == total)
    assert(rows.map(_.getLong(2)).sum == texts.length.toLong)
  }

  test("q_bm25: rare-term doc outranks common-term doc (idf weighting)") {
    // "dup" appears in ONE doc; "query" in many -> the dup doc must
    // rank first even though the query-heavy doc has more hits
    val common = (3L to 20L).map(id => (id, "query alpha beta gamma"))
    val dir = writeDocs(Seq(
      (1L, "dup alpha beta gamma"),
      (2L, "query query query query alpha")) ++ common)
    val rows = graft.SparkEntry.queries("q_bm25")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.head._1 == 1L, s"rare-term doc must rank first: ${rows.toSeq}")
    // every scored doc actually contains a probe term
    assert(rows.forall(_._2 > 0))
    // scores strictly ordered (ties broken by doc_id)
    assert(rows.map(_._3).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("q_vocab_coverage: exact cumulative coverage on a worked example") {
    val dir = writeDocs(Seq((1L, "a a b"), (2L, "b c")))
    val rows = graft.SparkEntry.queries("q_vocab_coverage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // counts: a=2, b=2, c=1; total 5; ties rank alphabetically
    assert(rows.toSeq == Seq(
      (1L, "a", 2L, 2L, 0.4),
      (2L, "b", 2L, 4L, 0.8),
      (3L, "c", 1L, 5L, 1.0)))
  }

  test("q_tfidf_source: source-exclusive terms outrank shared terms") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfidocs").toString
    Seq((1L, "xonly xonly shared", "A"), (2L, "yonly yonly shared", "B"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q_tfidf_source")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // rank-1 term of each source is its exclusive word, not "shared"
    assert(rows.collect { case ("A", 1L, w) => w }.head == "xonly")
    assert(rows.collect { case ("B", 1L, w) => w }.head == "yonly")
  }

  test("q_dedup_incr: exact and transitive-near duplicates of the seen corpus are flagged") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("incrdocs").toString
    val base = Seq.fill(60)("the quick brown fox jumps over the lazy dog").mkString(" ")
    val tweaked = base.dropRight(3) + "cat"
    // seen half (src0): base text + an unrelated doc; incoming half
    // (src10): an exact copy, a near copy (same shingles bar the tail),
    // and a genuinely new doc
    Seq((1L, base, "src0"), (2L, "completely unrelated content here", "src0"),
        (10L, base, "src10"), (11L, tweaked, "src10"),
        (12L, "x y z totally fresh words nothing shared", "src10"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_dedup_incr")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(10L, 11L, 12L), "only incoming docs reported")
    assert(got(10L) == "dup_exact")
    assert(got(11L) == "dup_near",
      s"near-identical repetitive text must share a MinHash band: $got")
    assert(got(12L) == "new")
  }

  test("q_mix_weights: tokens^0.75 allocation on a worked example") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixdocs").toString
    // source A: 16 tokens -> 16^0.75 = 8; source B: 1 token -> 1
    Seq((1L, Seq.fill(16)("w").mkString(" "), "A"), (2L, "w", "B"))
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q_mix_weights")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(rows("A") == ((16L, 8000000L, 8.0 / 9.0, 888889L)))
    assert(rows("B") == ((1L, 1000000L, 1.0 / 9.0, 111111L)))
  }

  test("q_token_rarity: rarer-token docs score higher, exact fixed-point mean") {
    val dir = writeDocs(Seq((1L, "a a a b"), (2L, "a a a a")))
    // counts: a=7, b=1, tot=8; sif_a = round(8/7*1e6) = 1142857, sif_b = 8e6
    val rows = graft.SparkEntry.queries("q_token_rarity")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L)._1 == 4L)
    assert(rows(1L)._2 == (3L * 1142857L + 8000000L).toDouble / 4 / 1000000)
    assert(rows(2L)._2 == 1142857.0 / 1000000)
    assert(rows(1L)._2 > rows(2L)._2, "the b-bearing doc is rarer on average")
  }

  test("q_curate_e2e: dedup + quality keeps flow into per-source token yield") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("e2edocs").toString
    val good = (1 to 50).map(i => s"w$i").mkString(" ") // 50 tokens, passes
    Seq((1L, good, "A"), (2L, good, "A"), // exact dup: only doc 1 counts
        (3L, "too short", "A"),           // quality drop
        (4L, good + " tail", "B"))        // distinct, passes (51 tokens)
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q_curate_e2e")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A: 3 docs in, 1 kept (the canonical copy), 50 tokens, 1 sequence
    assert(rows("A") == ((3L, 1L, 50L, 1L)))
    assert(rows("B") == ((1L, 1L, 51L, 1L)))
  }

  test("q_substring_dup: cross-doc 32-token spans reported, intra-doc repeats are not") {
    val run = (1 to 32).map(i => s"s$i").mkString(" ")
    val other = (1 to 32).map(i => s"t$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, run + " x y z"),          // carries the shared run
      (2L, "p q " + run),            // same run, different doc
      (3L, other + " " + other)))    // 2 occurrences, ONE doc -> excluded
    val rows = graft.SparkEntry.queries("q_substring_dup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.exists { case (h, nd, _, fd) =>
      h == md5hex(run) && nd == 2L && fd == 1L },
      s"the shared exact run must be flagged: ${rows.toSeq}")
    // no reported span belongs only to doc 3
    assert(rows.forall(_._4 < 3L), s"intra-doc repetition must not report: ${rows.toSeq}")
  }

  test("q_substring_strip: canonical keeps, members strip greedily-disjoint spans") {
    val run = (1 to 32).map(i => s"s$i").mkString(" ")     // 32 tokens
    val run33 = (1 to 33).map(i => s"r$i").mkString(" ")   // 33 tokens
    val dir = writeDocs(Seq(
      (1L, run + " a b c"),   // canonical holder of every span it carries
      (2L, "p q " + run),     // shares only the exact run (at offset 3)
      (3L, run + " a b c"),   // exact duplicate of doc 1 — member variant
      (4L, run33),            // canonical of the 33-token run
      (5L, run33),            // dup: spans at i=1 AND i=2 — greedy keeps
                              // them disjoint (accept 1, skip 2)
      (6L, "u v w")))         // under 32 tokens — never enters the store
    val got = graft.SparkEntry.queries("q_substring_strip")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 is first_doc of all its spans: nothing removed
    assert(got(1L) == ((35L, 0L, md5hex(run + " a b c"))))
    // doc 2: only the exact run (position 3) is cross-doc; 32 dropped
    assert(got(2L) == ((34L, 32L, md5hex("p q"))))
    // doc 3 (exact duplicate, NOT the canonical): every window of its
    // text is shared with doc 1; greedy accepts position 1, skips the
    // overlapping 2/3/4 — tail "a b c" survives
    assert(got(3L) == ((35L, 32L, md5hex("a b c"))))
    // docs 4/5: 33-token duplicate run → two overlapping dup spans;
    // the canonical keeps all, the member drops exactly ONE disjoint
    // span (32 tokens), not both overlapping ones
    assert(got(4L) == ((33L, 0L, md5hex(run33))))
    assert(got(5L) == ((33L, 32L, md5hex("r33"))))
    // short doc: passes through with the rejoined-token digest
    assert(got(6L) == ((3L, 0L, md5hex("u v w"))))
  }

  test("q_line_dedup: per-source cross-doc lines drop everywhere; within-doc and cross-source do not") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("linedocs").toString
    Seq(
      (1L, "h1 h2 h3 h4 x y z", "a"),        // shares block 1 with doc 2
      (2L, "h1 h2 h3 h4 p q r s", "a"),
      (3L, "h1 h2 h3 h4 u v", "b"),          // same line, OTHER source
      (4L, "w1 h1 h2 h3 h4", "a"),           // misaligned — blocks differ
      (5L, "t1 t2 t3 t4", "a"),              // exact duplicates: the whole
      (6L, "t1 t2 t3 t4", "a"),              // doc is boilerplate
      (7L, "r1 r2 r3 r4 r1 r2 r3 r4", "a"))  // within-doc repeat: df = 1
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_line_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the shared aligned block drops from BOTH source-a holders
    assert(got(1L) == ((2L, 1L, md5hex("x y z"))))
    assert(got(2L) == ((2L, 1L, md5hex("p q r s"))))
    // same line in source b: df(b) = 1, kept whole
    assert(got(3L) == ((2L, 0L, md5hex("h1 h2 h3 h4 u v"))))
    // the same four tokens NOT block-aligned are a different line
    assert(got(4L) == ((2L, 0L, md5hex("w1 h1 h2 h3 h4"))))
    // exact duplicates: every line crosses the bar — full removal.
    // The kept fingerprint is NULL, not md5(""): the oracle's
    // array_to_string over an empty list is NULL, and the engine
    // mirrors it (round-20 fix — the divergence first bit at sf0.001)
    assert(got(5L) == ((1L, 1L, null)))
    assert(got(6L) == ((1L, 1L, null)))
    // a doc repeating its own line is ONE distinct doc: not boilerplate
    assert(got(7L) == ((2L, 0L, md5hex("r1 r2 r3 r4 r1 r2 r3 r4"))))
  }

  test("q_bpe_apply: greedy merges, left-to-right within-word order, dense ids") {
    // Corpus engineered so "aaa" merges (a,a) in round 1 but its
    // follow-up (aa,a) NEVER wins — seven filler pairs at count 20
    // outvote it (12) for the remaining 7 rounds — freezing the
    // PARTIAL segmentation [aa, a]: left-to-right merge order (the
    // first (a,a) wins, NOT [a, aa]), mid-training state, and dense
    // rank ids over the final symbol vocabulary all pinned at once.
    val fillers = Seq("bc", "de", "fg", "hi", "jk", "lm", "no")
    val dir = writeDocs(Seq(
      (1L, Seq.fill(12)("aaa").mkString(" ")),
      (2L, fillers.flatMap(f => Seq.fill(20)(f)).mkString(" "))))
    val got = graft.SparkEntry.queries("q_bpe_apply")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // final symbols sorted: a=1, aa=2, bc=3, de=4, fg=5, hi=6, jk=7,
    // lm=8, no=9; aaa segments [aa, a] -> "2 1"
    assert(got(1L) == ((24L, 36L, md5hex(Seq.fill(12)("2 1").mkString(" ")))))
    val fillerSeq = (3 to 9).flatMap(id => Seq.fill(20)(id.toString)).mkString(" ")
    assert(got(2L) == ((140L, 840L, md5hex(fillerSeq))))

    // simple end-to-end: ab outvotes everything, then (ab,ab) — word
    // order and duplicate weighting flow into ids
    val dir2 = writeDocs(Seq((1L, "abab abab ab"), (2L, "abab ab")))
    val got2 = graft.SparkEntry.queries("q_bpe_apply")(spark, dir2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // vocab: ab=1, abab=2
    assert(got2(1L) == ((3L, 5L, md5hex("2 2 1"))))
    assert(got2(2L) == ((2L, 3L, md5hex("2 1"))))
  }

  test("q_emb_centroid: exact per-label per-dim means") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("centdocs").toString
    Seq((0L, Seq(1.0f, 3.0f), 7), (1L, Seq(3.0f, 5.0f), 7),
        (2L, Seq(10.0f, 0.0f), 8))
      .toDF("vec_id", "embedding", "label").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val rows = graft.SparkEntry.queries("q_emb_centroid")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows((7L, 0L)) == 2.0 && rows((7L, 1L)) == 4.0)
    assert(rows((8L, 0L)) == 10.0 && rows((8L, 1L)) == 0.0)
  }

  test("q_ann_sq8: quantized cosine top-10 matches the exact baseline") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("q_ann_topk")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val approx = graft.SparkEntry.queries("q_ann_sq8")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // int8 precision preserves this corpus's ranking exactly; accept
    // >= 8/10 so a legitimate near-tie flip can't flake the suite
    assert((exact & approx).size >= 8,
      s"SQ8 recall too low: exact=$exact approx=$approx")
  }

  test("q_ann_recall: candidate recall is a counting model, monotone in nprobe") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q_ann_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    // every probe set evaluates the same ground truth: |queries| x 10
    // pairs, so n_pairs is constant and a multiple of RecallK
    assert(rows.map(_._2).distinct.length == 1 && rows.head._2 % 10 == 0)
    // probing MORE cells can only reach MORE of the truth: hits (and
    // recall) must be non-decreasing in nprobe, and recall = hits/pairs
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3, s"recall not monotone: $a -> $b") }
    rows.foreach { case (_, n, h, r) =>
      assert(h <= n && math.abs(r - h.toDouble / n) < 1e-15) }
  }

  /** Textbook winnowing (Schleimer et al.): per window of 8 gram
    * hashes select the min, rightmost tie winning; distinct (pos, h)
    * selections. Independent of the query's key-encoding trick. */
  private def winnowModel(text: String): Option[(Long, Long, Long)] = {
    val n = math.min(text.length - 7, 2048)
    if (n < 8) return None
    val hs = (1 to n).map(p =>
      java.lang.Long.parseLong(
        md5hex(text.substring(p - 1, p + 7)).substring(0, 8), 16))
    val sel = (8 to n).map { j =>
      val win = (j - 7 to j).map(p => (hs(p - 1), p))
      val minH = win.map(_._1).min
      val p = win.filter(_._1 == minH).map(_._2).max
      (p, hs(p - 1))
    }.distinct
    Some((sel.size.toLong, sel.map(_._2).distinct.size.toLong,
      sel.map(_._2).sum))
  }

  test("q_dup_report: exact surplus per source, near-dup exposure crosses sources") {
    val ss = spark
    import ss.implicits._
    val seed = 11L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val a = Seq.fill(200)("abcd".charAt(rnd.nextInt(4))).mkString
    val b = Seq.fill(200)("efgh".charAt(rnd.nextInt(4))).mkString
    val c = Seq.fill(200)("ijkl".charAt(rnd.nextInt(4))).mkString
    val cNear = c.updated(195, 'z').mkString       // bands with c
    val d = Seq.fill(200)("mnop".charAt(rnd.nextInt(4))).mkString
    val dir = java.nio.file.Files.createTempDirectory("dupdocs").toString
    Seq(
      (1L, a, "s1"), (2L, a, "s1"), (3L, b, "s1"),   // exact dup inside s1
      (4L, c, "s2"), (5L, cNear, "s2"), (6L, d, "s2"), // near-dup pair in s2
      (7L, a, "s2"))                                  // cross-source exact copy
      .toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_dup_report")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // s1: 3 docs, 2 distinct texts; a's cluster spans docs 1,2,7 -> both
    // s1 copies are near-dup-exposed
    assert(got("s1") === ((3L, 2L, 2L)))
    // s2: 4 docs, all texts distinct WITHIN s2 (exact surplus 0), but
    // c/cNear band together and doc 7 joins a's cross-source cluster
    assert(got("s2") === ((4L, 4L, 3L)))
  }

  test("q_winnow: equivalence with textbook winnowing on random docs") {
    val seed = 42L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    def randText(len: Int) = Seq.fill(len)("ab".charAt(rnd.nextInt(2))).mkString
    val texts = Seq.tabulate(8)(i => randText(20 + rnd.nextInt(180))) ++
      Seq(randText(14),          // 7 grams only: absent from the output
          randText(10), "")      // too short / empty: absent
    val docsSeq = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) } ++
      Seq((100L, texts.head))    // duplicate content: same sketch, own row
    val dir = writeDocs(docsSeq)
    val got = graft.SparkEntry.queries("q_winnow")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = docsSeq.flatMap { case (id, t) => winnowModel(t).map(id -> _) }.toMap
    assert(got === want)
    assert(got.contains(100L) && got(100L) === got(1L), "dup doc re-keyed")
    assert(!got.contains(9L) && !got.contains(10L) && !got.contains(11L))
  }

  test("q_winnow_pairs: a long verbatim overlap pairs docs that would never band") {
    val seed = 5L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    def rt(len: Int, ab: String) = Seq.fill(len)(ab.charAt(rnd.nextInt(ab.length))).mkString
    // a 120-char quote embedded in two otherwise-unrelated 400-char docs:
    // whole-doc similarity is low (banding would likely miss it) but the
    // winnowing guarantee forces >= WinnowMinShared shared fingerprints
    val quote = rt(120, "abcd")
    val d1 = rt(200, "efgh") + quote + rt(80, "ijkl")
    val d2 = rt(150, "mnop") + quote + rt(130, "qrst")
    val lone = rt(400, "uvwx")
    val dir = writeDocs(Seq((1L, d1), (2L, d2), (3L, lone)))
    val got = graft.SparkEntry.queries("q_winnow_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet === Set((1L, 2L)),
      s"only the quote pair reports, got $got")
    // a 120-char run yields ~15 windows of selected fingerprints; well
    // past the report bar
    assert(got((1L, 2L)) >= 5L)
  }

  test("q_minhash_acc: exact-Jaccard columns match a set model; error is the stated formula") {
    val seed = 7L
    info(s"seed = $seed")
    val rnd = new scala.util.Random(seed)
    val base = Seq.fill(300)("abcd".charAt(rnd.nextInt(4))).mkString
    val near = base.updated(290, 'z').mkString  // tail edit: most lanes equal
    val far = Seq.fill(300)("wxyz".charAt(rnd.nextInt(4))).mkString
    val dir = writeDocs(Seq(
      (1L, base), (2L, near), (3L, far), (4L, base)))  // 4 collapses into 1
    def shingles(t: String): Set[String] =
      (1 to math.min(t.length - 7, 2048) by 4).map(p => t.substring(p - 1, p + 7)).toSet
    val rows = graft.SparkEntry.queries("q_minhash_acc")(spark, dir).collect()
    assert(rows.nonEmpty, "the near-dup pair must band together")
    val texts = Map(1L -> base, 2L -> near, 3L -> far)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b && texts.contains(a) && texts.contains(b),
        s"pair ($a,$b) must be over distinct-text reps")
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val (num, den) = ((sa & sb).size.toLong, (sa | sb).size.toLong)
      assert(r.getLong(3) === num && r.getLong(4) === den, s"pair ($a,$b)")
      val nEq = r.getLong(2)
      assert(nEq >= 1 && nEq <= 16)
      assert(r.getLong(5) ===
        math.abs(nEq * den - 16 * num) * 1000 / (16 * den), s"pair ($a,$b)")
    }
    assert(rows.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "the engineered near-dup pair is a candidate")
  }
}
