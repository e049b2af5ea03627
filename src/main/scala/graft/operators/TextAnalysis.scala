package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.TrackedPersist

/** Text-analysis operators over `documents`: per-document statistics /
  * quality signals, n-gram-heuristic language ID, and shingle-hash
  * document fingerprints (winnowing-style min-k sketch).
  *
  * Every derived ratio is a single division of exact integers, so the
  * values are bit-identical across engines and cluster sizes. All of
  * these are single-pass groupBy aggregations — at 100 TB they are one
  * scan + one hash aggregate each (map-side partials apply; doc_id is
  * unique so there is no skew).
  */
object TextAnalysis {

  /** Per-document stats: token counts (whitespace + BPE-ish regex),
    * type-token ratio, average token length, and a coarse quality
    * bucket. The regex token count stands in for subword tokenizers:
    * letter runs, digit runs, and single non-alnum marks.
    *
    * Entirely IN-ROW (round 9): every statistic is a per-document
    * function of the token array, so the r8 spelling — explode to a
    * token frame, doc-keyed groupBy (a full-corpus shuffle), then a
    * JOIN back to the doc scan — was three wide stages for zero
    * cross-row semantics. Now one scan with codegen'd collection
    * expressions: `size` for the count, `size(array_distinct)` for
    * the distinct count, `length(array_join(w, ''))` for the summed
    * token length (no separator — exactly Σ length(t)), and the
    * native [[graft.functions.TokenRunCount]] for the subword count.
    * A zero-token document drops (matching the oracle, where it has
    * no token rows to aggregate). At 100 TB: map-only until the
    * presentation sort.
    */
  def stats(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    docs
      // size(tokens) > 0 ⟺ text has a non-space char: the cheap
      // spelling keeps the pushed-down filter from re-tokenizing
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        Dedup.tokens(col("text")).as("w"),
        graft.functions.TokenRunCount(col("text")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        length(array_join(col("w"), "")).cast("long").as("sum_token_len"),
        col("n_bpe_tokens"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"), col("n_tokens"),
        col("n_distinct"), col("n_bpe_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("ttr"),
        (col("sum_token_len").cast("double") / col("n_tokens"))
          .as("avg_token_len"),
        when(col("n_tokens") >= 20 && col("n_tokens") <= 200 &&
          (col("n_distinct").cast("double") / col("n_tokens")) > 0.4, "good")
          .otherwise("poor").as("quality"))
      .orderBy("doc_id")
  }

  /** Stopword-marker language ID (n-gram heuristic) scored against the
    * labelled `lang` column, emitted as a confusion matrix. Marker sets
    * are deliberately tiny — the operator shape (per-doc scoring + one
    * aggregation) is what scales, not the lexicon.
    */
  def langIdConfusion(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(Dedup.tokens(col("text"))).as("t"))
    val scores = tok.groupBy(col("doc_id"), col("lang"))
      .agg(
        sum(when(col("t").isin("the", "a", "and", "of", "to"), 1)
          .otherwise(0)).as("en_score"),
        sum(when(col("t").isin("der", "die", "und", "das", "ist"), 1)
          .otherwise(0)).as("de_score"),
        sum(when(col("t").isin("le", "la", "et", "les", "un"), 1)
          .otherwise(0)).as("fr_score"),
        sum(when(col("t").isin("el", "los", "que", "de", "y"), 1)
          .otherwise(0)).as("es_score"))
    scores
      .select(col("lang"),
        when(col("en_score") >= col("de_score") &&
          col("en_score") >= col("fr_score") &&
          col("en_score") >= col("es_score") && col("en_score") > 0, "en")
          .when(col("de_score") >= col("fr_score") &&
            col("de_score") >= col("es_score") && col("de_score") > 0, "de")
          .when(col("fr_score") >= col("es_score") &&
            col("fr_score") > 0, "fr")
          .when(col("es_score") > 0, "es")
          .otherwise("unknown").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** Character-trigram Jaccard near-dup pairs with BLOCKING (the
    * classic non-LSH scalable dedup technique): candidate pairs are
    * bounded to the same (lang, length-band) block, so the quadratic
    * comparison never crosses blocks; exact char-3-gram Jaccard
    * verifies. Complements the MinHash (probabilistic, word-level) and
    * SimHash (hamming, token-level) variants with an exact
    * character-level one.
    *
    * 100 TB note: blocking keys shuffle-partition the corpus; the
    * within-block quadratic is the operator's contract (choose finer
    * bands for bigger corpora — the key is just a column expression).
    */
  def charGramJaccardPairs(docs: DataFrame,
      threshold: Double = 0.7): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("lang"),
        expr("n_chars DIV 100").as("len_band"),
        explode(when(length(col("text")) < 3, array())
          .otherwise(expr(
            "transform(sequence(1, length(text) - 2), i -> substr(lower(text), i, 3))")))
          .as("g"))
      .distinct()
    val cnt = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val blocks = grams.select("doc_id", "lang", "len_band").distinct()
    val cand = blocks.as("b1")
      .join(blocks.as("b2"),
        col("b1.lang") === col("b2.lang") &&
          col("b1.len_band") === col("b2.len_band") &&
          col("b1.doc_id") < col("b2.doc_id"))
      .select(col("b1.doc_id").as("a"), col("b2.doc_id").as("b"))
    val inter = cand
      .join(grams.as("g1"), col("g1.doc_id") === col("a"))
      .join(grams.as("g2"),
        col("g2.doc_id") === col("b") && col("g2.g") === col("g1.g"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("i"))
    val jac = col("i").cast("double") / (col("ca.n") + col("cb.n") - col("i"))
    inter
      .join(cnt.as("ca"), col("ca.doc_id") === col("a"))
      .join(cnt.as("cb"), col("cb.doc_id") === col("b"))
      .select(col("a"), col("b"), jac.as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** Materialized deduplicated corpus: exactly one representative row
    * (minimum doc_id) per distinct text. The keep-one counterpart of
    * Dedup.exactGroups — what a training pipeline actually writes out.
    * One window over the fingerprint (hash-partitioned, no skew).
    */
  def dedupedCorpus(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test assignment: md5(doc_id)-derived
    * bucket in 0..99 → 90/5/5 split. Content-stable (the same document
    * lands in the same split on any engine, any cluster, any run) —
    * the property a training pipeline needs so eval sets never leak
    * across reruns. Emitted as per-split counts plus min/max ids for
    * spot-checking.
    */
  /** Per-document split assignment (the reusable core of
    * [[trainSplit]]): adds a `split` column from the content-stable md5
    * bucket. Used standalone by the corpus builder.
    */
  def withSplit(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    docs
      .withColumn("bucket",
        Dedup.hexPrefix(md5(col("doc_id").cast("string").cast("binary")))
          % 100)
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test"))
      .drop("bucket")
  }

  /** First-iteration BPE merge statistics: corpus-wide counts of
    * adjacent token pairs — the inner loop of byte-pair-encoding
    * tokenizer training (count pairs → merge the best → repeat). One
    * explode + one hash aggregate; the top-k cut is exact because the
    * (n DESC, a, b) order is total. At 100 TB: map-side partial counts
    * collapse the pair stream before the shuffle, and the shuffle key
    * cardinality is vocab², not corpus size.
    */
  def bpePairs(docs: DataFrame, topK: Int = 50): DataFrame =
    docs.select(Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('a', w[i-1], 'b', w[i]))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("a"), col("b"))
      .limit(topK)

  /** Bigram-vocabulary coverage — a language-model-quality proxy that
    * stays deterministic (no transcendental log-perplexity; a fraction
    * of exact integers instead): per document, the share of its
    * adjacent-token bigrams found in the corpus-wide top-`vocabK`
    * bigram vocabulary. Low coverage = unusual token sequences
    * (boilerplate, non-text, other-language leakage).
    *
    * Scale shape: the vocabulary is a fixed-size top-k (broadcast), so
    * the per-doc pass is one scan + broadcast probe + doc_id hash agg —
    * no shuffle grows with the corpus.
    */
  def bigramCoverage(docs: DataFrame, vocabK: Int = 200): DataFrame = {
    val vocab = bpePairs(docs, vocabK).select(col("a"), col("b"))
      .withColumn("hit", lit(1L))
    val pairs = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('a', w[i-1], 'b', w[i]))")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    pairs
      .join(broadcast(vocab), Seq("a", "b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_in_vocab"))
      .select(col("doc_id"), col("n_bigrams"), col("n_in_vocab"),
        (col("n_in_vocab").cast("double") / col("n_bigrams")).as("coverage"))
      .orderBy("doc_id")
  }

  /** Per-source boilerplate concentration census: for each source, the
    * total and distinct adjacent-token bigram counts plus the mass its
    * own top-`topK` bigrams capture, as exact ppm. A templated source
    * (navigation chrome, license headers, generated prose) concentrates
    * bigram mass in a handful of patterns; organic text spreads it —
    * the census ranks sources by that concentration so a curator knows
    * where boilerplate-stripping effort pays. Complements
    * [[bigramCoverage]] (per-DOC share of a corpus-wide vocabulary)
    * and the q133 per-doc duplicate fraction: this is the per-SOURCE
    * rollup with an explicit top-k mass share.
    *
    * Scale shape: the bigram explode feeds a (source, bigram) hash
    * aggregate whose map-side partials absorb per-doc repetition, so
    * the shuffle carries one row per DISTINCT (source, bigram) —
    * vocabulary-sized, not corpus-sized. The row_number window then
    * runs over that vocabulary frame partitioned by source, and the
    * final rollup is |sources| rows. Nothing downstream of the first
    * aggregate scales with the corpus.
    */
  def boilerplateCensus(docs: DataFrame, topK: Int = 10): DataFrame = {
    val counts = docs
      .select(col("source"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('a', w[i-1], 'b', w[i]))")).as("p"))
      .groupBy(col("source"), col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy(desc("n"), col("a"), col("b"))))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("total_bigrams"),
        count(lit(1)).as("distinct_bigrams"),
        sum(when(col("r") <= topK, col("n")).otherwise(lit(0L)))
          .as("top_mass"))
      .select(col("source"), col("total_bigrams"), col("distinct_bigrams"),
        col("top_mass"),
        expr("top_mass * 1000000 DIV total_bigrams").as("top_ppm"))
      .orderBy("source")
  }

  /** Cross-source shingle overlap matrix: for every source pair, the
    * number of distinct word 3-grams present in both — the
    * contamination / provenance signal a corpus curator watches when
    * mixing crawls (a high-overlap pair means one source republishes
    * the other).
    *
    * Scale shape: after the (source, shingle) DISTINCT projection, a
    * shingle's posting list is bounded by the NUMBER OF SOURCES (a
    * constant ~dozens), not by corpus size — so the self-join per
    * shingle emits at most |sources|² rows and the classic inverted-
    * index blowup cannot happen, with no df cap needed.
    */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val ss = Dedup.shingles(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("shingle")).distinct()
    ss.as("x")
      .join(ss.as("y"),
        col("x.shingle") === col("y.shingle") &&
          col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("s1"), col("y.source").as("s2"))
      .agg(count(lit(1)).as("shared_shingles"))
      .orderBy("s1", "s2")
  }

  /** Deterministic hash-stratified sampling: every document falls in a
    * content-stable md5 bucket (0..99, keyed separately from the
    * train/val/test split hash so the two draws are independent), and
    * each language stratum keeps buckets below its own rate — the
    * standard way a pipeline up-samples low-resource languages. No
    * RNG, no `TABLESAMPLE`: the same doc is kept on any engine, any
    * cluster size, any rerun — and the sample is reproducible from the
    * data alone. Pure per-row projection + filter (codegen'd, no
    * shuffle).
    */
  def stratifiedSample(docs: DataFrame, enRate: Int = 10,
      defaultRate: Int = 30): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    docs
      .withColumn("bucket",
        Dedup.hexPrefix(md5(
          concat(lit("s:"), col("doc_id").cast("string")).cast("binary")))
          % 100)
      .where(col("bucket") <
        when(col("lang") === "en", enRate).otherwise(defaultRate))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Fixed-quota sampling: exactly min(N, |stratum|) documents per
    * language, chosen by a content-stable md5 order (not arrival or
    * storage order, which differ per engine and per run). The
    * complement of [[stratifiedSample]]'s rate sampling: quotas give a
    * balanced eval set regardless of stratum skew.
    *
    * Scale shape: one window ranked within lang — the per-stratum sort
    * is the unavoidable cost of an exact quota; at 100 TB the
    * rate-sample would pre-shrink the stream first (compose the two).
    */
  def quotaSample(docs: DataFrame, perStratum: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val w = Window.partitionBy(col("lang")).orderBy(col("k"), col("doc_id"))
    docs
      .withColumn("k",
        Dedup.hexPrefix(md5(
          concat(lit("q:"), col("doc_id").cast("string")).cast("binary"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= perStratum)
      .select(col("doc_id"), col("lang"), col("rk"))
      .orderBy("lang", "rk")
  }

  /** Distinctive-term extraction: each document's `k` rarest tokens by
    * corpus document frequency (df ASC, token ASC — a total order, so
    * the cut is exact). The deterministic stand-in for TF-IDF keyword
    * extraction: rarity rank needs no transcendental `log`, so the
    * result is bit-stable across engines.
    *
    * Scale shape: the (token, df) table is vocabulary-sized; tokens
    * join it on the token key and a per-doc window takes the top-k —
    * doc groups are bounded by document length, never corpus size.
    */
  def rareTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("token"))
      .distinct()
    val dfs = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("token"))
    tok.join(dfs, "token")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("df"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Corpus length-distribution report: documents cut into ten
    * equal-population deciles by (n_chars, doc_id) — a total order, so
    * NTILE is deterministic — with per-decile count and char bounds.
    * The profile a curation run reads before choosing chunking and
    * packing budgets.
    *
    * Scale shape: NTILE over an ORDER BY-only window funnels EVERY row
    * into one partition (Spark logs the degradation warning) — a
    * single-task sort that dies at corpus scale. Instead the global
    * rank is computed distributed: a range repartition + in-partition
    * sort gives the total (n_chars, doc_id) order across partitions,
    * and zipWithIndex assigns global positions from one lightweight
    * per-partition count pass. The exact SQL NTILE tile then follows
    * arithmetically from (rank, n): the first n mod 10 tiles hold
    * ceil(n/10) rows, the rest floor(n/10).
    */
  def lengthDeciles(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = docs.count()
    val sorted = docs
      .select(col("n_chars").cast("long").as("n_chars"),
        col("doc_id").cast("long").as("doc_id"))
      .repartitionByRange(col("n_chars"), col("doc_id"))
      .sortWithinPartitions("n_chars", "doc_id")
      .as[(Long, Long)]
    val k = 10L
    val q = n / k
    val r = n % k
    val cut = r * (q + 1) // ranks ≤ cut land in the ceil-sized tiles
    sorted.rdd.zipWithIndex()
      .map { case ((chars, _), idx) =>
        val rn = idx + 1L // 1-based rank in the total order
        val tile =
          if (rn <= cut) (rn - 1) / (q + 1) + 1
          else r + (rn - cut - 1) / q + 1
        (tile, chars)
      }
      .toDF("decile", "n_chars")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("decile")
  }

  /** Per-source duplication report: how much of each source is exact
    * duplicate — the provenance signal that catches a mirror or a
    * scraped re-crawl before near-dup work is spent on it. One hash
    * aggregate on (source, md5); the rate is a single division of
    * exact longs. Null-text documents are counted separately
    * (`n_null_text`) and excluded from the dup arithmetic:
    * COUNT(DISTINCT md5(text)) ignores NULLs, so leaving nulls in the
    * denominator would report them as duplicates of each other and
    * inflate the rate. A source of only null docs reports a null rate.
    */
  def dupRateBySource(docs: DataFrame): DataFrame =
    docs
      .groupBy(col("source"))
      .agg(count(col("text")).as("n_docs"),
        (count(lit(1)) - count(col("text"))).as("n_null_text"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique"))
      .select(col("source"), col("n_docs"), col("n_null_text"),
        col("n_unique"),
        ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs"))
          .as("dup_rate"))
      .orderBy("source")

  def trainSplit(docs: DataFrame): DataFrame =
    withSplit(docs)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("split")

  /** Cross-split contamination report: for each evaluation split
    * (val / test), how much of it leaks from train — exact-duplicate
    * documents (md5 membership in train's text set) and shared word
    * 3-gram shingles (the same shingle inventory the decontamination
    * operator q57 uses against external benchmarks, here applied to the
    * corpus's OWN split boundary). The leak a held-out eval inherits
    * from its training set is the first thing to audit before trusting
    * a validation loss.
    *
    * Scale shape: split membership is a pure function of doc_id (no
    * shuffle to assign); the shingle side is |distinct (split,
    * shingle)| — bounded by corpus token count — and both membership
    * probes are semi-joins on md5/shingle keys, never row payloads.
    * All arithmetic is integer counts; the single fraction divides two
    * exact longs.
    */
  def splitContamination(docs: DataFrame): DataFrame = {
    val sd = withSplit(docs)
    val sh = graft.operators.Dedup.shingles(docs)
      .join(sd.select(col("doc_id"), col("split")), "doc_id")
    val spl = sh.select(col("split"), col("shingle")).distinct()
    val trainSh = spl.where(col("split") === "train").select("shingle")
    val evalSh = spl.where(col("split") =!= "train")
    val shTotals = evalSh.groupBy("split")
      .agg(count(lit(1)).as("n_shingles"))
    val shLeaked = evalSh.join(trainSh, Seq("shingle"), "left_semi")
      .groupBy("split").agg(count(lit(1)).as("n_leaked_shingles"))
    val hashed = sd.select(col("split"),
      md5(col("text").cast("binary")).as("h"))
    val trainH = hashed.where(col("split") === "train")
      .select("h").distinct()
    val evalDocs = hashed.where(col("split") =!= "train")
    val docTotals = evalDocs.groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
    val docLeaked = evalDocs.join(trainH, Seq("h"), "left_semi")
      .groupBy("split").agg(count(lit(1)).as("n_exact_dup_docs"))
    docTotals
      .join(docLeaked, Seq("split"), "left")
      .join(shTotals, Seq("split"), "left")
      .join(shLeaked, Seq("split"), "left")
      .select(col("split"), col("n_docs"),
        coalesce(col("n_exact_dup_docs"), lit(0L)).as("n_exact_dup_docs"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_leaked_shingles"), lit(0L))
          .as("n_leaked_shingles"),
        (coalesce(col("n_leaked_shingles"), lit(0L)).cast("double") /
          coalesce(col("n_shingles"), lit(0L))).as("leak_frac"))
      .orderBy("split")
  }

  /** Per-language corpus profile: document/source counts plus exact
    * char/token totals and their per-doc means — the language-mix
    * table a multilingual training run reads before setting sampling
    * temperatures. One hash aggregate; integer sums; two final
    * divisions.
    */
  def langReport(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"), col("n_chars"),
        size(graft.operators.Dedup.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1)))
          .as("avg_chars"),
        (sum(col("n_tokens")).cast("double") / count(lit(1)))
          .as("avg_tokens"))
      .orderBy("lang")

  /** Temperature-scaled language sampling weights (alpha = 0.5): each
    * language's sampling probability is proportional to
    * sqrt(total_tokens) — the standard multilingual up-weighting of
    * low-resource languages (p_l ∝ n_l^alpha) at the canonical
    * temperature. Reports the raw token share, the alpha-scaled
    * sampling probability, and the boost factor (sample_prob /
    * token_share: > 1 means the language is up-sampled).
    *
    * Determinism: the sqrt weight is quantized to micro-units
    * (floor(sqrt(tokens)·1e6 + 0.5) — sqrt is IEEE-correctly-rounded in
    * both engines), so both weight totals are exact long sums and every
    * reported double is a single division of exact operands. Scale
    * shape: one corpus-scan hash agg into a |languages|-row table; the
    * totals join is a broadcast of one row.
    */
  def samplingWeights(docs: DataFrame): DataFrame = {
    import graft.operators.CacheRegistry.TrackedPersist
    val per = docs
      .select(col("lang"),
        size(graft.operators.Dedup.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .withColumn("w",
        floor(sqrt(col("total_tokens").cast("double")) * lit(1000000.0) +
          lit(0.5)))
      // |languages|-sized; feeds BOTH the totals and the join-back —
      // unpersisted, the corpus tokenize+agg ran twice (the q194 rule)
      .trackedPersist()
    val tot = per.agg(sum(col("total_tokens")).as("tok_sum"),
      sum(col("w")).as("w_sum"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("total_tokens"), col("w"),
        (col("total_tokens").cast("double") / col("tok_sum"))
          .as("token_share"),
        (col("w").cast("double") / col("w_sum")).as("sample_prob"),
        ((col("w").cast("double") / col("w_sum")) /
          (col("total_tokens").cast("double") / col("tok_sum"))).as("boost"))
      .orderBy("lang")
  }

  /** Vocabulary growth curve: distinct-token (vocab) and total-token
    * counts over nested 10% / 25% / 50% / 100% corpus subsets, chosen
    * by the same content-stable md5 doc bucket the split assignment
    * uses — the Heaps'-law profile that tells a tokenizer-training run
    * how vocabulary scales with corpus size, from ONE corpus pass.
    *
    * Scale shape: tokens are exploded once and collapsed to a
    * (token, min_bucket) table — vocab-sized, not corpus-sized — so
    * each subset's vocab is a conditional count over that small table;
    * doc counts and token totals come from a doc-level (bucket, n)
    * projection. Nothing rescans the corpus per threshold. The
    * type-token ratio is a single division of exact longs.
    */
  def vocabGrowth(docs: DataFrame,
      thresholds: Seq[Int] = Seq(10, 25, 50, 100)): DataFrame = {
    val sorted = thresholds.sorted
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.install(spark)
    val bucket =
      Dedup.hexPrefix(md5(col("doc_id").cast("string").cast("binary"))) % 100
    // band = smallest threshold a bucket first falls under; the corpus
    // is touched exactly twice (doc-level projection + token explode),
    // then everything is |thresholds|-sized
    def bandOf(b: Column): Column =
      sorted.init.foldRight(lit(sorted.last.toLong)) { (t, acc) =>
        when(b < t, t.toLong).otherwise(acc)
      }
    val docBand = docs
      .select(bucket.as("b"),
        size(graft.operators.Dedup.tokens(col("text"))).cast("long").as("n"))
      .groupBy(bandOf(col("b")).as("band"))
      .agg(count(lit(1)).as("dn"), sum(col("n")).as("tn"))
    val tokBand = docs
      .select(bucket.as("b"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("token"))
      .groupBy("token").agg(min(col("b")).as("mb"))
      .groupBy(bandOf(col("mb")).as("band"))
      .agg(count(lit(1)).as("vn"))
    // nested subsets = cumulative sums over the ≤|thresholds| band rows
    val spine = sorted.map(_.toLong).toDF("pct")
    val d = spine.join(docBand, col("band") <= col("pct"), "left")
      .groupBy("pct")
      .agg(coalesce(sum(col("dn")), lit(0L)).as("n_docs"),
        coalesce(sum(col("tn")), lit(0L)).as("n_tokens"))
    val v = spine.join(tokBand, col("band") <= col("pct"), "left")
      .groupBy("pct")
      .agg(coalesce(sum(col("vn")), lit(0L)).as("vocab"))
    d.join(v, "pct")
      // mirror the oracle's inner-join shape: a threshold reports only
      // once its subset has documents and tokens
      .where(col("n_docs") > 0 && col("vocab") > 0)
      .select(col("pct"), col("n_docs"), col("n_tokens"), col("vocab"),
        (col("vocab").cast("double") / col("n_tokens")).as("type_token_ratio"))
      .orderBy("pct")
  }

  /** Token-budget sampling plan: given a total training-token budget,
    * how many tokens each language contributes under the alpha=0.5
    * temperature weights ([[samplingWeights]]) and how many epochs over
    * its corpus that implies (> 1 means the language repeats). The
    * planning table a run prints before launching.
    *
    * planned_tokens = floor(budget · sample_prob) — one double
    * multiply + floor, deterministic; epochs is a single division.
    */
  def tokenBudgetPlan(docs: DataFrame,
      budget: Long = 1000000000L): DataFrame =
    samplingWeights(docs)
      .select(col("lang"), col("total_tokens"), col("sample_prob"),
        floor(col("sample_prob") * lit(budget).cast("double"))
          .as("planned_tokens"))
      .select(col("lang"), col("total_tokens"), col("sample_prob"),
        col("planned_tokens"),
        (col("planned_tokens").cast("double") / col("total_tokens"))
          .as("epochs"))
      .orderBy("lang")

  /** The k most-duplicated texts: exact-dup groups of 2+ ranked by copy
    * count (fingerprint tiebreak makes the top-k total-ordered), with
    * the smallest doc_id as the inspectable example. This is the
    * "what IS all this boilerplate" report a curation run prints before
    * choosing dedup thresholds. One hash aggregate on md5 + a bounded
    * TakeOrdered — no sort of the full group list.
    *
    * `prefixLen > 0` fingerprints only the first `prefixLen` characters:
    * the "shared boilerplate opening" report (license headers, scraped
    * nav chrome) that catches near-dups whose tails diverge — distinct
    * full texts that open identically group together.
    */
  def topDuplicatedTexts(docs: DataFrame, k: Int = 20,
                         prefixLen: Int = 0): DataFrame = {
    val key = if (prefixLen > 0) substring(col("text"), 1, prefixLen)
              else col("text")
    docs
      .select(md5(key.cast("binary")).as("fingerprint"), col("doc_id"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("example_doc_id"))
      .where(col("n_copies") >= 2)
      .orderBy(desc("n_copies"), col("fingerprint"))
      .limit(k)
  }

  /** Conservative ASCII patterns shared by the redactor and its oracle.
    * Deliberately restricted to constructs Java's regex engine and RE2
    * (DuckDB) interpret identically: literal classes, `\d`, ASCII `\b`,
    * bounded quantifiers — no lookaround, no backrefs, no Unicode
    * classes. That restriction is also what keeps the expression inside
    * whole-stage codegen on the Spark side.
    */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePattern = """\+\d{1,2}-\d{3}-\d{3}-\d{4}"""
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** PII scrub for training corpora: replace emails, E.164-ish phone
    * numbers, and IPv4 literals with typed placeholder tokens, and count
    * what was removed (the counts are the audit signal a pipeline
    * monitors for drift). Pure per-row `regexp_replace`/
    * `regexp_extract_all` projection — no shuffle, codegen'd, trivially
    * 100 TB-parallel. Redaction order is fixed (email → phone → IP) so
    * the output is deterministic even where patterns could overlap.
    */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "[EMAIL]"),
          PhonePattern, "[PHONE]"),
        Ipv4Pattern, "[IP]").as("redacted"))
      .orderBy("doc_id")
  }

  /** Sequence packing for training: assign documents to fixed-budget
    * token sequences with the "concatenate-then-chunk" model (a doc
    * belongs to the chunk its running token offset starts in — the
    * standard GPT-style token-stream layout, where a document may
    * straddle a chunk boundary and the consumer reads on). Two-level
    * layout keeps it 100 TB-parallel: documents shard by a
    * content-stable md5 bucket (shards are fully independent — at real
    * scale use 2^16 shards so each is executor-sized), and within a
    * shard the offset is a partitioned window cumsum ordered by doc_id
    * (deterministic on any engine, any run). Emits per-sequence
    * occupancy — the signal a pipeline monitors for packing efficiency.
    */
  def packSequences(docs: DataFrame, budget: Int = 512,
      shards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    graft.functions.GraftFunctions.install(docs.sparkSession)
    docs
      .select(col("doc_id"),
        (Dedup.hexPrefix(md5(col("doc_id").cast("string").cast("binary")))
          % shards).as("shard"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_in_shard", expr(s"cum_before DIV $budget"))
      .groupBy(col("shard"), col("seq_in_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "seq_in_shard")
  }

  /** Striding token chunker — the long-document counterpart of
    * [[packSequences]]: where packing concatenates SHORT documents into
    * budget-sized sequences, chunking SPLITS a long document into
    * overlapping windows. This is the TRAINING-side stride semantics
    * (the HF-tokenizer `stride` pattern): chunk starts advance by
    * `stride` tokens — EVERY stride start is emitted, including a final
    * suffix tail contained in its predecessor's window, because that is
    * what a striding trainer actually consumes — and the payload is a
    * compact hash handle, not text. [[chunkDocuments]] is the sibling
    * serving RAG/indexing: it suppresses contained tails and emits the
    * chunk text itself. Token units are the whitespace words of
    * [[Dedup.tokens]] (engine-exact, so the emitted md5-prefix
    * `chunk_hash` — the handle chunk-level exact dedup keys on —
    * replays bit-for-bit in any engine; a subword tokenizer slots in by
    * swapping the token column).
    *
    * Scale shape: pure per-row transform — tokenize, explode
    * ceil(n/stride) chunk starts, slice + hash each window inside the
    * same projection. No join, no aggregate; the only shuffle is the
    * presentation sort, and a writer would drop it. Output volume is
    * (window/stride)× the corpus, the overlap factor the caller chose.
    */
  /** Shared chunk-span builder: one row per (doc, window) with the FULL
    * md5 hex of the space-joined token slice. Extra pass-through
    * columns (e.g. `source`) survive the explode.
    */
  private[graft] def chunkSpans(docs: DataFrame, window: Int, stride: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    val keep = (Seq("doc_id") ++ carry).map(col)
    docs
      .select(keep :+ Dedup.tokens(col("text")).as("w"): _*)
      .where(size(col("w")) > 0)
      .select(keep ++ Seq(col("w"),
        explode(expr(s"sequence(0, size(w) - 1, $stride)")).as("start")): _*)
      .select(keep ++ Seq(
        expr(s"CAST(start DIV $stride AS BIGINT)").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        least(lit(window), size(col("w")) - col("start")).cast("long")
          .as("n_tok"),
        md5(concat_ws(" ", slice(col("w"), col("start") + 1, lit(window)))
          .cast("binary")).as("hex")): _*)
  }

  def chunkTokens(docs: DataFrame, window: Int = 32,
      stride: Int = 24): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    chunkSpans(docs, window, stride)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_tok"),
        Dedup.hexPrefix(col("hex")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Chunk-level dedup savings census: for each source, the token mass
    * chunk-granular exact dedup would reclaim — the estimator a curator
    * reads before deciding whether sub-document dedup pays for a
    * boilerplate-heavy source (whole-doc dedup misses chrome repeated
    * INSIDE otherwise-distinct pages; this measures it). Groups
    * [[chunkSpans]] windows by their FULL md5 (collision-free at any
    * corpus size, unlike the 32-bit prefix id `chunkTokens` emits for
    * compactness), counts within-source duplicate windows, and prices
    * the reclaim: `dup_tokens = Σ_groups (count-1)·n_tok`, as exact ppm
    * of the source's chunk token mass.
    *
    * Scale shape: explode → (source, hash) hash-aggregate with map-side
    * partials (the shuffle carries one row per DISTINCT chunk per
    * source, and duplicate-heavy inputs shrink the exchange, not grow
    * it) → |sources| rollup. Same skew-free 128-bit key discipline as
    * [[Dedup.exactGroups]].
    */
  def chunkDedupCensus(docs: DataFrame, window: Int = 32,
      stride: Int = 24): DataFrame =
    chunkSpans(docs, window, stride, carry = Seq("source"))
      .groupBy(col("source"), col("hex"))
      .agg(count(lit(1)).as("cnt"), min(col("n_tok")).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("cnt") * col("n_tok")).as("chunk_tokens"),
        sum((col("cnt") - 1) * col("n_tok")).as("dup_tokens"))
      .select(col("source"), col("n_chunks"), col("n_distinct_chunks"),
        col("chunk_tokens"), col("dup_tokens"),
        expr("dup_tokens * 1000000 DIV chunk_tokens").as("dup_ppm"))
      .orderBy("source")

  /** Content-defined chunk census: [[chunkDedupCensus]]'s per-source
    * reclaim table, but with chunk boundaries chosen by CONTENT
    * ([[graft.functions.CdcCuts]]: a cut wherever the windowed-md5
    * fold of the trailing `window` chars is ≡ 0 mod `div`) instead of
    * by offset stride. The difference is what each census can see: one
    * inserted banner shifts every strided window after it and the
    * strided census scores the re-crawl as 100% novel, while CDC
    * boundaries resynchronize within ~`window` chars of the edit and
    * the shared tail dedups chunk-for-chunk — the rsync/LBFS argument,
    * measured directly by the q146 gate's prefix-injected re-crawl.
    *
    * Duplication is counted CORPUS-WIDE and attributed per source —
    * unlike [[chunkDedupCensus]]'s within-source reclaim, because the
    * signal CDC exists to catch is cross-source: a re-crawl's chunks
    * match the ORIGINAL source's documents, never its own siblings. A
    * chunk instance is duplicated iff its full md5 occurs ≥ 2 times
    * anywhere in the corpus; per source the census reports total /
    * source-distinct chunk counts, chunk char mass, the char mass
    * sitting in corpus-duplicated chunks, and that share in exact ppm.
    *
    * Scale shape: the cut scan is one codegen'd per-row pass (no
    * |text|-row position explode — that spelling is the oracle's, not
    * ours); chunk extraction is a per-row `zip_with` over the ~L/div
    * cuts; then a (source, md5) hash-aggregate (the shuffle carries
    * one row per distinct chunk per source), a |distinct hex|-sized
    * global-count aggregate, and a hex-keyed join of those two
    * DISTINCT-chunk frames — duplication shrinks every exchange, and
    * no instance-level join exists. Expected chunk length is `div`
    * chars regardless of corpus size; both parameters are structural
    * literals validated at analysis time.
    */
  def cdcChunkCensus(docs: DataFrame, window: Int = 16,
      div: Int = 32): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val sc = docs
      .select(col("source"), col("text"),
        call_function("cdc_cuts", col("text"), lit(window), lit(div))
          .as("cuts"))
      .where(size(col("cuts")) > 0)
      .select(col("source"), explode(expr(
        "zip_with(concat(array(0), slice(cuts, 1, size(cuts) - 1)), cuts," +
          " (s, e) -> named_struct(" +
          "'hex', md5(cast(substring(text, s + 1, e - s) as binary))," +
          " 'n_chars', cast(e - s as bigint)))")).as("c"))
      .select(col("source"), col("c.hex").as("hex"),
        col("c.n_chars").as("n_chars"))
      .groupBy(col("source"), col("hex"))
      .agg(count(lit(1)).as("cnt"), min(col("n_chars")).as("n_chars"))
    val global = sc.groupBy(col("hex"))
      .agg(sum(col("cnt")).as("gcnt"))
    sc.join(global, "hex")
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        sum(col("cnt") * col("n_chars")).as("chunk_chars"),
        sum(when(col("gcnt") >= 2, col("cnt") * col("n_chars"))
          .otherwise(lit(0L))).as("dup_chars"))
      .select(col("source"), col("n_chunks"), col("n_distinct_chunks"),
        col("chunk_chars"), col("dup_chars"),
        expr("dup_chars * 1000000 DIV chunk_chars").as("dup_ppm"))
      .orderBy("source")
  }

  /** Benchmark decontamination: flag training documents that share at
    * least one distinct word 3-gram with any benchmark document — the
    * standard eval-leakage sweep a training pipeline runs before a data
    * release. Reuses the dedup shingle machinery; the benchmark shingle
    * set is BROADCAST because real benchmark suites are fixed-size
    * (thousands of docs) regardless of corpus scale, so at 100 TB this
    * stays one scan + a map-side hash probe per training shingle — no
    * corpus-sized shuffle. Emits overlap counts per contaminated doc
    * (the triage signal: 1 shared trigram is noise, 50 is a leak).
    */
  def contaminated(docs: DataFrame, isBenchmark: Column): DataFrame = {
    val sh = Dedup.shingles(docs)
    val benchIds = docs.where(isBenchmark)
      .select(col("doc_id").as("bench_id"))
    val benchSh = sh.join(benchIds, sh("doc_id") === col("bench_id"))
      .select(col("shingle"), col("bench_id"))
    val trainSh = sh.join(benchIds, sh("doc_id") === col("bench_id"),
      "left_anti")
    trainSh.join(broadcast(benchSh), "shingle")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("n_shared_shingles"),
        countDistinct(col("bench_id")).as("n_benchmarks_hit"))
      .orderBy("doc_id")
  }

  /** Bloom-filter decontamination calibration: builds a deterministic
    * Bloom bitset over the benchmark shingles (`m` bits, `kh` md5-
    * derived hash functions), probes every training document through
    * it, and reports the flagged count next to the EXACT contaminated
    * count ([[contaminated]]'s semi-join truth) with the exact-ppm
    * false-positive rate over clean docs — the calibration that
    * decides whether the broadcast-bitset sweep can replace the
    * shingle join at stream scale.
    *
    * Why a Bloom at 100 TB: the bitset is m bits (2 KiB at the
    * default) REGARDLESS of benchmark size — it broadcasts to every
    * executor and the sweep is one corpus scan with a map-side probe,
    * where the exact path shuffles the corpus shingle table. Bloom
    * has NO false negatives (every truly contaminated doc is flagged;
    * the report's `false_positives` is the only error direction), so
    * the sweep is safe as a PRE-FILTER: at scale, run the cheap
    * bitset sweep first and the exact join only over the flagged
    * sliver.
    *
    * Determinism: bit j of a shingle = md5(shingle||'|'||j) truncated
    * to 32 bits mod m — same bytes in any engine.
    */
  def bloomDecontCalibration(docs: DataFrame, isBenchmark: Column,
      m: Int = 16384, kh: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val sh = Dedup.shingles(docs)
    val benchIds = docs.where(isBenchmark)
      .select(col("doc_id").as("bench_id"))
    // benchmark shingles feed the bitset AND the exact-truth probe;
    // train shingles feed the Bloom probe AND the exact-truth side —
    // both persist or each consumer re-runs the corpus shingle pass
    // (the shared-subtree rule; frames are narrow)
    val benchShingles = sh
      .join(benchIds, sh("doc_id") === col("bench_id"), "left_semi")
      .select(col("shingle")).distinct()
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bits = benchShingles
      .select(col("shingle"), explode(expr(s"sequence(0, ${kh - 1})")).as("j"))
      .select(md5(concat(col("shingle"), lit("|"), col("j").cast("string"))
        .cast("binary")).as("h"))
      .select((Dedup.hexPrefix(col("h")) % m).as("pos"))
      .distinct()
    val trainSh = sh
      .join(benchIds, sh("doc_id") === col("bench_id"), "left_anti")
      .distinct()
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = trainSh
      .select(col("doc_id"), col("shingle"),
        explode(expr(s"sequence(0, ${kh - 1})")).as("j"))
      .select(col("doc_id"), col("shingle"),
        md5(concat(col("shingle"), lit("|"), col("j").cast("string"))
          .cast("binary")).as("h"))
      .select(col("doc_id"), col("shingle"),
        (Dedup.hexPrefix(col("h")) % m).as("pos"))
    val flagged = probes.join(broadcast(bits), "pos")
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") === kh)
      .select(col("doc_id")).distinct()
    val exactSet = trainSh
      .join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
    val nTrain = docs.where(!isBenchmark)
      .agg(count(lit(1)).as("n_train_docs"))
    nTrain
      .crossJoin(broadcast(exactSet.agg(
        count(lit(1)).as("exact_contaminated"))))
      .crossJoin(broadcast(flagged.agg(
        count(lit(1)).as("bloom_flagged"))))
      .select(col("n_train_docs"), col("exact_contaminated"),
        col("bloom_flagged"),
        (col("bloom_flagged") - col("exact_contaminated"))
          .as("false_positives"),
        // a fully-contaminated corpus has no clean docs to rate FPs
        // over (real on replicas that repeat texts) — report 0, not
        // a division-by-zero
        when(col("n_train_docs") === col("exact_contaminated"), 0L)
          .otherwise(expr("""(bloom_flagged - exact_contaminated)
                * 1000000 DIV (n_train_docs - exact_contaminated)"""))
          .as("fp_ppm_clean"))
  }

  /** Repetition quality filter (Gopher-style): per-document duplicate
    * word-bigram statistics — total vs distinct bigrams, the hottest
    * bigram's count, and the duplicate fraction, with a flag at the
    * classic 0.2 threshold. Catches boilerplate/spam that length or
    * type-token ratio miss. One explode + two hash aggregates, keyed by
    * doc_id (unique — no skew); the fraction is a single division of
    * exact integers, so it is bit-identical across engines.
    */
  def repetition(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"))
        .as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("n")).as("top_bigram_n"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        col("top_bigram_n"),
        ((col("n_bigrams") - col("n_distinct_bigrams")).cast("double")
          / col("n_bigrams")).as("dup_bigram_frac"),
        when((col("n_bigrams") - col("n_distinct_bigrams")).cast("double")
          / col("n_bigrams") > 0.2, "repetitive")
          .otherwise("ok").as("flag"))
      .orderBy("doc_id")

  /** Document chunking with overlap: sliding token windows of
    * `chunkTokens` advancing by `chunkTokens - overlap`, the prep step
    * for context-window-bounded consumers (RAG indexing, embedding).
    * Chunk count is `max(1, ceil((n - overlap) / stride))`, which
    * guarantees the final chunk contributes at least one new token (a
    * naive `ceil(n / stride)` emits tail chunks fully contained in
    * their predecessor). Pure per-row explode — no shuffle; chunk
    * boundaries are token-index arithmetic, so the emitted text is
    * engine-exact.
    *
    * Sibling of [[chunkTokens]], which serves the TRAINING-side stride
    * semantics instead: every stride start is emitted (including
    * contained suffix tails, because a striding trainer consumes them)
    * and the payload is a compact hash handle rather than chunk text.
    */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16): DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val stride = chunkTokens - overlap
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) > 0)
      .select(col("doc_id"), col("w"), explode(expr(
        s"""sequence(0, GREATEST(CAST(CEIL((size(w) - $overlap)
           | / CAST($stride AS DOUBLE)) AS INT), 1) - 1)""".stripMargin))
        .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        least(lit(chunkTokens),
          size(col("w")) - col("chunk_idx") * stride).cast("long")
          .as("n_toks"),
        expr(s"concat_ws(' ', slice(w, chunk_idx * $stride + 1, $chunkTokens))")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Vocabulary construction: corpus-wide token statistics — collection
    * frequency and document frequency per token, top-k by frequency —
    * the input a tokenizer-training step consumes and the table IDF
    * weighting reads. One explode + one hash aggregate (map-side
    * partials soak up the Zipf skew: every partition pre-aggregates its
    * own "the"-count before the shuffle moves one row per distinct
    * token per partition) + a TakeOrdered for the top-k — no global
    * sort. Counts are exact longs; ties rank lexicographically so the
    * cut is deterministic.
    */
  def vocabulary(docs: DataFrame, topK: Int = 1000): DataFrame =
    docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy(col("t").as("token"))
      .agg(count(lit(1)).as("cf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("cf"), col("token"))
      .limit(topK)

  /** Per-source out-of-vocabulary rate against the corpus top-`vocabK`
    * token vocabulary ([[vocabulary]]'s total-ordered cut): the
    * provenance-level coverage check a tokenizer-vocab decision reads —
    * a source whose tokens routinely miss the shared vocabulary is
    * drifting (other language, markup boilerplate, encoding noise) and
    * will fragment into rare subwords at training time.
    *
    * Scale shape: the vocabulary is a fixed-size top-k (broadcast); the
    * per-source pass is one token explode + broadcast probe + source-
    * keyed hash agg — no shuffle grows with the corpus (|sources| keys,
    * map-side partials). Counts are exact longs; the rate is one
    * division.
    */
  def oovBySource(docs: DataFrame, vocabK: Int = 200): DataFrame = {
    val v = vocabulary(docs, vocabK)
      .select(col("token")).withColumn("hit", lit(1L))
    docs
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy("source")
  }

  /** Winnowing-style fingerprint: the k lexicographically-smallest
    * shingle hashes, concatenated. Two documents sharing most content
    * share the sketch; the sketch is joinable/groupable at scale (one
    * 128·k-bit key per document).
    */
  def fingerprint(docs: DataFrame, k: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    // in-row min-k (round 9): the selection never crosses documents,
    // so the explode + doc-keyed rank window (a full-corpus shuffle
    // for a ≤k-per-doc result) is one native per-row loop — see
    // MinKHexHashes for the value-identity argument
    docs
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        graft.functions.MinKHexHashes(Dedup.tokens(col("text")), k)
          .as("fingerprint"))
      .where(col("fingerprint").isNotNull)
      .orderBy("doc_id")
  }

  /** Within-document n-gram repetition (the Gopher-style repetition
    * filter, Rae et al. 2021 §A1.1): per document, the fraction of
    * bigram occurrences consumed by the single most-frequent bigram —
    * high coverage = looped boilerplate, keyboard mashing, SEO spam —
    * plus the flag at the conventional 20% cutoff. Complements the
    * CROSS-document passes (boilerplate q104, segment dedup q112):
    * this one fires on documents that repeat THEMSELVES.
    *
    * Determinism: pure integer counts and one exact ppm DIV; "top
    * bigram" needs no tie-breaking because only its COUNT is emitted.
    * Scale shape: tokens explode once, (doc_id, bigram) hash agg with
    * map-side partials, then a doc_id agg — two aggregates, no window,
    * no join; at 100 TB both aggs are map-side-combined and doc_id is
    * unique so the second has no skew.
    */
  def repetitionReport(docs: DataFrame, flagPpm: Long = 200000)
      : DataFrame = {
    val bg = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat_ws(' ', slice(w, i, 2)))")).as("bigram"))
    bg.groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_bigram_n"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_n"),
        expr("top_bigram_n * 1000000 DIV n_bigrams").as("top_bigram_ppm"))
      .withColumn("flagged",
        (col("top_bigram_ppm") > flagPpm).cast("boolean"))
      .orderBy("doc_id")
  }

  /** Bigram language-model quality score — the CCNet-style LM filter
    * re-expressed without transcendentals: each document's mean
    * conditional bigram probability p(b|a) = c(a,b)/c(a,·) under the
    * corpus-trained model. A log-perplexity would hash-differ across
    * engines (ln is not correctly-rounded everywhere); the mean
    * probability ranks documents the same way for filtering purposes
    * and stays exact: each p(b|a) is quantized to micro-units at the
    * model (one IEEE division + multiply, identical in any engine),
    * then per-document aggregation is integer sum / one division.
    * Low avg_p = improbable token sequences (noise, other-language
    * leakage, shuffled boilerplate).
    *
    * Scale shape: two hash aggregates build the model (map-side
    * partials; keys are bigrams/unigrams, Zipf-skewed but combiners
    * absorb the head), one shuffle join scores occurrences against it
    * (both sides partitioned by bigram), one doc_id hash agg. Nothing
    * is all-pairs and no state is driver-side.
    */
  def lmQuality(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('a', w[i-1], 'b', w[i]))")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val cab = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val c1 = pairs.groupBy(col("a")).agg(count(lit(1)).as("c1"))
    val model = cab.join(c1, "a")
      .select(col("a"), col("b"),
        floor((col("cab").cast("double") / col("c1")) * lit(1000000L)
          + lit(0.5)).as("pq"))
    pairs.join(model, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("pq")).as("sum_pq"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_pq").cast("double")
          / (col("n_bigrams") * lit(1000000L))).as("avg_p"))
      .orderBy("doc_id")
  }

  /** Salient terms per source: tf–idf with a rational idf (n_docs/df
    * instead of log(n_docs/df) — monotone in the same direction, and a
    * ratio of exact integers survives the cross-engine hash gate where
    * a log cannot). The per-source top-k is the "what is this crawl
    * about / what leaked into it" report a corpus curator reads next
    * to [[oovBySource]].
    *
    * Scale shape: df is one distinct + hash agg on (doc_id, token), tf
    * one hash agg on (source, token); the scoring join is keyed by
    * token; the final top-k window partitions by source (|sources|
    * partitions, each holding its own vocabulary — bounded by corpus
    * vocabulary, not corpus size).
    */
  def tfidfBySource(docs: DataFrame, topK: Int = 5): DataFrame = {
    val tok = docs.select(col("doc_id"), col("source"),
      explode(Dedup.tokens(col("text"))).as("term"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val df = tok.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tf = tok.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val srcTotals = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src_tokens"))
    val scored = tf.join(df, "term").join(srcTotals, "source")
      .crossJoin(broadcast(nDocs))
      .select(col("source"), col("term"), col("tf"), col("df"),
        floor(((col("tf").cast("double") / col("n_src_tokens"))
          * (col("n_docs").cast("double") / col("df")))
          * lit(1000000L) + lit(0.5)).as("tfidf_micro"))
    val w = Window.partitionBy(col("source"))
      .orderBy(desc("tfidf_micro"), col("term"))
    scored.select(col("source"), col("term"), col("tf"), col("df"),
        col("tfidf_micro"), row_number().over(w).cast("long").as("rk"))
      .where(col("rk") <= topK)
      .orderBy(col("source"), col("rk"))
  }

  /** One-row dataset card: the headline numbers a corpus release ships
    * with — document / token / vocabulary counts, provenance breadth
    * (languages, sources), exact-duplicate mass, and mean document
    * length. All counts are exact longs; the two rates are single
    * divisions.
    *
    * Scale shape: one pass with grouping-free aggregates (the three
    * DISTINCT aggregates expand the scan by a constant factor of 3,
    * with partial aggregation per distinct key — no driver-side
    * state), plus one token-explode pass for the vocabulary size;
    * both reduce to a single row.
    */
  def corpusCard(docs: DataFrame): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text").cast("binary"))).as("n_distinct_texts"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).as("total_chars"))
    val tokAgg = docs
      .select(explode(Dedup.tokens(col("text"))).as("t"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("t")).as("n_distinct_tokens"))
    base.crossJoin(tokAgg).select(
      col("n_docs"), col("n_tokens"), col("n_distinct_tokens"),
      col("n_langs"), col("n_sources"), col("total_chars"),
      (col("n_docs") - col("n_distinct_texts")).as("n_dup_docs"),
      ((col("n_docs") - col("n_distinct_texts")).cast("double")
        / col("n_docs")).as("dup_rate"),
      (col("n_tokens").cast("double") / col("n_docs")).as("avg_doc_tokens"))
  }

  /** Per-source PII incidence: the drift monitor a pipeline alarms on
    * (one upstream source suddenly shipping unredacted emails is a
    * release blocker long before model training). Same three patterns as
    * [[redactPii]]; counts aggregate per source with the docs-affected
    * rate as exact ppm (`n·10⁶ ∕ docs` integer division, bit-stable).
    *
    * Scale shape: per-row codegen'd regex counts (no shuffle), then one
    * hash aggregate keyed on source — map-side partials reduce each
    * partition to |sources| rows before the (tiny) shuffle.
    */
  def piiStatsBySource(docs: DataFrame, textCol: String = "text")
      : DataFrame = {
    val t = col(textCol)
    docs
      .select(col("source"),
        size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
          .cast("long").as("e"),
        size(regexp_extract_all(t, lit(PhonePattern), lit(0)))
          .cast("long").as("p"),
        size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0)))
          .cast("long").as("i"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("e")).as("n_emails"),
        sum(col("p")).as("n_phones"),
        sum(col("i")).as("n_ips"),
        sum(when(col("e") + col("p") + col("i") > 0, 1L).otherwise(0L))
          .as("n_docs_with_pii"))
      .withColumn("pii_ppm", expr("n_docs_with_pii * 1000000 DIV n_docs"))
      .orderBy("source")
  }

  /** Per-source quality scorecard: the one-page dashboard a curation
    * pipeline reviews per ingest — volume, exact-duplicate mass, token
    * volume, vocabulary breadth, and mean document size, one row per
    * source. The per-corpus counterpart is [[corpusCard]]; this is the
    * table that decides which SOURCE gets down-weighted or dropped.
    *
    * Scale shape: two aggregation branches over the documents scan —
    * doc-level stats (count / distinct-md5 / char sum) in one hash agg
    * keyed on source, token-level stats (count / distinct terms) as an
    * explode + two-level agg — joined on the tiny source key. The
    * distinct-token count aggregates (source, term) first, so the big
    * shuffle carries one row per distinct term per source, not one per
    * token occurrence. Ratios are exact ppm integer divisions; the two
    * averages are single double divisions of exact longs.
    */
  def sourceScorecard(docs: DataFrame): DataFrame = {
    val docStats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text").cast("binary"))).as("n_distinct_texts"),
      sum(col("n_chars")).as("total_chars"))
    val tok = docs.select(col("source"),
      explode(Dedup.tokens(col("text"))).as("t"))
    val tokStats = tok
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("total_tokens"),
        count(lit(1)).as("n_distinct_tokens"))
    docStats.join(tokStats, "source")
      .select(col("source"), col("n_docs"),
        (col("n_docs") - col("n_distinct_texts")).as("n_dup_docs"),
        expr("(n_docs - n_distinct_texts) * 1000000 DIV n_docs")
          .as("dup_ppm"),
        col("total_tokens"), col("n_distinct_tokens"),
        (col("total_tokens").cast("double") / col("n_docs"))
          .as("avg_doc_tokens"),
        (col("total_chars").cast("double") / col("n_docs"))
          .as("avg_doc_chars"))
      .orderBy("source")
  }

  /** Collocation mining: the top-k token bigrams by pointwise mutual
    * information — phrase-vocabulary candidates for a tokenizer ("new
    * york"-style units whose joint frequency far exceeds chance).
    * Complements the raw-frequency pair ranking ([[TextAnalysis]] BPE
    * pairs): PMI surfaces ASSOCIATION, so rare-but-inseparable pairs
    * outrank ubiquitous-but-independent ones.
    *
    * PMI is kept as the RATIO form p(ab)/(p(a)·p(b)) =
    * c_ab·Nu²/(Nb·c_a·c_b) — no log, so the score is one fixed-order
    * IEEE expression over exact longs (numerator and denominator each
    * < 2⁵³ until petabyte token counts; both engines compute identical
    * bits, which is what lets the gate hash the doubles). `minCount`
    * suppresses the unstable rare-pair tail (classic PMI failure mode)
    * and bounds the scored set.
    *
    * Scale shape: two corpus passes (bigram explode, unigram explode) —
    * both collapse map-side into vocabulary-sized count tables, which
    * are persisted so the totals aggregates do NOT rescan the corpus
    * (same shared-subtree trap as KeyStats.heavyHitters). The scoring
    * join is keyed on single tokens against the (persisted) unigram
    * table; the result is TakeOrdered top-k, never a full sort.
    */
  def collocations(docs: DataFrame, minCount: Long = 5,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pairs = docs
      .select(Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= 2) // sequence(1, 0) DESCENDS, not empty
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> named_struct('a', w[i-1], 'b', w[i]))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .trackedPersist(StorageLevel.MEMORY_AND_DISK)
    val unig = docs.select(explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .trackedPersist(StorageLevel.MEMORY_AND_DISK)
    val totals = cab.agg(sum(col("n_ab")).as("nb"))
      .crossJoin(unig.agg(sum(col("c")).as("nu")))
    cab.where(col("n_ab") >= minCount)
      .join(unig.select(col("t").as("a"), col("c").as("c_a")), "a")
      .join(unig.select(col("t").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"), col("c_a"), col("c_b"),
        (col("n_ab").cast("double") * col("nu") * col("nu") /
          (col("nb").cast("double") * col("c_a") * col("c_b")))
          .as("pmi"))
      .orderBy(desc("pmi"), col("a"), col("b"))
      .limit(topK)
  }

  /** Corpus snapshot delta: per-source added / removed / changed /
    * unchanged counts between two corpus versions — the ingest report a
    * pipeline emits on every re-crawl (and the precondition for
    * incremental reprocessing: only 'added'+'changed' docs re-enter the
    * dedup/quality stages, see the incremental-dedup operator).
    * Change detection is by content fingerprint (md5), not timestamps,
    * so a re-crawl that rewrites identical bytes reports 'unchanged'.
    *
    * Scale shape: each side reduces to (doc_id, source, fingerprint) —
    * 3 narrow columns regardless of document size — then ONE full-outer
    * join keyed on doc_id (both sides shuffle co-partitioned; at 100 TB
    * both snapshots would be bucketed by doc_id and the join is
    * shuffle-free) and a |sources|×4-bounded hash agg.
    */
  def corpusDiff(prev: DataFrame, next: DataFrame): DataFrame = {
    val fa = prev.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("fa"))
    val fb = next.select(col("doc_id"), col("source").as("source_b"),
      md5(col("text").cast("binary")).as("fb"))
    fa.join(fb, Seq("doc_id"), "full_outer")
      .select(coalesce(col("source"), col("source_b")).as("source"),
        when(col("fa").isNull, "added")
          .when(col("fb").isNull, "removed")
          .when(col("fa") === col("fb"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy("source", "status")
  }

  /** Boilerplate-span report: the top-k word 3-gram shingles by DOCUMENT
    * frequency (distinct docs containing the span) with an exact-ppm
    * doc share — the C4/RefinedWeb-style signal for template text
    * (navigation chrome, license footers) that should be stripped
    * before training. Uses [[Dedup.shingles]] (distinct per doc), so a
    * span repeated inside one doc counts once.
    *
    * Scale shape: one shingle explode + hash agg keyed on the span
    * (map-side partials soak the Zipf head), then TakeOrdered top-k —
    * never a full sort. The 1-row corpus count broadcasts.
    */
  def boilerplateSpans(docs: DataFrame, k: Int = 20): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    Dedup.shingles(docs)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("shingle"), col("df"),
        expr("df * 1000000 DIV n_docs").as("df_ppm"))
      .orderBy(desc("df"), col("shingle"))
      .limit(k)
  }

  /** Gopher-style quality-filter funnel: evaluates the standard
    * heuristic filter battery per document (length bounds, mean token
    * length, top-unigram repetition share, stopword incidence) and
    * reports, per filter, how many documents fail it — plus the
    * survivors that pass every filter. This is the one-page report a
    * curation run publishes before committing thresholds; thresholds
    * here are calibrated to the synthetic corpus so every filter has
    * non-trivial mass (measured deciles: n_tokens 10-99, mean
    * token-length ×100 370-530, top-share 70k-141k ppm, stopword
    * 13k-106k ppm).
    *
    * Determinism: every metric is exact integer arithmetic (`DIV`
    * ratios); the report is a constant-size stack of aggregate sums.
    * Scale shape: one corpus scan computes the per-row metrics inside
    * the row (higher-order functions, no explode); the top-unigram
    * share needs the (doc, token) aggregate — one shuffle keyed on
    * doc_id+token, skew-free — and the final agg is a single row.
    */
  def qualityFunnel(docs: DataFrame): DataFrame = {
    val perRow = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        expr("aggregate(transform(w, t -> length(t)), 0L, (a, x) -> a + x)")
          .as("sum_len"),
        expr("size(filter(w, t -> t IN ('the', 'a')))").cast("long")
          .as("n_stop"))
    val topShare = docs
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("top_n"))
    val flags = perRow.join(topShare, "doc_id")
      .select(
        when(col("n_tokens") < 25, 1L).otherwise(0L).as("f_short"),
        when(col("n_tokens") > 90, 1L).otherwise(0L).as("f_long"),
        when(expr("sum_len * 100 DIV n_tokens") < 380 ||
          expr("sum_len * 100 DIV n_tokens") > 520, 1L).otherwise(0L)
          .as("f_toklen"),
        when(expr("top_n * 1000000 DIV n_tokens") > 120000, 1L)
          .otherwise(0L).as("f_rep"),
        when(expr("n_stop * 1000000 DIV n_tokens") < 20000, 1L)
          .otherwise(0L).as("f_stop"))
      .withColumn("f_pass",
        when(col("f_short") + col("f_long") + col("f_toklen") +
          col("f_rep") + col("f_stop") === 0L, 1L).otherwise(0L))
    flags.agg(
        count(lit(1)).as("n_docs"),
        sum(col("f_short")).as("n_short"),
        sum(col("f_long")).as("n_long"),
        sum(col("f_toklen")).as("n_toklen"),
        sum(col("f_rep")).as("n_rep"),
        sum(col("f_stop")).as("n_stop"),
        sum(col("f_pass")).as("n_pass"))
      .selectExpr("n_docs", """stack(6,
          1L, 'too_short',      n_short,
          2L, 'too_long',       n_long,
          3L, 'odd_token_len',  n_toklen,
          4L, 'repetitive',     n_rep,
          5L, 'low_stopword',   n_stop,
          6L, 'pass_all',       n_pass) AS (stage, filter_name, n)""")
      .select(col("stage"), col("filter_name"), col("n"),
        expr("n * 1000000 DIV n_docs").as("ppm"))
      .orderBy("stage")
  }

  /** Per-source Pearson correlation between document length (chars) and
    * token count — the sanity check that a source's `n_chars` metadata
    * actually tracks its content (a low r flags metadata drift or
    * non-text payloads mis-ingested as text).
    *
    * Determinism at any parallelism: the five sufficient statistics are
    * EXACT integer sums (every product < 2^53 by construction at these
    * magnitudes), and r is one fixed-order IEEE expression over them
    * (multiply/divide/sqrt are exactly-rounded, so both engines emit
    * identical bits). Scale shape: one scan, one hash agg keyed on
    * source — the textbook map-side-combine aggregate.
    */
  def lengthTokenCorr(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("n_chars").cast("long").as("x"),
        size(Dedup.tokens(col("text"))).cast("long").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x")).as("sum_chars"),
        sum(col("y")).as("sum_tokens"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("source"), col("n_docs"), col("sum_chars"),
        col("sum_tokens"),
        ((col("n_docs") * col("sxy") - col("sum_chars") * col("sum_tokens"))
          .cast("double") /
          (sqrt((col("n_docs") * col("sxx") -
            col("sum_chars") * col("sum_chars")).cast("double")) *
            sqrt((col("n_docs") * col("syy") -
              col("sum_tokens") * col("sum_tokens")).cast("double"))))
          .as("corr"))
      .orderBy("source")

  /** Corpus-wide token-length histogram with exact-ppm shares — the
    * length distribution a subword-tokenizer design reads before
    * choosing merges (long-tail lengths ⇒ under-merged vocabulary).
    * The counts table is persisted so the total-mass aggregate does
    * not rescan the corpus (same shared-subtree rule as the
    * heavy-hitters report); its key space is tiny (≈ max word length).
    */
  def tokenLengthHist(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(explode(Dedup.tokens(col("text"))).as("t"))
      .select(length(col("t")).cast("long").as("len"))
      .groupBy(col("len"))
      .agg(count(lit(1)).as("n"))
      .trackedPersist()
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("len"), col("n"),
        expr("n * 1000000 DIV total").as("share_ppm"))
      .orderBy("len")
  }

  /** Sub-document SEGMENT dedup report — the C4/RefinedWeb line-dedup
    * analog for a corpus without natural line breaks: text splits into
    * consecutive non-overlapping `segLen`-token segments (trailing
    * partial kept), each segment is md5-fingerprinted, and a segment
    * OCCURRENCE is "duplicated" when its fingerprint appears more than
    * once corpus-wide. Per source: doc/segment counts, duplicated
    * occurrences with exact-ppm rate, and the token mass inside
    * duplicated segments — the "how much would line-dedup delete"
    * planning number a curation run reads before enabling
    * sub-document dedup.
    *
    * Scale shape: segments are built INSIDE the row (transform over
    * sequence + slice — no token explode); the df table aggregates on
    * the 128-bit digest (skew-free key); one digest-keyed join fans df
    * back to occurrences (both sides bucketable by digest at 100 TB);
    * the final agg is |sources|-bounded. Exact integer ppm via DIV.
    */
  /** Shared positional-segment frame used by [[segmentDedup]] (df join)
    * and [[sourceSegmentOverlap]] (cross-source matrix): one row per
    * segment occurrence with its md5 fingerprint.
    */
  private def segmentOccurrences(docs: DataFrame, segLen: Int): DataFrame =
    docs
      .select(col("source"), col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .select(col("source"), col("doc_id"),
        explode(when(size(col("w")) < 1, array()).otherwise(expr(
          s"transform(sequence(1, (size(w) + ${segLen - 1}) div $segLen), " +
            s"i -> concat_ws(' ', slice(w, (i - 1) * $segLen + 1, $segLen)))")))
          .as("seg"))
      .select(col("source"), col("doc_id"),
        md5(col("seg").cast("binary")).as("fp"),
        size(split(col("seg"), " ")).cast("long").as("n_tok"))

  def segmentDedup(docs: DataFrame, segLen: Int = 10): DataFrame = {
    val occ = segmentOccurrences(docs, segLen)
    val df = occ.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    occ.join(df, "fp")
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_segments"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("dup_segments"),
        sum(when(col("df") > 1, col("n_tok")).otherwise(0L)).as("dup_tokens"))
      .select(col("source"), col("n_docs"), col("n_segments"),
        col("dup_segments"),
        expr("dup_segments * 1000000 DIV n_segments").as("dup_seg_ppm"),
        col("dup_tokens"))
      .orderBy("source")
  }

  /** Cross-source segment-overlap matrix: for every source pair, how
    * many DISTINCT 10-token segments they share — the provenance map
    * that tells a curation run which feeds mirror which (syndication,
    * scraped re-posts, shared boilerplate) before per-source sampling
    * weights are trusted. Emits (source_a, source_b, shared_segments,
    * a_ppm, b_ppm) with exact-ppm shares of each side's distinct
    * segment vocabulary.
    *
    * Scale shape: occurrences reduce to DISTINCT (fp, source) first —
    * the big shuffle carries one row per distinct (segment, source);
    * the self-join keys on the digest (skew-free, bucketable); a
    * segment present in s sources expands to C(s,2) ≤ |sources|²/2
    * pair rows, bounded by the source count, not the corpus. Output is
    * ≤ |sources|² rows.
    */
  def sourceSegmentOverlap(docs: DataFrame, segLen: Int = 10): DataFrame = {
    val fpSrc = segmentOccurrences(docs, segLen)
      .select(col("fp"), col("source")).distinct()
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = fpSrc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_segments"))
    val pairs = fpSrc.as("x")
      .join(fpSrc.as("y"),
        col("x.fp") === col("y.fp") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("shared_segments"))
    pairs
      .join(vocab.select(col("source").as("source_a"),
        col("n_segments").as("na")), "source_a")
      .join(vocab.select(col("source").as("source_b"),
        col("n_segments").as("nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("shared_segments"),
        expr("shared_segments * 1000000 DIV na").as("a_ppm"),
        expr("shared_segments * 1000000 DIV nb").as("b_ppm"))
      .orderBy("source_a", "source_b")
  }

  /** Normalization dedup gain: how many additional documents exact
    * dedup would collapse if texts were canonicalized first (lowercase
    * + whitespace squeeze + trim) — the report that decides whether a
    * normalize-then-dedup stage pays for itself on a crawl whose
    * re-ingests differ only in casing/spacing. One corpus pass, two
    * digest distinct-counts (the distinct runs on 128-bit md5 digests,
    * never on payloads — the at-scale spelling), one output row.
    */
  def normalizationGain(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("text")), " +", " "))
    docs
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text").cast("binary"))).as("raw_distinct"),
        countDistinct(md5(norm.cast("binary"))).as("norm_distinct"))
      .select(col("n_docs"),
        (col("n_docs") - col("raw_distinct")).as("raw_redundant"),
        (col("n_docs") - col("norm_distinct")).as("norm_redundant"),
        (col("raw_distinct") - col("norm_distinct"))
          .as("normalization_gain"))
  }

  /** Robust-winnowing fingerprint density report (the MOSS scheme):
    * positional word 3-gram hashes, a sliding window of `w` consecutive
    * hashes, and from each window the MINIMUM hash is selected
    * (ties → leftmost, enforced by packing the position into the low
    * bits); consecutive windows that pick the same (hash, position)
    * collapse, so the selected set has expected density 2/(w+1) while
    * GUARANTEEING every `w+k-1`-token match window shares a selected
    * fingerprint — the property plain min-k sketches (q38) lack.
    * Reports per-source selection density — the index-size planning
    * number for a winnowed plagiarism/contamination index.
    *
    * Determinism: hash = first 8 md5 hex digits as a long (the shared
    * [[Dedup.hexToLongSql]] arithmetic); packed = hash·2²⁰ + (pos−1)
    * (exact in a long for documents up to 2²⁰ shingles — 100× the
    * corpus max; a longer doc would chunk first). Per-window MIN over
    * the position-packed longs is total-ordered.
    *
    * Scale shape (round 9): winnowing never crosses documents, so the
    * whole selection runs IN-ROW via the native fused
    * [[graft.functions.WinnowPrints]] expression — shingle md5s,
    * position packing, window minima, and the duplicate collapse are
    * one codegen-called Java loop per document. r8's formulation
    * exploded every position and shuffled the frame by doc_id for a
    * window MIN; that shuffle was the measured cost (2.4× the oracle
    * at 50×), and the intermediate HOF spelling (array lambdas) ran
    * the md5s interpreted. Now the only explode is over the SELECTED
    * prints (expected density 2/(w+1)), feeding a map-side-partial
    * hash agg — zero wide shuffles before the |sources|-bounded
    * aggregates.
    */
  def winnowReport(docs: DataFrame, w: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val toks = docs.select(col("source"), col("doc_id"),
      Dedup.tokens(col("text")).as("w"))
    val sel = toks
      .where(size(col("w")) >= 3)
      .select(col("source"), col("doc_id"),
        explode(graft.functions.WinnowPrints(col("w"), w)).as("msel"))
    val perSrc = sel.groupBy(col("source"))
      .agg(count(lit(1)).as("n_prints"),
        countDistinct(expr(s"msel div ${1L << 20}")).as("distinct_hashes"))
    val totals = toks.groupBy(col("source"))
      .agg(
        sum(when(size(col("w")) >= 3, 1L).otherwise(0L)).as("n_docs"),
        sum(when(size(col("w")) >= 3, (size(col("w")) - 2).cast("long"))
          .otherwise(0L)).as("n_positions"))
    totals.join(perSrc, "source")
      .select(col("source"), col("n_docs"), col("n_positions"),
        col("n_prints"),
        expr("n_prints * 1000000 DIV n_positions").as("print_ppm"),
        col("distinct_hashes"))
      .orderBy("source")
  }

  /** Exact cross-document substring duplication (the Lee et al. 2022
    * "Deduplicating Training Data" exact-substring analysis, windowed):
    * every `k`-token window shared by ≥ 2 documents marks its token
    * range as duplicated; overlapping ranges merge into maximal spans
    * (gaps-and-islands over window starts); the per-source report is
    * docs affected, merged span count, duplicated-token mass, and
    * dup ppm — the number a curation pass reads to decide whether
    * span-level cutting (vs whole-doc dropping) is worth running.
    *
    * Scale shape: windows are one positioned pass (same spelling as
    * [[winnowReport]]); the ≥2-docs filter is a hash agg on the window
    * digest (map-side partials; the digest is md5 so the key space is
    * uniform — no skew); the islands window partitions by doc_id
    * (narrow rows, per-doc ordering only — never a global sort).
    * Determinism: integers and digests end-to-end; the only division
    * is one exact integer DIV.
    */
  def substringDupSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    // feeds the windowed pass AND the per-source totals — unpersisted,
    // the corpus tokenization runs twice
    val toks = docs.select(col("source"), col("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wins = toks
      .select(col("source"), col("doc_id"),
        posexplode(when(size(col("w")) < k, array()).otherwise(expr(
          s"transform(sequence(1, size(w) - ${k - 1}), " +
            s"i -> concat_ws(' ', slice(w, i, $k)))")))
          .as(Seq("pos0", "win")))
      .select(col("source"), col("doc_id"), (col("pos0") + 1).as("pos"),
        md5(col("win").cast("binary")).as("h"))
      // feeds BOTH the df agg and the hit join — unpersisted, the
      // windowed corpus pass (explode + md5) runs twice
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") >= 2)
      .select(col("h"))
    val hits = wins.join(dup, "h")
      .select(col("source"), col("doc_id"), col("pos"),
        (col("pos") + (k - 1)).as("endp"))
    // one window start per (doc, pos), so the per-doc ordering is total
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMax = byPos.rowsBetween(Window.unboundedPreceding, -1)
    val spans = hits
      .withColumn("pmax", max(col("endp")).over(prevMax))
      .withColumn("newi",
        when(col("pmax").isNull || col("pos") > col("pmax") + 1, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("newi")).over(byPos))
      .groupBy(col("source"), col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("s"), max(col("endp")).as("e"))
    val perDoc = spans.groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum((col("e") - col("s") + 1).cast("long")).as("covered"))
    val tot = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("w")).cast("long")).as("total_tokens"))
    val perSrc = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("docs_with_dup"),
        sum(col("n_spans")).as("n_spans"),
        sum(col("covered")).as("dup_tokens"))
    tot.join(perSrc, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_tokens"),
        coalesce(col("docs_with_dup"), lit(0L)).as("docs_with_dup"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ppm",
        expr("dup_tokens * 1000000 DIV total_tokens"))
      .orderBy("source")
  }

  /** DSIR-flavored importance scoring (Xie et al., 2023 "Data Selection
    * via Importance Resampling", with the log-ratio replaced by an
    * exact integer ratio so any engine reproduces it bit-for-bit):
    * hashed-bigram features (md5 mod `buckets`), per-bucket weight
    * `(target_count+1) · 1e6 DIV (corpus_count+1)` (add-1 smoothed
    * target-over-raw ratio in ppm), per-document score = mean bucket
    * weight over its bigram OCCURRENCES; emits the top `topK` docs —
    * the ranked worklist importance resampling draws from. The target
    * distribution here is the `lang = 'en'` slice (the "formal domain"
    * stand-in this corpus affords).
    *
    * Scale shape: the weight table is ≤ `buckets` rows — broadcast
    * forever; building it and scoring are each ONE corpus pass with
    * map-side partials; the final top-k is orderBy+limit (TakeOrdered,
    * no global sort, no single-partition window). Overflow headroom:
    * `(t+1)·1e6` stays in-long up to ~9e12 target bigram occurrences;
    * at 100 TB shard the constant down or widen to DECIMAL(38,0).
    */
  def dsirWeights(docs: DataFrame, buckets: Int = 4096,
      topK: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val toks = docs.select(col("doc_id"), col("lang"),
      Dedup.tokens(col("text")).as("w"))
    val bg = toks
      .select(col("doc_id"), col("lang"),
        explode(when(size(col("w")) < 2, array()).otherwise(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> concat_ws(' ', slice(w, i, 2)))")))
          .as("bigram"))
      .select(col("doc_id"), col("lang"),
        (Dedup.hexPrefix(md5(col("bigram").cast("binary")))
          % buckets).as("b"))
      // feeds the target counts, the corpus counts, AND the scoring
      // join — unpersisted, the bigram explode + md5 + hex fold runs
      // three times over the corpus
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tgt = bg.where(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("t_cnt"))
    val raw = bg.groupBy(col("b")).agg(count(lit(1)).as("r_cnt"))
    val wts = raw.join(tgt, Seq("b"), "left")
      .select(col("b"),
        expr("(coalesce(t_cnt, 0) + 1) * 1000000 DIV (r_cnt + 1)")
          .as("wt"))
    bg.join(broadcast(wts), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wt")).as("wt_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("wt_sum DIV n_bigrams").as("score_ppm"))
      .orderBy(desc("score_ppm"), col("doc_id"))
      .limit(topK)
  }

  /** Tokenizer fertility by language: subword-ish (regex) tokens per
    * whitespace word and characters per subword token — the numbers a
    * tokenizer evaluation reads per language before committing a vocab
    * (high fertility on a language = that language pays more sequence
    * length per word). Uses the same BPE-ish regex as [[stats]], so
    * the two reports agree by construction.
    *
    * Scale shape: one corpus pass, per-row codegen'd regex counting,
    * one |langs|-keyed hash agg with map-side partials — no explode,
    * no shuffle beyond the tiny final agg. Ratios are exact integer
    * ppm divisions.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    docs.select(col("lang"),
        // native run count == size(Dedup.tokens(text)) (WordRunCount)
        graft.functions.WordRunCount(col("text")).as("nw"),
        // Native TokenRunCount == regexp_count(lower(text),
        // '[a-z]+|[0-9]+|[^a-z0-9\s]') — r8 measured the regex form at
        // 9.1x the DuckDB oracle at 50x, pure java.util.regex engine
        // cost; the one-byte-loop classifier deletes it. Oracle-facing
        // whitespace contract (\s = [ \t\n\x0B\f\r], Java semantics,
        // vs RE2's \s without \x0B): the corpora are ASCII without
        // vertical tabs, and TokenRunCount's scaladoc spells the class
        // explicitly.
        graft.functions.TokenRunCount(col("text")).as("nb"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("nb")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("fertility_ppm",
        expr("n_bpe_tokens * 1000000 DIV n_words"))
      .withColumn("chars_per_token_ppm",
        expr("n_chars * 1000000 DIV n_bpe_tokens"))
      .orderBy("lang")
  }

  /** Per-source Gini coefficient of document token counts — the
    * length-inequality number a mixture designer reads next to q130's
    * source shares: a source whose token mass sits in a few huge docs
    * (G → 1) packs/dedups very differently from one of uniform pages
    * (G → 0), even at identical totals.
    *
    * Exact WITHOUT sorting documents: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) /
    * (n·Σx) over ascending-sorted xᵢ needs only the SUM of ranks of
    * each distinct length value — so per-doc lengths collapse into a
    * (source, length)-count table (one corpus-sized hash agg with
    * map-side partials), a cumulative window over that collapsed
    * table hands each value-run its rank range, and the run's rank·x
    * contribution is closed-form: v·(c·before + c(c+1)/2). The only
    * window is |distinct lengths|-per-source-sized. Rank products are
    * DECIMAL(38,0) (v·c·n wraps int64 past ~10⁹ docs/source); the
    * run-triangle c(c+1) DIV 2 stays int64 while any single (source,
    * length) cell holds < 3·10⁹ docs. Ties are no issue: equal values
    * contribute the same total whichever way ranks fall inside a run.
    * One final double division; the NULL guard is the empty/degenerate
    * source (zero total tokens).
    */
  def tokenGini(docs: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(20,0)")
    val cnt = docs
      .select(col("source"),
        size(graft.operators.Dedup.tokens(col("text"))).cast("long").as("v"))
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
    cnt
      .withColumn("before", sum(col("c")).over(w) - col("c"))
      .withColumn("rv",
        dec(col("v")) * (dec(col("c")) * dec(col("before")) +
          dec(expr("c * (c + 1) DIV 2"))))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        sum(col("c") * col("v")).as("total_tokens"),
        sum(col("rv")).as("r"))
      .withColumn("gini_num",
        lit(2).cast("decimal(20,0)") * col("r") -
          dec(col("n_docs") + 1) * dec(col("total_tokens")))
      .withColumn("gini_den", dec(col("n_docs")) * dec(col("total_tokens")))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        when(col("gini_den") === lit(0).cast("decimal(38,0)"), lit(null))
          .otherwise(col("gini_num").cast("double") /
            col("gini_den").cast("double"))
          .as("gini"))
      .orderBy("source")
  }

  /** Per-source unigram drift vs the whole corpus: exact total-
    * variation distance ½·Σ|p_source(t) − p_corpus(t)| in ppm — the
    * log-free "how far is this source's vocabulary usage from the
    * mixture" number (TV, not KL/JS, deliberately: divergences need
    * ln, which is not correctly-rounded-guaranteed and is banned from
    * gated values; TV is a pure integer computation).
    *
    * Exactness: Σ|c_st·T − c_t·S| over the source's own terms plus the
    * absent-term mass (T − Σ_{t∈s} c_t)·S, all in DECIMAL(38,0)
    * (c·T products wrap int64 past ~3·10⁹·√ tokens), floored to ppm
    * against 2·S·T with integral DIV — bit-identical to the oracle's
    * HUGEINT spelling. Scale shape: one explode + (source, term) hash
    * agg (map-side partials absorb the token stream), a term-keyed
    * agg for corpus counts, one term-keyed join between the two
    * count tables (both already collapsed to distinct terms — never
    * token-stream-sized), and a |sources|-row finish; the per-source
    * totals and the grand total ride broadcast joins.
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(20,0)")
    val cst = docs
      .select(col("source"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("c"))
      .trackedPersist() // feeds the corpus rollup AND the per-source join
    val ct = cst.groupBy(col("t")).agg(sum(col("c")).as("g"))
    val ss = cst.groupBy(col("source"))
      .agg(sum(col("c")).as("s_tok"), count(lit(1)).as("s_terms"))
    val tot = ss.agg(sum(col("s_tok")).as("tot"))
    cst.join(ct, "t")
      .join(broadcast(ss), "source")
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(min(col("s_tok")).as("n_tokens"),
        min(col("s_terms")).as("n_terms"),
        min(col("tot")).as("tot"),
        sum(abs(dec(col("c")) * dec(col("tot")) -
          dec(col("g")) * dec(col("s_tok")))).as("present"),
        sum(col("g")).as("cov"))
      .withColumn("tv_num",
        (col("present") +
          dec(col("tot") - col("cov")) * dec(col("n_tokens"))) *
          lit(1000000L).cast("decimal(20,0)"))
      .withColumn("tv_den",
        lit(2).cast("decimal(20,0)") * dec(col("n_tokens")) * dec(col("tot")))
      .select(col("source"), col("n_tokens"), col("n_terms"),
        expr("tv_num DIV tv_den").as("tv_ppm"))
      .orderBy("source")
  }

  /** Per-source exclusive-vocabulary census: of each source's distinct
    * terms, how many appear in NO other source, in exact floored ppm —
    * the provenance-uniqueness signal a corpus-mixing decision reads
    * next to [[sourceDrift]]'s distribution distance (a source can have
    * near-zero drift yet carry a large exclusive tail, or vice versa).
    *
    * Scale shape: everything downstream of the scan runs on COLLAPSED
    * distinct-term tables — the token stream never crosses an exchange
    * un-deduped (distinct's partial aggregate collapses repeats
    * map-side), the per-term source counts are a |terms|-row rollup,
    * the join back is collapsed-table × collapsed-table on the term
    * key, and the finish is |sources| rows.
    */
  def exclusiveVocab(docs: DataFrame): DataFrame = {
    val st = docs
      .select(col("source"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
      .distinct()
    // per-term source count as a WINDOW over the collapsed table, not
    // a groupBy + join-back: the join-back spelling re-evaluated the
    // corpus-sized explode+distinct (the q194 shared-subtree rule —
    // this exact instance was predicted by the r13 verdict and caught
    // by PlanLint rule 4). A trackedPersist also fixes the double scan
    // but was measured pathological at the 400× replica (cache
    // materialization of the collapsed frame under the 108 M-token
    // explode — PERF_NOTES r14); the window needs ONE corpus pass and
    // no cache: everything after the distinct's own exchange is
    // |sources × vocab|-sized.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
    st.withColumn("nsrc", count(lit(1)).over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("nsrc") === 1, 1L).otherwise(0L)).as("n_exclusive"))
      .select(col("source"), col("n_terms"), col("n_exclusive"),
        expr("n_exclusive * 1000000 DIV n_terms").as("excl_ppm"))
      .orderBy("source")
  }

  /** Per-source exact nearest-rank token-length percentiles (p50/p90/
    * p99) plus the extremes — the length-distribution bands a packing
    * or truncation decision reads, computed WITHOUT ever sorting
    * documents: lengths collapse to the (source, length)→count table
    * in one fact-absorbing aggregate, and the nearest-rank percentile
    * (smallest length whose cumulative count reaches ⌈p·n/100⌉, i.e.
    * 100·cum ≥ p·n on integers) falls out of a per-source cumulative
    * sum over that |distinct lengths|-row table — the q166 rank-range
    * arithmetic, exact at any corpus size, with the Window partitioned
    * by source above the aggregate (never corpus-wide).
    */
  def lengthPercentiles(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val cnt = docs
      .select(col("source"),
        // native run count == size(Dedup.tokens(text)): one pass per
        // byte, no token-array materialization, no interpreted lambda
        // (the r14 jstack showed SimpleHigherOrderFunction.eval hot in
        // this gate's scan at replica scale)
        graft.functions.WordRunCount(col("text")).as("v"))
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("v"))
    val wt = Window.partitionBy(col("source"))
    cnt
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wt))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        min(col("v")).as("min_len"), max(col("v")).as("max_len"),
        min(when(col("cum") * 100 >= col("n") * 50, col("v"))).as("p50"),
        min(when(col("cum") * 100 >= col("n") * 90, col("v"))).as("p90"),
        min(when(col("cum") * 100 >= col("n") * 99, col("v"))).as("p99"))
      .orderBy("source")
  }

}
