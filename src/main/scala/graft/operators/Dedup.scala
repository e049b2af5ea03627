package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.TrackedPersist

/** Deduplication operators over a `documents(doc_id, text, …)` relation —
  * the training-data-pipeline surface the brief requires: exact dedup,
  * MinHash+LSH near-dup, and SimHash, all as composable DataFrame
  * transforms.
  *
  * 100 TB design notes:
  *  - nothing here is ever all-pairs: near-dup candidates come from
  *    band-bucket joins (docs sharing a (band, minhash) key), so the
  *    shuffle keys are bucket hashes and the quadratic blowup is bounded
  *    per bucket — the standard MinHash-LSH layout; at cluster scale the
  *    bucket join is a hash-partitioned shuffle join on (band, minhash);
  *  - exact dedup is one hash-aggregate on a fingerprint (map-side
  *    partial aggregation applies);
  *  - all hashes are md5 (same bytes in any engine/JVM) so results are
  *    reproducible across engines and cluster sizes, and the DuckDB
  *    oracle can replay them bit-for-bit.
  */
object Dedup {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct word 3-gram shingles per document: (doc_id, shingle).
    * Documents shorter than 3 tokens produce no shingles (matching the
    * oracle's range semantics).
    */
  def shingles(docs: DataFrame): DataFrame = {
    val w = tokens(col("text"))
    docs
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        explode(when(size(col("w")) < lit(3), array())
          .otherwise(expr(
            "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))")))
          .as("shingle"))
      .distinct()
  }

  /** Exact duplicate groups: md5(text) fingerprint → group size +
    * representative (min doc_id). One hash aggregate; at 100 TB this is
    * the canonical first dedup pass (shuffle key = 128-bit digest, no
    * skew).
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("representative"))

  /** Metadata conflicts among exact duplicates: duplicate groups whose
    * members disagree on `lang` or `source` — the cases where "keep the
    * representative" silently discards provenance, so a curation
    * pipeline must resolve them by policy (e.g. keep the earliest-crawled
    * source) instead of arbitrarily. Emits one row per conflicted
    * fingerprint with the disagreement breadth and the canonical member.
    *
    * Scale shape: identical to [[exactGroups]] — one hash aggregate
    * keyed on the 128-bit digest (two extra distinct-aggregates expand
    * the agg by a constant factor), then a post-agg filter; no extra
    * shuffle, skew-free key.
    */
  def labelConflicts(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("representative"))
      .where(col("n_docs") > 1 &&
        (col("n_sources") > 1 || col("n_langs") > 1))
      .orderBy("representative")

  /** Snapshot delta report — the dataset-versioning ledger a curation
    * pipeline prints between corpus releases: per source, documents
    * ADDED (doc_id only in the new snapshot), REMOVED (only in the
    * old), CHANGED (same doc_id, different content digest) and
    * UNCHANGED. Content equality is the same md5 discipline as
    * [[exactGroups]], so "changed" means the bytes changed, not that a
    * mutable timestamp column drifted.
    *
    * Scale shape: one full-outer join keyed on doc_id — co-located and
    * shuffle-free when both snapshots are written with
    * [[graft.operators.CorpusWriter.writeBucketed]] — comparing
    * 128-bit digests computed in the scan projection, then a
    * |sources|-sized rollup. A removed doc reports under its OLD
    * source, everything else under the new one.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    // Presence is EXPLICIT marker columns, never digest-nullness
    // (ADVICE r10: md5(NULL text) is NULL, so a doc present in both
    // snapshots with NULL text would read as "added"). Digests are
    // compared null-safely: NULL text on both sides is "unchanged",
    // NULL on one side is "changed" — every present-both doc counts
    // exactly once, so added+removed+changed+unchanged covers the
    // id universe (the q142 oracle spells the same contract with
    // IS [NOT] DISTINCT FROM).
    val o = oldDocs.select(col("doc_id"), col("source").as("src_old"),
      md5(col("text").cast("binary")).as("h_old"), lit(true).as("in_old"))
    val n = newDocs.select(col("doc_id"), col("source").as("src_new"),
      md5(col("text").cast("binary")).as("h_new"), lit(true).as("in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_new"), col("src_old")).as("source"),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("h_old") <=> col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
      .orderBy("source")
  }

  /** SQL spelling of "8 hex chars starting at `start` (1-based) of `h`,
    * as a non-negative long" — pure arithmetic over a position lookup,
    * so it is portable across engines (`posFn` = instr for Spark,
    * strpos for DuckDB; same argument order and 1-based semantics).
    */
  /** Spark-side native form of [[hexToLongSql]]: identical value on
    * md5 input (digit-for-digit, including the instr-style -1 for a
    * non-hex char), one fused byte loop inside whole-stage codegen
    * instead of 8 substr allocations + 8 constant-string scans per
    * row (see [[graft.functions.HexPrefixLong]]). Callers must run
    * `GraftFunctions.install` on the session first. The SQL-string
    * generator below remains the DuckDB-oracle spelling.
    */
  def hexPrefix(h: Column, start: Int = 1): Column =
    graft.functions.HexPrefixLong(h, start)

  def hexToLongSql(h: String, start: Int, posFn: String): String =
    (0 until 8).map { k =>
      val mult = math.pow(16, 7 - k).toLong
      // CAST keeps the multiply in 64-bit in both engines (a bare int
      // literal would wrap in 32-bit arithmetic for high digits)
      s"($posFn('0123456789abcdef', substr($h, ${start + k}, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString("(", " + ", ")")

  /** Per-document per-band MinHash signature (b=`bands` bands of r=2
    * hashes; the band key is the pair "h_{2b}|h_{2b+1}").
    *
    * r=2 makes bucket collision probability J² instead of J, which is
    * what keeps candidate sets tight on corpora whose documents share
    * common shingles (r=1 buckets on a single popular min-shingle and
    * explodes quadratically) while still catching true near-dups with
    * probability 1-(1-J²)^b ≈ 1 at J ≥ 0.8.
    *
    * One md5 per shingle, with the 2·bands hash family derived by
    * Kirsch-Mitzenmacher mixing `(h1 + i·h2) mod 2^32` over two 32-bit
    * halves of the digest — 2·bands× fewer digest computations than
    * hashing per function. Computed as ONE wide aggregate (min-columns
    * in a single groupBy pass, then `stack`ed to long form) rather than
    * a shingles×functions cross join: at 100 TB the cross join
    * multiplies the shuffle; the wide aggregate shuffles each shingle
    * row exactly once with map-side partial mins.
    */
  def minhash(docs: DataFrame, bands: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val sh = shingles(docs)
    val hh = sh
      .select(col("doc_id"), md5(col("shingle").cast("binary")).as("h"))
      .select(col("doc_id"),
        hexPrefix(col("h"), 1).as("h1"),
        hexPrefix(col("h"), 9).as("h2"))
    val minCols = (0 until bands * 2).map(i =>
      min((col("h1") + lit(i.toLong) * col("h2")) % 4294967296L).as(s"mh_$i"))
    val stackArgs = (0 until bands)
      .map(b => s"${b}L, concat(mh_${2 * b}, '|', mh_${2 * b + 1})")
      .mkString(", ")
    hh.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .selectExpr("doc_id",
        s"stack($bands, $stackArgs) AS (band, minhash)")
  }

  /** Per-ROW MinHash band keys — the same (band, minhash) rows as
    * [[minhash]] (identical hash family, banding, and key format;
    * pinned by a spec equality test) computed entirely inside each row
    * with higher-order functions: no shuffle, no aggregation. That
    * makes it legal mid-STREAM (a streaming groupBy-agg would pin the
    * plan to one stateful operator; this leaves the stateful budget to
    * the consumer) and trivially parallel at 100 TB — signature cost
    * is O(shingles × 2·bands) arithmetic per document, no data moves.
    * Documents with < 3 tokens emit no rows, matching [[minhash]].
    */
  def minhashPerRow(docs: DataFrame, bands: Int = 8): DataFrame = {
    val w = tokens(col("text"))
    val sh = array_distinct(
      when(size(w) < 3, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(w) - 2),
          i => concat_ws(" ", slice(w, i, lit(3))))))
    val hh = transform(col("__sh"), s => {
      val h = md5(s.cast("binary"))
      struct(conv(h.substr(lit(1), lit(8)), 16, 10).cast("long").as("h1"),
        conv(h.substr(lit(9), lit(8)), 16, 10).cast("long").as("h2"))
    })
    def mh(i: Column) = aggregate(col("__hh"), lit(4294967296L),
      (acc, x) => least(acc,
        (x.getField("h1") + i * x.getField("h2")) % 4294967296L))
    val keys = transform(sequence(lit(0), lit(bands - 1)), b => {
      val bl = b.cast("long")
      struct(bl.as("band"),
        concat(mh(bl * 2).cast("string"), lit("|"),
          mh(bl * 2 + 1).cast("string")).as("minhash"))
    })
    docs
      .withColumn("__sh", sh)
      .withColumn("__hh", hh)
      .select(col("doc_id"),
        explode(when(size(col("__sh")) === 0,
          array().cast("array<struct<band:bigint,minhash:string>>"))
          .otherwise(keys)).as("bm"))
      .select(col("doc_id"), col("bm.band").as("band"),
        col("bm.minhash").as("minhash"))
  }

  /** LSH candidate buckets: (band, minhash) keys shared by >1 document,
    * with the member list. This is the set a near-dup pass joins on —
    * never an all-pairs comparison.
    *
    * Exact-dup collapse first (r17, the [[nearDupClusters]] argument):
    * a MinHash signature is a function of the text alone, so members
    * of an md5-exact group carry exactly their representative's
    * (band, minhash) rows. The shingle → md5 → min-agg signature
    * pipeline — the measured GC-heavy stage (VERDICT r16: 4 separate
    * heaps beat 1 shared heap by 28% on this gate) — therefore runs
    * over one doc per distinct text, and members re-attach through a
    * rep-keyed join before the bucket rollup. Same rows, same buckets,
    * same member lists; a corpus with no exact dups pays one md5 pass.
    */
  def lshBuckets(docs: DataFrame, bands: Int = 8): DataFrame = {
    // persisted for the same two-consumer reason as
    // [[nearDupClusterEdges]] (PlanLint rule 4 + one md5 pass)
    val fp = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("fp"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    val repMh = minhash(
      docs.join(groups.select(col("rep").as("doc_id")), "doc_id")
        .select(col("doc_id"), col("text")), bands)
      .withColumnRenamed("doc_id", "rep")
    repMh.join(fp.join(groups, "fp").select(col("rep"), col("doc_id")), "rep")
      .groupBy(col("band"), col("minhash"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          d => d.cast("string")), ",").as("docs"))
      .where(col("n_docs") > 1)
  }

  /** Verified near-duplicate pairs: LSH candidates whose exact shingle
    * Jaccard ≥ `threshold`. The Jaccard join runs only over candidate
    * pairs (bucket-bounded), with intersection counts from a shingle
    * equi-join.
    *
    * Recall note: with b=8, r=2 banding a candidate surfaces with
    * probability 1-(1-J²)^8 — ≈100% at J ≥ 0.8, ~53% at J = 0.3. The
    * default threshold is therefore 0.5; lowering it without also
    * raising `bands` advertises pairs the banding won't reliably
    * surface.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5,
      bands: Int = 8): DataFrame =
    verifiedPairStats(docs, bands)
      .select(col("a"), col("b"), col("i"),
        (col("i").cast("double") / col("u")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy("a", "b")

  /** The shared LSH→exact-verify core of [[nearDupPairs]] /
    * [[dupRateSweep]]: banded candidate pairs with their exact shingle
    * INTERSECTION `i` and UNION `u` counts, unfiltered — so callers
    * can apply a threshold in whichever arithmetic they need (the
    * double `i/u` of the pair report, or the exact-integer
    * `i·10⁶ ≥ t_ppm·u` of the sweep, which never touches a float).
    *
    * Scale shape: candidates are bucket-bounded (banded equi-join,
    * never all-pairs); the intersection count is a shingle equi-join
    * over candidates only; `u` is inclusion–exclusion from the
    * per-doc distinct-shingle counts.
    */
  def verifiedPairStats(docs: DataFrame, bands: Int = 8): DataFrame = {
    val mh = minhash(docs, bands)
    val cand = mh.as("m1")
      .join(mh.as("m2"),
        col("m1.band") === col("m2.band") &&
          col("m1.minhash") === col("m2.minhash") &&
          col("m1.doc_id") < col("m2.doc_id"))
      .select(col("m1.doc_id").as("a"), col("m2.doc_id").as("b"))
      .distinct()
    val sh = shingles(docs)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("s1.doc_id") === col("a"))
      .join(sh.as("s2"),
        col("s2.doc_id") === col("b") && col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(cnt.as("ca"), col("ca.doc_id") === col("a"))
      .join(cnt.as("cb"), col("cb.doc_id") === col("b"))
      .select(col("a"), col("b"), col("i"),
        (col("ca.n") + col("cb.n") - col("i")).as("u"))
  }

  /** Dedup METHOD-AGREEMENT census: on the LSH candidate pairs, do the
    * lexical verdict (exact shingle Jaccard ≥ `jacPpm`/10⁶) and the
    * semantic verdict (embedding cosine ≥ `cosMilli`/10³) agree? The
    * 2×2 confusion table — pair counts plus exact jaccard-ppm and
    * cosine ranges per cell — is the calibration a pipeline runs
    * before trusting EITHER method alone: text-only cells are
    * paraphrase-blind lexical dups (template chrome), embed-only cells
    * are near-paraphrases the shingles miss, and their relative mass
    * decides whether SemDeDup earns its embedding cost on this corpus.
    * Population note (in-band by construction): the census covers LSH
    * CANDIDATES, i.e. pairs at least one banding surfaced — the
    * population a combined dedup pass would actually adjudicate.
    *
    * Determinism: the lexical side is exact integers (`i·10⁶ ≥
    * jacPpm·u`); the semantic side is [[Similarity.cosine]]'s
    * pico-quantized dot/norms (exact long sums, three final double
    * ops) — both predicates and the min/max range columns are
    * bit-identical on any engine at any parallelism; no float ever
    * enters an order-sensitive sum.
    *
    * Scale shape: candidates are bucket-bounded ([[verifiedPairStats]],
    * never all-pairs); the embedding attach is two id-keyed equi-joins
    * of the |candidates|-sized pair list against the vector table
    * (shuffle on the id — the pair list, not the corpus, is the
    * driver); the census output is ≤ 4 rows.
    */
  def methodAgreement(docs: DataFrame, embs: DataFrame,
      jacPpm: Long = 500000L, cosMilli: Int = 900,
      bands: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val e = embs.select(col("vec_id"), col("embedding"))
    methodAgreementPairs(docs, bands)
      .join(e.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .select(col("i"), col("u"),
        Similarity.cosine(col("ea"), col("eb")).as("cos"))
      .groupBy(
        (col("i") * 1000000L >= lit(jacPpm) * col("u")).as("text_dup"),
        (col("cos") * 1000 >= lit(cosMilli.toDouble)).as("embed_dup"))
      .agg(count(lit(1)).as("n_pairs"),
        min(expr("i * 1000000 DIV u")).as("min_jac_ppm"),
        max(expr("i * 1000000 DIV u")).as("max_jac_ppm"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"))
      .orderBy("text_dup", "embed_dup")
  }

  /** [[methodAgreement]]'s candidate pairs with exact intersection/
    * union counts, computed with the q141 EXACT-DUP-COLLAPSE: LSH,
    * shingle verification, and Jaccard arithmetic run over ONE
    * representative per distinct text; the member pairs re-enter by
    * arithmetic expansion afterwards. Value-identical to
    * `verifiedPairStats(docs)` in the columns the census reads (i, u,
    * and the pair SET — orientation aside, which min/max/count never
    * see), because minhash, shingles, and therefore candidacy and
    * (i, u) are functions of the TEXT alone: same-text docs share all
    * bands (every within-group pair with ≥1 shingle is a candidate,
    * with i = u = the text's shingle count), and a cross-group member
    * pair is a candidate exactly when its reps share a bucket, with
    * the reps' (i, u). Unlike q141's count-only expansion, every
    * expanded pair IS materialized — each needs its own embedding
    * cosine downstream (embeddings are not text-determined) — so the
    * collapse removes the quadratic SHINGLE-JOIN work per member pair
    * (the measured 50×-replica pathology: 200–400 s uncollapsed) while
    * keeping the output-sized work that is irreducible. Within-group
    * expansion is bounded by the duplicate-group size histogram —
    * exactly the pairs the census exists to adjudicate.
    */
  private def methodAgreementPairs(docs: DataFrame, bands: Int): DataFrame = {
    val g = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("gid"), col("text"))
    val members = g.select(col("gid"), col("doc_id"))
    val reps = g.groupBy(col("gid"))
      .agg(min(struct(col("doc_id"), col("text"))).as("r"),
        count(lit(1)).as("gn"))
      .select(col("gid"), col("r.doc_id").as("doc_id"),
        col("r.text").as("text"), col("gn"))
    import graft.operators.CacheRegistry.TrackedPersist
    val mp = members.trackedPersist() // feeds both expansion joins
    val rp = reps.trackedPersist()    // feeds LSH, shingle counts, id→gid
    val ridToGid = rp.select(col("doc_id").as("rid"), col("gid"))
    val cross = verifiedPairStats(rp.select(col("doc_id"), col("text")), bands)
      .join(ridToGid.select(col("rid").as("a"), col("gid").as("ga")), "a")
      .join(ridToGid.select(col("rid").as("b"), col("gid").as("gb")), "b")
      .join(mp.select(col("gid").as("ga"), col("doc_id").as("ma")), "ga")
      .join(mp.select(col("gid").as("gb"), col("doc_id").as("mb")), "gb")
      .select(col("ma").as("a"), col("mb").as("b"), col("i"), col("u"))
    val shCnt = shingles(rp.select(col("doc_id"), col("text")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val within = rp.where(col("gn") >= 2)
      .join(shCnt, "doc_id") // drops shingle-less texts, like the LSH does
      .select(col("gid"), col("n_sh"))
      .join(mp.as("x"), "gid")
      .join(mp.as("y").withColumnRenamed("doc_id", "doc_id_y"), "gid")
      .where(col("doc_id") < col("doc_id_y"))
      .select(col("doc_id").as("a"), col("doc_id_y").as("b"),
        col("n_sh").as("i"), col("n_sh").as("u"))
    cross.unionByName(within)
  }

  /** Train/val/test LEAKAGE census — the release check a split ships
    * with: verified near-dup pairs ([[nearDupPairs]] semantics at
    * `threshold`) rolled up by the UNORDERED pair of splits their
    * documents landed in under [[TextAnalysis.withSplit]]'s
    * deterministic assignment. Same-split rows are ordinary intra-split
    * duplication; cross-split rows (`is_leak`) are evaluation leakage —
    * a val/test document whose near-copy sits in train scores as
    * memorization, not generalization. The split is content-blind
    * (md5 of doc_id), so near-dups scatter across splits at the split
    * rates — exactly why this census must run BEFORE a release, and
    * why [[TrainingCorpus.build]] deduplicates before splitting.
    *
    * Scale shape: the [[nearDupMatrixByLabel]] exact-dup-collapse core
    * with split as the label — LSH/verify over |distinct texts| only,
    * member splits re-entering through per-(group, split) histograms
    * (splits are per-doc_id, so members of one text group scatter
    * across splits; the expansion convolves the histograms instead of
    * materializing member pairs). The split itself is a per-row hash
    * (recomputed, never joined — the point of a deterministic split);
    * output is ≤ 6 unordered split pairs.
    */
  def splitLeakage(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    nearDupMatrixByLabel(
      TextAnalysis.withSplit(docs)
        .select(col("doc_id"), col("text"), col("split").as("lbl")),
      threshold)
      .select(col("l1").as("split_a"), col("l2").as("split_b"),
        col("n_pairs"))
      .withColumn("is_leak", col("split_a") =!= col("split_b"))
      .orderBy("split_a", "split_b")

  /** Duplicate-rate threshold sweep — the tuning table for "where do
    * we set the near-dup threshold": for each candidate threshold (in
    * ppm), how many VERIFIED pairs and how many distinct documents a
    * dedup pass at that threshold would touch, all from ONE pass of
    * the LSH/verify machinery. The compare is exact integer
    * (`i·10⁶ ≥ t_ppm·u`), so the sweep is bit-identical across
    * engines — no float threshold ever enters a gated value.
    * Thresholds below 500000 are rejected: with b=8/r=2 banding the
    * candidate recall below J=0.5 is not advertised (see
    * [[nearDupPairs]]); above 1000000 nothing can pass.
    *
    * Exact-duplicate collapse FIRST — the [[sourceNearDupMatrix]]
    * discipline, which is exactly what a sweep needs at scale (a
    * corpus whose duplication motivates the sweep is the corpus where
    * uncollapsed LSH blows up quadratically in copy count):
    * [[verifiedPairStats]] runs over one representative per distinct
    * text, and counts expand back arithmetically — value-identical
    * because identical texts have identical shingle sets, hence
    * identical signatures (candidacy transfers member-for-member) and
    * identical (i, u):
    *  - cross-group: a rep pair passing threshold t stands for
    *    n_A·n_B member pairs;
    *  - within-group: members are Jaccard-1 pairs — C(n, 2) at every
    *    t ≤ 10⁶, counted only for texts of ≥ 3 tokens (shorter docs
    *    emit no shingles and never pair in the uncollapsed pipeline);
    *  - touched docs at t: every member of every group in a passing
    *    cross pair, plus every member of an eligible n ≥ 2 group.
    * Spec-pinned equal to the uncollapsed formulation on a
    * duplicate-heavy frame; the q145 oracle stays the uncollapsed
    * spelling, so the gate hash enforces the identity too.
    *
    * Scale shape: one md5 hash-agg collapse, LSH/verify over
    * |distinct texts|, expansions join groups-sized frames, output is
    * |thresholds| rows.
    */
  def dupRateSweep(docs: DataFrame,
      thresholdsPpm: Seq[Long] =
        Seq(500000L, 600000L, 700000L, 800000L, 900000L, 1000000L),
      bands: Int = 8): DataFrame = {
    require(thresholdsPpm.nonEmpty &&
      thresholdsPpm.forall(t => t >= 500000L && t <= 1000000L),
      "sweep thresholds must lie in [0.5, 1.0] ppm-scaled: below 0.5 " +
        "b=8/r=2 banding recall is not advertised (raise bands), above " +
        "1.0 nothing passes")
    val spark = docs.sparkSession
    import spark.implicits._
    val thr = thresholdsPpm.toDF("threshold_ppm")

    val fp = docs.select(col("doc_id"), col("text"),
      md5(col("text").cast("binary")).as("fp"))
    val groups = fp.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("rep"))
    val repDocs = fp
      .join(groups.select(col("rep").as("doc_id")), "doc_id")
      .select(col("doc_id"), col("text"))
    val repN = groups.select(col("rep"), col("fp"), col("n"))

    // cross-group rep pairs, thresholded in exact integers, expanded
    val crossQ = verifiedPairStats(repDocs, bands)
      .join(repN.select(col("rep").as("a"), col("fp").as("fpa"),
        col("n").as("na")), "a")
      .join(repN.select(col("rep").as("b"), col("fp").as("fpb"),
        col("n").as("nb")), "b")
      .crossJoin(broadcast(thr))
      .where(col("i") * lit(1000000L) >= col("threshold_ppm") * col("u"))
    val crossPairs = crossQ.groupBy(col("threshold_ppm"))
      .agg(sum(col("na") * col("nb")).as("cp"))

    // within-group J=1 pairs: per-threshold constant over eligible
    // (>= 3 token) groups with n >= 2
    val eligible = repDocs.where(size(tokens(col("text"))) >= 3)
      .select(col("doc_id").as("rep"))
      .join(repN, "rep")
    val withinAgg = eligible.where(col("n") >= 2)
      .agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("wp"))
      .crossJoin(broadcast(thr))
      .select(col("threshold_ppm"), col("wp"))

    // touched docs: groups in passing cross pairs ∪ eligible n>=2
    // groups, member counts summed over the union
    val crossGroups = crossQ.select(col("threshold_ppm"),
        explode(array(col("fpa"), col("fpb"))).as("gfp"))
    val withinGroups = eligible.where(col("n") >= 2)
      .select(col("fp").as("gfp"))
      .crossJoin(broadcast(thr))
      .select(col("threshold_ppm"), col("gfp"))
    val nd = crossGroups.union(withinGroups).distinct()
      .join(groups.select(col("fp").as("gfp"), col("n")), "gfp")
      .groupBy(col("threshold_ppm"))
      .agg(sum(col("n")).as("n_dup_docs"))

    thr.join(crossPairs, Seq("threshold_ppm"), "left")
      .join(withinAgg, Seq("threshold_ppm"), "left")
      .join(nd, Seq("threshold_ppm"), "left")
      .select(col("threshold_ppm"),
        (coalesce(col("cp"), lit(0L)) + coalesce(col("wp"), lit(0L)))
          .as("n_pairs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
      .orderBy("threshold_ppm")
  }

  /** Cross-source near-dup attribution matrix: VERIFIED near-dup
    * document pairs (the [[nearDupPairs]] semantics) rolled up per
    * unordered source pair — where q70's shingle-overlap matrix says
    * two crawls share vocabulary, this counts actual near-duplicate
    * document pairs crossing each source boundary (within-source
    * republication lands on the diagonal). The provenance report that
    * decides which source a dedup keep-policy demotes when crawls
    * mirror each other.
    *
    * Exact-duplicate collapse FIRST: a web corpus carries the same
    * page text many times, and LSH candidate volume grows
    * quadratically in that multiplicity (every copy lands in every
    * bucket its text hashes to). Near-dup-ness depends only on TEXT,
    * so the pipeline runs over one representative per distinct text
    * and expands back arithmetically — value-identical to running
    * [[nearDupPairs]] over every document:
    *  - cross-group: a verified rep pair (A, B) stands for every
    *    member cross pair (same texts ⇒ same Jaccard); contribution to
    *    unordered (s₁, s₂) is Σ n_A(s_i)·n_B(s_j) over the groups'
    *    per-source member counts;
    *  - within-group: members are Jaccard-1 pairs — C(n_s, 2) on the
    *    diagonal and n_s₁·n_s₂ across — counted only for texts of ≥ 3
    *    tokens (shorter docs emit no shingles, so the uncollapsed
    *    pipeline never pairs them) and only when threshold ≤ 1.
    * Measured on the 50× replica (50 exact copies per doc): 76 s → the
    * collapsed path runs the LSH over the distinct texts only.
    *
    * Scale shape: the collapse is one md5-keyed hash aggregate (the
    * [[exactGroups]] discipline); LSH/verify run on |distinct texts|;
    * the expansions join groups-sized frames; output stays bounded by
    * |sources|².
    */
  def sourceNearDupMatrix(docs: DataFrame, threshold: Double = 0.5)
      : DataFrame =
    nearDupMatrixByLabel(
      docs.select(col("doc_id"), col("text"), col("source").as("lbl")),
      threshold)
      .select(col("l1").as("s1"), col("l2").as("s2"), col("n_pairs"))
      .orderBy("s1", "s2")

  /** The label-generic core of [[sourceNearDupMatrix]] /
    * [[splitLeakage]]: verified near-dup pairs rolled up per unordered
    * pair of the endpoints' `lbl` values, computed with the
    * exact-dup-collapse expansion (the q141 argument — near-dup-ness
    * depends only on text, labels only re-weight the expansion):
    * cross-group rep pairs contribute per-(group, label) member-count
    * products; within-group Jaccard-1 pairs come from each group's
    * label histogram (C(n,2) on the diagonal, n₁·n₂ across), gated on
    * the ≥ 3-token shingle floor. Input must expose
    * (doc_id, text, lbl); output (l1 ≤ l2, n_pairs), unordered.
    */
  private def nearDupMatrixByLabel(docs: DataFrame, threshold: Double)
      : DataFrame = {
    val fp = docs.select(col("doc_id"), col("lbl"), col("text"),
      md5(col("text").cast("binary")).as("fp"))
    // per-(group, label) member counts + one representative per group
    val members = fp.groupBy(col("fp"), col("lbl"))
      .agg(count(lit(1)).as("n"))
    val reps = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val repDocs = fp.join(reps.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("text"))
    val repFp = fp.join(reps.select(col("doc_id")), "doc_id")
      .select(col("doc_id"), col("fp"))

    // cross-group: rep pair -> member-count product per label pair
    val cross = nearDupPairs(repDocs, threshold)
      .join(repFp.select(col("doc_id").as("a"), col("fp").as("fpa")), "a")
      .join(repFp.select(col("doc_id").as("b"), col("fp").as("fpb")), "b")
      .join(members.select(col("fp").as("fpa"), col("lbl").as("sa"),
        col("n").as("na")), "fpa")
      .join(members.select(col("fp").as("fpb"), col("lbl").as("sb"),
        col("n").as("nb")), "fpb")
      .select(least(col("sa"), col("sb")).as("l1"),
        greatest(col("sa"), col("sb")).as("l2"),
        (col("na") * col("nb")).as("n_pairs"))

    // within-group Jaccard-1 pairs (only texts the shingle pipeline
    // would pair: >= 3 tokens; and only when the threshold admits J=1)
    val eligible = fp
      .where(size(tokens(col("text"))) >= 3)
      .groupBy(col("fp"), col("lbl")).agg(count(lit(1)).as("n"))
    val withinSame = eligible
      .select(col("lbl").as("l1"), col("lbl").as("l2"),
        expr("n * (n - 1) DIV 2").as("n_pairs"))
      .where(col("n_pairs") > 0)
    val withinCross = eligible.as("x")
      .join(eligible.as("y"),
        col("x.fp") === col("y.fp") && col("x.lbl") < col("y.lbl"))
      .select(col("x.lbl").as("l1"), col("y.lbl").as("l2"),
        (col("x.n") * col("y.n")).as("n_pairs"))
    val within = withinSame.union(withinCross)
      .where(lit(threshold <= 1.0))

    cross.union(within)
      .groupBy(col("l1"), col("l2"))
      .agg(sum(col("n_pairs")).as("n_pairs"))
  }

  /** Size distribution of the near-dup clusters: (cluster_size,
    * n_clusters, n_docs), the one-page profile a curation run reads to
    * decide whether near-dup collapse is removing scattered pairs or
    * entire mirrored sites. Built on [[nearDupClusters]] (so only
    * docs appearing in a verified pair participate; singletons are by
    * definition not clusters); one distinct over the |clusters|-sized
    * label table plus a histogram agg over cluster sizes — both
    * orders-of-magnitude smaller than the corpus.
    */
  def clusterSizeHistogram(docs: DataFrame, threshold: Double = 0.5):
      DataFrame =
    nearDupClusters(docs, threshold)
      .select(col("cluster"), col("cluster_size")).distinct()
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")

  /** MinHash estimator calibration: for every LSH candidate pair,
    * bucket by the number of shared band signatures (1-8) and report
    * how exact shingle-Jaccard distributes inside each bucket — the
    * audit that tells you what a band collision actually MEANS on your
    * corpus before you trust the q31/q32 thresholds. With r=2 banding a
    * pair sharing b of 8 bands collides with probability ~1-(1-J²)^b,
    * so avg_jaccard should rise steeply with shared_bands; a flat table
    * means the signature is mis-mixed for this shingle distribution.
    *
    * Determinism: per-pair Jaccard is quantized to micro-units
    * (floor((i/u)·1e6 + 0.5), single division) so the per-bucket sums
    * are exact longs and avg/min/max are single divisions. Scale shape:
    * candidates are bucket-bounded (same join as [[nearDupPairs]] —
    * never all-pairs); the per-pair band count is a hash agg on the
    * pair key; the final histogram has ≤ 8 rows.
    */
  def lshCalibration(docs: DataFrame, bands: Int = 8): DataFrame = {
    val mh = minhash(docs, bands)
    val cand = mh.as("m1")
      .join(mh.as("m2"),
        col("m1.band") === col("m2.band") &&
          col("m1.minhash") === col("m2.minhash") &&
          col("m1.doc_id") < col("m2.doc_id"))
      .groupBy(col("m1.doc_id").as("a"), col("m2.doc_id").as("b"))
      .agg(count(lit(1)).as("shared_bands"))
    val sh = shingles(docs)
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("s1.doc_id") === col("a"))
      .join(sh.as("s2"),
        col("s2.doc_id") === col("b") && col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("a"), col("b"), col("shared_bands"))
      .agg(count(lit(1)).as("i"))
    val jac = col("i").cast("double") /
      (col("ca.n") + col("cb.n") - col("i"))
    inter
      .join(cnt.as("ca"), col("ca.doc_id") === col("a"))
      .join(cnt.as("cb"), col("cb.doc_id") === col("b"))
      .select(col("shared_bands"),
        floor(jac * lit(1000000.0) + lit(0.5)).as("jq"))
      .groupBy("shared_bands")
      .agg(count(lit(1)).as("n_pairs"), sum(col("jq")).as("sjq"),
        min(col("jq")).as("mnq"), max(col("jq")).as("mxq"))
      .select(col("shared_bands"), col("n_pairs"),
        (col("sjq").cast("double") / (lit(1000000L) * col("n_pairs")))
          .as("avg_jaccard"),
        (col("mnq").cast("double") / lit(1000000.0)).as("min_jaccard"),
        (col("mxq").cast("double") / lit(1000000.0)).as("max_jaccard"))
      .orderBy("shared_bands")
  }

  /** Incremental-batch dedup status: classify each NEW document against
    * an EXISTING corpus as `exact_dup` (md5 match), `near_dup` (shares
    * an LSH bucket with an existing doc and verifies at Jaccard ≥
    * `threshold`), or `novel` — the daily-increment operation a
    * production corpus runs, where the existing side's fingerprints and
    * MinHash signatures are already materialized and ONLY the new batch
    * pays signature computation.
    *
    * Scale shape: the exact screen is a left-semi on the 128-bit
    * fingerprint; the near screen joins batch signatures to existing
    * signatures on the (band, minhash) bucket key (existing buckets are
    * an index lookup, not a corpus scan), and the exact-Jaccard verify
    * runs only over surviving candidate pairs. Batch cost is
    * O(|batch| · sig) + bucket-bounded joins — independent of corpus
    * size given the materialized index.
    */
  def incrementalStatus(batch: DataFrame, existing: DataFrame,
      threshold: Double = 0.5, bands: Int = 8): DataFrame = {
    val bFp = batch.select(col("doc_id"),
      md5(col("text").cast("binary")).as("fp"))
    val eFp = existing.select(md5(col("text").cast("binary")).as("efp"))
      .distinct()
    val exact = bFp.join(eFp, col("fp") === col("efp"), "left_semi")
      .select(col("doc_id"))
    val bMh = minhash(batch, bands)
    val eMh = minhash(existing, bands)
      .select(col("band").as("eband"), col("minhash").as("eminhash"),
        col("doc_id").as("eid"))
    val cand = bMh
      .join(eMh, col("band") === col("eband") &&
        col("minhash") === col("eminhash"))
      .select(col("doc_id"), col("eid")).distinct()
    val bSh = shingles(batch)
    val eSh = shingles(existing)
      .select(col("doc_id").as("eid"), col("shingle"))
    val bCnt = bSh.groupBy(col("doc_id")).agg(count(lit(1)).as("bn"))
    val eCnt = eSh.groupBy(col("eid")).agg(count(lit(1)).as("en"))
    val near = cand
      .join(bSh.as("s1"), Seq("doc_id"))
      .join(eSh.as("s2"),
        col("s2.eid") === cand("eid") &&
          col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("doc_id"), cand("eid"))
      .agg(count(lit(1)).as("i"))
      .join(bCnt, "doc_id").join(eCnt, "eid")
      .where(col("i").cast("double") /
        (col("bn") + col("en") - col("i")) >= threshold)
      .select(col("doc_id")).distinct()
    batch.select(col("doc_id"))
      .join(exact.withColumn("is_exact", lit(1)), Seq("doc_id"), "left")
      .join(near.withColumn("is_near", lit(1)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact") === 1, "exact_dup")
          .when(col("is_near") === 1, "near_dup")
          .otherwise("novel").as("status"))
      .orderBy("doc_id")
  }

  /** Incremental near-dup ATTRIBUTION: for each batch document, its
    * single best verified match in the existing corpus (max Jaccard,
    * ties to the smallest corpus id) — the step after
    * [[incrementalStatus]]'s keep/drop verdict: joining a new document
    * to the CLUSTER it belongs to, so an incremental ingest can extend
    * existing duplicate groups instead of re-clustering the corpus.
    *
    * Same candidate discipline as every near-dup operator here: LSH
    * band buckets joined batch×index (cost scales with the BATCH, not
    * the corpus), exact-Jaccard verification over candidate pairs
    * only, then a struct-MAX argmax per batch doc (map-side partials;
    * no window over the pair set). At 100 TB the corpus-side band
    * table is the persisted LSH index [[incrementalStatus]] documents;
    * nothing rescans the corpus text except the candidate shingle
    * join, which is keyed on the candidates' doc ids.
    */
  def incrementalBestMatch(batch: DataFrame, existing: DataFrame,
      threshold: Double = 0.5, bands: Int = 8): DataFrame = {
    val bMh = minhash(batch, bands)
    val eMh = minhash(existing, bands)
      .select(col("band").as("eband"), col("minhash").as("eminhash"),
        col("doc_id").as("eid"))
    val cand = bMh
      .join(eMh, col("band") === col("eband") &&
        col("minhash") === col("eminhash"))
      .select(col("doc_id"), col("eid")).distinct()
    val bSh = shingles(batch)
    val eSh = shingles(existing)
      .select(col("doc_id").as("eid"), col("shingle"))
    val bCnt = bSh.groupBy(col("doc_id")).agg(count(lit(1)).as("bn"))
    val eCnt = eSh.groupBy(col("eid")).agg(count(lit(1)).as("en"))
    val verified = cand
      .join(bSh.as("s1"), Seq("doc_id"))
      .join(eSh.as("s2"),
        col("s2.eid") === cand("eid") &&
          col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("doc_id"), cand("eid"))
      .agg(count(lit(1)).as("i"))
      .join(bCnt, "doc_id").join(eCnt, "eid")
      .select(col("doc_id"), col("eid"),
        (col("i").cast("double") / (col("bn") + col("en") - col("i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
    val best = verified.groupBy(col("doc_id"))
      .agg(max(struct(col("jaccard"), (-col("eid")).as("ne"))).as("m"))
      .select(col("doc_id"), (-col("m.ne")).as("match_id"),
        col("m.jaccard").as("jaccard"))
    batch.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id"), col("jaccard"),
        when(col("match_id").isNotNull, "near_dup").otherwise("novel")
          .as("status"))
      .orderBy("doc_id")
  }

  /** Containment near-duplicates: ordered pairs where |A∩B|/|A| ≥
    * `threshold` — the ASYMMETRIC overlap that catches a document
    * embedded inside a larger one (quote inclusion, boilerplate
    * wrapping), which symmetric Jaccard misses (a small doc inside a
    * big one has low Jaccard but containment 1.0).
    *
    * Candidate generation is an inverted shingle index pruned two ways,
    * both essential at scale: shingles with df=1 pair nothing and drop
    * out, and shingles with df > `dfCap` are stop-shingles (boilerplate
    * n-grams) whose postings lists would quadratically explode the
    * self-join — the standard prefix/df-filtering trade. A contained
    * doc still surfaces as long as ANY of its shingles is rare, which
    * holds except for docs made entirely of corpus-wide boilerplate
    * (those are exact-dedup territory anyway). Verification then
    * computes the EXACT intersection over the full shingle sets of
    * candidate pairs only — identical join shape to [[nearDupPairs]].
    */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.8,
      dfCap: Int = 20): DataFrame = {
    val sh = shingles(docs)
    val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= dfCap)
      .select(col("shingle"))
    val rare = sh.join(dfs, "shingle")
    val cand = rare.as("r1")
      .join(rare.as("r2"),
        col("r1.shingle") === col("r2.shingle") &&
          col("r1.doc_id") =!= col("r2.doc_id"))
      .select(col("r1.doc_id").as("a"), col("r2.doc_id").as("b"))
      .distinct()
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.as("s1"), col("s1.doc_id") === col("a"))
      .join(sh.as("s2"),
        col("s2.doc_id") === col("b") && col("s2.shingle") === col("s1.shingle"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(cnt.as("ca"), col("ca.doc_id") === col("a"))
      .select(col("a"), col("b"), col("i"),
        (col("i").cast("double") / col("ca.n")).as("containment"))
      .where(col("containment") >= threshold)
      .orderBy("a", "b")
  }

  /** Near-duplicate CLUSTERS: connected components over the verified
    * pair graph, labeled by the component's minimum doc_id — the form
    * dedup actually consumes (keep one representative per cluster, not
    * per pair; pairs alone under-delete transitive groups A~B~C where
    * A~C never met a bucket). Components come from alternating
    * large-star/small-star contraction — O(log n) rounds regardless of
    * graph diameter, so even an adversarial boilerplate chain spanning
    * the corpus converges; see [[connectedComponents]].
    *
    * Exact-dup collapse FIRST (r17, guide §2.3 "shuffle fewer bytes"
    * via the §8 proxy rule): signatures, candidacy and Jaccard are all
    * functions of the text alone, so members of an md5-exact group are
    * interchangeable in the pair graph — the full graph is exactly the
    * REPRESENTATIVE graph expanded by per-group J=1 cliques (the q141
    * expansion argument, and the curation order NeMo-Curator/Dolma
    * run: exact dedup before MinHash). The LSH → shingle-verify
    * pipeline therefore runs over one doc per distinct text, and each
    * group rejoins its rep through a star edge — same components, same
    * min labels (the rep IS its group's min), same sizes. Groups whose
    * text has < 3 tokens emit no shingles and no signatures in the
    * direct form, so the token floor excludes them here too. Measured
    * (r17, 50× replica): the direct form shuffled 28 GB and ran 197 s;
    * the collapsed form runs the pair pipeline over 4 992 reps instead
    * of 250 000 docs.
    */
  def nearDupClusters(docs: DataFrame, threshold: Double = 0.5,
      maxIter: Int = 20): DataFrame =
    connectedComponents(nearDupClusterEdges(docs, threshold), maxIter)
      .orderBy("doc_id")

  /** The collapsed edge set [[nearDupClusters]] contracts: verified
    * pairs over one representative per distinct text, unioned with the
    * member→rep star edges that expand each exact group back into its
    * component. Factored out so the r17 plan evidence can explain the
    * pre-contraction lineage (the checkpoint boundary hides it from
    * the gate's own explain).
    */
  private[graft] def nearDupClusterEdges(docs: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    // fp feeds both the group table and the member-edge join: persist
    // the ~24 B/row digest projection so the corpus is md5'd/tokenized
    // once (PlanLint rule 4 — the q164/q193 re-evaluation defect —
    // and its prescribed trackedPersist remedy)
    val fp = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .where(size(tokens(col("text"))) >= 3)
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val groups = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("rep"))
    val repDocs = docs
      .join(groups.select(col("rep").as("doc_id")), "doc_id")
      .select(col("doc_id"), col("text"))
    // the verified rep pairs — nearDupPairs' exact predicate, minus
    // its presentation ORDER BY (a full range exchange the contraction
    // loop would immediately throw away)
    val repPairs = verifiedPairStats(repDocs)
      .where(col("i").cast("double") / col("u") >= threshold)
      .select(col("a"), col("b"))
    // members hang off their representative as J = 1 edges (admitted
    // whenever the threshold admits J = 1, like nearDupMatrixByLabel's
    // within-group expansion)
    val memberEdges = fp.join(groups, "fp")
      .where(col("doc_id") =!= col("rep") && lit(threshold <= 1.0))
      .select(col("doc_id").as("a"), col("rep").as("b"))
    repPairs.union(memberEdges)
  }

  /** Collapse policy for near-dup clusters: per clustered document, the
    * representative its cluster keeps — the LONGEST copy (max n_chars,
    * min doc_id tiebreak), not the arbitrary min-id member — plus the
    * keep/drop action. This is the survivor-remap table a dedup pass
    * hands downstream so references to dropped doc_ids can be rewritten
    * (NeMo-Curator/Dolma-style "keep best copy" semantics, vs the
    * reference's implicit first-wins; cf. app.py's single-node dedup
    * having no cluster notion at all).
    *
    * Scale shape: one agg keyed by cluster picks the arg-max via a
    * (n_chars, -doc_id) struct MAX — map-side partials, no window over
    * the corpus — then one join keyed by cluster fans the choice back
    * to members. Both shuffles are on cluster, reusing the label
    * table's key; the corpus itself is touched only to fetch n_chars.
    */
  def clusterRepresentatives(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sized = nearDupClusters(docs, threshold)
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
    val reps = sized.groupBy(col("cluster"))
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_id"))).as("m"))
      .select(col("cluster"), (-col("m.neg_id")).as("rep_doc_id"))
    sized.join(reps, "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        col("rep_doc_id"),
        when(col("doc_id") === col("rep_doc_id"), "keep")
          .otherwise("drop").as("action"))
      .orderBy("doc_id")
  }

  /** Connected components over an undirected pair list `(a, b)`:
    * returns (doc_id, cluster, cluster_size) with cluster = component
    * min. Factored from [[nearDupClusters]] so the fixpoint is testable
    * on a bare graph.
    *
    * Algorithm: alternating large-star/small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14).
    * Large-star hangs every bigger neighbor of a node onto the
    * neighborhood min; small-star re-hangs the smaller neighbors.
    * Alternating the two converges in O(log n) rounds REGARDLESS of
    * graph diameter — the property min-label propagation lacks: that
    * needs diameter rounds, and a 100 TB corpus with one long
    * boilerplate chain would blow any fixed round budget and throw.
    * Every round is two (self-join + hash-agg) passes over the EDGE
    * set — never the corpus — and the fixpoint (a star forest where
    * every node points straight at its component min) is detected by
    * edge-set stability, a count + anti-join, not a collect.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // emit (v, m) for every neighbor v>u, where m = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val dir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = dir.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      dir.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // orient (hi → lo); emit (v, m) for the smaller neighbors and
    // (u, m), where m = min of u's smaller neighborhood
    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = o.groupBy(col("u")).agg(min(col("v")).as("m"))
      o.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    // ONE execution of the (possibly expensive) pair lineage: the r17
    // decomposition measured the full q59 gate shuffling exactly 2× the
    // pair pipeline's bytes (28.4 GB vs 14.0 GB at 50×) because the
    // node set and the edge set each eagerly checkpointed the same
    // uncached lineage. Materialize the pair list once; both derive
    // from the checkpointed blocks.
    val p = pairs.localCheckpoint(true)
    // singletons and component minima can drop out of the shrinking
    // edge set; remember every input node so the output covers them
    // (no checkpoint needed — rederiving from p is one cheap local job)
    val nodes = p.select(col("a").as("node"))
      .union(p.select(col("b").as("node")))
      .distinct()
    var edges = p.select(col("a").as("u"), col("b").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var converged = false
    var it = 0
    // carried across rounds: re-counting the PREVIOUS edge set every
    // iteration would add one job per round for a number already known
    var edgeCount = edges.count()
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nextCount = next.count()
      // both sides are distinct: equal cardinality + one-sided set
      // containment ⇒ set equality ⇒ fixpoint reached
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edges = next
      edgeCount = nextCount
      it += 1
    }
    // Never return silently-wrong labels: an unfinished contraction
    // would under-collapse clusters downstream (TrainingCorpus.build
    // keeps one doc per cluster) with no signal. O(log n) rounds means
    // hitting this bound indicates a mis-set maxIter, not a long chain.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star-contraction " +
          "rounds (edge set still changing) — raise maxIter")
    // fixpoint edges all point (node → component min); roots and
    // singletons label themselves
    val starLabels = edges.groupBy(col("u")).agg(min(col("v")).as("lbl"))
    val labels = nodes
      .join(starLabels, nodes("node") === starLabels("u"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("label"))
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "label")
      .select(col("node").as("doc_id"), col("label").as("cluster"),
        col("cluster_size"))
  }

  /** SimHash near-duplicate pairs: candidates from 4×16-bit block
    * bucketing (pigeonhole: hamming ≤ 3 ⇒ at least one of the four
    * blocks is identical, so the blocked join is COMPLETE for the
    * threshold — never all-pairs), verified by exact hamming distance
    * over the hex signatures.
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block bucketing is only complete for <= 3")
    // referenced twice below; lazy persist (NOT eager localCheckpoint —
    // that would execute the job at plan-construction time and pin
    // non-recoverable executor blocks)
    val sim = simhash(docs)
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = sim.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), bk -> struct(bk AS bk, substr(simhash, 1 + bk * 4, 4) AS block))"))
        .as("b"))
      .select(col("doc_id"), col("simhash"), col("b.bk"), col("b.block"))
    val cand = blocks.as("b1")
      .join(blocks.as("b2"),
        col("b1.bk") === col("b2.bk") && col("b1.block") === col("b2.block") &&
          col("b1.doc_id") < col("b2.doc_id"))
      .select(col("b1.doc_id").as("a"), col("b2.doc_id").as("b"),
        col("b1.simhash").as("sa"), col("b2.simhash").as("sb"))
      .distinct()
    // hamming via per-hex-digit xor popcount (lookup-string trick),
    // folded in ONE projection with a higher-order aggregate over the
    // 16 digit positions — no 16× candidate-row blowup and no extra
    // hash aggregate (the r6 verdict's optional cleanup)
    cand.select(col("a"), col("b"),
        expr("""aggregate(sequence(0, 15), 0L, (acc, i) ->
                  acc + CAST(substr('0112122312232334',
                    CAST((instr('0123456789abcdef', substr(sa, i + 1, 1)) - 1)
                       ^ (instr('0123456789abcdef', substr(sb, i + 1, 1)) - 1)
                     AS INT) + 1, 1) AS BIGINT))""").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  /** 64-bit SimHash per document, rendered as a 16-hex-char signature.
    * Pure integer arithmetic over md5 hex digits so any engine computes
    * the identical signature; near-dup detection is then hamming
    * distance over these (bucketable by 16-bit blocks at scale).
    *
    * One hash-aggregate pass via the typed [[graft.functions.SimHashAgg]]
    * aggregator (64 signed counters per doc, map-side partials) — no
    * tokens × bit-positions row blowup; the DuckDB oracle replays the
    * identical arithmetic with its explode formulation.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val sim = udaf(graft.functions.SimHashAgg)
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), md5(col("t").cast("binary")).as("h"))
      .groupBy(col("doc_id"))
      .agg(sim(col("h")).as("simhash"))
  }

  /** Shard-stitch detection: pairs (left, right) where the LAST `k`
    * tokens of one document equal the FIRST `k` tokens of another —
    * the signature of a crawl record split across shard boundaries
    * with overlap, which a re-assembly pass would concatenate instead
    * of keeping two truncated fragments (a common crawl-ingest defect
    * that inflates doc counts and truncates training sequences).
    *
    * The join keys on the k-token phrase itself; phrases carried by
    * more than `maxDf` documents on either side are dropped first —
    * those are boilerplate openings/closings (q83's territory), not
    * split points, and the cap bounds the per-phrase pair fan-out at
    * maxDf² regardless of corpus size. One scan builds both boundary
    * tables; at 100 TB both sides hash-partition on the phrase.
    */
  def stitchPairs(docs: DataFrame, k: Int = 5,
      maxDf: Int = 100): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(col("text")).as("w"))
      .where(size(col("w")) >= k)
    // each boundary table feeds BOTH the pair join and its df cap;
    // unpersisted, every consumer re-tokenizes the whole corpus (the
    // q96/q108 shared-subtree rule). (id, k-token phrase) rows only —
    // far narrower than the corpus; MEMORY_AND_DISK spills, not OOMs.
    val lft = t.select(col("doc_id").as("left_id"),
      expr(s"concat_ws(' ', slice(w, size(w) - ${k - 1}, $k))").as("phrase"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rgt = t.select(col("doc_id").as("right_id"),
      expr(s"concat_ws(' ', slice(w, 1, $k))").as("phrase"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lc = lft.groupBy(col("phrase")).agg(count(lit(1)).as("c"))
      .where(col("c") <= maxDf).select(col("phrase"))
    val rc = rgt.groupBy(col("phrase")).agg(count(lit(1)).as("c"))
      .where(col("c") <= maxDf).select(col("phrase"))
    lft.join(rgt, "phrase")
      .join(lc, Seq("phrase"), "left_semi")
      .join(rc, Seq("phrase"), "left_semi")
      .where(col("left_id") =!= col("right_id"))
      .select(col("left_id"), col("right_id"), col("phrase"))
      .orderBy("left_id", "right_id")
  }

  /** Shingle-novelty census per source: every distinct word 3-gram
    * shingle is attributed to its FIRST document (min doc_id over the
    * corpus — the same keep-lowest-id attribution every dedup pass
    * here uses), and each source reports how much of its shingle mass
    * is NOVEL (first-occurrence) vs inherited from earlier documents.
    * The pooled ratio Σnovel·10⁶ DIV Σshingles is exact integer ppm;
    * fully-novel docs introduce every one of their shingles. This is
    * the curriculum/acquisition signal a pipeline reads when deciding
    * whether a new source still ADDS anything: a crawl snapshot whose
    * novelty_ppm collapses is re-crawling what the corpus already
    * holds (the doc-level complement of the q77 incremental probe).
    *
    * Scale shape: the shingle table ([[shingles]], distinct per doc)
    * feeds ONE shingle-keyed min-aggregate (map-side partial MIN, md5-
    * free — the raw shingle is the key exactly as q57 does) and one
    * co-keyed join back; both shuffles share the shingle partitioning,
    * and everything after the per-doc aggregate is |docs|- then
    * |sources|-sized. Documents under 3 tokens carry no shingles and
    * drop from the census (inner join), mirroring the oracle's range
    * semantics. At 100 TB the shingle table is written bucketed by
    * shingle and the min-owner side becomes a bucket-local merge.
    */
  def noveltyReport(docs: DataFrame): DataFrame = {
    val sh = shingles(docs)
    val own = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("owner"))
    val perDoc = sh.join(own, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("doc_id") === col("owner"), 1L).otherwise(0L))
          .as("n_own"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("n_shingles"),
        sum(col("n_own")).as("n_novel_shingles"),
        sum(when(col("n_own") === col("n_sh"), 1L).otherwise(0L))
          .as("n_fully_novel_docs"))
      .select(col("source"), col("n_docs"), col("n_shingles"),
        col("n_novel_shingles"),
        expr("n_novel_shingles * 1000000 DIV n_shingles").as("novelty_ppm"),
        col("n_fully_novel_docs"))
      .orderBy("source")
  }

  /** Duplicate-spread census: exact-dup clusters classified by HOW the
    * copies spread across sources — the "is duplication re-crawl
    * (cross-source) or re-post (intra-source)" table that decides
    * whether dedup should run before or after source mixing. For each
    * (cluster size, distinct sources) cell: cluster count, document
    * count, the documents OUTSIDE each cluster's dominant source
    * (`size − max per-source count` summed), and that spill as exact
    * ppm of the cell's documents.
    *
    * Scale shape: one (text-hash, source) hash aggregate over the
    * corpus — the md5 collapses each document to a 16-BYTE BINARY key
    * map-side (`unhex(md5)`: the hash never appears in the output, so
    * the key representation is free to be the narrow one — half the
    * agg/shuffle key bytes of the 32-char hex spelling, value-identical
    * because unhex is injective on hex digests), so the shuffle carries
    * distinct (hash, source) cells, not texts — then a hash-keyed
    * rollup to clusters (partial aggs; the second grouping is a prefix
    * of the first, so AQE coalesces rather than re-exchanges) and a
    * census-sized final agg. Singleton clusters are excluded (size ≥
    * 2): the census reads duplication structure, not corpus size. All
    * integer arithmetic.
    *
    * Residual-vs-oracle disposition: ENGINE-FLOOR LEDGER row in
    * PERF_NOTES r15 (measured floor stage, scales, anchors).
    */
  def dupSpreadCensus(docs: DataFrame): DataFrame =
    dupSpreadCensusHashed(
      docs.select(unhex(md5(col("text"))).as("h"), col("source")))

  /** [[dupSpreadCensus]] over a PRE-HASHED `(h, source)` frame — for
    * callers that already hold a content hash (any injective per-text
    * key: binary md5, hex md5, a fingerprint column) and must not pay
    * a second text scan. Synthetic-duplication channels derive their
    * union legs from ONE hashed projection map-side (identical text ⇒
    * identical hash), instead of re-reading and re-digesting the
    * corpus per leg.
    */
  def dupSpreadCensusHashed(hashed: DataFrame): DataFrame = {
    val ps = hashed
      .groupBy(col("h"), col("source"))
      .agg(count(lit(1)).as("c"))
    val cl = ps.groupBy(col("h"))
      .agg(sum(col("c")).as("size"), count(lit(1)).as("n_sources"),
        max(col("c")).as("max_c"))
      .where(col("size") >= 2)
    cl.groupBy(col("size"), col("n_sources"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("size")).as("n_docs"),
        sum(col("size") - col("max_c")).as("cross_source_docs"))
      .select(col("size"), col("n_sources"), col("n_clusters"),
        col("n_docs"), col("cross_source_docs"),
        expr("cross_source_docs * 1000000 DIV n_docs").as("spill_ppm"))
      .orderBy("size", "n_sources")
  }

  /** Cross-source exact-duplicate MATRIX: for every unordered source
    * pair, how many distinct texts appear in both — the
    * provenance-overlap table a corpus-mixing decision reads next to
    * [[dupSpreadCensus]]'s aggregate spill (the census says HOW MUCH
    * leaks across sources; the matrix says BETWEEN WHOM).
    */
  def crossSourceDupMatrix(docs: DataFrame): DataFrame =
    crossSourceDupMatrixHashed(docs.select(
      unhex(md5(col("text"))).as("h"), col("source")))

  /** [[crossSourceDupMatrix]] over a pre-hashed `(h, source)` stream
    * (16-byte binary digests — the q162 key discipline). Scale shape:
    * the stream collapses to DISTINCT (h, source) map-side before
    * anything joins (the only fact-absorbing step); the self-join runs
    * h-partitioned over that collapsed table against its cached self,
    * fanning out at most C(|sources present|, 2) rows per digest —
    * bounded by the source-universe size, never by corpus size; the
    * finish is a ≤|sources|²-row aggregate.
    */
  def crossSourceDupMatrixHashed(pairs: DataFrame): DataFrame = {
    import graft.operators.CacheRegistry.TrackedPersist
    val hs = pairs.select(col("h"), col("source")).distinct()
      .trackedPersist() // both sides of the self-join
    hs.as("a").join(hs.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_texts"))
      .orderBy("source_a", "source_b")
  }
}
