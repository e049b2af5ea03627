package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling / data-mixing operators over `documents` — the knobs a
  * training run turns AFTER curation: how much of each source to take
  * (mixture weights), what sequence packing costs (padding census),
  * and a reproducible subsample to take it with (hash-threshold
  * sampling). All ratios are exact integer ppm arithmetic; the one
  * irrational step (√n for temperature weights) is quantized to micros
  * immediately (`sqrt` is IEEE-correctly-rounded in every engine, so
  * the quantized weight is bit-identical — the same determinism rule
  * the verify notes pin for the engine at large).
  */
object Sampling {

  /** Temperature-balanced source mixture at α = 0.5 (square-root
    * sampling — the standard multilingual/multi-source rebalancing
    * exponent): per source, the natural share and the √-tempered
    * share, plus the sampling boost each source gets. α = 0.5 rather
    * than a free exponent because √ is the one power both engines
    * compute bit-identically (`pow`/`ln` are NOT correctly-rounded —
    * banned from gated values).
    *
    * Scale shape: one corpus pass → |sources|-keyed hash agg with
    * map-side partials; the totals join is a 1-row broadcast. At
    * 100 TB this is a metadata-sized report.
    */
  def sourceMixture(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        // native run count == size(Dedup.tokens(text)) without the
        // interpreted filter/split lambda or the array (WordRunCount)
        sum(graft.functions.WordRunCount(col("text"))).as("n_tokens"),
        // √n quantized to micros while still exact-integer-valued
        floor(sqrt(count(lit(1)).cast("double")) * 1e6 + 0.5)
          .cast("long").as("sqrt_w"))
    val tot = per.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("sqrt_w")).as("t_sqrt"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_docs * 1000000 DIV t_docs").as("natural_ppm"),
        expr("sqrt_w * 1000000 DIV t_sqrt").as("tempered_ppm"))
      .withColumn("boost_ppm",
        expr("CASE WHEN natural_ppm = 0 THEN NULL " +
          "ELSE tempered_ppm * 1000000 DIV natural_ppm END"))
      .orderBy("source")
  }

  /** Context-window packing census for sequence length `seqLen`: what
    * a corpus costs to feed a trainer, per source — subword token mass
    * (the q126 [[graft.functions.TokenRunCount]] law), docs that would
    * truncate, the truncated-token loss, and the padding waste under
    * the two standard packing regimes: CONCAT (GPT-style: concatenate
    * everything, chunk every seqLen — waste only in the final chunk)
    * vs ISOLATED (one doc per sequence, pad to seqLen — the worst
    * case). The span between the two waste_ppm numbers is what a
    * packing implementation is worth on this corpus.
    *
    * Scale shape: per-row native token count, |sources|-keyed agg with
    * map-side partials; exact integer DIV everywhere.
    */
  def packingReport(docs: DataFrame, seqLen: Int = 512): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val L = seqLen.toLong
    docs.select(col("source"),
        graft.functions.TokenRunCount(col("text")).as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        sum(when(col("t") > L, 1L).otherwise(0L)).as("docs_truncated"),
        sum(greatest(col("t") - L, lit(0L))).as("tokens_lost"),
        sum(expr(s"(t + ${L - 1}) DIV $L")).as("isolated_seqs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("docs_truncated"), col("tokens_lost"),
        expr(s"(n_tokens + ${L - 1}) DIV $L").as("concat_seqs"),
        col("isolated_seqs"))
      // NULL-guard the degenerate all-zero-token source: Spark DIV 0
      // yields NULL but DuckDB's // raises, so make both engines
      // explicitly agree on NULL (the q131 oracle carries the same CASE)
      .withColumn("concat_waste_ppm",
        expr(s"CASE WHEN concat_seqs = 0 THEN NULL ELSE " +
          s"(concat_seqs * $L - n_tokens) * 1000000 DIV (concat_seqs * $L) END"))
      .withColumn("isolated_waste_ppm",
        expr(s"CASE WHEN isolated_seqs = 0 THEN NULL ELSE " +
          s"(isolated_seqs * $L - n_tokens) * 1000000 DIV (isolated_seqs * $L) END"))
      .orderBy("source")
  }

  /** Hash-threshold sample-rate census: keep a document iff the first
    * 8 md5 hex digits of `doc_id || '|strat'` — folded to a long by
    * the shared [[Dedup.hexPrefix]] arithmetic — land under `ppm/1e6`
    * of the 32-bit hash space, and report per-source target vs
    * ACHIEVED rate. The audit complement of the row-selecting samplers
    * ([[TextAnalysis.stratifiedSample]]'s per-lang rates,
    * [[TextAnalysis.quotaSample]]'s exact quotas): before a sampling
    * run trusts a hash threshold, this is the number that says whether
    * md5 mixing actually delivered the rate in every stratum.
    * Content-stable (same corpus → same sample on any engine, any
    * partitioning — NEVER `rand()`).
    *
    * Scale shape: per-row codegen'd hash + one |sources| agg; the keep
    * predicate is reusable as-is as a selection WHERE clause.
    */
  def sampleRateCensus(docs: DataFrame, ppm: Long = 250000): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val keep = Dedup.hexPrefix(
      md5(concat(col("doc_id"), lit("|strat")).cast("binary")), 1) *
      lit(1000000L) < lit(ppm * 4294967296L)
    docs.select(col("source"), when(keep, 1L).otherwise(0L).as("s"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("s")).as("n_sampled"))
      .select(col("source"), col("n_docs"), col("n_sampled"),
        lit(ppm).as("target_ppm"),
        expr("n_sampled * 1000000 DIV n_docs").as("achieved_ppm"))
      .orderBy("source")
  }

  /** Token-budget greedy selection census — "take documents in a
    * content-stable random order until each source's token budget is
    * spent", the selection a data-mixing recipe actually executes
    * after [[sourceMixture]] chose the budgets. Order is the md5 hash
    * of `doc_id || '|budget'` (folded by [[Dedup.hexPrefix]], doc_id
    * tiebreak) — uniform, engine-independent, never `rand()`. A
    * document is selected iff the running token total up to and
    * including it stays ≤ `budgetTokens`; tokens are the q126 subword
    * law ([[graft.functions.TokenRunCount]]). Reports per source:
    * docs seen/selected, tokens selected, and exact-integer budget
    * utilization ppm.
    *
    * Scale shape — the distributed prefix sum, not a per-source
    * window: `SUM OVER (PARTITION BY source ORDER BY h)` puts an
    * entire source on ONE reducer, which at 100 TB is a single-task
    * sort of a trillion rows. Instead the hash space splits into
    * `buckets` ORDER-ALIGNED ranges (`h DIV width`, monotone in h):
    * a |sources|·buckets token-mass table gives exclusive per-bucket
    * offsets (tiny window), broadcast back, and each row's global
    * running total is its bucket offset plus a within-bucket prefix —
    * the window partitions are (source, bucket), 64× finer, and
    * `buckets` scales with the cluster. Value-identical to the
    * single window (same total order; the q144 oracle spells the
    * plain window), pinned by spec against the window formulation.
    */
  def budgetSelect(docs: DataFrame, budgetTokens: Long = 2000L,
      buckets: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val width = 4294967296L / buckets
    val base = docs.select(col("source"), col("doc_id"),
        graft.functions.TokenRunCount(col("text")).as("t"),
        Dedup.hexPrefix(md5(concat(col("doc_id").cast("string"),
          lit("|budget")).cast("binary"))).as("h"))
      .withColumn("bkt", expr(s"h DIV $width"))
    val wOff = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = base.groupBy(col("source"), col("bkt"))
      .agg(sum(col("t")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select(col("source"), col("bkt"), col("off"))
    val wLocal = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(off), Seq("source", "bkt"))
      .withColumn("cum", sum(col("t")).over(wLocal) + col("off"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cum") <= budgetTokens, 1L).otherwise(0L))
          .as("n_selected"),
        sum(when(col("cum") <= budgetTokens, col("t")).otherwise(0L))
          .as("tokens_selected"))
      .select(col("source"), col("n_docs"), col("n_selected"),
        col("tokens_selected"), lit(budgetTokens).as("budget_tokens"),
        expr("tokens_selected * 1000000 DIV budget_tokens")
          .as("utilization_ppm"))
      .orderBy("source")
  }

  /** Exact token-length distribution per source: min / lower-median /
    * ceil-p90 / ceil-p99 / max of the subword token count (the q126
    * [[graft.functions.TokenRunCount]] law) plus doc and token totals —
    * the census that tunes `seqLen` BEFORE [[packingReport]] prices a
    * choice. Exact at scale without sorting the corpus, by the same
    * distinct-value construction as the inter-arrival percentiles:
    * lengths collapse into a (source, t)-keyed count table (map-side
    * partials; the distinct-length domain is tiny vs the doc count),
    * percentiles read off the cumulative window over that table, and
    * the target ranks are integer arithmetic — `(n+1) DIV 2`,
    * `(9n+9) DIV 10`, `(99n+99) DIV 100` — so the report is
    * bit-identical on any engine at any parallelism (never
    * approx_percentile, whose sketch merges are nondeterministic).
    */
  def lengthPercentiles(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.install(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("t"))
    val c = docs.select(col("source"),
        graft.functions.TokenRunCount(col("text")).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        sum(col("t") * col("n")).as("n_tokens"))
    c.withColumn("cum", sum(col("n")).over(w))
      .join(tot, "source")
      .groupBy(col("source"))
      .agg(min(col("n_docs")).as("n_docs"),
        min(col("n_tokens")).as("n_tokens"),
        min(col("t")).as("min_tokens"),
        min(when(col("cum") >= expr("(n_docs + 1) DIV 2"), col("t")))
          .as("p50_tokens"),
        min(when(col("cum") >= expr("(9 * n_docs + 9) DIV 10"), col("t")))
          .as("p90_tokens"),
        min(when(col("cum") >= expr("(99 * n_docs + 99) DIV 100"), col("t")))
          .as("p99_tokens"),
        max(col("t")).as("max_tokens"))
      .orderBy("source")
  }

  /** Robust per-source length-outlier census: median / MAD (median
    * absolute deviation) of `n_chars` per source and the count of docs
    * whose deviation exceeds `tenthsMad`/10 × MAD — the heavy-tail
    * screen that survives the exact outliers it is hunting (a mean/
    * stddev z-score is dragged by the very anomalies — concatenation
    * bugs, binary-in-text blobs, truncated crawls — it should flag;
    * the breakdown point of the median is 50%). Lower-median rank
    * convention ((n+1) DIV 2 over the cumulative count table — the
    * q110/q135 technique), so every statistic is EXACT integer
    * arithmetic end to end: median and MAD are observed char counts,
    * the outlier predicate is `dev·10 > tenthsMad·MAD` in longs.
    *
    * Scale shape: docs collapse ONCE into a (source, n_chars) count
    * table (map-side partials; distinct-length domain ≪ doc count) —
    * the only corpus-sized operation. The median window, the deviation
    * re-key (|table| rows, NOT |docs|), the MAD window, and the final
    * census all run over that persisted table, every shuffle keyed on
    * source. MAD = 0 (over half the source at one length) degrades as
    * documented: every off-median doc counts as an outlier.
    */
  def robustLengthOutliers(docs: DataFrame, tenthsMad: Int = 35): DataFrame = {
    import graft.operators.CacheRegistry.TrackedPersist
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("v"))
    // lower median of a (source, v, n) count table, via the shared
    // rank-on-cumulative trick; also returns per-source row counts
    def lowerMedian(c: DataFrame, as: String): DataFrame = {
      val tot = c.groupBy(col("source")).agg(sum(col("n")).as("n_docs"))
      c.withColumn("cum", sum(col("n")).over(wv))
        .join(tot, "source")
        .groupBy(col("source"))
        .agg(min(when(col("cum") >= expr("(n_docs + 1) DIV 2"), col("v")))
          .as(as), min(col("n_docs")).as("n_docs"))
    }
    val cnt = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("n"))
      .trackedPersist() // feeds the median pass AND the deviation re-key
    val med = lowerMedian(cnt, "med_chars")
    val dev = cnt.join(med.select(col("source"), col("med_chars")), "source")
      .groupBy(col("source"), abs(col("v") - col("med_chars")).as("v"))
      .agg(sum(col("n")).as("n"))
      .trackedPersist() // feeds the MAD pass AND the outlier census
    val mad = lowerMedian(dev, "mad_chars")
      .select(col("source"), col("mad_chars"))
    dev.join(mad, "source")
      .join(med.select(col("source"), col("med_chars"), col("n_docs")),
        "source")
      .groupBy(col("source"))
      .agg(min(col("n_docs")).as("n_docs"),
        min(col("med_chars")).as("med_chars"),
        min(col("mad_chars")).as("mad_chars"),
        sum(when(col("v") * 10 > lit(tenthsMad.toLong) * col("mad_chars"),
          col("n")).otherwise(0L)).as("n_outliers"),
        max(col("v")).as("max_dev"))
      .orderBy("source")
  }

  /** Epoch-capped water-filling token allocator — the mixture SOLVER
    * the share reports ([[sourceMixture]] q130, per-lang q89) stop
    * short of: given a training budget `B` tokens, √-tempered source
    * weights `w_s = ⌊√tokens_s⌋`, and an upsampling ceiling
    * `capPpm` (how many epochs of a source a run tolerates before
    * repetition hurts — cap_s = tokens_s·capPpm/10⁶), find the
    * allocation `need_s = min(cap_s, λ·w_s)` with the water level λ
    * chosen so Σ need = B. Small sources hit their epoch cap; the
    * budget they can't absorb spills pro-rata onto the rest — the
    * fixed point every "we can't just √-sample, CC would need 9
    * epochs" planning discussion is groping for.
    *
    * EXACT λ-search, no iteration: sources sorted by saturation ratio
    * r_s = cap_s/w_s ascending saturate in PREFIX order (saturating a
    * source with r < λ raises λ — (B−c)/(W−w) ≥ B/W iff r ≤ B/W — so
    * the level only rises along the sort, and past the first
    * non-saturating source r > λ holds forever). One |sources|-row
    * sort + prefix sums decides everything: row k saturates iff
    * every row j ≤ k passes (B − prefixCap_j)·w_j ≥ cap_j·(W −
    * prefixW_j) — a running-AND window over the prefix test.
    *
    * Cross-engine arithmetic discipline: the saturation products and
    * the two huge-divisor ppm ratios reach beyond 64 bits at 100 TB
    * scale, so they run in exact decimal here (sized under Spark's
    * p1+p2+1 ≤ 38 exactness cap) and HUGEINT in the oracle; every
    * product with a SMALL divisor uses the split identity
    * `a = q·d + r ⇒ (a·m) DIV d = q·m + (r·m) DIV d` to stay inside
    * BIGINT at any corpus size. The sort key is the ppm-quantized
    * ratio with a source tiebreak — both engines order identically,
    * which is what the gate hash needs; quantization can only swap
    * sources whose true ratios differ below micro resolution.
    *
    * Scale shape: one corpus scan → |sources|-keyed agg; everything
    * after runs on the metadata-sized per-source frame (the unordered
    * single-partition window is |sources| rows, same as the totals
    * broadcasts elsewhere). Flooring leaves < |unsaturated| tokens of
    * budget unassigned — deterministic slack, never overspend.
    */
  def waterfillPlan(docs: DataFrame, budgetTokens: Long = 15000L,
      capPpm: Long = 900000L): DataFrame = {
    require(budgetTokens >= 1 && capPpm >= 1,
      s"need positive budget and cap, got B=$budgetTokens cap=$capPpm")
    graft.functions.GraftFunctions.install(docs.sparkSession)
    import graft.operators.CacheRegistry.TrackedPersist
    import org.apache.spark.sql.expressions.Window
    val per = docs.groupBy(col("source"))
      .agg(sum(graft.functions.WordRunCount(col("text"))).as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        floor(sqrt(col("n_tokens").cast("double"))).cast("long")
          .as("weight"),
        // cap = tokens·capPpm DIV 1e6 via the split identity
        expr(s"(n_tokens DIV 1000000) * $capPpm + " +
          s"((n_tokens % 1000000) * $capPpm) DIV 1000000")
          .as("cap_tokens"))
      // ratio key: (cap·1e6) DIV max(w,1), split so cap·1e6 never
      // materializes; w=0 only when tokens=0 (cap=0, rk=0 — saturates
      // trivially at need 0 and perturbs no prefix sum)
      .withColumn("rk",
        expr("(cap_tokens DIV greatest(weight, 1)) * 1000000 + " +
          "((cap_tokens % greatest(weight, 1)) * 1000000) " +
          "DIV greatest(weight, 1)"))
      // |sources|-sized; feeds the weight total AND the flagged chain —
      // unpersisted, the corpus token-count agg ran multiple times
      // (the q194 shared-subtree rule)
      .trackedPersist()
    val ord = Window.orderBy(col("rk"), col("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("weight")).as("w_tot"))
    val flagged = per.crossJoin(broadcast(tot))
      .withColumn("pre_cap",
        coalesce(sum(col("cap_tokens")).over(pre), lit(0L)))
      .withColumn("pre_w", coalesce(sum(col("weight")).over(pre), lit(0L)))
      .withColumn("pass",
        // DECIMAL(19,0)·DECIMAL(18,0) → DECIMAL(38,0): under Spark's
        // p1+p2+1 cap, so the product is EXACT (precision loss would
        // silently round); weights fit 18 digits by construction
        // (⌊√long⌋ < 2³²)
        when(expr(s"CAST($budgetTokens - pre_cap AS DECIMAL(19, 0)) * " +
          "CAST(weight AS DECIMAL(18, 0)) >= " +
          "CAST(cap_tokens AS DECIMAL(19, 0)) * " +
          "CAST(w_tot - pre_w AS DECIMAL(18, 0))"), 1L).otherwise(0L))
      .withColumn("saturated", min(col("pass")).over(run) === 1L)
      .trackedPersist() // feeds the saturated totals AND the final plan
    val sat = flagged.agg(
      coalesce(sum(when(col("saturated"), col("cap_tokens"))), lit(0L))
        .as("sat_cap"),
      coalesce(sum(when(!col("saturated"), col("weight"))), lit(0L))
        .as("w_last"))
    flagged.crossJoin(broadcast(sat))
      .withColumn("need_tokens",
        when(col("saturated"), col("cap_tokens")).otherwise(
          // (B_last·w) DIV W_last via the split identity, W guarded
          // (the guard only fires when every source saturated and no
          // row takes this arm)
          expr(s"(($budgetTokens - sat_cap) DIV greatest(w_last, 1)) " +
            s"* weight + ((($budgetTokens - sat_cap) % " +
            "greatest(w_last, 1)) * weight) DIV greatest(w_last, 1)")))
      .select(col("source"), col("n_tokens"), col("weight"),
        col("cap_tokens"), col("saturated"), col("need_tokens"),
        // these two divide by a potentially HUGE divisor, where the
        // split identity can't bound the remainder product — so they
        // run in exact decimal (DECIMAL(19,0)·10⁶ → DECIMAL(27,0),
        // IntegralDivide on decimals is exact; HUGEINT // in the
        // oracle)
        expr("CASE WHEN n_tokens = 0 THEN NULL ELSE CAST(" +
          "(CAST(need_tokens AS DECIMAL(19, 0)) * CAST(1000000 AS " +
          "DECIMAL(7, 0))) DIV n_tokens AS BIGINT) END").as("epochs_ppm"),
        expr("CAST((CAST(need_tokens AS DECIMAL(19, 0)) * " +
          s"CAST(1000000 AS DECIMAL(7, 0))) DIV $budgetTokens AS BIGINT)")
          .as("share_ppm"))
      .orderBy("source")
  }
}
