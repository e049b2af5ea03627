package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Readers for the driver-generated test tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst owns pushdown/pruning: every
  * downstream `.select`/`.filter` reaches the scan as `ReadSchema` /
  * `PushedFilters`. At 100 TB these would be partitioned/bucketed table
  * scans; the query code is agnostic to that (it never assumes a
  * single-file layout).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      // prefer the orderkey-co-bucketed fact pair when writeOrderFacts
      // has registered one FOR THIS SOURCE generation (schema-identical
      // — values never change, only the per-orderkey exchanges
      // disappear; the events table keeps its explicit Tables.events
      // entry point)
      case "lineitem" => graft.operators.CorpusWriter
        .bucketedSource(spark, dir, "lineitem.parquet",
          graft.operators.CorpusWriter.DefaultLineitemTable)
        .getOrElse(spark.read.parquet(s"$dir/lineitem.parquet"))
      case "orders" => graft.operators.CorpusWriter
        .bucketedSource(spark, dir, "orders.parquet",
          graft.operators.CorpusWriter.DefaultOrdersTable)
        .getOrElse(spark.read.parquet(s"$dir/orders.parquet"))
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** The events table for `dir`, preferring the user_id-bucketed layout
    * when [[graft.operators.CorpusWriter.writeEvents]] has registered
    * one FOR THIS SOURCE in the session catalog (schema-identical, so
    * values never change — only the per-user shuffle disappears; see
    * the writer's scaladoc for the 100 TB argument). Falls back to the
    * plain parquet read otherwise, which is what the round driver's
    * fresh-session Verify/Bench runs always get.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusWriter.bucketedEvents(spark, dir)
      .getOrElse(apply(spark, dir, "events"))

  /** Epoch-seconds for an event-time column, robust to the physical type
    * the driver's generator emits for `events.ts` (it has changed across
    * testdata generations): INT64(nanos) surfaced as a raw Long via
    * [[sessionConf]]'s `nanosAsLong`, TIMESTAMP_MICROS (TimestampType),
    * or TIMESTAMP_NTZ. All three floor toward negative infinity —
    * `DIV` on longs and Spark's timestamp→long cast (a floorDiv on
    * micros) — so the result is bit-identical to the DuckDB oracle's
    * `CAST(FLOOR(EPOCH(ts)) AS BIGINT)` in every case. The NTZ branch
    * casts through TimestampType under the pinned UTC session timezone,
    * which is lossless.
    */
  def epochSec(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType => expr(s"$c DIV 1000000000")
      case _        => col(c).cast(TimestampType).cast(LongType)
    }

  /** Session settings every entry point (Verify/Bench/tests) must share.
    * `nanosAsLong`: kept for testdata generations where events.ts is
    * parquet TIMESTAMP(NANOS) (which Spark's micros TimestampType
    * refuses) — those surface ts as a lossless raw nanos Long; newer
    * generations emit TIMESTAMP_MICROS and surface TIMESTAMP_NTZ. Query
    * code derives seconds through [[epochSec]] so both encodings work.
    */
  val sessionConf: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    // Prefer shuffled-hash over sort-merge for non-broadcast equi-joins:
    // measured 28-31% faster on the join-heavy headline queries at 50×
    // sf0.1 (PERF_NOTES.md round-4 evidence) by skipping both sort
    // passes. Safe at 100 TB because shuffle partitions are sized to fit
    // executor memory (the build side is the smaller per-partition
    // slice) and AQE splits skewed partitions; this is the default
    // posture of modern vectorized engines.
    // Broadcast threshold stays at the 10 MB DEFAULT, deliberately.
    // A 64 MB threshold was tried in r13 (it let the 200× customer map
    // keep broadcasting and un-flipped q163's SMJ) and REVERTED after
    // it destabilized the connected-component operators at 50×:
    // size-estimate currencies differ by plan node — parquet scans
    // estimate from file bytes (reliable), but localCheckpoint'd loop
    // frames (q59/q85/q90) report COMPRESSED in-memory block sizes, so
    // a ~50 MB-looking frame deserialized into a ~512 MB driver
    // HashedRelation → intermittent "Not enough memory to build and
    // broadcast" + GCLocker starvation (PERF_NOTES r13). The q163-class
    // wins are kept with PLAN-LOCAL shuffle_hash hints on the
    // pre-collapsed fact sides instead — hints scope the decision to
    // joins whose build side is known-bounded, rather than betting the
    // whole session on every estimate being honest.
    "spark.sql.join.preferSortMergeJoin" -> "false")
}
