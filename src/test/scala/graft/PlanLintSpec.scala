package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.joins.{CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.SparkSpec

/** Static plan lint over EVERY gate query — the three anti-patterns a
  * scale review checks by hand on the plan dumps, run on every `sbt
  * test` against the real sf0.001 testdata:
  *
  *  1. no `CartesianProductExec` anywhere (an unhinted cross join of
  *     two non-broadcast sides is quadratic at any scale);
  *  2. no shuffle join (SMJ/SHJ) whose build or probe subtree reads
  *     ONLY fixed-size dimension tables (region/nation) — those must
  *     broadcast; shuffling a 25-row dim means the OTHER side's
  *     corpus-sized exchange was spent to meet it;
  *  3. no globally-ordered Window (empty partitionSpec) fed by a
  *     fact-table scan with no aggregate in between — a single-
  *     partition sort of the corpus. Windows above an aggregate are
  *     fine (the powerUserShare/q154 pattern: |distinct values|-sized
  *     by construction).
  *
  * Lint runs on the NON-adaptive physical plan (AQE re-plans at
  * runtime but starts from this shape; disabling it keeps the whole
  * join/window tree statically visible). Planning only — nothing
  * executes here; GateSmokeSpec covers execution.
  */
class PlanLintSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val dimTables = Set("region", "nation")
  private val factTables = Set("lineitem", "orders", "customer", "part",
    "supplier", "events", "documents", "embeddings")

  private def tableOf(scan: FileSourceScanExec): Option[String] = {
    val paths = scan.relation.location.rootPaths.map(_.toString.toLowerCase)
    (dimTables ++ factTables).find(t => paths.exists(_.contains(t)))
  }

  /** All source tables read anywhere in the subtree (no pruning). */
  private def scans(p: SparkPlan): Seq[String] =
    p.collect { case f: FileSourceScanExec => tableOf(f) }.flatten

  /** Fact scans reachable WITHOUT passing through an aggregate or a
    * cached relation (both collapse/decouple cardinality).
    */
  private def unaggregatedFactScans(p: SparkPlan): Seq[String] = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
        _: SortAggregateExec | _: InMemoryTableScanExec => Nil
    case f: FileSourceScanExec => tableOf(f).filter(factTables).toSeq
    case other => other.children.flatMap(unaggregatedFactScans)
  }

  def lint(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val cartesian = plan.collect { case c: CartesianProductExec =>
      "CartesianProduct"
    }
    val dimShuffleJoins = plan.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }.flatMap { j =>
      j.children.flatMap { side =>
        val ts = scans(side)
        if (ts.nonEmpty && ts.forall(dimTables))
          Seq(s"shuffle join against dim-only side ${ts.distinct.sorted
            .mkString(",")} (should broadcast)")
        else Nil
      }
    }
    val globalWindows = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        unaggregatedFactScans(w.child).distinct.sorted match {
          case Nil => Nil
          case ts => Seq(s"unpartitioned Window over fact scan ${ts
            .mkString(",")}")
        }
    }.flatten
    cartesian ++ dimShuffleJoins ++ globalWindows
  }

  /** Plan a frame with AQE off so the full static tree is visible. */
  private def planned[A](mk: => A): A = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try mk finally spark.conf.set(key, old)
  }

  for (d <- SparkEntry.allDefs) {
    test(s"plan lint: ${d.name}") {
      val vs = planned(lint(d.spark(spark, dir)))
      assert(vs.isEmpty, s"plan-lint violations: ${vs.mkString("; ")}")
    }
  }

  // --- seeded regressions: each rule must FIRE on a plan built to
  //     violate it (otherwise the 166 green lints prove nothing)

  test("lint fires on a seeded CartesianProduct") {
    val a = spark.range(12000000L).toDF("a") // 96 MB estimate > 64 MB
    val b = spark.range(12000000L).toDF("b") // broadcast threshold
    val vs = planned(lint(a.crossJoin(b)))
    assert(vs.exists(_.contains("CartesianProduct")), vs.toString)
  }

  test("lint fires on a seeded dim-side shuffle join") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val vs = planned(lint(events.join(nation.hint("merge"),
      col("user_id") === col("n_nationkey"))))
    assert(vs.exists(_.contains("dim-only side nation")), vs.toString)
  }

  test("lint fires on a seeded unpartitioned corpus Window") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val vs = planned(lint(events.withColumn("rn",
      row_number().over(Window.orderBy(col("event_id"))))))
    assert(vs.exists(_.contains("unpartitioned Window over fact scan " +
      "events")), vs.toString)
  }

  test("lint passes an aggregate-collapsed global window (the " +
    "powerUserShare shape)") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val v = events.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("users"))
      .withColumn("cum", sum(col("users")).over(Window.orderBy(col("c"))))
    assert(planned(lint(v)).isEmpty)
  }
}
