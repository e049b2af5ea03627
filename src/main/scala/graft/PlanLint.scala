package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Expression, IsNotNull, IsNull, NamedExpression, Not, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.joins.{CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Static plan lint shared by PlanLintSpec (every `sbt test`, sf0.001)
  * and the plan-dump mains Plans/PlansProbe (replica scale, so shapes
  * that only appear past the broadcast thresholds fail the dump loudly
  * instead of needing a manual read — VERDICT r13 items 1 and 5). The
  * four rules are the anti-patterns every scale review checked by hand:
  *
  *  1. no `CartesianProductExec` with a CORPUS side — a cross join is
  *     quadratic in whatever feeds it, so any side with a fact scan not
  *     collapsed by an aggregate (or decoupled by a cached relation) is
  *     a scale defect. Value-domain-sized cartesians ABOVE aggregates
  *     (the q91 centroid-pair / q198 type-pair shape) are benign by
  *     construction and pass — this is the scale-aware refinement the
  *     r13 verdict asked for (the blanket rule only held at sf0.001
  *     where those two plans broadcast instead).
  *  2. no shuffle join (SMJ/SHJ) whose build or probe subtree reads
  *     ONLY fixed-size dimension tables (region/nation) — those must
  *     broadcast; shuffling a 25-row dim means the OTHER side's
  *     corpus-sized exchange was spent to meet it.
  *  3. no globally-ordered Window (empty partitionSpec) fed by a fact
  *     scan with no aggregate in between — a single-partition sort of
  *     the corpus. Windows above an aggregate are fine (the
  *     powerUserShare/q154 pattern: |distinct values|-sized).
  *  4. no re-evaluated shared collapsed subtree: two structurally
  *     identical aggregates (same grouping, same child modulo
  *     join-pushed IsNotNull filters) over the same fact source in one
  *     plan mean a frame built once in code is being computed twice at
  *     runtime — the q164/q193/q194/q195/q198 defect (recurred four
  *     times in r13; the q194 persist alone flipped 1.6× to an 0.18×
  *     win). The remedy is `trackedPersist()` on the collapsed frame.
  *     Detection is on the optimized LOGICAL plan (persisted copies
  *     collapse to InMemoryRelation leaves and vanish), CONFIRMED on
  *     the physical plan (exchange reuse can legitimately absorb
  *     bit-identical copies — those don't re-evaluate and must pass).
  */
object PlanLint extends PredicateHelper {
  val dimTables = Set("region", "nation")
  val factTables = Set("lineitem", "orders", "customer", "part",
    "supplier", "events", "documents", "embeddings")

  /** Gates allowed to keep an intentional duplicate-collapse (rule 4),
    * each with the measured/argued reason. A whitelisted gate that
    * STOPS firing should be removed from here (the spec asserts both
    * directions so stale entries surface).
    *
    * All nine entries are the shingle/char-gram pipeline family whose
    * duplicated collapse is the CORPUS-SIZED exploded (doc, shingle)
    * frame: persisting it was A/B-measured neutral-to-WORSE at the 50×
    * replica (PERF_NOTES r11 "Negative result: shingle-frame persist
    * in nearDupPairs" — re-tokenization rides the OS page cache;
    * materializing ~67 M exploded rows costs more than it saves). At
    * real scale the remedy is materializing the shingle table ONCE as
    * a bucketed parquet layout shared across all dedup passes
    * (CorpusWriter), not a per-query persist. The small side tables in
    * the same pipelines (minhash signatures, per-doc shingle counts)
    * were A/B-measured separately in r14 — see PERF_NOTES r14.
    */
  val sharedSubtreeWhitelist: Map[String, String] = Map(
    "q51_chargram_jaccard" -> "corpus-sized char-gram explode; r11 negative result",
    "q68_containment" -> "corpus-sized shingle explode; r11 negative result",
    "q70_source_overlap" -> "corpus-sized shingle explode; r11 negative result",
    "q77_incremental_dedup" -> "corpus-sized shingle explode; r11 negative result",
    "q80_split_contamination" -> "corpus-sized shingle explode; r11 negative result",
    "q111_incremental_match" -> "corpus-sized shingle explode; r11 negative result",
    "q141_source_neardup_matrix" -> "corpus-sized shingle explode + arithmetic expansion legs; r11 negative result",
    "q143_split_leakage" -> "corpus-sized shingle explode + arithmetic expansion legs; r11 negative result",
    "q145_dup_threshold_sweep" -> "corpus-sized shingle explode re-entered per threshold; r11 negative result")

  private def tableOf(scan: FileSourceScanExec): Option[String] = {
    val paths = scan.relation.location.rootPaths.map(_.toString.toLowerCase)
    (dimTables ++ factTables).find(t => paths.exists(_.contains(t)))
  }

  private def tableOfRel(rel: LogicalRelation): Option[String] = {
    val paths = rel.relation match {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location.rootPaths.map(_.toString.toLowerCase)
      case _ => Nil
    }
    factTables.find(t => paths.exists(_.contains(t)))
  }

  /** All source tables read anywhere in the physical subtree. */
  def scans(p: SparkPlan): Seq[String] =
    p.collect { case f: FileSourceScanExec => tableOf(f) }.flatten

  /** Fact scans reachable WITHOUT passing through an aggregate or a
    * cached relation (both collapse/decouple cardinality).
    */
  def unaggregatedFactScans(p: SparkPlan): Seq[String] = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
        _: SortAggregateExec | _: InMemoryTableScanExec => Nil
    case f: FileSourceScanExec => tableOf(f).filter(factTables).toSeq
    case other => other.children.flatMap(unaggregatedFactScans)
  }

  // --- rule 4 machinery -------------------------------------------------

  /** Fact tables read by LogicalRelations in the logical subtree. */
  private def factRels(p: LogicalPlan): Seq[String] =
    p.collect { case r: LogicalRelation => tableOfRel(r) }.flatten

  /** Join pushdown decorates one copy of a shared subtree with
    * IsNotNull guards the other copy lacks — strip them so the two
    * copies canonicalize identically (exactly the asymmetry that also
    * defeats Spark's own exchange reuse and makes the double scan
    * real).
    */
  private def stripNullGuards(p: LogicalPlan): LogicalPlan = p.transformUp {
    case Filter(cond, child) =>
      val kept = splitConjunctivePredicates(cond).filterNot {
        case _: IsNotNull => true
        case Not(_: IsNull) => true
        case _ => false
      }
      kept.reduceOption(And).map(Filter(_, child)).getOrElse(child)
  }

  /** Signature of "the collapse this aggregate performs": grouping keys
    * over the normalized child, ignoring WHICH aggregate functions are
    * computed (column pruning legally narrows one copy's output — the
    * shuffle+scan underneath is still paid twice).
    */
  private def aggSignature(a: Aggregate): LogicalPlan = {
    val out: Seq[NamedExpression] = a.groupingExpressions.map {
      case ne: NamedExpression => ne
      case e: Expression => Alias(e, "k")()
    }
    Aggregate(a.groupingExpressions, out, stripNullGuards(a.child))
      .canonicalized
  }

  def sharedSubtreeViolations(df: DataFrame): Seq[String] = {
    val qe = df.queryExecution
    val aggs = qe.optimizedPlan.collect {
      case a: Aggregate if factRels(a).nonEmpty => a
    }
    val dupGroups = aggs.groupBy(aggSignature).values.filter(_.size >= 2)
    if (dupGroups.isEmpty) return Nil
    // physical confirmation: exchange reuse / caching absorbs
    // bit-identical copies — only tables actually scanned >= 2 times at
    // execution re-evaluate
    val physCounts = scans(qe.executedPlan)
      .groupBy(identity).view.mapValues(_.size).toMap
    dupGroups.toSeq.flatMap { g =>
      val ts = g.flatMap(factRels).distinct.sorted
      if (ts.exists(t => physCounts.getOrElse(t, 0) >= 2))
        Seq(s"shared collapsed subtree over ${ts.mkString(",")} " +
          s"evaluated ${g.size}x (grouping ${g.head.groupingExpressions
            .map(_.sql).mkString(",")}) — trackedPersist the frame " +
          "(the q194 rule)")
      else Nil
    }.distinct
  }

  // --- the four rules over one frame -------------------------------------

  def lint(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val cartesian = plan.collect {
      case c: CartesianProductExec =>
        c.children.flatMap(unaggregatedFactScans).distinct.sorted match {
          case Nil => Nil // value-domain-sized sides above aggregates
          case ts => Seq(s"CartesianProduct with un-collapsed corpus side " +
            ts.mkString(","))
        }
    }.flatten
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
    cartesian ++ dimShuffleJoins ++ globalWindows ++
      sharedSubtreeViolations(df)
  }

  /** Lint one gate, honoring the rule-4 whitelist. Returns remaining
    * violations.
    */
  def lintGate(name: String, df: DataFrame): Seq[String] = {
    val vs = lint(df)
    if (sharedSubtreeWhitelist.contains(name))
      vs.filterNot(_.startsWith("shared collapsed subtree"))
    else vs
  }
}
