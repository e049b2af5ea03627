package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming corpus curation: near-duplicate candidate detection over a
  * document STREAM — the online counterpart of the batch LSH pass
  * (`Dedup.lshBuckets` → `nearDupPairs`), for ingest pipelines that
  * must flag "this looks like something we already hold" at arrival
  * time instead of waiting for the nightly batch.
  *
  * Shape: per-row MinHash band keys ([[Dedup.minhashPerRow]] — no
  * shuffle, so the plan's single stateful operator is the bucket
  * state) → `flatMapGroupsWithState` keyed by (band, minhash) bucket.
  * State per bucket is the bounded id list of prior members; a new
  * arrival emits one candidate row per stored member, then joins the
  * list. Cross-batch pairs therefore surface exactly like within-batch
  * pairs, and a candidate is emitted at most once per (pair, band)
  * while the bucket is under its cap (a capped-out doc re-delivered by
  * an at-least-once source can re-emit: it is deliberately not stored)
  * — downstream exact-Jaccard verification (same as batch) dedups.
  *
  * 100 TB/day notes: state size is bounded by `maxBucket` ids per
  * bucket — a hot boilerplate bucket stops ACCUMULATING at the cap but
  * keeps MATCHING against its first `maxBucket` members (new arrivals
  * still emit candidates, so the flag never goes dark; the cap bounds
  * both memory and the per-event emission fan-out at `bands ·
  * maxBucket`). Buckets shard across executors by key hash; the r=2
  * band key keeps collision probability at J², so bucket population
  * grows with true duplication, not corpus size. A production
  * deployment adds a state TTL (event-time timeout) when "already
  * seen" has a freshness horizon; the state machine body is unchanged.
  */
object CorpusStreamOps {

  final case class DocIn(doc_id: Long, text: String)

  /** One candidate per (arriving doc, stored bucket member, band). */
  final case class Candidate(doc_id: Long, matched_doc_id: Long, band: Long)

  def nearDupCandidates(docs: Dataset[DocIn], bands: Int = 8,
      maxBucket: Int = 64): Dataset[Candidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    Dedup.minhashPerRow(docs.toDF(), bands)
      .select(concat(col("band").cast("string"), lit("#"), col("minhash"))
        .as("bucket"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[Long], Candidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (bucket, rows, state: GroupState[List[Long]]) =>
          val band = bucket.substring(0, bucket.indexOf('#')).toLong
          // sorted distinct arrival order makes within-batch emission
          // deterministic regardless of partition/iterator order
          val arrivals = rows.map(_._2).toSeq.distinct.sorted
          var known = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[Candidate]
          arrivals.foreach { id =>
            if (!known.contains(id)) {
              known.foreach(k => out += Candidate(id, k, band))
              if (known.length < maxBucket) known = known :+ id
            }
          }
          state.update(known)
          out.result().iterator
      }
  }
}
