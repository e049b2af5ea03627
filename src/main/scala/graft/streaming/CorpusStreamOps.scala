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

  final case class VecIn(vec_id: Long, embedding: Seq[Float])

  /** One row per arriving vector that matches a stored cluster
    * representative at ≥ threshold: the streaming SemDeDup flag.
    */
  final case class SemDupCandidate(vec_id: Long, matched_vec_id: Long,
      cluster: Int, cosine: Double)

  /** Streaming semantic dedup — the online counterpart of the batch
    * [[graft.operators.Similarity.semanticDedup]] (q122), completing
    * the streaming story for the embedding operators the same way
    * [[nearDupCandidates]] does for MinHash: flag "semantically
    * already held" at ARRIVAL time.
    *
    * Shape: the TRAINED centroid table (train in batch with
    * [[graft.operators.Similarity.trainedCentroids]], collect via
    * [[collectCentroids]] — k×d values, broadcast-sized forever) rides
    * the closure; each arriving vector is assigned to its argmax
    * centroid per-row (same pico-quantized scoring law as the batch
    * quantizer: floor(x·c·1e12+0.5) summed, over √Σfloor(c²·1e12+0.5);
    * ties → smaller cluster id), then `flatMapGroupsWithState` keyed
    * by cluster holds the capped representative list. A new arrival
    * compares against its cluster's representatives only — never
    * all-pairs, the same blocking discipline as batch — emits its BEST
    * match ≥ threshold (max cosine, ties → smaller stored id), and
    * becomes a representative itself only when it matched nothing
    * (streaming SemDeDup keeps one exemplar per semantic neighborhood,
    * which also bounds state harder than storing every arrival).
    *
    * 100 TB/day notes: state is ≤ `maxCluster` (vec_id, embedding)
    * pairs per cluster, sharded across executors by cluster key; a
    * saturated cluster keeps MATCHING (flags never go dark) but stops
    * accumulating exemplars. At real cadence the centroids retrain in
    * batch nightly and the query restarts with the new table — the
    * state machine body is unchanged. Arrivals are processed in
    * vec_id order within a batch, so emission is deterministic under
    * partition/iterator reordering; re-delivery of a stored exemplar
    * id is a no-op (at-least-once source).
    */
  def semanticDedupCandidates(vecs: Dataset[VecIn],
      centroids: Array[(Int, Array[Double])], threshold: Double = 0.25,
      maxCluster: Int = 1024): Dataset[SemDupCandidate] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    require(centroids.nonEmpty, "centroids must be trained in batch first")
    val assignFn = assigner(centroids)
    vecs.map(v => (assignFn(v.embedding), v.vec_id, v.embedding))
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Seq[Float])], SemDupCandidate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (cluster, rows, state: GroupState[List[(Long, Seq[Float])]]) =>
          val arrivals = rows.map(r => (r._2, r._3)).toSeq
            .distinctBy(_._1).sortBy(_._1)
          var reps = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[SemDupCandidate]
          arrivals.foreach { case (id, v) =>
            if (!reps.exists(_._1 == id)) {
              // best stored match: max cosine, ties to the smaller id —
              // explicitly, since reps insertion order is ascending only
              // WITHIN a batch (a later batch can append a smaller id)
              var best: Option[(Long, Double)] = None
              reps.foreach { case (rid, rv) =>
                val c = cosQ(v, rv)
                if (c >= threshold && best.forall { case (bid, bc) =>
                    c > bc || (c == bc && rid < bid) })
                  best = Some((rid, c))
              }
              best match {
                case Some((rid, c)) =>
                  out += SemDupCandidate(id, rid, cluster, c)
                case None =>
                  if (reps.length < maxCluster) reps = reps :+ ((id, v))
              }
            }
          }
          state.update(reps)
          out.result().iterator
      }
  }

  /** One row per arriving TRAIN vector that sits too close to a
    * benchmark vector: the streaming decontamination flag.
    */
  final case class ContamFlag(vec_id: Long, bench_vec_id: Long,
      cluster: Int, cosine: Double)

  /** Streaming semantic decontamination — the online counterpart of
    * the batch [[graft.operators.Similarity.semanticDecontamination]]
    * (q128): flag an arriving train vector AT INGEST when its
    * embedding is within `threshold` of any benchmark vector.
    *
    * Unlike [[semanticDedupCandidates]] this needs NO state at all:
    * the benchmark set is fixed for a contamination horizon, so it
    * rides the closure pre-bucketed by cluster — each arrival is
    * assigned to its argmax centroid (same quantized law as batch)
    * and compared only against ITS cluster's bench members, the q128
    * probe discipline with nprobe=1 on the arrival side. A pure map:
    * no shuffle, no stateful operator, trivially parallel at any
    * ingest rate; the stateful budget stays free for the dedup
    * consumer in the same query. Emits the BEST-matching bench vector
    * (max cosine, ties → smaller bench id) per flagged arrival.
    *
    * At real cadence the bench set and centroids retrain/reload on
    * query restart; |bench| is eval-suite-sized (thousands), so the
    * per-cluster index stays broadcast-sized forever.
    */
  def decontaminationFlags(vecs: Dataset[VecIn],
      centroids: Array[(Int, Array[Double])],
      bench: Array[(Long, Seq[Float])], threshold: Double = 0.25)
      : Dataset[ContamFlag] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    require(centroids.nonEmpty, "centroids must be trained in batch first")
    val assignFn = assigner(centroids)
    val byCluster: Map[Int, Array[(Long, Seq[Float])]] =
      bench.map { case (id, v) => (assignFn(v), id, v) }
        .groupBy(_._1)
        .map { case (k, rows) =>
          (k, rows.sortBy(_._2).map(r => (r._2, r._3))) }
    vecs.flatMap { v =>
      val k = assignFn(v.embedding)
      var best: Option[(Long, Double)] = None
      byCluster.getOrElse(k, Array.empty).foreach { case (bid, bv) =>
        val c = cosQ(v.embedding, bv)
        if (c >= threshold && best.forall(_._2 < c)) best = Some((bid, c))
      }
      best.map { case (bid, c) => ContamFlag(v.vec_id, bid, k, c) }
    }
  }

  /** Argmax-centroid assignment closure shared by the streaming
    * operators — the per-row form of the batch trained-quantizer
    * scoring (pico-quantized dot over √Σfloor(c²·1e12+0.5); ties →
    * smaller cluster id).
    */
  private def assigner(centroids: Array[(Int, Array[Double])])
      : Seq[Float] => Int = {
    val cents = centroids.sortBy(_._1)
    val cn2 = cents.map { case (_, c) =>
      c.map(x => math.floor(x * x * 1e12 + 0.5)).sum / 1e12
    }
    (v: Seq[Float]) => {
      var bestK = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < cents.length) {
        val c = cents(i)._2
        var dq = 0.0
        var j = 0
        val n = math.min(v.length, c.length)
        while (j < n) {
          dq += math.floor(v(j).toDouble * c(j) * 1e12 + 0.5)
          j += 1
        }
        val score = dq / 1e12 / math.sqrt(cn2(i))
        if (score > bestScore) { bestScore = score; bestK = cents(i)._1 }
        i += 1
      }
      bestK
    }
  }

  /** Exact quantized cosine — the same arithmetic as the batch
    * [[graft.functions.CosineSimQ]] expression (floor-quantized picos,
    * summed in index order), so a pair flagged here carries the
    * identical cosine the batch pass would compute.
    */
  private[streaming] def cosQ(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += math.floor(x * y * 1e12 + 0.5).toLong
      na += math.floor(x * x * 1e12 + 0.5).toLong
      nb += math.floor(y * y * 1e12 + 0.5).toLong
      i += 1
    }
    (dot / 1e12) / (math.sqrt(na / 1e12) * math.sqrt(nb / 1e12))
  }

  /** Collect a batch-trained centroid table ((k, i, c) rows from
    * [[graft.operators.Similarity.trainedCentroids]]) into the
    * closure-sized array [[semanticDedupCandidates]] broadcasts.
    */
  def collectCentroids(cent: org.apache.spark.sql.DataFrame)
      : Array[(Int, Array[Double])] =
    cent.collect()
      .map(r => (r.get(0).asInstanceOf[Number].intValue,
        r.get(1).asInstanceOf[Number].intValue,
        r.get(2).asInstanceOf[Number].doubleValue))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (k, rows) =>
        (k, rows.sortBy(_._2).map(_._3)) }

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

  /** One flagged duplicate window of an arriving document. */
  final case class DupChunk(doc_id: Long, chunk_id: Long, n_tok: Long)

  /** Streaming chunk-level dedup — the online counterpart of
    * [[graft.operators.TextAnalysis.chunkDedupCensus]]: flag, at
    * ARRIVAL time, the training-stride windows of an incoming document
    * whose exact token content the stream has already stored (chrome
    * repeated inside otherwise-new pages, shard-split re-deliveries).
    * Downstream sums `n_tok` for the live reclaim counter the batch
    * census reports offline.
    *
    * State discipline (same bound pattern as [[nearDupCandidates]]):
    * chunks key by the first `prefixLen` hex chars of their full md5 —
    * 16^prefixLen buckets — and each bucket stores at most `maxBucket`
    * full hashes, so state is ≤ 16^prefixLen·maxBucket hashes TOTAL
    * regardless of stream length. md5 prefixes are uniform, so buckets
    * fill evenly and the cap binds only as the DISTINCT-chunk count
    * approaches that product (16⁴·256 ≈ 16.8M chunks at the defaults);
    * an overflowing bucket stops storing NEW chunks (their later
    * copies go unflagged — dedup degrades to sampling, never errors).
    * Each stored hash carries its first HOLDER doc, so a re-delivered
    * document never flags against itself (at-least-once sources), and
    * within-doc repetition stays unflagged (that is q133's metric, not
    * cross-doc dedup). Emission is deterministic under iterator/
    * partition reordering: arrivals process in (doc_id, chunk_id)
    * order within a batch.
    */
  def chunkDupFlags(docs: Dataset[DocIn], window: Int = 32,
      stride: Int = 24, prefixLen: Int = 4, maxBucket: Int = 256)
      : Dataset[DupChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.TextAnalysis.chunkSpans(docs.toDF(), window, stride)
      .select(substring(col("hex"), 1, prefixLen).as("bucket"),
        col("hex"), col("doc_id"), col("chunk_id"), col("n_tok"))
      .as[(String, String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(String, Long)], DupChunk](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[List[(String, Long)]]) =>
          val arrivals = rows.toSeq.sortBy(r => (r._3, r._4))
          var known = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupChunk]
          arrivals.foreach { case (_, hex, did, cid, ntok) =>
            known.find(_._1 == hex) match {
              case Some((_, holder)) =>
                if (holder != did) out += DupChunk(did, cid, ntok)
              case None =>
                if (known.length < maxBucket) known = known :+ (hex -> did)
            }
          }
          state.update(known)
          out.result().iterator
      }
  }
}
