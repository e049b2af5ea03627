package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key carries a large
  * share of the FACT side (a boilerplate fingerprint, a null-ish
  * default id, one hot user), a plain hash join sends that whole share
  * to ONE reducer — the straggler that decides the stage's wall time.
  * Salting splits the hot key's rows across `salts` sub-partitions and
  * replicates the DIMENSION side's matching rows to every sub-
  * partition, preserving exact join semantics while dividing the
  * worst partition by ~`salts`.
  *
  * When to reach for this instead of AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`, on by default and the first
  * choice): AQE only splits SORT-MERGE join partitions of completed
  * shuffle stages — it does not help shuffled hash joins it cannot
  * re-plan, streaming joins (no AQE mid-stream), or an agg keyed by
  * the same hot key downstream; salting also fixes the layout
  * DETERMINISTICALLY, where AQE's split depends on observed sizes and
  * so can differ run to run.
  *
  * Determinism: the salt is `pmod(xxhash64(whole fact row), salts)` —
  * content-derived, not `rand()`, so reruns and retried tasks place
  * every row identically (a rand() salt breaks task-retry idempotence
  * and rerun-stable layouts).
  *
  * Cost model: the dimension side is replicated ×`salts` through the
  * shuffle — size it like a broadcast decision: worth it when
  * `|dim| · salts ≪ |fact hot share|`. For a hot key holding 10% of a
  * 100 TB fact table, salts=32 turns a 10 TB reducer into ~300 GB
  * reducers for 32× a (small) dim's shuffle bytes.
  */
object SkewJoin {

  /** Inner equi-join `fact(factKey) = dim(dimKey)` with salted
    * distribution. Output columns = fact.* then dim.* (the dim key
    * column dropped, as in a `USING` join keyed on the fact name).
    */
  def saltedJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("graft_salt") &&
      !dim.columns.contains("graft_salt"),
      "graft_salt is reserved by saltedJoin")
    val factCols: Seq[Column] = fact.columns.toSeq.map(c => col(s"f.$c"))
    val dimCols: Seq[Column] =
      dim.columns.toSeq.filter(_ != dimKey).map(c => col(s"d.$c"))
    val salted = fact
      .withColumn("graft_salt",
        pmod(xxhash64(struct(fact.columns.toSeq.map(col): _*)),
          lit(salts.toLong)))
    val replicated = dim
      .withColumn("graft_salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.as("f")
      .join(replicated.as("d"),
        col(s"f.$factKey") === col(s"d.$dimKey") &&
          col("f.graft_salt") === col("d.graft_salt"))
      .select(factCols ++ dimCols: _*)
  }
}
