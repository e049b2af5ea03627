package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over the `events` table: how many users
  * completed step 1, then step 2 strictly after their first step 1,
  * then step 3 strictly after that — the classic product-analytics
  * query (and a conversion-labeling step for behavioral training
  * data).
  *
  * Shape chosen for scale: each stage is a filtered per-user MIN
  * aggregate joined to the previous stage on user_id — no window over
  * the full event stream, no per-user event arrays. Every shuffle is
  * keyed on user_id with map-side partial MINs, so a user's funnel
  * state is one row regardless of how many events they have; stage
  * DataFrames shrink monotonically. Timestamps compare as raw parquet
  * nanos (exact longs).
  */
object EventFunnel {

  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    def stepCount(stage: DataFrame, label: String): DataFrame =
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(label).as("step"), col("n_users"))
    // stage 1: first occurrence of the entry event per user
    var stage = events.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    var out = Seq(stepCount(stage, s"step1_${steps.head}"))
    // stage k: first occurrence strictly after the user's stage-(k-1).
    // The whole funnel stays one lazy plan (no driver-side counts);
    // earlier stages appear as shared subtrees of later ones — a long
    // funnel over huge data would persist each stage, the composition
    // is unchanged.
    for ((s, i) <- steps.zipWithIndex.drop(1)) {
      val prev = stage.select(col("user_id").as("pu"), col("t").as("pt"))
      stage = events.where(col("event_type") === s)
        .join(prev, col("user_id") === col("pu") && col("ts") > col("pt"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      out = out :+ stepCount(stage, s"step${i + 1}_$s")
    }
    out.reduce(_.unionByName(_)).orderBy("step")
  }
}
