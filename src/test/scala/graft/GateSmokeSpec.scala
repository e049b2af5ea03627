package graft

import graft.engine.SparkSpec

/** Schema-drift guard: every gate query must plan AND execute against the
  * driver's real testdata, not just the synthetic frames the unit specs
  * build. The round-7 regression motivates this: the generator changed
  * `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP_MICROS between rounds
  * and six gate queries silently dropped out of the correctness run —
  * every unit test stayed green because they all fed Long-typed synthetic
  * columns. Executing here (not just `executedPlan`) also catches
  * runtime-only failures (codegen, UDF input types, partition-empty
  * edge cases) at the smallest scale factor, where the whole sweep stays
  * cheap.
  */
class GateSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  for (d <- SparkEntry.allDefs) {
    test(s"${d.name} plans and executes on real sf0.001 testdata") {
      val df = d.spark(spark, dir)
      // analysis + optimization + physical planning (throws on type drift)
      df.queryExecution.executedPlan
      assert(df.count() >= 0)
    }
  }
}
