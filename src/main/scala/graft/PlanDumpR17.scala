package graft

/** DEV-SIDE plan dumper for the round-17 optimization evidence:
  * writes `<outDir>/<name>_<tag>.txt` with explain("formatted") for
  * each selected gate, plus — because q59's contraction loop runs at
  * plan-construction time and its checkpoints hide the interesting
  * lineage from the gate's own explain — the q59 CC-INPUT plans:
  *
  *  - `q59_cc_input_before`: the pre-r17 edge lineage
  *    (nearDupPairs over every document, ORDER BY included);
  *  - `q59_cc_input_after`: the shipped collapsed lineage
  *    (Dedup.nearDupClusterEdges — rep pairs ∪ member star edges).
  *
  * Usage: runMain graft.PlanDumpR17 <sfDir> <outDir> <tag> <name>...
  *        (name "q59inputs" selects the two CC-input dumps)
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val wanted = args.drop(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    def dump(name: String, df: org.apache.spark.sql.DataFrame,
        tagOverride: String = tag): Unit = {
      val f = new java.io.PrintWriter(s"$outDir/${name}_$tagOverride.txt")
      try f.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      finally f.close()
      println(s"[plandump] wrote $outDir/${name}_$tagOverride.txt")
    }

    for (w <- wanted) w match {
      case "q31inputs" =>
        // before = the pre-r17 direct rollup over every document's
        // signature; after = the shipped collapsed gate
        import org.apache.spark.sql.functions._
        val docs = Tables(spark, sfDir, "documents")
        dump("q31_lsh_buckets",
          graft.operators.Dedup.minhash(docs)
            .groupBy(col("band"), col("minhash"))
            .agg(count(lit(1)).as("n_docs"),
              array_join(transform(sort_array(collect_list(col("doc_id"))),
                d => d.cast("string")), ",").as("docs"))
            .where(col("n_docs") > 1)
            .orderBy("band", "minhash"), "before")
        dump("q31_lsh_buckets",
          SparkEntry.queries("q31_lsh_buckets")(spark, sfDir), "after")
      case "q59inputs" =>
        val docs = Tables(spark, sfDir, "documents")
        dump("q59_cc_input",
          graft.operators.Dedup.nearDupPairs(docs)
            .select(org.apache.spark.sql.functions.col("a"),
              org.apache.spark.sql.functions.col("b")), "before")
        dump("q59_cc_input",
          graft.operators.Dedup.nearDupClusterEdges(docs), "after")
      case name =>
        SparkEntry.allDefs.find(_.name == name) match {
          case Some(d) => dump(name, d.spark(spark, sfDir))
          case None => println(s"[plandump] unknown gate $name")
        }
    }
    spark.stop()
  }
}
