package graft

/** DEV-SIDE per-query plan dumper for the round-16 optimization
  * evidence: writes `<outDir>/<name>_<tag>.txt` with the
  * explain("formatted") output of each selected gate, optionally after
  * deploying the quantized embeddings projection (so the same binary
  * produces the `_before` [plain files] and `_after` [projection]
  * dumps the judge diffs).
  *
  * Usage: runMain graft.PlanDumpR16 <sfDir> <outDir> <tag>
  *          [embquant] <name>...
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    var wanted = args.drop(3)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    if (wanted.headOption.contains("embquant")) {
      wanted = wanted.drop(1)
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      BucketRehearsal.dropBucketTable(spark, wh,
        graft.operators.CorpusWriter.DefaultEmbQuantTable)
      graft.operators.CorpusWriter.writeEmbQuantProjection(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        sourceDir = Some(sfDir))
    }
    if (wanted.headOption.contains("docdigest")) {
      wanted = wanted.drop(1)
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      BucketRehearsal.dropBucketTable(spark, wh,
        graft.operators.CorpusWriter.DefaultDocDigestTable)
      graft.operators.CorpusWriter.writeDocDigestProjection(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        sourceDir = Some(sfDir))
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = SparkEntry.allDefs.map(_.name)
      .filter(n => wanted.exists(n.contains))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
        (s"-- $n ($tag), data: $sfDir\n\n" + txt)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
