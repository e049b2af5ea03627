package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.engine.{WebhookConfig, WebhookEngine}

/** Dev repro harness for the PARSE_EMPTY_STATEMENT flake seen once in
  * the racing-ingests test: hammers concurrent ingests + ad-hoc reads
  * and prints every Left the readers see. Usage:
  * runMain graft.RaceRepro [rounds] [readersPerRound]
  */
object RaceRepro {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(50)
    val nReaders = args.lift(1).map(_.toInt).getOrElse(4)
    // mode: full = writers + engine.adHocQuery (the failing test's shape)
    //       nowriters = readers only
    //       rawsql = writers + bare spark.sql readers (no engine plumbing)
    val mode = args.lift(2).getOrElse("full")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    var lefts = 0
    for (r <- 1 to rounds) {
      val dir = java.nio.file.Files.createTempDirectory("race").toString
      val e = new WebhookEngine(spark, dir,
        (_, _, _) => graft.engine.Delivery.Result(success = true, Some(200), ""))
      e.register(WebhookConfig("/race", "https://example.com/x",
        "SELECT * FROM {{payload}}", None, None))
      e.refreshSqlViews()
      val writers =
        if (mode == "nowriters") Seq.empty
        else (1 to 2).map(t => Future {
          (1 to 5).foreach(i => e.ingest("/race", s"""{"t": $t, "i": $i}"""))
        })
      val readers = (1 to nReaders).map(_ => Future {
        (1 to 5).map { _ =>
          mode match {
            case "rawsql" =>
              try Right(spark.sql("SELECT COUNT(*) FROM raw_events").collect().toSeq)
              catch { case t: Throwable => Left(t.getMessage) }
            case "refresh" => // refreshSqlViews + sql, no validate
              try {
                e.refreshSqlViews()
                Right(spark.sql("SELECT COUNT(*) FROM raw_events").collect().toSeq)
              } catch { case t: Throwable => Left(t.getMessage) }
            case "validate" => // validate + sql, no refresh
              e.validateAdHoc("SELECT COUNT(*) FROM raw_events").flatMap { _ =>
                try Right(spark.sql("SELECT COUNT(*) FROM raw_events").collect().toSeq)
                catch { case t: Throwable => Left(t.getMessage) }
              }
            case _ => e.adHocQuery("SELECT COUNT(*) FROM raw_events")
          }
        }.toSeq
      })
      Await.result(Future.sequence(writers ++ readers), 120.seconds)
      val errs = Await.result(Future.sequence(readers), 120.seconds)
        .flatten.collect { case Left(err) => err }
      if (errs.nonEmpty) {
        lefts += errs.size
        println(s"[race] round $r: ${errs.size} failures:")
        errs.foreach(e => println(s"[race]   ${e.linesIterator.mkString(" | ")}"))
      }
      e.close()
      if (r % 10 == 0) println(s"[race] $r rounds, $lefts failures so far")
    }
    println(s"[race] DONE: $lefts failures in $rounds rounds (mode=$mode)")
    spark.stop()
  }
}
