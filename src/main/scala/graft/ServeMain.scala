package graft

/** Runnable gateway: `sbt "runMain graft.ServeMain [workDir] [port]"`.
  * Starts the engine + HTTP shell with the shipped admin console
  * (`frontend/dist`) wired as the SPA static root, so `GET /` answers
  * the health check (reference parity) and any other GET path (e.g.
  * `/app`) serves the console. Auth key comes from
  * WEBHOOK_GATEWAY_API_KEY (default "default_key"), matching the
  * reference's src/app.py:875-892.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-gateway").toString)
    val port = args.lift(1).map(_.toInt).getOrElse(8000)
    val spark = GraftSession.local()
    val engine = new graft.engine.WebhookEngine(spark, workDir)
    val server = new graft.server.GatewayServer(engine, port,
      staticDir = Some("frontend/dist")).start()
    println(s"[serve] gateway on http://127.0.0.1:${server.boundPort}" +
      s" (workDir=$workDir, console at /app)")
    Thread.currentThread.join()
  }
}
