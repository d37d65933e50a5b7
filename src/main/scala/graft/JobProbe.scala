package graft

/** Dev tool (r17 optimization round): per-JOB wall-time breakdown of a
  * named registry query — the streaming/maintainer rows' cost at small
  * SF is fixed per-job overhead (scheduling, commit protocol, file
  * listing), invisible in a plan dump. Attaches a SparkListener,
  * runs each named query once (plus an untimed warm-up when -w), and
  * prints one line per Spark job: jobId, wall seconds, task count,
  * description. Usage:
  *   graft.JobProbe <sfDir> [-w] qNN_name ...
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val warm = args.contains("-w")
    val names = args.drop(1).filterNot(_ == "-w").toSeq
    val spark = graft.engine.GraftSession.local("graft-job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.scheduler._
    final case class J(start: Long, desc: String, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, J(System.nanoTime(), desc,
          e.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (enabled) {
        Option(jobs.remove(e.jobId)).foreach { j =>
          lines.add(f"  job ${e.jobId}%4d ${(System.nanoTime() - j.start) / 1e9}%7.3f s tasks=${j.tasks}%4d  ${j.desc.take(120)}")
        }
      }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (warm) { fn(spark, sfDir).count(); () }
      graft.engine.SessionCache.sweepBetweenQueries(spark)
      lines.clear(); jobs.clear(); enabled = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      enabled = false
      Thread.sleep(300) // let late job-end events drain
      println(f"\n===== $n total $total%.3f s, ${lines.size} jobs =====")
      import scala.jdk.CollectionConverters._
      lines.asScala.toSeq.sorted.foreach(println)
      graft.engine.SessionCache.sweepBetweenQueries(spark)
    }
    spark.stop()
  }
}
