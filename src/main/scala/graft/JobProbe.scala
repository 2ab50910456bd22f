package graft

import scala.collection.mutable

/** Per-job time accounting for one query: runs the named queries
  * against PROBE_DIR (default sf0.1) and prints every Spark job's
  * wall time, stage/task totals and description — plus the DRIVER GAP
  * between jobs (footer reads, manifest I/O, planning), which no job
  * metric captures. The optimization round's measurement loop (guide
  * §1): attribute a slow query to its jobs before touching code.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[probe] master=${spark.sparkContext.master} dir=$dir")
    val sel = if (args.isEmpty) Seq("q1_agg")
      else args.toSeq
    final case class JobRow(id: Int, start: Long, var end: Long,
      desc: String, var tasks: Int, var taskTimeMs: Long)
    val jobs = mutable.Map[Int, JobRow]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .orElse(e.stageInfos.lastOption.map(_.name.linesIterator
            .take(1).mkString))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRow(e.jobId, e.time, -1L, d, 0, 0L)
        }
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val sid = e.stageId
        // attribute tasks to the live job holding this stage: good
        // enough for a single-threaded probe
        jobs.synchronized {
          jobs.values.toSeq.sortBy(-_.id).headOption.foreach { j =>
            j.tasks += 1
            if (e.taskMetrics != null)
              j.taskTimeMs += e.taskMetrics.executorRunTime
          }
        }
        val _ = sid
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def drop(): Unit = {
      InternalCaches.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // one untimed warmup of each selected query (JIT/codegen)
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      sel.foreach(n => try SparkEntry.queries(n)(spark, warm).count()
        catch { case _: Throwable => () })
    drop()
    sel.foreach { name =>
      jobs.synchronized { jobs.clear() }
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable => println(s"FAILED: $e"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let job-end events drain
      val rows = jobs.synchronized { jobs.values.toSeq.sortBy(_.start) }
      println(f"\n===== $name  wall=$wall%.2f s  ($n rows) =====")
      var prevEnd = t0 / 1000000L // ms epoch-ish: nanoTime base differs;
      // use first job's start as t0 reference for gaps between jobs only
      var lastEnd = -1L
      var jobSum = 0.0
      var gapSum = 0.0
      rows.foreach { j =>
        val durS = (j.end - j.start) / 1e3
        val gapS = if (lastEnd < 0) 0.0 else (j.start - lastEnd) / 1e3
        if (lastEnd >= 0) gapSum += math.max(0.0, gapS)
        jobSum += math.max(0.0, durS)
        val d = if (j.desc.length > 90) j.desc.take(90) else j.desc
        println(f"  job ${j.id}%4d  ${durS}%7.3f s  gap=${gapS}%6.3f  tasks=${j.tasks}%4d  taskTime=${j.taskTimeMs / 1e3}%7.2f s  $d")
        lastEnd = math.max(lastEnd, j.end)
        prevEnd = lastEnd
      }
      println(f"  [sum] jobs=${jobSum}%.2f s  inter-job gaps=${gapSum}%.2f s  njobs=${rows.size}")
      drop()
    }
    spark.stop()
  }
}
