package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicInteger}
import scala.collection.concurrent.TrieMap

/** Dev tool (optimization round): split each query's DRIVER time into
  * Catalyst phases. JobProbe shows protocol-heavy queries spend ~45%
  * of wall in inter-job gaps; this probe answers WHAT the gap is —
  * per executed action, [[org.apache.spark.sql.catalyst.QueryPlanningTracker]]
  * records analysis / optimization / planning wall spans, and the
  * listener sums them per query together with the action count. The
  * remainder (gap − phases) is manifest/footer I/O + codegen compile
  * + scheduler overhead.
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[probe] master=${spark.sparkContext.master} dir=$dir")
    val phaseMs = TrieMap[String, AtomicLong]()
    val actions = new AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        actions.incrementAndGet()
        qe.tracker.phases.foreach { case (name, span) =>
          phaseMs.getOrElseUpdate(name, new AtomicLong(0L))
            .addAndGet(span.endTimeMs - span.startTimeMs)
          ()
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def drop(): Unit = {
      InternalCaches.drain()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val sel = if (args.isEmpty) Seq("q1_agg") else args.toSeq
    val warm = "/root/testdata/sf0.001"
    if (new java.io.File(warm).isDirectory)
      sel.foreach(n => try SparkEntry.queries(n)(spark, warm).count()
        catch { case _: Throwable => () })
    drop()
    sel.foreach { name =>
      phaseMs.clear(); actions.set(0)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable => println(s"FAILED: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat before reading the sums
      Thread.sleep(300)
      val phases = phaseMs.toSeq.sortBy(-_._2.get)
        .map { case (k, v) => f"$k=${v.get / 1e3}%.2fs" }.mkString("  ")
      println(f"$name%-28s wall=$wall%6.2f s  actions=${actions.get}%3d  $phases")
      drop()
    }
    spark.stop()
  }
}
