package graft.operators

/** A SCOPED observed-metric reader for the fold paths: attach a
  * uniquely-named `observe(name, expr)` to the frame a staging write
  * executes, then read the metric here once the write returned — one
  * action carries both the data and its gate metric (round 18).
  *
  * This deliberately avoids [[org.apache.spark.sql.Observation]]: that
  * API registers with the session's ObservationManager, and merely
  * initializing the manager plants a non-serializable object inside
  * the SparkSession — after which anything that java-serializes a
  * session capture (an MLlib model's training summary inside a UDF
  * closure, QualityModelSpec's exact failure) dies with
  * `NotSerializableException: ObservationManager`. A STRING-named
  * observe is a pure `CollectMetrics` plan node; this gate reads its
  * row through a listener registered for exactly the call's lifetime,
  * so no session state outlives the fold.
  */
private[graft] final class MetricGate(
    spark: org.apache.spark.sql.SparkSession) {
  val name: String = "__gate_" + java.util.UUID.randomUUID().toString
  @volatile private var row: Option[org.apache.spark.sql.Row] = None
  private val latch = new java.util.concurrent.CountDownLatch(1)
  private val listener =
    new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get(name).foreach { r =>
          row = Some(r)
          latch.countDown()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
  spark.listenerManager.register(listener)

  /** The observed row's first column as a long. Call strictly AFTER
    * the observed action succeeded — the listener bus is async, so
    * this waits (bounded) for the metric to arrive.
    */
  def long(): Long = {
    if (!latch.await(120, java.util.concurrent.TimeUnit.SECONDS))
      throw new IllegalStateException(
        s"observed metric $name never arrived (listener bus stalled?)")
    row.get.getLong(0)
  }

  def close(): Unit = spark.listenerManager.unregister(listener)
}

private[graft] object MetricGate {
  /** Run `body` with a gate, closing it whatever happens. */
  def withGate[A](spark: org.apache.spark.sql.SparkSession)(
      body: MetricGate => A): A = {
    val g = new MetricGate(spark)
    try body(g) finally g.close()
  }
}
