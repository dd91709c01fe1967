package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume meter for scale measurements: accumulates shuffle
  * read/write bytes across all tasks between [[reset]] and [[read]].
  * Wall-clock at toy scale is constant-dominated (driver latency, JIT,
  * I/O noise); on a real cluster the quantity that decides whether a
  * plan survives a 100× scale-up is how many bytes cross the network —
  * this meter makes that the measured variable.
  *
  * Task-end events arrive asynchronously on the listener bus; [[read]]
  * polls until the counters have been stable for a settle window after
  * the action returned (bounded wait — scale-harness use only).
  */
final class ShuffleMeter(spark: SparkSession) extends SparkListener {
  private val write = new LongAdder
  private val read0 = new LongAdder

  spark.sparkContext.addSparkListener(this)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      write.add(m.shuffleWriteMetrics.bytesWritten)
      read0.add(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  def reset(): Unit = { drain(); write.reset(); read0.reset() }

  /** (shuffle write bytes, shuffle read bytes) since the last reset. */
  def read(): (Long, Long) = { drain(); (write.sum(), read0.sum()) }

  private def drain(): Unit = {
    var last = (-1L, -1L)
    var stable = 0
    var waited = 0
    while (stable < 3 && waited < 100) {
      val now = (write.sum(), read0.sum())
      if (now == last) stable += 1 else stable = 0
      last = now
      Thread.sleep(50)
      waited += 1
    }
  }
}
