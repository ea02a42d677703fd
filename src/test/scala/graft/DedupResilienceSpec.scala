package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** The spill-safety claim behind the doc-frequency window (DedupOps
  * scaladoc): a hot shingle's partition buffer must degrade to DISK,
  * not OOM, and spilling must not change results. Forced here by
  * shrinking the window buffer thresholds to a few rows — every
  * partition then takes the ExternalAppendOnlyUnsafeRowArray spill
  * path the 100 TB stop-shingle scenario would take.
  */
class DedupResilienceSpec extends SparkSpec {

  test("d03 under forced window-buffer spill: bytes hit disk, results " +
      "unchanged") {
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("d03_ngram_jaccard_pairs")
    val baseline = q(spark, d).collect().toSeq

    val spilled = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { spilled.addAndGet(m.diskBytesSpilled); () }
      }
    }
    val keys = Seq("spark.sql.windowExec.buffer.in.memory.threshold",
      "spark.sql.windowExec.buffer.spill.threshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.sparkContext.addSparkListener(listener)
    try {
      keys.foreach(spark.conf.set(_, "4"))
      val under = q(spark, d).collect().toSeq
      Thread.sleep(500) // drain task-end events off the async listener bus
      assert(under == baseline, "spilling changed the result")
      assert(spilled.get() > 0,
        "thresholds of 4 rows must force actual disk spill")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
