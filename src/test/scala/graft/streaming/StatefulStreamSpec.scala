package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** flatMapGroupsWithState carrying per-key state ACROSS micro-batches —
  * the incremental form of the reference's per-shard worker state machine
  * (reference main/consumer/ConsumerWorker.scala:202-548): state persists
  * in the state store between batches and evolves as new batches arrive.
  */
class StatefulStreamSpec extends SparkSpec {
  import StatefulStreamSpec.Hit

  test("per-key running count accumulates across micro-batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-state").toString
    val input = MemoryStream[Long](spark)

    def fn(user: Long, rows: Iterator[Long],
        state: GroupState[Int]): Iterator[Hit] = {
      val total = state.getOption.getOrElse(0) + rows.size
      state.update(total)
      Iterator.single(Hit(user, total))
    }

    val q = input.toDS().groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("state_running")
      .option("checkpointLocation", s"$tmp/chk").start()
    try {
      input.addData(7L, 7L, 8L)
      q.processAllAvailable()
      input.addData(7L, 8L, 8L)
      q.processAllAvailable()
      val rows = spark.table("state_running").as[Hit].collect()
      // latest emission per key reflects the cross-batch total
      val latest = rows.groupBy(_.user).view.mapValues(_.map(_.n).max).toMap
      assert(latest == Map(7L -> 3, 8L -> 3))
    } finally q.stop()
  }

  test("stateful query runs on the RocksDB state store (the bounded-memory " +
      "store for 100 TB-scale state)") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-rocks").toString
      val input = MemoryStream[Long](spark)
      def fn(user: Long, rows: Iterator[Long],
          state: GroupState[Int]): Iterator[Hit] = {
        val total = state.getOption.getOrElse(0) + rows.size
        state.update(total)
        Iterator.single(Hit(user, total))
      }
      val q = input.toDS().groupByKey(identity)
        .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.NoTimeout)(fn)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("rocks_state")
        .option("checkpointLocation", s"$tmp/chk").start()
      try {
        input.addData(1L, 1L, 2L)
        q.processAllAvailable()
        input.addData(1L)
        q.processAllAvailable()
        val latest = spark.table("rocks_state").as[Hit].collect()
          .groupBy(_.user).view.mapValues(_.map(_.n).max).toMap
        assert(latest == Map(1L -> 3, 2L -> 1))
      } finally q.stop()
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

object StatefulStreamSpec {
  case class Hit(user: Long, n: Int)
}
