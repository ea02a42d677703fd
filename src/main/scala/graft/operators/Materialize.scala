package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization strategy for the single cut point multi-pass operators
  * place between "build the narrow frame once" and "read it from several
  * branches" (t07's token frame, [[Pipeline.prepare]]'s surviving corpus,
  * [[DedupOps]]' per-doc index).
  *
  * The right choice is deployment-specific, so it is a parameter:
  *
  *  - [[Materialize.LocalCheckpoint]] (default): eager, truncates lineage,
  *    stores shuffle-file-backed blocks on executors. Fastest on local[*]
  *    and small clusters — but NOT fault-tolerant: at cluster scale a lost
  *    executor kills the query instead of recomputing.
  *  - [[Materialize.Persist]]: MEMORY_AND_DISK cache, lineage retained —
  *    a lost executor recomputes the missing partitions. The right default
  *    on a real cluster when the upstream scan is re-runnable.
  *  - [[Materialize.ReliableCheckpoint]]: eager DFS checkpoint under the
  *    session's checkpoint dir (`SparkContext.setCheckpointDir`, an
  *    HDFS/S3 path at cluster scale) — survives executor AND lineage
  *    loss; the durable choice for very long pipelines.
  *
  * Storage lifetime: `LocalCheckpoint` blocks are released by the
  * ContextCleaner once the checkpoint RDD is unreferenced (and the
  * iterative operators free superseded frontiers explicitly). `Persist`
  * entries live in the CacheManager until `unpersist`/`clearCache` —
  * a long-lived session invoking a Persist-strategy operator per batch
  * should `spark.catalog.clearCache()` between invocations (or prefer
  * LocalCheckpoint, whose storage is GC-driven). `ReliableCheckpoint`
  * files remain under the checkpoint dir; enable
  * `spark.cleaner.referenceTracking.cleanCheckpoints` or clean the dir
  * by retention policy, as with any Spark reliable checkpoint.
  */
sealed trait Materialize {
  def apply(df: DataFrame): DataFrame = this match {
    case Materialize.LocalCheckpoint => df.localCheckpoint(eager = true)
    case Materialize.Persist => df.persist(StorageLevel.MEMORY_AND_DISK)
    case Materialize.ReliableCheckpoint =>
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "Materialize.ReliableCheckpoint requires " +
          "SparkContext.setCheckpointDir (an HDFS/S3 path at cluster scale)")
      df.checkpoint(eager = true)
  }
}

object Materialize {
  case object LocalCheckpoint extends Materialize
  case object Persist extends Materialize
  case object ReliableCheckpoint extends Materialize
}
