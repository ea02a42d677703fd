package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** Deterministic lazy record generator behind the [[ShardService]] seam —
  * the reliability-harness load source (reference
  * it/SimpleKinesisProducer.scala:126-143: sequential integer payloads,
  * fixed per-shard ordering). Records are synthesized on read, so a
  * 5M-record benchmark run holds no buffered data: offered load is bounded
  * only by the consumer, like a pre-filled Kinesis stream.
  *
  * Shard `s` carries seqNo 1..perShard; payload = global record index
  * `s * perShard + n` as a UTF-8 string (pit-stop contiguity checkable).
  */
final class GeneratorShardService(
    override val streamName: String,
    nShards: Int,
    perShard: Long) extends ShardService {

  private val shardIds = (0 until nShards).map(i => s"shard-$i")

  override def listShards(): Seq[String] = shardIds

  private def shardIndex(shardId: String): Int =
    shardId.stripPrefix("shard-").toInt

  override def latestPosition(shardId: String): ShardPos =
    ShardPos(BigInt(perShard), 0L)

  override def positionAtTimestamp(shardId: String, tsMicros: Long): ShardPos =
    ShardPos.Beginning

  override def positionAfter(shardId: String, from: ShardPos,
      maxRecords: Int): ShardPos = {
    val cur = from.seqNo.max(BigInt(0))
    ShardPos((cur + maxRecords).min(BigInt(perShard)), 0L)
  }

  override def read(shardId: String, from: ShardPos, to: ShardPos)
      : Iterator[RawShardRecord] = {
    val s = shardIndex(shardId)
    val start = (from.seqNo.max(BigInt(0)) + 1).toLong
    val end = to.seqNo.min(BigInt(perShard)).toLong
    Iterator.range(start, end + 1).map { n =>
      val global = s * perShard + n
      RawShardRecord.single(s"pk-$s", BigInt(n), 1700000000000000L + n,
        global.toString.getBytes(UTF_8))
    }
  }
}
