package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.sources.{GraftShardOffsets, ShardPos}

/** One-shot migration off the reference (round-10 verdict item 6): a
  * real reactive-kinesis deployment keeps live per-shard checkpoints
  * in a DynamoDB lease table named `<application>-<stream>` (reference
  * main/consumer/KinesisConsumer.scala:71-74; README.md:96-108), so a
  * user switching engines would otherwise face TRIM_HORIZON
  * reprocessing or LATEST data loss. This main converts a DynamoDB
  * JSON export of that table (one `{"Item": {...}}` object per line —
  * the shape both `aws dynamodb scan` items and the S3 table-export
  * produce) into the engine's offset-WAL grammar, ready to pass as
  * the source's `initial-positions` option: every listed shard
  * resumes exactly AFTER its KCL checkpoint.
  *
  * Lease rows translate by their KCL `ExtendedSequenceNumber`:
  *
  *  - numeric checkpoint + `checkpointSubSequenceNumber` →
  *    `"shard":"seq:sub"` (the engine's position = last consumed,
  *    which is precisely KCL's checkpoint semantics)
  *  - `TRIM_HORIZON` (leased, never checkpointed) → the engine's
  *    Beginning position — the full shard replays, as KCL would
  *  - `SHARD_END` (parent fully drained) → `SHARD_END` — the WAL
  *    token that lets the shard age out cleanly
  *  - `LATEST` (never checkpointed, start-at-tip config) → OMITTED:
  *    the shard falls back to the source's `initial-position`
  *    option, matching KCL's no-lease behavior; set that option to
  *    `LATEST` for a faithful migration of such rows
  *  - `AT_TIMESTAMP` (never checkpointed, start-at-timestamp config)
  *    → OMITTED the same way: in KCL the sentinel carries no
  *    timestamp — the timestamp lives in the WORKER CONFIG
  *    (`initialPositionInStreamExtended`), so the faithful
  *    translation is the engine's config equivalent: set
  *    `initial-position` to `AT_TIMESTAMP:<epochMillis>` with the
  *    application's configured timestamp and the shard consumes
  *    exactly the at-or-after-timestamp suffix (the source resolves
  *    it per shard via `positionAtTimestamp`)
  *
  * Usage: `runMain graft.ImportKclCheckpoints <leaseExport.jsonl>
  * <out.json>` — writes the `initial-positions` value. No Spark
  * session needed; the conversion is pure.
  */
object ImportKclCheckpoints {

  private val mapper = new ObjectMapper()

  /** Pure conversion: lease-export lines → (positions, shards omitted
    * as LATEST, shards omitted as AT_TIMESTAMP — both defer to the
    * source's `initial-position` option, as KCL defers their sentinel
    * to worker config). Fails loudly on malformed rows — a silently
    * dropped lease would mass-duplicate or lose data on the migrated
    * stream. */
  def convert(lines: Iterator[String])
      : (Map[String, ShardPos], Seq[String], Seq[String]) = {
    val positions = Map.newBuilder[String, ShardPos]
    val latest = Seq.newBuilder[String]
    val atTimestamp = Seq.newBuilder[String]
    lines.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val root = mapper.readTree(line)
      val item = Option(root.get("Item")).getOrElse(
        sys.error(s"lease-export line has no Item: $line"))
      def s(field: String): Option[String] =
        Option(item.get(field)).flatMap(n => Option(n.get("S")))
          .map(_.asText())
      def n(field: String): Option[Long] =
        Option(item.get(field)).flatMap(n => Option(n.get("N")))
          .map(_.asText().toLong)
      val shard = s("leaseKey").getOrElse(
        sys.error(s"lease-export line has no leaseKey: $line"))
      val checkpoint = s("checkpoint").getOrElse(
        sys.error(s"lease row for $shard has no checkpoint"))
      checkpoint match {
        case "LATEST" => latest += shard
        case "TRIM_HORIZON" => positions += shard -> ShardPos.Beginning
        case "SHARD_END" => positions += shard -> ShardPos.ShardEnd
        case "AT_TIMESTAMP" => atTimestamp += shard
        case seq if seq.forall(_.isDigit) && seq.nonEmpty =>
          positions += shard ->
            ShardPos(BigInt(seq),
              n("checkpointSubSequenceNumber").getOrElse(0L))
        case other => sys.error(
          s"lease row for $shard has unrecognized checkpoint '$other'")
      }
    }
    (positions.result(), latest.result(), atTimestamp.result())
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: ImportKclCheckpoints <leaseExport.jsonl> <out.json>")
    val in = java.nio.file.Paths.get(args(0))
    val out = java.nio.file.Paths.get(args(1))
    val lines = java.nio.file.Files.readAllLines(in)
    import scala.jdk.CollectionConverters._
    val (positions, latest, atTs) = convert(lines.iterator().asScala)
    val json = GraftShardOffsets(positions).json()
    java.nio.file.Files.writeString(out, json)
    println(s"[import-kcl] ${positions.size} shard checkpoints -> $out")
    if (latest.nonEmpty) println(
      s"[import-kcl] ${latest.size} LATEST (never-checkpointed) leases " +
        s"omitted — they follow the source's initial-position option: " +
        latest.mkString(", "))
    if (atTs.nonEmpty) println(
      s"[import-kcl] ${atTs.size} AT_TIMESTAMP (never-checkpointed) " +
        "leases omitted — set the source's initial-position option to " +
        "AT_TIMESTAMP:<epochMillis> with the application's configured " +
        "timestamp: " + atTs.mkString(", "))
    println(s"""[import-kcl] start the stream with .option("initial-positions", <contents of $out>)""")
  }
}
