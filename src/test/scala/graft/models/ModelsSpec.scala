package graft.models

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Ports of the reference's model semantics
  * (test/models/ConsumerEventSpec.scala) plus the ordering hazard the
  * numeric representation engineers out (SURVEY.md §1.2).
  */
class ModelsSpec extends AnyFunSuite {

  /** Deterministic property loop (scalatestplus bridge unavailable in the
    * offline cache — drive scalacheck Gens directly). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(f)
    }

  test("compound sequence ordering: numeric on seq, tiebreak on subSeq") {
    val a = CompoundSequenceNumber(BigInt(1), 1)
    val b = CompoundSequenceNumber(BigInt(1), 2)
    val c = CompoundSequenceNumber(BigInt(3), 0)
    assert(b.isAfter(a) && c.isAfter(b) && !a.isAfter(c))
  }

  test("ordering is numeric — the reference's string-concat hazard case") {
    // string comparison would say "10" < "9"; numeric ordering must not
    val nine = CompoundSequenceNumber(BigInt(9), 0)
    val ten = CompoundSequenceNumber(BigInt(10), 0)
    assert(ten.isAfter(nine))
    assert("10" < "9") // the hazard being engineered out
  }

  test("38-digit sequence numbers survive and order correctly") {
    val big = BigInt("99999999999999999999999999999999999999")
    val a = CompoundSequenceNumber(big - 1, 5)
    val b = CompoundSequenceNumber(big, 0)
    assert(b.isAfter(a))
  }

  test("payload round-trips through UTF-8 (ConsumerEventSpec port)") {
    forAllSeeded(Gen.alphaNumStr) { s =>
      val ev = ConsumerEvent("stream", "shard-0", Some("pk"), BigInt(1), 0L,
        s.getBytes(StandardCharsets.UTF_8),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      assert(ev.payloadAsString() == s)
    }
  }

  test("ProducerEvent string convenience constructor UTF-8 encodes") {
    val ev = ProducerEvent("key", "{Some Payload}")
    assert(new String(ev.data, StandardCharsets.UTF_8) == "{Some Payload}")
  }

  test("envelope schema matches SURVEY §1.3") {
    assert(Envelope.schema.fieldNames.toSeq == Seq("streamName", "shardId",
      "partitionKey", "seqNo", "subSeqNo", "data", "approxArrivalTs"))
  }
}
