package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class OffsetsSpec extends AnyFunSuite {

  test("offset JSON round-trips, including 38-digit sequence numbers") {
    val seq38 = BigInt("99999999999999999999999999999999999999")
    val o = GraftShardOffsets(Map(
      "shard-0" -> ShardPos(BigInt(0), 0L),
      "shard-1" -> ShardPos(seq38, 12L),
      "shard-2" -> ShardPos.Beginning))
    val back = GraftShardOffsets.fromJson(o.json())
    assert(back == o)
  }

  test("offset JSON is stable (sorted keys) for WAL comparison") {
    val a = GraftShardOffsets(Map("b" -> ShardPos(BigInt(1), 0),
      "a" -> ShardPos(BigInt(2), 0)))
    val b = GraftShardOffsets(Map("a" -> ShardPos(BigInt(2), 0),
      "b" -> ShardPos(BigInt(1), 0)))
    assert(a.json() == b.json())
    assert(a.json() == """{"a":"2:0","b":"1:0"}""")
  }

  test("corrupted offset JSON fails loudly instead of dropping entries") {
    // silent drop would restart the shard at Beginning => mass duplication
    val corrupt = """{"shard-0":"123:0","shard-1":"not-a-position"}"""
    assertThrows[IllegalArgumentException](GraftShardOffsets.fromJson(corrupt))
    assertThrows[IllegalArgumentException](
      GraftShardOffsets.fromJson("""["shard-0"]"""))
    assertThrows[IllegalArgumentException](
      GraftShardOffsets.fromJson("""{"shard-0":123}"""))
    // empty map is legal
    assert(GraftShardOffsets.fromJson("{}").positions.isEmpty)
  }

  test("ShardPos ordering: numeric seq, sub tiebreak, Beginning below all") {
    import ShardPos.ordering
    assert(ordering.lt(ShardPos(BigInt(9), 5), ShardPos(BigInt(10), 0)))
    assert(ordering.lt(ShardPos(BigInt(10), 0), ShardPos(BigInt(10), 1)))
    assert(ordering.lt(ShardPos.Beginning, ShardPos(BigInt(0), 0)))
  }
}
