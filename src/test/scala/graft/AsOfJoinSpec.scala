package graft

import org.apache.spark.sql.functions._

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  * semantics pinned on hand-built edge cases, equivalence pinned
  * against q26's declarative union+window formulation on real data,
  * and the plan pinned to the custom exec with key-hash exchanges.
  */
class AsOfJoinSpec extends SparkSpec {

  private def asof(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) = {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AsOfJoin.join(l, r, "k", "rk", "t", Seq("rt", "rid"))
  }

  test("as-of semantics: backward inclusive match, greatest tiebreak " +
      "wins, no-match rows keep nulls, null times never match") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // matches right t=10 (inclusive bound)
      (1L, 25L, 101L), // matches the LATEST of t=20 (ties: rid 3 > 2)
      (1L, 5L, 102L),  // before all rights of key 1 -> null
      (2L, 50L, 103L), // key 2 has no right rows at all -> null
      (3L, 50L, 104L)  // right of key 3 has null time -> null
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, Some(10L), 1L),
      (1L, Some(20L), 2L),
      (1L, Some(20L), 3L), // tie on rt: greatest rid must win
      (1L, Some(30L), 4L), // after t=25: out of window
      (3L, None, 9L)
    ).toDF("rk", "rt", "rid")
    val out = asof(left, right).collect()
      .map(r => r.getAs[Long]("lid") ->
        (if (r.isNullAt(r.fieldIndex("rid"))) -1L else r.getAs[Long]("rid")))
      .toMap
    assert(out == Map(100L -> 1L, 101L -> 3L, 102L -> -1L,
      103L -> -1L, 104L -> -1L), s"got $out")
  }

  test("native as-of equals q26's union+window formulation on the " +
      "events corpus") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id").as("purchase_id"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("rk"), col("ts").as("rt"),
        col("event_id").as("rid"))
    val native = asof(purchases, signups)
      .select(col("purchase_id"), col("k").as("user_id"),
        col("rid").as("signup_id"))
      .orderBy(col("purchase_id")).collect().toSeq
    val declarative = SparkEntry.queries("q26_asof_join")(spark, d)
      .collect().toSeq
    assert(native == declarative,
      s"native and window as-of diverge: ${native.take(3)} vs " +
        s"${declarative.take(3)}")
  }

  test("the plan is AsOfJoinExec over two key exchanges — no union, " +
      "no window, no product join") {
    import spark.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("k", "t", "lid")
    val r = Seq((1L, 1L, 1L)).toDF("rk", "rt", "rid")
    val p = asof(l, r).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("AsOfJoin ("), p)
    assert(!p.contains("Window") && !p.contains("Union"), p)
    assert("hashpartitioning".r.findAllIn(p).size == 2, p.take(1500))
  }

  test("property sweep: random streams equal the naive model across " +
      "seeds, sizes, duplicate times and sparse keys") {
    import spark.implicits._
    for (seed <- Seq(7L, 42L, 1234L)) {
      val rnd = new scala.util.Random(seed)
      val nL = 50 + rnd.nextInt(200)
      val nR = rnd.nextInt(120)
      val nKeys = 1 + rnd.nextInt(9)
      val lefts = (0L until nL).map(i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, i))
      val rights = (0L until nR).map(j =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, j))
      val got = asof(
        lefts.toDF("k", "t", "lid").repartition(1 + rnd.nextInt(4)),
        rights.toDF("rk", "rt", "rid").repartition(1 + rnd.nextInt(4)))
        .collect().map(r => r.getAs[Long]("lid") ->
          (if (r.isNullAt(r.fieldIndex("rid"))) -1L
           else r.getAs[Long]("rid"))).toMap
      val model = lefts.map { case (k, t, lid) =>
        val cand = rights.filter(r => r._1 == k && r._2 <= t)
        lid -> (if (cand.isEmpty) -1L
                else cand.maxBy(r => (r._2, r._3))._3)
      }.toMap
      assert(got == model, s"seed $seed: diverged on " +
        s"${(got.toSet -- model.toSet).take(3)}")
    }
  }

  test("match state survives partition boundaries of the SORT, not the " +
      "data: many keys interleaved across a 3-partition shuffle") {
    import spark.implicits._
    val left = (0L until 300L).map(i => (i % 7, 100L + i, i))
      .toDF("k", "t", "lid").repartition(5)
    val right = (0L until 50L).map(j => (j % 7, 90L + j * 3, j))
      .toDF("rk", "rt", "rid").repartition(3)
    val out = asof(left, right).collect()
    // model: per left row, the right row of same key with max (rt, rid)
    // among rt <= t
    val rights = (0L until 50L).map(j => (j % 7, 90L + j * 3, j))
    val model = (0L until 300L).map { i =>
      val (k, t) = (i % 7, 100L + i)
      val cand = rights.filter(r => r._1 == k && r._2 <= t)
      i -> (if (cand.isEmpty) -1L else cand.maxBy(r => (r._2, r._3))._3)
    }.toMap
    val got = out.map(r => r.getAs[Long]("lid") ->
      (if (r.isNullAt(r.fieldIndex("rid"))) -1L else r.getAs[Long]("rid")))
      .toMap
    assert(got == model)
  }
}
