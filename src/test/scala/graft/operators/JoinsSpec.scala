package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Temporal-join specs: as-of and range joins are checked against
  * brute-force ground truth on real event data, plus plan shape (the range
  * join must hash-join on the time bucket, never nested-loop). */
class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  // normalize ts to TimestampType whatever encoding the testdata shipped
  private lazy val ev = graft.sources.Sources.normalizeTs(
    spark.read.parquet("/root/testdata/sf0.01/events.parquet"))

  test("asOfJoin matches brute-force latest-prior-reference on real events") {
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("purchase_id"))

    val got = Joins.asOfJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts",
        tieBreak = Some("purchase_id"))
      .select($"event_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toMap

    val ps = purchases.as[(Long, java.sql.Timestamp, Long)].collect()
    val expected = clicks.as[(Long, Long, java.sql.Timestamp)].collect().map {
      case (id, u, t) =>
        val prior = ps.filter(p => p._1 == u && !p._2.after(t))
        id -> (if (prior.isEmpty) None
               else Some(prior.maxBy(p => (p._2.getTime, p._3))._3))
    }.toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("asOfJoin: inclusive at equal ts; tie among refs goes to max tieBreak") {
    val probes = Seq((1L, 100L), (2L, 50L)).toDF("probe_id", "t")
      .withColumn("t", timestamp_micros($"t"))
    val refs = Seq((10L, 100L), (11L, 100L), (12L, 99L)).toDF("ref_id", "rt")
      .withColumn("rt", timestamp_micros($"rt"))
      .withColumn("k", lit(1L))
    val out = Joins.asOfJoin(
        probes.withColumn("k", lit(1L)), refs, Seq("k"), "t", "rt",
        tieBreak = Some("ref_id"))
      .select($"probe_id", $"ref_id").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(11L), "equal-ts ref visible; max tieBreak wins")
    assert(out(2L).isEmpty, "no reference at or before t=50")
  }

  test("asOfJoin: matched row travels intact — a NULL payload field stays NULL") {
    // ref at t=90 has price but NULL qty; ref at t=80 has both. The t=100
    // probe matches the t=90 row, whose NULL qty must NOT be backfilled
    // from the older row (per-column last(ignoreNulls) would stitch the
    // two reference rows together).
    val probes = Seq((1L, 100L)).toDF("probe_id", "t")
      .withColumn("t", timestamp_micros($"t")).withColumn("k", lit(1L))
    val refs = Seq(
      (80L, Some(5.0), Some(10L)),
      (90L, Some(7.0), Option.empty[Long])).toDF("rt", "price", "qty")
      .withColumn("rt", timestamp_micros($"rt")).withColumn("k", lit(1L))
    val out = Joins.asOfJoin(probes, refs, Seq("k"), "t", "rt")
      .select($"probe_id", $"price", $"qty")
      .as[(Long, Option[Double], Option[Long])].collect()
    assert(out.toSeq == Seq((1L, Some(7.0), None)),
      "matched reference row must attach as-is, nulls included")
  }

  test("asOfJoin: non-orderable tieBreak column is rejected, string keys order correctly") {
    val probes = Seq((1L, 100L)).toDF("probe_id", "t")
      .withColumn("t", timestamp_micros($"t")).withColumn("k", lit(1L))
    val refs = Seq((100L, "b", 1.0), (100L, "a", 2.0)).toDF("rt", "tag", "v")
      .withColumn("rt", timestamp_micros($"rt")).withColumn("k", lit(1L))
    // a STRING tie column is orderable and must break the tie by its raw
    // ordering (round-2 cast it to long → null → silent nondeterminism)
    val out = Joins.asOfJoin(probes, refs.select($"k", $"rt", $"tag"), Seq("k"),
        "t", "rt", tieBreak = Some("tag"))
      .select($"tag").as[String].collect()
    assert(out.toSeq == Seq("b"), "greatest raw string tie value must win")
    // a MAP-typed tie column is not orderable → fail fast
    val badRefs = refs.withColumn("m", map(lit("x"), lit(1)))
      .select($"k", $"rt", $"m", $"v")
    assertThrows[IllegalArgumentException] {
      Joins.asOfJoin(probes, badRefs, Seq("k"), "t", "rt", tieBreak = Some("m"))
    }
  }

  test("rangeJoinPointInterval matches brute-force, incl. intervals spanning many buckets") {
    val wins = ev.where($"event_type" === "signup").limit(200)
      .select($"event_id".as("window_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
    val errs = ev.where($"event_type" === "error").select($"ts")

    // bucket smaller than the interval => every interval explodes to 6 buckets
    for (bucket <- Seq(60L, 300L, 3600L)) {
      val got = Joins.rangeJoinPointInterval(errs, "ts", wins, "w_start", "w_end", bucket)
        .groupBy($"window_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      val expected = wins.join(errs)
        .where($"ts" >= $"w_start" && $"ts" < $"w_end")
        .groupBy($"window_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"bucketSeconds=$bucket")
    }
  }

  test("keyed rangeJoinPointInterval: equi-key rides the bucket join, matches brute force") {
    val clicks = ev.where($"event_type" === "click").limit(150)
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_start"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as("c_end"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    val got = Joins.rangeJoinPointInterval(purchases, "p_ts", clicks,
        "c_start", "c_end", bucketSeconds = 600, keys = Seq("user_id"))
      .select($"click_id", $"p_ts").as[(Long, java.sql.Timestamp)].collect().toSet
    val cs = clicks.as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
    val ps = purchases.as[(Long, java.sql.Timestamp)].collect()
    val expected = (for {
      (cid, u, s, e) <- cs
      (pu, pt) <- ps
      if pu == u && !pt.before(s) && pt.before(e)
    } yield (cid, pt)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture should contain conversions")
    // the key is part of the equi-join (bucket fan-out is per-key local)
    val plan = Joins.rangeJoinPointInterval(purchases, "p_ts", clicks,
      "c_start", "c_end", bucketSeconds = 600, keys = Seq("user_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("user_id"), plan)
  }

  test("rangeJoinPointInterval: half-open bounds and degenerate intervals") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val pts = Seq(ts(1000000L), ts(2000000L), ts(3000000L)).toDF("ts")
    val wins = Seq(
      (1L, ts(1000000L), ts(3000000L)),  // [1s, 3s) -> points at 1s, 2s
      (2L, ts(2000000L), ts(2000000L)),  // empty interval -> nothing
      (3L, ts(3000000L), ts(2000000L)))  // end < start -> nothing
      .toDF("window_id", "w_start", "w_end")
    val got = Joins.rangeJoinPointInterval(pts, "ts", wins, "w_start", "w_end", 1L)
      .groupBy($"window_id").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
  }

  test("rangeJoinPointInterval plan is a hash equi-join on the bucket, not a nested loop") {
    val wins = ev.where($"event_type" === "signup")
      .select($"event_id".as("window_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 5 MINUTES")).as("w_end"))
    val errs = ev.where($"event_type" === "error").select($"ts")
    val plan = Joins.rangeJoinPointInterval(errs, "ts", wins, "w_start", "w_end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(5).mkString("\n"))
  }
}
