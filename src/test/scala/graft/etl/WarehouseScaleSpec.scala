package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Scale-infrastructure specs: bucketed co-located joins (no exchange),
  * dynamic-partition incremental loads, salted aggregation/join. */
class WarehouseScaleSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("bucketed tables equi-join with no shuffle exchange on either side") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Warehouse.ensureDatabase(spark, "test_buckets")
    Warehouse.overwriteBucketedTable(li, "test_buckets.li_b", "l_orderkey", 4)
    Warehouse.overwriteBucketedTable(
      o.withColumnRenamed("o_orderkey", "l_orderkey"), "test_buckets.o_b", "l_orderkey", 4)
    val joined = spark.table("test_buckets.li_b")
      .join(spark.table("test_buckets.o_b"), "l_orderkey")
    // bucketed SMJ must not exchange either side
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(joined.count() == li.count()) // FK: every lineitem has its order
  }

  test("partitioned table load enables partition pruning on the date key") {
    Warehouse.ensureDatabase(spark, "test_parts")
    val df = Seq(
      ("2024-01-01", "a", 1), ("2024-01-02", "b", 2), ("2024-01-03", "c", 3))
      .toDF("day", "k", "v")
    Warehouse.overwritePartitionedTable(df, "test_parts.t", Seq("day"))
    val pruned = spark.table("test_parts.t").where($"day" === "2024-01-02")
    assert(pruned.count() == 1)
    // static partition pruning: only one partition directory is read
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("day=2024-01-02")
      || pruned.inputFiles.length == 1, s"no pruning evidence:\n$scan")
    assert(pruned.inputFiles.forall(_.contains("day=2024-01-02")))
  }

  test("incremental partition overwrite replaces only the partitions present") {
    Warehouse.ensureDatabase(spark, "test_incr")
    val day1 = Seq(("2024-01-01", "a", 1), ("2024-01-02", "b", 2)).toDF("day", "k", "v")
    Warehouse.overwriteIncrementalPartitions(day1, "test_incr.t", Seq("day"))
    // re-load day 2 with corrected data + add day 3; day 1 must survive
    val day23 = Seq(("2024-01-02", "b", 20), ("2024-01-03", "c", 3)).toDF("day", "k", "v")
    Warehouse.overwriteIncrementalPartitions(day23, "test_incr.t", Seq("day"))
    val got = spark.table("test_incr.t").select("day", "v").as[(String, Int)]
      .collect().toMap
    assert(got == Map("2024-01-01" -> 1, "2024-01-02" -> 20, "2024-01-03" -> 3))
  }

  test("orphanRows broadcast hint is conditional on parent size") {
    val child = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val parent = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    // the optimizer folds ResolvedHint into the Join node's JoinHint —
    // assert on that (the physical plan can't distinguish: AQE broadcasts
    // small test data regardless of hints)
    def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if Seq(j.hint.leftHint, j.hint.rightHint).flatten
            .exists(_.strategy.contains(
              org.apache.spark.sql.catalyst.plans.logical.BROADCAST)) => j
      }.nonEmpty
    // dimension-sized parent (file stats ≪ threshold) → hinted
    val small = graft.quality.Checks.orphanRows(child, parent, "l_partkey", "p_partkey")
    assert(hasBroadcastHint(small), "dimension-sized parent should be hinted")
    // fact-sized parent (threshold lowered below the file size) → no hint;
    // strategy left to AQE so a fact⋈fact FK check can't OOM the driver
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val large = graft.quality.Checks.orphanRows(child, parent, "l_partkey", "p_partkey")
      assert(!hasBroadcastHint(large), "fact-sized parent must not be hinted")
      // forced hint (reference pipeline path) overrides the heuristic
      val forced = graft.quality.Checks.orphanRows(
        child, parent, "l_partkey", "p_partkey", broadcastParent = Some(true))
      assert(hasBroadcastHint(forced))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // semantics unchanged either way
    assert(small.count() ==
      graft.quality.Checks.orphanRows(child, parent, "l_partkey", "p_partkey",
        broadcastParent = Some(false)).count())
  }

  test("salted aggregate equals plain aggregate") {
    val df = spark.range(0, 10000)
      .select((col("id") % 3).as("k"), col("id").cast("double").as("v"))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(Long, Long, Double)].collect().toSet
    val salted = graft.operators.Skew.saltedAggregate(df, Seq("k"), 16,
      partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
      merges = Seq(sum($"n").as("n"), sum($"s").as("s")))
      .as[(Long, Long, Double)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin rejects join types that would duplicate small-side rows") {
    val big = Seq((1L, "x")).toDF("k", "payload")
    val small = Seq((1L, "y")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(big, small, "k", 4, joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(big, small, "k", 4, joinType = "right")
    }
    // left joins stay supported (unmatched BIG rows are never replicated)
    assert(graft.operators.Skew.saltedJoin(big, small, "k", 4, "left").count() == 1)
  }

  test("salted join equals plain join on a skewed key") {
    // 90% of big-side rows share one hot key
    val big = spark.range(0, 5000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(999L)).as("k"),
        col("id").as("payload"))
    val small = Seq((999L, "hot"), (0L, "z"), (1L, "o"), (2L, "t")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = graft.operators.Skew.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("salt is ROW-pure: identical results and per-bucket assignment across partition layouts") {
    // rand(seed)-based salting is deterministic per PARTITIONING only — a
    // repartition or task retry reshuffles which rows land in which salt
    // bucket. The content-hash salt must give every row the same bucket in
    // any layout, making stage retries bit-stable.
    val df = spark.range(0, 4000)
      .select((col("id") % 5).as("k"), col("id").cast("double").as("v"))
    def saltedCounts(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      graft.operators.Skew.saltedAggregate(d, Seq("k"), 16,
        partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
        merges = Seq(sum($"n").as("n"), sum($"s").as("s")))
        .as[(Long, Long, Double)].collect().toSet
    val layouts = Seq(df, df.repartition(17), df.repartition(3, col("v")), df.coalesce(1))
    assert(layouts.map(saltedCounts).distinct.size == 1)

    // assignment itself (not just the merged result) is layout-invariant:
    // expose stage-1 groups by aggregating to (k, salt-bucket count sets)
    def stage1Shape(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      graft.operators.Skew.saltedAggregate(d, Seq("k"), 16,
        partials = Seq(count(lit(1)).as("n")),
        merges = Seq(count(lit(1)).as("n_buckets")))
        .as[(Long, Long)].collect().toSet
    assert(layouts.map(stage1Shape).distinct.size == 1)
    // and the hot key actually spreads over multiple buckets
    assert(stage1Shape(df).forall(_._2 > 1), "salt should spread each key")
  }
}
