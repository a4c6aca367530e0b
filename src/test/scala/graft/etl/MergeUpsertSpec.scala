package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSparkSession

/** Keyed MERGE/upsert semantics: updates replace, inserts append, the
  * rest is untouched; composite keys work; schema mismatch is rejected. */
class MergeUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("mergeUpsert: update wins, insert appends, untouched rows survive") {
    val current = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val merged = Warehouse.mergeUpsert(current, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(merged == Set(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("mergeUpsert: composite key") {
    val current = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val updates = Seq((1L, "y", 9.0)).toDF("k1", "k2", "v")
    val merged = Warehouse.mergeUpsert(current, updates, Seq("k1", "k2"))
      .as[(Long, String, Double)].collect().toSet
    assert(merged == Set((1L, "x", 1.0), (1L, "y", 9.0)))
  }

  test("mergeUpsert: empty delta is a no-op; schema mismatch rejected") {
    val current = Seq((1L, "a")).toDF("k", "name")
    val empty = current.where("false")
    assert(Warehouse.mergeUpsert(current, empty, Seq("k")).count() == 1)
    val wrong = Seq((1L, "a", 1.0)).toDF("k", "name", "extra")
    intercept[IllegalArgumentException] {
      Warehouse.mergeUpsert(current, wrong, Seq("k"))
    }
  }

  test("mergeUpsert: duplicate source keys rejected (MERGE multi-match semantics)") {
    val current = Seq((1L, "a")).toDF("k", "name")
    val dupDelta = Seq((2L, "x"), (2L, "y")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Warehouse.mergeUpsert(current, dupDelta, Seq("k"))
    }
    assert(e.getMessage.contains("multiple rows for the same key"))
  }

  test("mergeUpsert: column type drift rejected, not silently coerced") {
    val current = Seq((1L, 10.0)).toDF("k", "v")
    val drifted = Seq((2L, "11")).toDF("k", "v") // v: double vs string
    val e = intercept[IllegalArgumentException] {
      Warehouse.mergeUpsert(current, drifted, Seq("k"))
    }
    assert(e.getMessage.contains("type drift"))
  }

  test("mergeUpsert: nested NULLABILITY differences are not drift") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // a parquet-read current table has containsNull=true arrays; a
    // freshly-built delta from non-null literals has containsNull=false —
    // unionByName merges these fine, so the drift guard must not reject
    val cur = spark.createDataFrame(
      java.util.List.of(Row(1L, Seq("a", "b"))),
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("tags", ArrayType(StringType, containsNull = true)))))
    val upd = spark.createDataFrame(
      java.util.List.of(Row(1L, Seq("z")), Row(2L, Seq("c"))),
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("tags", ArrayType(StringType, containsNull = false)))))
    val merged = Warehouse.mergeUpsert(cur, upd, Seq("k"))
      .as[(Long, Seq[String])].collect().toSet
    assert(merged == Set((1L, Seq("z")), (2L, Seq("c"))))
  }
}
