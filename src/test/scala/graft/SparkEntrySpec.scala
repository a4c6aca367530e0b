package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: every queries entry runs at sf0.001; entry()
  * returns rows; oracleSql keys all exist in queries. */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
