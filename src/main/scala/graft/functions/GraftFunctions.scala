package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration point for graft's native Catalyst expressions. Idempotent —
  * safe to call per query; also usable from `spark.sql` once registered. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
  }

  /** `simhash64(array<string>) -> long` as a Column (session must be
    * registered first; queries call [[register]] idempotently). */
  def simhash64(c: Column): Column = call_function("simhash64", c)
}
