package graft
import org.apache.spark.sql.SparkSession
/** Dev tool (optimization rounds): dump `.explain("formatted")` for named
  * registered queries to files — the plan evidence the optimization
  * deliverables commit (plans/r16/<query>_{before,after}.txt). Not part
  * of the bench contract.
  *
  * Usage: sbt "runMain graft.ExplainQuery <outDir> <suffix> q_a q_b ..."
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainQuery <outDir> <suffix> <query...>")
    val outDir = args(0); val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    args.drop(2).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(fn) =>
          // Building the frame runs the operators' eager materializations
          // (their plans are the interesting ones but live inside the
          // operator); the formatted explain captures the final plan the
          // bench action executes, which is the committable evidence.
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
          println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
