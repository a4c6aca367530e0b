package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
/** Dev measurement tool (optimization rounds): run named queries exactly
  * the way graft.Bench does, but with a job listener that prints each
  * Spark job's wall time and call site, plus the gaps between jobs
  * (driver-side planning/analysis time). This is how we attribute a
  * query's seconds to its materializing actions before touching anything
  * — guide §1 "measure first". Not part of the bench contract.
  *
  * Usage: sbt "runMain graft.ProfileQuery q_corpus_pipeline [q_...]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryName> [more...]")
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
    // warmup, as in Bench
    spark.range(0, 1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case _: Throwable => }

    case class JobRec(id: Int, t0: Long, var t1: Long = -1L,
        site: String = "", nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // last stage's name carries the action's call site (e.g.
        // "count at Dedup.scala:2414") — the attribution we want
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nt = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, JobRec(js.jobId, System.nanoTime(), site = site, nTasks = nt))
        order.add(js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.t1 = System.nanoTime()
      }
    })

    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          // one untimed warm pass? No — profile the FIRST pass too, then a
          // second pass: the bench medians over passes, so both matter.
          for (pass <- 1 to 2) {
            jobs.clear(); order.clear()
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            println(f"== $name pass $pass: wall $wall%.3f s  (count=$n)")
            var prevEnd = t0
            var jobSum = 0.0
            val it = order.iterator()
            while (it.hasNext) {
              val r = jobs.get(it.next())
              val gap = (r.t0 - prevEnd) / 1e9
              val dur = if (r.t1 < 0) -1.0 else (r.t1 - r.t0) / 1e9
              jobSum += math.max(dur, 0)
              println(f"   job ${r.id}%4d  gap ${gap}%7.3f  dur ${dur}%7.3f  tasks ${r.nTasks}%4d  ${r.site}")
              prevEnd = if (r.t1 > 0) r.t1 else r.t0
            }
            println(f"   [sum jobs $jobSum%.3f s; driver gaps ${wall - jobSum}%.3f s]")
            spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
            spark.catalog.clearCache()
            System.gc(); Thread.sleep(150); System.gc()
          }
      }
    }
    spark.stop()
  }
}
