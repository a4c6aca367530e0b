package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (SURVEY §5.2; one
  * SparkContext per JVM). Mirrors the Verify/Bench session config. */
object TestSparkSession {
  private def rm(path: String): Unit = {
    def loop(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(loop)); f.delete(): Unit
    }
    loop(new java.io.File(path))
  }

  lazy val spark: SparkSession = {
    // A fresh derby metastore must pair with a fresh warehouse dir —
    // leftover table locations from a previous JVM otherwise collide
    // with CREATE TABLE AS SELECT.
    rm("target/test-warehouse"); rm("target/derby"); rm("metastore_db")
    System.setProperty("derby.system.home", "target/derby")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/test-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
