package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * relational primitives so Catalyst keeps optimizing them (north-star
  * mandate: time-series enrichment over event logs at 100 TB).
  *
  * Both operators are deliberately NOT crossJoin+filter:
  *  - [[asOfJoin]] is the union-and-window formulation — ONE shuffle on the
  *    key (identical cost shape to a sort-merge join), no row explosion,
  *    state bounded by a sort run, the standard scalable as-of shape.
  *  - [[rangeJoinPointInterval]] buckets time so candidates meet in a hash
  *    equi-join on the bucket id; each (interval, point) pair is generated
  *    at most once (a point lives in exactly one bucket), so no dedup pass
  *    is needed and the shuffle carries interval-span/bucket-width ≈ O(1)
  *    replicas instead of |points|×|intervals| pairs.
  */
object Joins {

  /** Backward as-of join: for every probe row, attach the payload of the
    * latest reference row with the same key and `refTs` ≤ the probe's
    * `probeTs` (inclusive). Probes with no earlier reference keep null
    * payloads (left-join semantics).
    *
    * Mechanics: tag both inputs, union them, sort each key's timeline once
    * (window over (ts, isProbe) — references order BEFORE probes at equal
    * ts, which is what makes the match inclusive), and carry the last
    * reference row forward AS ONE STRUCT — the matched row's payload
    * columns travel together, so a NULL inside the matched row STAYS null
    * instead of being backfilled per-column from an older reference
    * (per-column `last(ignoreNulls)` could stitch different reference rows
    * together; DuckDB ASOF / merge_asof attach the matched row intact).
    * Ties among references at the same (key, ts) resolve to the row with
    * the greatest `tieBreak` (pass a unique id for full determinism;
    * event streams with sub-microsecond collisions are the only case that
    * needs it).
    *
    * Every non-key, non-timestamp reference column comes back as a payload
    * column, so `refs` should be pre-projected to what the caller wants —
    * narrower payloads also mean a narrower shuffle.
    */
  def asOfJoin(probes: DataFrame, refs: DataFrame, keys: Seq[String],
      probeTs: String, refTs: String, tieBreak: Option[String] = None): DataFrame = {
    val payloadCols = refs.columns.filterNot(c => keys.contains(c) || c == refTs)
    val probeCols = probes.columns
    require(payloadCols.intersect(probeCols).isEmpty,
      s"asOfJoin: payload columns ${payloadCols.mkString(",")} collide with probe columns")
    // A non-orderable tie column would cast to null and silently disable
    // the tie-break the caller asked for — fail fast instead.
    tieBreak.foreach { c =>
      val dt = refs.schema(c).dataType
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt),
        s"asOfJoin: tieBreak column $c of type ${dt.simpleString} is not orderable")
    }

    if (payloadCols.isEmpty) return probes

    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => refs.schema(refs.schema.fieldIndex(c))))
    val pTagged = probes
      .withColumn("_g_ts", col(probeTs))
      .withColumn("_g_probe", lit(1))
      .withColumn("_g_tie", tieBreak.map(c => lit(null).cast(refs.schema(c).dataType))
        .getOrElse(lit(null).cast("long")))
      .withColumn("_g_payload", lit(null).cast(payloadType))
      .select(keys.map(col) ++
        Seq(col("_g_ts"), col("_g_probe"), col("_g_tie"), col("_g_payload")) ++
        probeCols.filterNot(keys.contains).map(col): _*)
    val rTagged = refs
      .withColumn("_g_ts", col(refTs))
      .withColumn("_g_probe", lit(0))
      .withColumn("_g_tie", tieBreak.map(col).getOrElse(lit(null).cast("long")))
      .withColumn("_g_payload", struct(payloadCols.map(col): _*))
      .select(keys.map(col) ++
        Seq(col("_g_ts"), col("_g_probe"), col("_g_tie"), col("_g_payload")) ++
        probeCols.filterNot(keys.contains)
          .map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)

    // asc_nulls_first on the tie column keeps probe rows (null tie) stable;
    // among same-ts references the greatest tie value lands last and wins.
    // The whole matched row rides ONE last(ignoreNulls) — probe rows carry
    // a null struct, reference rows a non-null one (even when every field
    // inside is null), so "latest reference row" and "non-null value"
    // coincide exactly.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_g_ts").asc, col("_g_probe").asc, col("_g_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTagged.unionByName(rTagged)
      .withColumn("_g_payload", last(col("_g_payload"), ignoreNulls = true).over(w))
      .where(col("_g_probe") === 1)
      .select(probeCols.map(col) ++
        payloadCols.map(c => col("_g_payload").getField(c).as(c)): _*)
  }

  /** Point-in-interval range join: every (interval, point) pair with
    * `startCol` ≤ point ts < `endCol` (half-open, the event-window
    * convention). Inner-join semantics; left-join composition is a
    * group-count plus a join back on the interval key.
    *
    * Scale shape: both sides are hashed to `bucketSeconds`-wide time
    * buckets; intervals are exploded to the buckets they overlap, points
    * map to exactly one bucket, and candidates meet in an equi-join on the
    * bucket id. Pick `bucketSeconds` ≈ the typical interval length: each
    * interval then replicates to ~2 buckets, and the per-bucket fan-out is
    * |points in bucket| × |intervals overlapping bucket| — local, not
    * global, quadratic. A heavily skewed bucket (event storm) can still be
    * salted downstream since the join is a plain equi-join.
    */
  def rangeJoinPointInterval(points: DataFrame, pointTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 300L, keys: Seq[String] = Seq.empty): DataFrame = {
    require(bucketSeconds > 0, "rangeJoin: bucketSeconds must be positive")
    val bucketMicros = bucketSeconds * 1000000L
    // The TimestampType cast makes TIMESTAMP_NTZ inputs bucketable too
    // (unix_micros rejects NTZ); a no-op on TimestampType. Bucketing only
    // needs the SAME monotone ts→micros mapping on both sides — the final
    // exact predicate compares the original columns — so the session-
    // timezone interpretation the cast applies to NTZ is harmless.
    def bucketOf(ts: Column): Column =
      floor(unix_micros(ts.cast(org.apache.spark.sql.types.TimestampType)) /
        bucketMicros)

    val p = points.withColumn("_g_bucket", bucketOf(col(pointTs)))
    // Half-open interval: the last covered instant is end − 1µs, so the
    // bucket range is [bucket(start), bucket(end − 1µs)] inclusive.
    val i = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("_g_bucket",
        explode(sequence(bucketOf(col(startCol)),
          bucketOf(col(endCol) - expr("INTERVAL 1 MICROSECOND")))))
    // Keyed variant: candidates meet on (keys, bucket) so per-bucket
    // fan-out is per-KEY local — without this, a keyed range join would
    // cross every key's points with every key's intervals inside a
    // bucket (an event-storm bucket times |keys| at 100 TB).
    i.join(p, keys :+ "_g_bucket")
      .where(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("_g_bucket")
  }
}
