package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-first data selection under a global token budget — "take the
  * best documents until the budget is spent", the standard curation step
  * when a training run wants N tokens out of a much larger cleaned
  * corpus. Greedy prefix of the (quality DESC, id) order, not a knapsack:
  * deterministic, restatable as a single window cumsum in any SQL engine,
  * and what data-curation pipelines actually run. North-star extension;
  * no reference analogue.
  *
  * Scale shape — the naive form is a window over a GLOBAL ORDER BY, which
  * Spark executes as ONE task holding the whole corpus: the classic
  * single-partition-window scale killer. This implementation is the
  * textbook distributed prefix sum instead:
  *
  *   1. `repartitionByRange` on the selection order — each partition owns
  *      a contiguous quality range;
  *   2. per-partition token totals to the driver — #partitions scalars,
  *      driver state by construction (the [[Similarity.ivfTopK]] centroid
  *      argument);
  *   3. exclusive prefix offsets broadcast back as a literal map;
  *   4. per-partition window cumsum + its partition's offset = the exact
  *      global running total, computed with per-partition parallelism.
  *
  * The result is a pure function of the total order (quality DESC, id):
  * range boundaries may split quality ties across partitions, but the
  * within-partition window re-sorts by the SAME total order (id is
  * unique), so every row's global running total — and therefore the kept
  * set — is identical for any boundary placement, partition count, or
  * input layout. */
object Selection {

  /** Keep the maximal prefix of documents in (qualityCol DESC, idCol ASC)
    * order whose cumulative `tokensCol` stays within `budget` (inclusive).
    * Token counts must be non-null and non-negative — validated in the
    * scan (a null would silently end the budget early, a negative would
    * let the running total shrink). */
  def selectUnderTokenBudget(df: DataFrame, qualityCol: String, tokensCol: String,
      idCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val nTok = col(tokensCol).cast("long")
    val checked = df.withColumn(tokensCol,
      when(nTok.isNull.or(nTok < 0),
        raise_error(concat(
          lit(s"selectUnderTokenBudget: $tokensCol must be non-null and >= 0, got "),
          coalesce(nTok.cast("string"), lit("null")),
          lit(s" for $idCol="), col(idCol).cast("string"))))
        .otherwise(nTok))
    val n = math.max(Dedup.cpuParallelism(df), 1)
    val ranged = Dedup.materialize(
      checked.repartitionByRange(n, col(qualityCol).desc, col(idCol).asc)
        .withColumn("_pid", spark_partition_id()))
    // per-partition totals: #partitions rows — driver state by construction
    val totals = ranged.groupBy(col("_pid"))
      .agg(sum(col(tokensCol)).as("_t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    // offsets ride back as a BROADCAST join on the partition id — a
    // when-chain or map literal over partition count would compile a
    // #partitions-deep expression tree (10k+ on a real cluster, past
    // codegen limits); a broadcast hash join is O(1) depth at any scale
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("_pid", "_offset")
    val w = Window.partitionBy(col("_pid"))
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    ranged
      .join(broadcast(offsetsDf), Seq("_pid"))
      .withColumn("_run", sum(col(tokensCol)).over(w) + col("_offset"))
      .where(col("_run") <= budget)
      .drop("_pid", "_offset", "_run")
  }
}
