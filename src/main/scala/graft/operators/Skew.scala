package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (north-star scale mandate: "salting for
  * skew"). AQE's skew-join handling splits oversized SHUFFLE partitions at
  * runtime; salting complements it for aggregations and for joins where
  * one logical key dominates (a viral document id, an empty-string key,
  * a default timestamp).
  */
object Skew {

  /** ROW-pure salt in [0, saltBuckets): a hash of the full row content
    * (every hashable column), not `rand()`. rand(seed) is deterministic
    * per PARTITIONING but reshuffles under task retry / repartition /
    * input-split changes; a content hash gives each row the same salt on
    * every run and layout (bit-stable stage retries) while still varying
    * WITHIN a hot key — which is the whole point of salting. Map-typed
    * columns are excluded (Spark's hash expressions reject MapType);
    * byte-identical duplicate rows share a salt, which only weakens
    * spreading for exact-duplicate skew, never correctness. */
  private def rowSalt(df: DataFrame, saltBuckets: Int, seed: Int = 42): Column = {
    import org.apache.spark.sql.types._
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType      => true
      case ArrayType(e, _) => containsMap(e)
      case StructType(fs)  => fs.exists(f => containsMap(f.dataType))
      case _               => false
    }
    val hashable = df.columns.filter(c => !containsMap(df.schema(c).dataType))
    pmod(xxhash64((hashable.map(col) :+ lit(seed)).toIndexedSeq: _*),
      lit(saltBuckets.toLong)).cast("int")
  }

  /** Two-stage salted aggregation: stage 1 aggregates on (keys, salt) —
    * spreading a hot key over `saltBuckets` reducers — stage 2 merges the
    * partials on the true keys. `partials` must be decomposable
    * (sum/count/min/max and merges thereof); the caller supplies the
    * partial aggregates and how to merge them.
    *
    * Example — salted count + sum:
    * {{{
    * Skew.saltedAggregate(df, Seq("k"), 32,
    *   partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merges   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt", rowSalt(df, saltBuckets))
    val stage1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random salt in [0, n); the small side is
    * replicated n× with every salt value; the join key becomes
    * (key, salt), so one hot key spreads over n reducers. Use when the
    * small side is too big to broadcast but the key histogram is spiky;
    * AQE's skew-join covers the broadcast-able cases. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    // Only join types that never EMIT an unmatched small-side row are
    // sound here: the small side is replicated saltBuckets×, so a right/
    // full outer (or a semi/anti FROM the small side) would surface each
    // unmatched replica as a duplicate output row.
    require(Set("inner", "left", "leftouter", "left_outer")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedBig = big.withColumn("_salt", rowSalt(big, saltBuckets))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
