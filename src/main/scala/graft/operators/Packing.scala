package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the stage after [[Chunking]] in every pre-training
  * pipeline: greedy first-fit packing of token chunks into fixed-budget
  * training examples (maximize fill, never split a chunk, never exceed
  * the budget). The reference has no analogue; north-star extension
  * surface.
  *
  * Scale design: packing is inherently sequential, so the corpus is
  * sharded DETERMINISTICALLY (md5-hex prefix of the doc id — the same
  * engine-portable key-pure bucket [[Sampling]] uses) and each
  * (split, shard) group packs independently: one hash shuffle to
  * co-locate a group, then a STREAMING greedy pass with O(1) state per
  * task (`mapPartitions` — genuine per-partition sequential logic, the
  * one shape the DataFrame API cannot express). 16^shardHexDigits shards
  * bound the sequential chain length; examples never cross a shard, so
  * adding shards trades a little tail fill for parallelism. Chunks never
  * cross SPLITS either — an example mixing train and test rows would
  * leak through the pack.
  *
  * Determinism end to end: shard is key-pure, the in-shard order is
  * (doc id, chunk idx), and greedy is a pure fold over that order — the
  * same (example_id, membership) on any cluster size, partitioning, or
  * retry, and restatable verbatim in an external SQL engine (the
  * q_packed_examples oracle runs it as a recursive CTE).
  */
object Packing {

  /** Per-chunk example assignment: input chunk rows (any extra columns
    * dropped) plus (split, shard, example_idx). Greedy rule per
    * (split, shard) group in (idCol, chunkIdxCol) order: a chunk joins
    * the current example unless that would push it past `tokenBudget`,
    * in which case it starts the next one. A single chunk larger than
    * the budget occupies an example alone (callers chunking with
    * chunkTokens ≤ tokenBudget never produce one). */
  def assignExamples(chunks: DataFrame, tokenBudget: Long,
      idCol: String = "doc_id", chunkIdxCol: String = "chunk_idx",
      nTokensCol: String = "n_chunk_tokens", splitCol: Option[String] = None,
      shardHexDigits: Int = 1, carryCols: Seq[String] = Nil): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    require(shardHexDigits >= 1 && shardHexDigits <= 8,
      s"shardHexDigits must be in [1, 8], got $shardHexDigits")
    val splitC = splitCol.map(col).getOrElse(lit("all"))
    // Validate token counts IN the projection: a null would otherwise
    // surface as an opaque executor NPE in the greedy pass, and a negative
    // count would silently corrupt packing (the running total could
    // decrease, overfilling examples past the budget).
    val nTok = col(nTokensCol).cast("long")
    val checkedTok = when(nTok.isNull.or(nTok < 0),
      raise_error(concat(
        lit(s"Packing: $nTokensCol must be non-null and >= 0, got "),
        coalesce(nTok.cast("string"), lit("null")),
        lit(s" for $idCol="), col(idCol).cast("string"))))
      .otherwise(nTok)
    // `carryCols` ride the shuffle untouched (APPENDED after the five
    // greedy-pass columns so the pass's positional reads stay fixed) —
    // the packExamples input_ids path carries each chunk's piece-id
    // array through to the example rollup without a second join.
    val base = chunks.select(Seq(
      splitC.cast("string").as("split"),
      substring(md5(col(idCol).cast("string")), 1, shardHexDigits).as("shard"),
      col(idCol),
      col(chunkIdxCol).cast("long").as(chunkIdxCol),
      checkedTok.as(nTokensCol)) ++ carryCols.map(col): _*)
    // hash-partition on (split, shard) so each group lands WHOLLY in one
    // task, then sort within partitions — the greedy pass below streams
    // group by group with constant state, no per-group buffering
    val arranged = base
      .repartition(Dedup.cpuParallelism(chunks), col("split"), col("shard"))
      .sortWithinPartitions(col("split"), col("shard"), col(idCol), col(chunkIdxCol))
    val outSchema = arranged.schema.add("example_idx", LongType, nullable = false)
    arranged.mapPartitions { it =>
      var curSplit: String = null
      var curShard: String = null
      var exIdx = 0L
      var tok = 0L
      it.map { r =>
        val sp = r.getString(0)
        val sh = r.getString(1)
        val n = r.getLong(4)
        if (sp != curSplit || sh != curShard) {
          curSplit = sp; curShard = sh; exIdx = 0L; tok = 0L
        }
        if (tok > 0 && tok + n > tokenBudget) { exIdx += 1; tok = 0L }
        tok += n
        Row.fromSeq(r.toSeq :+ exIdx)
      }
    }(Encoders.row(outSchema))
  }

  /** Example-level rollup of [[assignExamples]]: one row per packed
    * training example — (example_id, split, n_chunks, n_tokens,
    * fill_ratio, members, doc_starts) where `members` lists
    * "docId:chunkIdx" in pack order, `doc_starts` is the starting token
    * OFFSET of each packed member within the example's concatenated
    * stream ([0, n₀, n₀+n₁, …] — the attention-reset boundaries a
    * trainer derives position_ids and the block-diagonal mask from; a
    * cross-member attention leak is exactly what these offsets exist to
    * prevent), and `example_id` is the deterministic "split/shard/idx"
    * composite.
    *
    * `inputIds` (a Column over the input chunk rows yielding one
    * array<int> per chunk — e.g. [[Bpe.pieceIds]] over the BPE chunker's
    * `chunk_text`) adds an `input_ids` column: the member chunks' id
    * arrays concatenated in pack order — the tensor a trainer actually
    * consumes. The ids are computed BEFORE the packing shuffle and ride
    * it as a carried column (ints, roughly the size of the text they
    * replace), so the rollup needs no second join with the corpus. */
  def packExamples(chunks: DataFrame, tokenBudget: Long,
      idCol: String = "doc_id", chunkIdxCol: String = "chunk_idx",
      nTokensCol: String = "n_chunk_tokens", splitCol: Option[String] = None,
      shardHexDigits: Int = 1, inputIds: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val withIds = inputIds.fold(chunks)(c => chunks.withColumn("_piece_ids", c))
    val assigned = assignExamples(withIds, tokenBudget, idCol, chunkIdxCol,
      nTokensCol, splitCol, shardHexDigits,
      carryCols = if (inputIds.isDefined) Seq("_piece_ids") else Nil)
    // pack-order member token counts — one sorted struct list feeds the
    // boundary offsets below (same (idCol, chunkIdx) order as `members`)
    val sortedN = transform(
      array_sort(collect_list(struct(col(idCol), col(chunkIdxCol),
        col(nTokensCol).cast("long").as("_n")))),
      x => x.getField("_n"))
    val memberAggs = Seq(
      count(lit(1)).as("n_chunks"),
      sum(col(nTokensCol)).as("n_tokens"),
      array_join(
        transform(
          array_sort(collect_list(struct(col(idCol), col(chunkIdxCol)))),
          x => concat(x.getField(idCol).cast("string"), lit(":"),
            x.getField(chunkIdxCol).cast("string"))),
        ",").as("members"),
      // exclusive prefix sums of the member counts: [0, n0, n0+n1, …]
      slice(
        aggregate(sortedN, array(lit(0L)),
          (acc, n) => concat(acc, array(element_at(acc, -1) + n))),
        lit(1), size(sortedN)).as("doc_starts")) ++
      // pack order == (idCol, chunkIdx) order within the example (the
      // greedy pass assigns in exactly that sort); the struct prefix
      // makes array_sort reproduce it, then the id arrays flatten
      inputIds.map(_ => flatten(transform(
        array_sort(collect_list(struct(col(idCol), col(chunkIdxCol),
          col("_piece_ids")))),
        x => x.getField("_piece_ids"))).as("input_ids"))
    assigned
      .groupBy(col("split"), col("shard"), col("example_idx"))
      .agg(memberAggs.head, memberAggs.tail: _*)
      .select(Seq(
        concat_ws("/", col("split"), col("shard"), col("example_idx")).as("example_id"),
        col("split"),
        col("n_chunks"),
        col("n_tokens"),
        // long-to-double division is correctly rounded IEEE in both
        // engines — bit-identical cross-engine, unlike accumulated
        // float sums
        (col("n_tokens").cast("double") / lit(tokenBudget.toDouble)).as("fill_ratio"),
        col("members"),
        col("doc_starts")) ++
        inputIds.map(_ => col("input_ids")): _*)
  }
}
