package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GraftFunctions, Tok}

/** BM25 ranked retrieval over a document corpus (Robertson et al., the
  * Okapi BM25 weighting; the `1 + ·` idf form that stays non-negative
  * for terms appearing in most documents) — the targeted-curation
  * counterpart of [[Dsir]]: given a handful of query terms describing a
  * target domain, surface the k most on-topic documents.
  *
  * Spark-first shape, NO inverted index and NO explode: per-term
  * term-frequencies are narrow array expressions over the normalized
  * token stream (`size(filter(tokens, _ = term))`), so the plan is
  *  - ONE aggregation pass for the corpus statistics (N, total tokens,
  *    per-term document frequencies — |Q|+2 driver scalars), then
  *  - ONE narrow codegen'd scoring projection (idf and avgdl travel as
  *    plan literals) topped by a per-partition top-k heap + driver
  *    merge (`TakeOrderedAndProject` — no global sort, no shuffle).
  * At 100 TB that is two scans and zero exchanges — strictly cheaper
  * than building the inverted index a dedicated engine would use, for
  * the few-terms/top-k query shape this operator serves.
  *
  * Engine-parity discipline: every per-term score is a product/quotient
  * chain over EXACT-integer-derived doubles in a fixed operation order,
  * quantized to DECIMAL(25,9) before the (exact) per-document sum — the
  * repo's ln/float contract, so the DuckDB restatement
  * ([[bm25OracleSql]], generated from the same constants) agrees on the
  * ranked set. */
object Retrieval {

  /** Corpus statistics one BM25 pass needs: document count, total token
    * count, per-query-term document frequency (aligned with the terms
    * seq passed to [[bm25Stats]]). */
  case class Bm25Stats(nDocs: Long, totalTokens: Long, docFreq: Seq[Long])

  /** Normalize query terms under the tokenizer's rule (Locale.ROOT
    * lowercase, non-[a-z0-9] → space) and require each to stay a single
    * token — a multi-token "term" would silently never match
    * ([[graft.functions.TextAnalysis.containsBlockedWord]]'s contract). */
  private def normTerms(terms: Seq[String], tok: Tok = Tok.Latin): Seq[String] = {
    require(terms.nonEmpty, "bm25: empty query")
    // terms normalize through the SAME kernel the document stream uses
    // (driver-side call — agreement by construction; under Tok.Ml a
    // Cyrillic/Arabic term stays matchable instead of normalizing away)
    val normed = terms.map { t =>
      val ts = (tok match {
        case Tok.Ml => graft.functions.ShingleUtil.normTokensMl(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        case _ => graft.functions.ShingleUtil.normTokens(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
      }).toSeq.map(_.toString)
      require(ts.length == 1,
        s"bm25: query term '$t' normalizes to [${ts.mkString(" ")}] — " +
          "not a single token")
      ts.head
    }
    require(normed.distinct.size == normed.size,
      s"bm25: duplicate query terms after normalization: $normed")
    normed
  }

  /** The stats aggregation as a one-row frame — split out so its plan is
    * spec-auditable. Tokenize-once discipline (the scoring pass's own
    * fix, applied to the stats pass): the token array materializes in a
    * projection UNDER the aggregate and every aggregate expression
    * references the alias — referencing the kernel inline in the |Q|+1
    * aggregates would re-tokenize the full text once per term
    * (RetrievalSpec pins exactly ONE kernel call in the executed plan). */
  private[operators] def bm25StatsFrame(df: DataFrame, textCol: String,
      q: Seq[String], tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val withToks = df.select(
      tok.tokens(col(textCol)).as("_toks"))
    val dfAggs = q.zipWithIndex.map { case (t, i) =>
      sum(array_contains(col("_toks"), t).cast("long")).as(s"df_$i")
    }
    val aggCols = Seq(count(lit(1)).as("n"),
      sum(size(col("_toks"))).as("tot")) ++ dfAggs
    withToks.agg(aggCols.head, aggCols.tail: _*)
  }

  /** ONE aggregation pass → |terms|+2 driver scalars. */
  def bm25Stats(df: DataFrame, textCol: String, terms: Seq[String],
      tok: Tok = Tok.Latin): Bm25Stats = {
    val q = normTerms(terms, tok)
    val row = bm25StatsFrame(df, textCol, q, tok).first()
    // sum() over zero rows (or all-null texts) returns null — fail loudly
    // instead of an opaque NPE on unboxing, per the family convention
    require(row.getLong(0) > 0 && !row.isNullAt(1) && row.getLong(1) > 0,
      s"bm25: empty corpus (docs=${row.getLong(0)}, " +
        s"tokens=${if (row.isNullAt(1)) 0L else row.getLong(1)}) — " +
        "stats need at least one tokenizable document")
    Bm25Stats(row.getLong(0), row.getLong(1),
      q.indices.map(i => row.getLong(2 + i)))
  }

  /** Per-term idf under the non-negative `ln(1 + (N−df+0.5)/(df+0.5))`
    * form — computed from exact longs in a fixed op order, so the SQL
    * restatement's `ln` sees the bit-identical operand. */
  private def idf(stats: Bm25Stats): Seq[Double] =
    stats.docFreq.map { dft =>
      math.log(1.0 + ((stats.nDocs - dft) + 0.5) / (dft + 0.5))
    }

  /** All per-document scores: (idCol, score). One narrow projection —
    * [[bm25TopK]] is the usual entry point; this is the building block
    * (e.g. to threshold instead of top-k). */
  def bm25ScoreAll(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], stats: Bm25Stats,
      k1: Double = 1.2, b: Double = 0.75, tok: Tok = Tok.Latin): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val q = normTerms(terms, tok)
    require(stats.docFreq.size == q.size,
      s"bm25: stats carry ${stats.docFreq.size} docFreqs for ${q.size} terms")
    // materialize the token array ONCE per row in its own projection —
    // referencing the kernel |Q|+… times inline would re-tokenize the
    // full text per term (CollapseProject keeps the split: the alias is
    // multiply-referenced and non-cheap)
    val withToks = df.select(col(idCol),
      tok.tokens(col(textCol)).as("_bm25_toks"))
    val toks = col("_bm25_toks")
    val dl = size(toks).cast("double")
    val avgdl = stats.totalTokens.toDouble / stats.nDocs.toDouble
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val perTerm = q.zip(idf(stats)).map { case (t, w) =>
      val tf = size(filter(toks, x => x === lit(t))).cast("double")
      (lit(w) * ((tf * lit(k1p1)) /
        (tf + lit(k1) * (lit(oneMinusB) + lit(b) * (dl / lit(avgdl))))))
        .cast(DecimalType(25, 9))
    }
    withToks.select(col(idCol),
      perTerm.reduce(_ + _).cast("double").as("score"))
  }

  /** The k best-matching documents for the query: (idCol, score), ties
    * broken by id. Two corpus passes, zero shuffles (see object doc). */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, tok: Tok = Tok.Latin): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val stats = bm25Stats(df, textCol, terms, tok)
    bm25ScoreAll(df, textCol, idCol, terms, stats, k1, b, tok)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB restatement of [[bm25TopK]] over the `documents` table —
    * generated from the SAME term list and constants (the
    * QmOracle/DsirOracle no-drift pattern); stats are recomputed in SQL
    * from the same exact integers, so idf/avgdl see bit-identical
    * operands and the DECIMAL(25,9) per-term quantization absorbs any
    * last-ulp `ln` divergence. */
  def bm25OracleSql(terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val q = normTerms(terms)
    q.foreach(t => require(!t.contains("'"), s"term not SQL-safe: $t"))
    def d(x: Double): String = java.lang.Double.toString(x)
    val dfSel = q.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(t, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
    }.mkString(", ")
    val perTerm = q.zipWithIndex.map { case (t, i) =>
      s"CAST(ln(1.0 + ((st.n - st.df_$i) + 0.5) / (st.df_$i + 0.5)) * " +
        s"((tf.tf_$i * ${d(k1 + 1.0)}) / " +
        s"(tf.tf_$i + ${d(k1)} * (${d(1.0 - b)} + ${d(b)} * (tf.dl / st.avgdl)))) " +
        "AS DECIMAL(25,9))"
    }.mkString(" + ")
    val tfSel = q.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) AS tf_$i"
    }.mkString(", ")
    "WITH tk AS (SELECT doc_id, list_filter(regexp_split_to_array(trim(" +
      "regexp_replace(lower(text),'[^a-z0-9]+',' ','g')),'\\s+'), x -> x <> '') AS t FROM documents), " +
      s"st AS (SELECT count(*) AS n, $dfSel, " +
      "CAST(CAST(sum(len(t)) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM tk), " +
      s"tf AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, $tfSel FROM tk) " +
      s"SELECT tf.doc_id AS doc_id, CAST($perTerm AS DOUBLE) AS score " +
      s"FROM tf, st ORDER BY score DESC, doc_id LIMIT $k"
  }
}
