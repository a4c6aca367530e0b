package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic MULTILINGUAL near-dup fixture — the corpus the `q_*_ml`
  * oracle queries run on (the LangProfiles.samples discipline: ONE Scala
  * source generates both the Spark frame and the DuckDB VALUES literal,
  * so the two engines read byte-identical text).
  *
  * Shape: per language a BASE document, a TWIN differing in one word (zh:
  * two characters) — shingle Jaccard ≈ 0.7–0.9, comfortably above the
  * 0.5 detection threshold with banding recall ≈ 1 − 1e-4 — and for
  * zh/ru/en an UNRELATED document (J ≈ 0 against everything). Under the
  * Latin tokenizer every non-Latin document here tokenizes EMPTY, so the
  * zh/ja/ru/ar twins are invisible — exactly the blindness the ml
  * tokenizer closes; the en twin doubles as the proof that ml and Latin
  * agree on ASCII. Texts avoid apostrophes/quotes so the SQL literal
  * needs no escaping (asserted). */
object MlFixture {

  /** (doc_id, lang, text). Twins are (base, base+1); ids are spaced so
    * id arithmetic never collides across languages. */
  val docs: Seq[(Long, String, String)] = Seq(
    (0L, "zh", "机器学习模型需要大量高质量训练数据来提升性能和泛化能力因此数据清洗与去重是整个流程中非常重要的一步"),
    (1L, "zh", "机器学习模型需要大量高质量训练数据来提升性能和泛化能力因此数据清洗与去重是整个流程中极其重要的一步"),
    (2L, "zh", "今天天气晴朗适合出门散步公园里的花都开了孩子们在草地上快乐地玩耍大家都很开心"),
    (10L, "ja", "これは機械学習のための文書でありたくさんのデータが必要です品質の高いデータはモデルの性能を大きく向上させます"),
    (11L, "ja", "これは機械学習のための文書でありたくさんのデータが必要です品質の高いデータはモデルの性能をさらに向上させます"),
    (20L, "ru", "машинное обучение требует огромного количества качественных данных для тренировки моделей и проверки их способности к обобщению на новых примерах"),
    (21L, "ru", "машинное обучение требует большого количества качественных данных для тренировки моделей и проверки их способности к обобщению на новых примерах"),
    (22L, "ru", "сегодня хорошая погода и дети играют в парке на зеленой траве под ярким солнцем все очень рады"),
    (30L, "ar", "التعلم الالي يحتاج الى كمية كبيرة من البيانات عالية الجودة لتدريب النماذج بشكل جيد والتحقق من قدرتها على التعميم"),
    (31L, "ar", "التعلم الالي يحتاج الى كمية ضخمة من البيانات عالية الجودة لتدريب النماذج بشكل جيد والتحقق من قدرتها على التعميم"),
    (40L, "en", "machine learning models need large amounts of high quality training data to improve performance and generalization across many different tasks"),
    (41L, "en", "machine learning models need huge amounts of high quality training data to improve performance and generalization across many different tasks"),
    (42L, "en", "the quick brown fox jumps over the lazy dog while the sun shines brightly on the quiet green meadow"))

  /** The twin pairs planted above — ground truth for specs. */
  val twinPairs: Seq[(Long, Long)] =
    Seq((0L, 1L), (10L, 11L), (20L, 21L), (30L, 31L), (40L, 41L))

  docs.foreach { case (_, _, t) =>
    require(!t.contains("'") && !t.contains("\\"),
      "MlFixture texts must need no SQL escaping")
  }

  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "lang", "text")
  }

  /** DuckDB VALUES literal of the SAME rows, for FROM-clause use:
    * `FROM ${MlFixture.sqlValues}`. */
  def sqlValues: String =
    docs.map { case (i, l, t) => s"($i, '$l', '$t')" }
      .mkString("(VALUES ", ", ", ") mlf(doc_id, lang, text)")

  /** QUALITY-GATE fixture (q_gopher_quality_ml): every natural document
    * tripled so it clears the 50-token Gopher floor, plus per-script
    * GARBAGE the gate must still drop — zh symbol spam, zh bullet spam,
    * pure digit spam, and an English word salad with no stopwords. The
    * per-script gate's contract in one table: natural zh/ja/ru/ar text
    * passes, garbage fails, each for the right flag. */
  val gateDocs: Seq[(Long, String)] =
    docs.map { case (i, _, t) => (i, s"$t $t $t") } ++ Seq(
      (900L, docs.head._3 + " " + Seq.fill(10)("###").mkString(" ")),
      (901L, Seq.fill(40)("- 项目条目").mkString("\n")),
      (902L, Seq.fill(60)("12345 67890").mkString(" ")),
      (903L, (1 to 60).map(i => s"word$i").mkString(" ")))

  /** VALUES literal of [[gateDocs]] (newlines rendered via chr(10) so
    * the SQL stays one line). */
  def gateSqlValues: String =
    gateDocs.map { case (i, t) =>
      s"($i, '${t.replace("\n", "' || chr(10) || '")}')"
    }.mkString("(VALUES ", ", ", ") gf(doc_id, text)")

  /** COMPOSED-PIPELINE fixture (q_corpus_pipeline_ml): [[gateDocs]] plus
    * an exact ML-content duplicate of the tripled zh base (id 500) so
    * the chain's exact rung has work under the ml fingerprint. The
    * benchmark side of the composed query is the unrelated zh/en docs
    * (ids 2 and 42 — clean untripled text). Expected end-to-end
    * survivors: 0, 10, 20, 22, 30, 40 — the garbage AND the stopword-
    * free en pangram (42) gate-dropped, 500 exact-deduped, twins
    * 1/11/21/31/41 near-deduped, the zh leak (2) decontaminated (42
    * would be a second decon hit had it passed the gate; the CJK hit is
    * the one the Latin tokenizer could never see). Verified stage by
    * stage by the oracle's DuckDB restatement. */
  val pipelineDocs: Seq[(Long, String)] =
    gateDocs ++ Seq((500L, gateDocs.head._2))

  /** VALUES literal of [[pipelineDocs]]. */
  def pipelineSqlValues: String =
    pipelineDocs.map { case (i, t) =>
      s"($i, '${t.replace("\n", "' || chr(10) || '")}')"
    }.mkString("(VALUES ", ", ", ") pf(doc_id, text)")

  // ── ALL-RUNGS fixture (q_corpus_pipeline_full, round 15) ───────────────
  // The composed chain's last coverage gap was cross-rung: ml tokenizer,
  // media dedup/decon, semantic-JL, and mix/pack each had a pairwise
  // variant but never ran in ONE config. This fixture extends
  // [[pipelineDocs]] with five ≥50-token natural-English docs that thread
  // the remaining rungs: a planted SEMANTIC twin pair (600/601 — lexically
  // unrelated topics, embeddings nearly parallel, so only the embedding
  // rung can collapse them), a planted IMAGE near-dup pair (700/701 carry
  // ImageFixture PNGs 3/4 — one triple's base+edit), and a planted
  // BENCHMARK-IMAGE carrier (702 carries PNG 7, the near-dup of benchmark
  // image 6). Every doc gets a deterministic 64-dim embedding literal
  // ([[fullEmbedding]]) and a mix stratum `source = 'src' || id % 3`.

  /** The five full-variant texts. Each ≥ 50 whitespace tokens (the Gopher
    * floor), stopword-bearing English, distinct topics (trigram Jaccard
    * ≈ 0 pairwise and against [[gateDocs]]), no 8-token run shared with
    * the benchmark docs, and no quote/backslash characters (asserted). */
  val fullExtraDocs: Seq[(Long, String)] = Seq(
    (600L, "the old garden behind our house has many kinds of vegetables " +
      "and fruit trees that we planted over several years and every " +
      "morning before work i water the tomato beds pull small weeds from " +
      "the dark soil check the apple branches for insects and collect " +
      "ripe beans for the kitchen table while the birds sing"),
    (601L, "we walked along the rocky mountain trail for six hours until " +
      "the narrow path opened onto a wide green valley where a cold " +
      "river ran between tall pine trees and we rested near the water " +
      "eating bread with cheese while clouds moved slowly across the " +
      "bright afternoon sky before the long climb back down"),
    (700L, "to prepare this simple soup you first chop two large onions " +
      "and three carrots then fry them gently in olive oil with a " +
      "little salt until they turn soft before adding red lentils some " +
      "vegetable stock and a spoon of cumin and letting the pot simmer " +
      "for half an hour while you stir now and then"),
    (701L, "the small wooden boat left the harbor at dawn with four crew " +
      "members aboard and sailed north along the coast past white " +
      "cliffs and quiet fishing villages while the captain watched the " +
      "wind change direction and adjusted the sails so they could reach " +
      "the island before the evening tide turned against them"),
    (702L, "last night we carried the telescope up the hill behind the " +
      "school and pointed it at the planets for two hours watching the " +
      "rings of saturn and the bright moons of jupiter while the " +
      "teacher explained how light from distant stars travels for many " +
      "years before it ever reaches our small waiting eyes"))

  fullExtraDocs.foreach { case (i, t) =>
    require(!t.contains("'") && !t.contains("\\"),
      s"full-fixture doc $i must need no SQL escaping")
    require(t.split("\\s+").length >= 50,
      s"full-fixture doc $i must clear the 50-token Gopher floor")
  }

  /** The q_corpus_pipeline_full corpus: [[pipelineDocs]] + the five
    * rung-threading docs above. */
  val fullDocs: Seq[(Long, String)] = pipelineDocs ++ fullExtraDocs

  /** VALUES literal of [[fullDocs]]. */
  def fullSqlValues: String =
    fullDocs.map { case (i, t) =>
      s"($i, '${t.replace("\n", "' || chr(10) || '")}')"
    }.mkString("(VALUES ", ", ", ") ff(doc_id, text)")

  /** doc → ImageFixture media id for the full variant's payload carriers.
    * (3, 4) are one fixture triple's base + near-dup edit (the image rung
    * collapses 701 into 700); 7 is the near-dup of benchmark image 6 (the
    * media-decon rung drops 702). Monotonic in doc id so media-id pair
    * order and doc-id pair order agree. */
  val fullMediaAttach: Seq[(Long, Long)] = Seq((700L, 3L), (701L, 4L), (702L, 7L))

  /** The frozen benchmark image ids the full variant's media-decon rung
    * probes against. */
  val fullBenchImageIds: Seq[Long] = Seq(6L)

  /** Deterministic 64-dim embedding for full-fixture doc `id` — the
    * jlproject avalanche mix mapped to [-1, 1] (exact small rationals
    * n/1000, so the SQL literal round-trips bit-exactly). Docs 600/601
    * are the planted SEMANTIC pair: both sit on a cone tight around
    * frozen coarse centroid 0 (assignment is unambiguous in raw AND
    * JL-projected space) with cosine(600, 601) ≈ 0.999; every other
    * pair of fixture embeddings is near-orthogonal (≪ the 0.9 cut). */
  def fullEmbedding(id: Long): Array[Double] = {
    // the ONE avalanche-mix copy (ADVICE r15: ScaleProfile's cosine
    // corpus shares the exact generator, so the two cannot drift)
    def mix(a: Long, d: Int, seed: Int): Double =
      graft.functions.VectorSimUtil.mixUnit(a, d, seed)
    if (id == 600L || id == 601L)
      Array.tabulate(64) { d =>
        FrozenAnn.coarse(0)._2(d).toDouble * 10.0 +
          0.05 * mix(600L, d, 0) +
          (if (id == 601L) 0.02 * (if (mix(601L, d, 0x7f4a7c15) >= 0) 1.0 else -1.0)
           else 0.0)
      }
    else Array.tabulate(64)(d => mix(id, d, 0))
  }

  /** VALUES literal `fe(doc_id, v)` of every [[fullDocs]] embedding. */
  def fullEmbSqlValues: String =
    fullDocs.map { case (i, _) =>
      s"($i, ${fullEmbedding(i).mkString("[", ",", "]")}::DOUBLE[])"
    }.mkString("(VALUES ", ", ", ") fe(doc_id, v)")
}
