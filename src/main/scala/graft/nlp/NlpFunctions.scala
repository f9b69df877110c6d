package graft.nlp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The rebuild's NLP surface (SURVEY.md §2.5: X1 sentiment, X2 entity
 * sentiment, X3 classification) as **pure Catalyst column expressions** —
 * composed exclusively from `org.apache.spark.sql.functions._` higher-order
 * and collection functions, so every scorer stays inside whole-stage
 * codegen, needs no UDF/serialization round-trip, ships no closures to
 * executors, and is replayable in ANSI SQL by the DuckDB oracle
 * (see [[graft.oracle.OracleSql]]).
 *
 * Scoring spec (the determinism contract shared with the oracle):
 *  - tokens(text)   = non-empty runs of letters in lower(text)
 *  - sv             = Σ valence(token)        (integer, 0 for no hits)
 *  - sav            = Σ |valence(token)|      (integer)
 *  - n              = count of lexicon-matched tokens
 *  - score          = sv / (5·n)              (0 when n = 0) ∈ [-1, 1]
 *  - magnitude      = sav / 5
 *  - mood value     = score · magnitude       (SentimentAnalysis.scala:252)
 *
 * All real-valued results are emitted as **micro-units**: BIGINT
 * round(x · 1e6). Integer outputs make the oracle hash comparison immune to
 * floating-point summation-order differences between Spark and DuckDB —
 * every cross-row aggregation in the engine then happens in exact integer
 * arithmetic. The single double-precision division above is bit-identical
 * in both engines (IEEE-754 ops on identical operands).
 */
object NlpFunctions {

  val MICRO = 1000000.0

  /** Lowercased letter-run tokens of `text` (array<string>, no empties).
    * Implemented as regexp_extract_all of maximal [a-z] runs — identical
    * to split-on-non-letters with empties dropped, but a plain codegen
    * expression where the filter(split(...)) higher-order form would be
    * CodegenFallback and knock its whole Project out of whole-stage
    * codegen. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  private val valenceMap: Column =
    typedLit(Lexicons.valence.toMap)

  /** Σ valence over tokens (missing words count 0). */
  def valenceSum(toks: Column): Column =
    aggregate(toks, lit(0),
      (acc, t) => acc + coalesce(element_at(valenceMap, t), lit(0)))

  /** Σ |valence| over tokens. */
  def absValenceSum(toks: Column): Column =
    aggregate(toks, lit(0),
      (acc, t) => acc + abs(coalesce(element_at(valenceMap, t), lit(0))))

  /** Count of lexicon-matched tokens. */
  def matchedCount(toks: Column): Column =
    aggregate(toks, lit(0),
      (acc, t) => acc + when(element_at(valenceMap, t).isNotNull, lit(1))
        .otherwise(lit(0)))

  /** score · 1e6 as BIGINT; 0 when no token matched. X1 batch twin
    * (SentimentAnalysis.scala:231-240). */
  def scoreMicro(sv: Column, n: Column): Column =
    when(n === 0, lit(0L)).otherwise(
      round(sv.cast("double") / (lit(5.0) * n) * lit(MICRO)).cast("long"))

  /** magnitude · 1e6 as BIGINT — sav/5 · 1e6 = sav · 200000, exact. */
  def magnitudeMicro(sav: Column): Column =
    (sav.cast("long") * lit(200000L))

  /** mood value (score·magnitude, SentimentAnalysis.scala:252) · 1e6 as
    * BIGINT. Parenthesization mirrors the oracle SQL exactly:
    * ((sv/(5·n)) · (sav/5)) · 1e6. */
  def moodMicro(sv: Column, sav: Column, n: Column): Column =
    when(n === 0, lit(0L)).otherwise(
      round((sv.cast("double") / (lit(5.0) * n)) *
            (sav.cast("double") / lit(5.0)) * lit(MICRO)).cast("long"))

  private val entityList: Column = typedLit(Lexicons.entityTerms)

  /** X2 batch twin (SentimentAnalysis.scala:62-93): entity mentions =
    * lowercased capitalized tokens of the original text ++ lexicon-NER
    * tokens. Per-mention; callers group to distinct keys and derive
    * salience = mentions(key) / total mentions. */
  def entityMentions(text: Column, toks: Column): Column =
    concat(
      transform(regexp_extract_all(text, lit("[A-Z][a-z]+"), lit(0)),
        m => lower(m)),
      filter(toks, t => array_contains(entityList, t)))

  /** X3 batch twin (SentimentAnalysis.scala:126-148): array of
    * struct(category, conf_micro) for categories with ≥1 keyword hit;
    * confidence = hits / |tokens|. The ≥25-word guard
    * (SentimentAnalysis.scala:129, split on single space) is applied by
    * the caller so that under-guard rows keep an *empty* list rather than
    * being dropped, exactly like the reference. */
  def categoriesArr(toks: Column): Column = {
    val perCat = Lexicons.categoryKeywords.map { case (name, kws) =>
      val kwArr = typedLit(kws)
      val hits = aggregate(toks, lit(0),
        (acc, t) => acc + when(array_contains(kwArr, t), lit(1))
          .otherwise(lit(0)))
      struct(lit(name).as("category"), hits.as("hits"))
    }
    val all = array(perCat: _*)
    val nTok = size(toks)
    transform(
      filter(all, c => c.getField("hits") > 0),
      c => struct(
        c.getField("category").as("category"),
        round(c.getField("hits").cast("double") / nTok.cast("double") *
          lit(MICRO)).cast("long").as("conf_micro")))
  }

  /** Reference word count: split on a single space with Java `split`
    * semantics (SentimentAnalysis.scala:129) — NOT the letter-run
    * tokenizer. Java's `split(" ")` drops TRAILING empty fields (keeps
    * interior ones), returns [""] for "" and [] for all-space input;
    * mirrored exactly here and in the oracle SQL. */
  def refWordCount(text: Column): Column = {
    // \z (end of input), NOT $ — Java's $ also matches before a final
    // newline, which would strip "a \n" to "a\n" and diverge from both
    // Java split semantics and the oracle's RE2 (where $ = end of text).
    val trimmed = regexp_replace(text, " +\\z", "")
    when(length(text) === 0, lit(1))
      .when(length(trimmed) === 0, lit(0))
      .otherwise(size(split(trimmed, " ")))
  }
}
