package graft.oracle

import graft.nlp.Lexicons

/**
 * DuckDB oracle SQL for every driver-checked query — the exact relational
 * mirror of [[graft.pipeline.ParityQueries]] (and of the training-data
 * queries in [[graft.pipeline.DataOps]]), sharing the same lexicons via
 * inline VALUES CTEs ([[graft.nlp.Lexicons]]).
 *
 * Determinism contract with the Spark side:
 *  - every real-valued output is a micro-unit BIGINT (round(x·1e6)) whose
 *    floating-point sub-expression is written with the *same operand order
 *    and parenthesization* in both engines;
 *  - every cross-row aggregation runs on exact integers (DuckDB HUGEINT
 *    sums are CAST back to BIGINT in the output, since the driver's
 *    pandas conversion would otherwise widen them to float);
 *  - window starts are integer seconds relative to the stream epoch.
 */
object OracleSql {

  private val MIC = "1000000.0"

  /** Message-stream derivation, mirror of [[graft.sources.Messages]]:
    * tsec advances 6 s per 3-doc bucket; user count scales with the data
    * (one user per 64 buckets, floor 3). */
  val msgsCte: String =
    """msgs AS (
      |  SELECT doc_id AS seq,
      |         (doc_id // 3) * 6 AS tsec,
      |         'ch' || CAST(((doc_id // 3) % 4) AS VARCHAR) AS channel,
      |         'u'  || CAST(((doc_id // 3) % GREATEST(3, (((SELECT MAX(doc_id) FROM documents) // 3) + 1) // 64)) AS VARCHAR) AS username,
      |         text
      |  FROM documents
      |)""".stripMargin

  /** W1: 1 s tumbling concat (width 1 ⇒ wsec = tsec). */
  val w1Cte: String =
    """w1 AS (
      |  SELECT tsec AS wsec, channel, username,
      |         string_agg(text, chr(10) ORDER BY seq) AS text
      |  FROM msgs GROUP BY 1, 2, 3
      |)""".stripMargin

  /** Tokenize a CTE named `src` (cols: the given key cols + text) into
    * (keyCols..., t). */
  private def tokCte(name: String, src: String, keyCols: String): String =
    s"""$name AS (
       |  SELECT $keyCols, t FROM (
       |    SELECT $keyCols,
       |           unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
       |    FROM $src) u
       |  WHERE t <> ''
       |)""".stripMargin

  /** Document sentiment of CTE `src` keyed by `keyCols`:
    * (keyCols..., sv, sav, n, score_micro, mag_micro, mood_micro). */
  private def sentCte(name: String, src: String, keyCols: String): String = {
    val onClause = keyCols.split(",\\s*")
      .map(k => s"w.$k = t.$k").mkString(" AND ")
    val wKeys = keyCols.split(",\\s*").map("w." + _).mkString(", ")
    s"""${tokCte(name + "_tok", src, keyCols)},
       |${name}_agg AS (
       |  SELECT $wKeys,
       |         COALESCE(SUM(l.v), 0) AS sv,
       |         COALESCE(SUM(ABS(l.v)), 0) AS sav,
       |         COUNT(l.v) AS n
       |  FROM $src w
       |  LEFT JOIN ${name}_tok t ON $onClause
       |  LEFT JOIN lex l ON t.t = l.word
       |  GROUP BY $wKeys
       |),
       |$name AS (
       |  SELECT $keyCols,
       |    CASE WHEN n = 0 THEN 0 ELSE
       |      CAST(ROUND(CAST(sv AS DOUBLE) / (5.0 * n) * $MIC) AS BIGINT)
       |    END AS score_micro,
       |    CAST(sav * 200000 AS BIGINT) AS mag_micro,
       |    CASE WHEN n = 0 THEN 0 ELSE
       |      CAST(ROUND((CAST(sv AS DOUBLE) / (5.0 * n)) *
       |                 (CAST(sav AS DOUBLE) / 5.0) * $MIC) AS BIGINT)
       |    END AS mood_micro
       |  FROM ${name}_agg
       |)""".stripMargin
  }

  private def withLex(ctes: String*): String =
    s"WITH ${Lexicons.valenceCte},\n" + ctes.mkString(",\n")

  /** sentiment columns joined onto W1 rows. */
  private val sentW1: String =
    withLex(msgsCte, w1Cte, sentCte("sent", "w1", "wsec, channel, username"))

  /** Entity rows: one per (W1 row, key), with mentions m, total totm and
    * the document's sentiment/mood. Mirror of ParityQueries.entityRows. */
  private val entityCtes: String = {
    s"""$msgsCte,
       |$w1Cte,
       |${sentCte("sent", "w1", "wsec, channel, username")},
       |entm AS (
       |  SELECT wsec, channel, username, unnest(list_concat(
       |    list_transform(regexp_extract_all(text, '[A-Z][a-z]+'),
       |                   x -> lower(x)),
       |    list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                x -> x <> '' AND
       |                     list_contains(${Lexicons.entityListSql}, x))
       |  )) AS key
       |  FROM w1
       |),
       |entg AS (
       |  SELECT wsec, channel, username, key, COUNT(*) AS m
       |  FROM entm GROUP BY 1, 2, 3, 4
       |),
       |ent AS (
       |  SELECT e.wsec, e.channel, e.username, e.key, e.m,
       |         SUM(e.m) OVER (PARTITION BY e.wsec, e.channel, e.username)
       |           AS totm,
       |         s.score_micro, s.mag_micro, s.mood_micro
       |  FROM entg e
       |  JOIN sent s ON e.wsec = s.wsec AND e.channel = s.channel
       |             AND e.username = s.username
       |)""".stripMargin
  }

  /** W2 100 s re-window + its sentiment + category rows (guard ≥ 25 words
    * split on single space; confidence = hits / |tokens|). */
  private val categoryCtes: String = {
    s"""$msgsCte,
       |$w1Cte,
       |w2 AS (
       |  SELECT (wsec // 100) * 100 AS w2sec, channel, username,
       |         string_agg(text, chr(10) ORDER BY wsec) AS text
       |  FROM w1 GROUP BY 1, 2, 3
       |),
       |${sentCte("sent2", "w2", "w2sec, channel, username")},
       |w2g AS (
       |  -- Java split(" ") word count: trailing empties dropped,
       |  -- "" -> 1, all-space -> 0 (mirror of NlpFunctions.refWordCount)
       |  SELECT * FROM w2 WHERE
       |    CASE WHEN length(text) = 0 THEN 1
       |         WHEN length(regexp_replace(text, ' +$$', '')) = 0 THEN 0
       |         ELSE len(string_split(regexp_replace(text, ' +$$', ''), ' '))
       |    END >= 25
       |),
       |${tokCte("tok2", "w2g", "w2sec, channel, username")},
       |ntok AS (
       |  SELECT w2sec, channel, username, COUNT(*) AS nt
       |  FROM tok2 GROUP BY 1, 2, 3
       |),
       |cathit AS (
       |  SELECT t.w2sec, t.channel, t.username, c.category,
       |         COUNT(*) AS hits
       |  FROM tok2 t JOIN cat c ON t.t = c.word
       |  GROUP BY 1, 2, 3, 4
       |),
       |catrow AS (
       |  SELECT h.w2sec, h.channel, h.username, h.category,
       |    CAST(ROUND(CAST(h.hits AS DOUBLE) / CAST(n.nt AS DOUBLE) * $MIC)
       |         AS BIGINT) AS conf_micro,
       |    s.score_micro, s.mag_micro, s.mood_micro
       |  FROM cathit h
       |  JOIN ntok n ON h.w2sec = n.w2sec AND h.channel = n.channel
       |             AND h.username = n.username
       |  JOIN sent2 s ON h.w2sec = s.w2sec AND h.channel = s.channel
       |              AND h.username = s.username
       |)""".stripMargin
  }

  /** Running user mood (W4 twin). */
  private val userMoodCtes: String =
    s"""$msgsCte,
       |$w1Cte,
       |${sentCte("sent", "w1", "wsec, channel, username")},
       |urun AS (
       |  SELECT username AS key, wsec,
       |         CAST(SUM(mood_micro) OVER (PARTITION BY username
       |           ORDER BY wsec, channel ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS BIGINT) AS run_micro
       |  FROM sent
       |)""".stripMargin

  /** W7 entity opinion (30 s tumbling mood sum per entity key). */
  private val w7Ctes: String =
    s"""$entityCtes,
       |w7 AS (
       |  SELECT (wsec // 30) * 30 AS w7sec, key,
       |         CAST(SUM(mood_micro) AS BIGINT) AS mood_micro
       |  FROM ent GROUP BY 1, 2
       |)""".stripMargin

  /** Count-window toxicity over CTE `src` (cols key, ordCol, valCol).
    * The value column joins the ORDER BY as the final tie-break (mirror
    * of ParityQueries.w8*): rows tied on (key, ord) then order by value,
    * and fully tied rows are interchangeable for every window sum. */
  private def toxicSql(ctes: String, src: String, ordCol: String,
      valCol: String, n: Int, thrMicro: Long): String =
    s"""$ctes,
       |rn AS (
       |  SELECT key, $valCol AS v,
       |         ROW_NUMBER() OVER (PARTITION BY key
       |           ORDER BY $ordCol, $valCol) AS rn
       |  FROM $src
       |)
       |SELECT key, (rn - 1) // $n AS grp,
       |       CAST(SUM(v) AS BIGINT) AS mood_micro
       |FROM rn GROUP BY 1, 2
       |HAVING COUNT(*) = $n AND SUM(v) <= $thrMicro""".stripMargin

  // ---------------------------------------------------------------
  // Public query → SQL map (keys match SparkEntry.queries)
  // ---------------------------------------------------------------

  val r1Parse: String =
    s"""WITH $msgsCte,
       |lines AS (
       |  -- Java split(",") drops trailing empty fields: strip trailing
       |  -- commas before the limit-3 parse (mirror of ParityQueries.r1Parse)
       |  SELECT seq, rtrim(channel || ',' || username || ',' ||
       |         replace(text, ' the ', ', the '), ',') AS line
       |  FROM msgs
       |)
       |SELECT seq,
       |       split_part(line, ',', 1) AS channel,
       |       split_part(line, ',', 2) AS username,
       |       regexp_replace(line, '^[^,]*,[^,]*,?', '') AS text
       |FROM lines""".stripMargin

  val w1Concat: String =
    s"WITH $msgsCte,\n$w1Cte\nSELECT wsec, channel, username, text FROM w1"

  val w2Concat: String =
    s"""WITH $msgsCte,
       |$w1Cte
       |SELECT (wsec // 100) * 100 AS w2sec, channel, username,
       |       string_agg(text, chr(10) ORDER BY wsec) AS text
       |FROM w1 GROUP BY 1, 2, 3""".stripMargin

  val x1Sentiment: String =
    s"""$sentW1
       |SELECT wsec, channel, username, score_micro, mag_micro
       |FROM sent""".stripMargin

  /** Trained-model sentiment tier mirror
    * ([[graft.nlp.MlSentiment.x1SentimentMl]]): same lexicon labels,
    * same tokenization, same parts-per-billion Laplace class rates with
    * truncating integer division (`//` here, `div` in Spark — identical
    * on the non-negative operands), same sign rule. All-integer, so the
    * trained model's every prediction replays bit-for-bit. */
  val x1SentimentMl: String =
    s"""$sentW1,
       |lbl AS (
       |  SELECT w.wsec, w.channel, w.username, w.text,
       |         CASE WHEN s.score_micro > 0 THEN 1 ELSE 0 END AS label
       |  FROM w1 w JOIN sent s ON w.wsec = s.wsec AND w.channel = s.channel
       |                        AND w.username = s.username
       |),
       |${tokCte("mtok", "lbl", "wsec, channel, username, label")},
       |cls AS (
       |  SELECT t, SUM(label) AS cpos, SUM(1 - label) AS cneg
       |  FROM mtok GROUP BY 1
       |),
       |tot AS (
       |  SELECT SUM(cpos) AS npos, SUM(cneg) AS nneg, COUNT(*) AS v FROM cls
       |),
       |wts AS (
       |  SELECT t,
       |         (CAST(cpos + 1 AS HUGEINT) * 1000000000) // (npos + v)
       |       - (CAST(cneg + 1 AS HUGEINT) * 1000000000) // (nneg + v) AS w
       |  FROM cls CROSS JOIN tot
       |),
       |sc AS (
       |  SELECT m.wsec, m.channel, m.username, SUM(w.w) AS score
       |  FROM mtok m JOIN wts w ON m.t = w.t
       |  GROUP BY 1, 2, 3
       |)
       |SELECT b.wsec, b.channel, b.username,
       |       CAST(CASE WHEN COALESCE(s.score, 0) > 0 THEN 1 ELSE 0 END
       |         AS BIGINT) AS pred_pos
       |FROM w1 b LEFT JOIN sc s ON b.wsec = s.wsec AND b.channel = s.channel
       |                         AND b.username = s.username""".stripMargin

  val x2Entities: String =
    s"""WITH ${Lexicons.valenceCte},
       |$entityCtes
       |SELECT wsec, channel, username, key,
       |       CAST(ROUND(CAST(m AS DOUBLE) / CAST(totm AS DOUBLE) * $MIC)
       |            AS BIGINT) AS salience_micro,
       |       score_micro, mag_micro
       |FROM ent""".stripMargin

  val w3EntityCount: String =
    s"""WITH ${Lexicons.valenceCte},
       |$entityCtes
       |SELECT (wsec // 10) * 10 AS w3sec, key, COUNT(*) AS cnt
       |FROM ent GROUP BY 1, 2""".stripMargin

  val trending: String =
    s"""WITH ${Lexicons.valenceCte},
       |$entityCtes,
       |w3 AS (
       |  SELECT (wsec // 10) * 10 AS w3sec, key, COUNT(*) AS cnt
       |  FROM ent GROUP BY 1, 2
       |)
       |SELECT w3sec, key, cnt,
       |       CAST(ROUND(CAST(cnt AS DOUBLE) /
       |         CAST(SUM(cnt) OVER (PARTITION BY w3sec) AS DOUBLE) * $MIC)
       |         AS BIGINT) AS pct_micro
       |FROM w3""".stripMargin

  val x3Categories: String =
    s"""WITH ${Lexicons.valenceCte},
       |${Lexicons.categoryCte},
       |$categoryCtes
       |SELECT w2sec, channel, username, category, conf_micro
       |FROM catrow""".stripMargin

  val r6CategorySentiment: String =
    s"""WITH ${Lexicons.valenceCte},
       |${Lexicons.categoryCte},
       |$categoryCtes
       |SELECT w2sec, channel, username, category, conf_micro,
       |       score_micro, mag_micro
       |FROM catrow""".stripMargin

  val r7MoodUser: String =
    s"""$sentW1
       |SELECT wsec, username AS key, mood_micro FROM sent""".stripMargin

  val w4UserMoodRunning: String =
    s"""WITH ${Lexicons.valenceCte},
       |$userMoodCtes
       |SELECT key, wsec, run_micro FROM urun""".stripMargin

  val w5ChannelMoodSliding: String =
    s"""$sentW1,
       |cand AS (
       |  SELECT channel AS key, mood_micro, (wsec // 60) * 60 AS wstart
       |  FROM sent
       |  UNION ALL
       |  SELECT channel AS key, mood_micro, (wsec // 60) * 60 - 60
       |  FROM sent WHERE wsec % 60 < 30
       |)
       |SELECT wstart, key, CAST(SUM(mood_micro) AS BIGINT) AS mood_micro
       |FROM cand GROUP BY 1, 2""".stripMargin

  val w6CategoryOpinion: String =
    s"""WITH ${Lexicons.valenceCte},
       |${Lexicons.categoryCte},
       |$categoryCtes
       |SELECT category AS key, w2sec, channel, username,
       |       CAST(SUM(mood_micro) OVER (PARTITION BY category
       |         ORDER BY w2sec, channel, username
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS run_micro
       |FROM catrow""".stripMargin

  val w7EntityOpinion: String =
    s"""WITH ${Lexicons.valenceCte},
       |$w7Ctes
       |SELECT w7sec, key, mood_micro FROM w7""".stripMargin

  val w8ToxicUser: String =
    toxicSql(s"WITH ${Lexicons.valenceCte},\n$userMoodCtes", "urun",
      "wsec", "run_micro", 10, -10000000L)

  val w8ToxicTopic: String =
    toxicSql(s"WITH ${Lexicons.valenceCte},\n$w7Ctes", "w7",
      "w7sec", "mood_micro", 25, -20000000L)

  val w8ToxicChannel: String =
    toxicSql(s"WITH ${Lexicons.valenceCte},\n$userMoodCtes", "urun",
      "wsec", "run_micro", 50, -30000000L)
}
