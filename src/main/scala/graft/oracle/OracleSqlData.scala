package graft.oracle

import graft.functions.HashFns
import graft.nlp.Lexicons
import graft.pipeline.DataOps

/**
 * DuckDB oracle SQL for the LLM-data-pipeline queries — the exact
 * relational mirror of [[graft.pipeline.DataOps]]. Shares the cross-engine
 * determinism contract of [[OracleSql]]:
 *
 *  - the one shared hash primitive is MD5; hash60(s) is
 *    `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)` here and
 *    `conv(substring(md5(s), 1, 15), 16, 10)` in Spark — same 60-bit
 *    value ([[graft.functions.HashFns]]);
 *  - embeddings are converted to micro-unit BIGINTs *first*, so every
 *    dot product / norm is exact integer arithmetic in both engines —
 *    float summation order cannot flip any result;
 *  - the only double-precision steps (cosine normalize, ratio rounding)
 *    are written with identical operand order and parenthesization.
 */
object OracleSqlData {

  private val MIC = "1000000.0"
  private val P = HashFns.P // 2147483647

  /** hash60 of a SQL expression. */
  private def h60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  // =================================================================
  // Shared text CTEs
  // =================================================================

  /** Whitespace words per doc (list), with source. */
  private val wrdsCte: String =
    """wrds AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split(text, ' '), x -> x <> '') AS w
      |  FROM documents
      |)""".stripMargin

  /** Distinct 3-word shingles, one row per (doc_id, sh). */
  private val shCte: String =
    s"""shl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 3 THEN
       |           list_distinct(list_transform(range(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
       |         ELSE CAST([] AS VARCHAR[]) END AS shs
       |  FROM wrds
       |),
       |sh AS (SELECT doc_id, unnest(shs) AS sh FROM shl)""".stripMargin

  // =================================================================
  // Dedup family
  // =================================================================

  val dedupExact: String =
    """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  val dedupMinhash: String = {
    val k = DataOps.MinhashK
    s"""WITH $wrdsCte,
       |$shCte,
       |shh AS (SELECT doc_id, sh, ${h60("sh")} % $P AS hp FROM sh),
       |perm AS (SELECT unnest(range(0, $k)) AS i),
       |sig AS (
       |  SELECT s.doc_id, p.i,
       |         MIN(((((2 * p.i + 1) * 2654435761) % $P) * s.hp +
       |              ((p.i * 2246822519) % $P)) % $P) AS m
       |  FROM shh s CROSS JOIN perm p
       |  GROUP BY 1, 2
       |),
       |bands AS (
       |  SELECT doc_id, i // ${DataOps.MinhashR} AS band,
       |         string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
       |  FROM sig GROUP BY 1, 2
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |),
       |nsh AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
       |intr AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
       |  GROUP BY 1, 2
       |)
       |SELECT * FROM (
       |  SELECT i.doc_a, i.doc_b,
       |         CAST(ROUND(CAST(i.inter AS DOUBLE) /
       |           CAST(na.nsh + nb.nsh - i.inter AS DOUBLE) * $MIC)
       |           AS BIGINT) AS jac_micro
       |  FROM intr i
       |  JOIN nsh na ON na.doc_id = i.doc_a
       |  JOIN nsh nb ON nb.doc_id = i.doc_b
       |) WHERE jac_micro >= 500000""".stripMargin
  }

  /** Recall-eval mirror ([[graft.pipeline.DataOps.minhashRecallEval]]):
    * same hash sample, complete common-shingle ground truth, and the
    * dedupMinhash signature/band candidates restricted to the sample
    * (string band keys here vs the engine's 64-bit band hash — identical
    * pair sets except under a ~2^-64 collision, the documented
    * with-high-probability contract). */
  val minhashRecallEval: String = {
    val k = DataOps.MinhashK
    s"""WITH $wrdsCte,
       |$shCte,
       |sub AS (
       |  SELECT doc_id FROM documents
       |  WHERE ${h60("'recall:' || doc_id")} % 5 = 0
       |),
       |shs AS (SELECT sh.doc_id, sh.sh FROM sh JOIN sub USING (doc_id)),
       |nsh AS (SELECT doc_id, COUNT(*) AS nsh FROM shs GROUP BY 1),
       |tr AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM shs sa JOIN shs sb ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
       |  GROUP BY 1, 2
       |),
       |truth AS (
       |  SELECT doc_a, doc_b FROM tr
       |  JOIN nsh na ON na.doc_id = tr.doc_a
       |  JOIN nsh nb ON nb.doc_id = tr.doc_b
       |  WHERE CAST(ROUND(CAST(inter AS DOUBLE) /
       |    CAST(na.nsh + nb.nsh - inter AS DOUBLE) * $MIC) AS BIGINT)
       |    >= 500000
       |),
       |shh AS (SELECT doc_id, ${h60("sh")} % $P AS hp FROM shs),
       |perm AS (SELECT unnest(range(0, $k)) AS i),
       |sig AS (
       |  SELECT s.doc_id, p.i,
       |         MIN(((((2 * p.i + 1) * 2654435761) % $P) * s.hp +
       |              ((p.i * 2246822519) % $P)) % $P) AS m
       |  FROM shh s CROSS JOIN perm p
       |  GROUP BY 1, 2
       |),
       |bands AS (
       |  SELECT doc_id, i // ${DataOps.MinhashR} AS band,
       |         string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
       |  FROM sig GROUP BY 1, 2
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |),
       |hit AS (
       |  SELECT c.doc_a FROM cand c
       |  JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
       |),
       |agg AS (
       |  SELECT (SELECT COUNT(*) FROM sub) AS n_docs,
       |         (SELECT COUNT(*) FROM truth) AS n_true,
       |         (SELECT COUNT(*) FROM cand) AS n_cand,
       |         (SELECT COUNT(*) FROM hit) AS n_hit
       |)
       |SELECT CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(n_true AS BIGINT) AS n_true,
       |       CAST(n_cand AS BIGINT) AS n_cand,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       CAST(CASE WHEN n_true > 0 THEN (n_hit * 1000000) // n_true
       |                 ELSE 1000000 END AS BIGINT) AS recall_micro,
       |       CAST(CASE WHEN n_cand > 0 THEN (n_hit * 1000000) // n_cand
       |                 ELSE 1000000 END AS BIGINT) AS precision_micro
       |FROM agg""".stripMargin
  }

  /** Dedup-family recall audit mirror
    * ([[graft.pipeline.DataOps.dedupRecallEval]]): the
    * [[minhashRecallEval]] sample + shingle-Jaccard ≥ 0.5 truth, with
    * each SHIPPED tier pair relation replayed over the same sample —
    * exact md5 pairs, the banded-LSH verified minhash pairs (string
    * band keys, the same with-high-probability parity note as
    * [[dedupMinhash]]), and the simhash / within-source-ngram tiers in
    * their DEFINITIONAL all-pairs forms (Hamming ≤ 3, Jaccard ≥ 0.8 —
    * the engine's chunk-bucket and PPJoin prunings are exact, so the
    * filtered forms are the definition). */
  val dedupRecallEval: String = {
    val k = DataOps.MinhashK
    s"""WITH wrds AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents
       |  WHERE ${h60("'recall:' || doc_id")} % 5 = 0
       |),
       |$shCte,
       |nsh AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
       |tr AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM sh sa JOIN sh sb ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
       |  GROUP BY 1, 2
       |),
       |truth AS (
       |  SELECT doc_a, doc_b FROM tr
       |  JOIN nsh na ON na.doc_id = tr.doc_a
       |  JOIN nsh nb ON nb.doc_id = tr.doc_b
       |  WHERE CAST(ROUND(CAST(inter AS DOUBLE) /
       |    CAST(na.nsh + nb.nsh - inter AS DOUBLE) * $MIC) AS BIGINT)
       |    >= 500000
       |),
       |docsub AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ${h60("'recall:' || doc_id")} % 5 = 0
       |),
       |ex AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM docsub a JOIN docsub b
       |    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
       |),
       |shh AS (SELECT doc_id, ${h60("sh")} % $P AS hp FROM sh),
       |perm AS (SELECT unnest(range(0, $k)) AS i),
       |sig AS (
       |  SELECT s.doc_id, p.i,
       |         MIN(((((2 * p.i + 1) * 2654435761) % $P) * s.hp +
       |              ((p.i * 2246822519) % $P)) % $P) AS m
       |  FROM shh s CROSS JOIN perm p
       |  GROUP BY 1, 2
       |),
       |bands AS (
       |  SELECT doc_id, i // ${DataOps.MinhashR} AS band,
       |         string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
       |  FROM sig GROUP BY 1, 2
       |),
       |mhcand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |),
       |mh AS (
       |  SELECT c.doc_a, c.doc_b FROM mhcand c
       |  JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
       |),
       |wc AS (
       |  SELECT doc_id, w_, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, unnest(w) AS w_ FROM wrds)
       |  GROUP BY 1, 2
       |),
       |wh AS (SELECT doc_id, cnt, ${h60("w_")} AS h FROM wc),
       |sb AS (
       |  SELECT doc_id, j,
       |         SUM(CASE WHEN ((h >> j) & 1) = 1 THEN cnt ELSE -cnt END) AS s
       |  FROM wh CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
       |  GROUP BY 1, 2
       |),
       |sim AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
       |                       ELSE 0 END) AS BIGINT) AS simhash
       |  FROM sb GROUP BY 1
       |),
       |sm AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |),
       |tok AS (
       |  SELECT doc_id, source, unnest(list_distinct(w)) AS w_ FROM wrds
       |),
       |ntok AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY 1),
       |intr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |  FROM tok a JOIN tok b
       |    ON a.source = b.source AND a.w_ = b.w_ AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |ng AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT i.doc_a, i.doc_b,
       |           CAST(ROUND(CAST(i.inter AS DOUBLE) /
       |             CAST(na.nt + nb.nt - i.inter AS DOUBLE) * $MIC)
       |             AS BIGINT) AS jac_micro
       |    FROM intr i
       |    JOIN ntok na ON na.doc_id = i.doc_a
       |    JOIN ntok nb ON nb.doc_id = i.doc_b
       |  ) WHERE jac_micro >= 800000
       |),
       |tiers AS (
       |  SELECT 'exact' AS tier,
       |         (SELECT COUNT(*) FROM ex) AS n_cand,
       |         (SELECT COUNT(*) FROM ex c JOIN truth t
       |            ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hit
       |  UNION ALL
       |  SELECT 'minhash',
       |         (SELECT COUNT(*) FROM mh),
       |         (SELECT COUNT(*) FROM mh c JOIN truth t
       |            ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
       |  UNION ALL
       |  SELECT 'ngram',
       |         (SELECT COUNT(*) FROM ng),
       |         (SELECT COUNT(*) FROM ng c JOIN truth t
       |            ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
       |  UNION ALL
       |  SELECT 'simhash',
       |         (SELECT COUNT(*) FROM sm),
       |         (SELECT COUNT(*) FROM sm c JOIN truth t
       |            ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
       |)
       |SELECT tier,
       |       CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
       |       CAST(n_cand AS BIGINT) AS n_cand,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       CAST(CASE WHEN (SELECT COUNT(*) FROM truth) > 0
       |                 THEN (n_hit * 1000000) //
       |                      (SELECT COUNT(*) FROM truth)
       |                 ELSE 1000000 END AS BIGINT) AS recall_micro,
       |       CAST(CASE WHEN n_cand > 0 THEN (n_hit * 1000000) // n_cand
       |                 ELSE 1000000 END AS BIGINT) AS precision_micro
       |FROM tiers""".stripMargin
  }

  /** Connected components over the minhash pair graph via WITH RECURSIVE:
    * rep(doc) = min doc_id reachable through near-dup edges. */
  /** LPA mirror ([[graft.pipeline.DataOps.dupCommunities]]): the
    * [[dedupMinhash]] pair CTE inlined, symmetric edges, the
    * [[graft.pipeline.DataOps.LpaIters]] synchronous plurality rounds
    * unrolled as generated CTEs (count desc, label asc tie-break). */
  lazy val dupCommunities: String = {
    val iters = DataOps.LpaIters
    val steps = (1 to iters).map { t =>
      s"""v$t AS (
         |  SELECT e.a AS node, l.lab, COUNT(*) AS c
         |  FROM edges e JOIN l${t - 1} l ON l.node = e.b
         |  GROUP BY 1, 2
         |),
         |l$t AS (
         |  SELECT node, lab FROM (
         |    SELECT node, lab,
         |           ROW_NUMBER() OVER (PARTITION BY node
         |             ORDER BY c DESC, lab ASC) AS rn
         |    FROM v$t
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS ($dedupMinhash),
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |),
       |l0 AS (SELECT DISTINCT a AS node, a AS lab FROM edges),
       |$steps,
       |sz AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS n_members
       |       FROM l$iters GROUP BY 1)
       |SELECT l.node AS doc_id, l.lab AS community, sz.n_members
       |FROM l$iters l JOIN sz ON sz.lab = l.lab""".stripMargin
  }

  /** Store-probe mirror ([[graft.sources.MinhashIndex.dedupIndexed]]):
    * the [[dedupMinhash]] signature/band CTEs restricted to the
    * odd-vs-even split, candidates from string band keys (≡ the store's
    * 64-bit band hash except under a ~2^-64 collision), exact-Jaccard
    * verify over 60-bit shingle HASHES — precisely what the store
    * retains (8 bytes/shingle, no text). */
  /** Store-probe mirror of the MinhashIndex registry entries: banded
    * candidates restricted to (snapshot `newPred`, indexed `oldPred`)
    * pairs — [[dedupIndexed]] is the even/odd split, [[dedupIncremental]]
    * the build-third/append-third store probed by the last third. */
  private def dedupSplit(newPred: String, oldPred: String): String = {
    val k = DataOps.MinhashK
    s"""WITH $wrdsCte,
       |$shCte,
       |shh AS (SELECT doc_id, sh, ${h60("sh")} % $P AS hp FROM sh),
       |perm AS (SELECT unnest(range(0, $k)) AS i),
       |sig AS (
       |  SELECT s.doc_id, p.i,
       |         MIN(((((2 * p.i + 1) * 2654435761) % $P) * s.hp +
       |              ((p.i * 2246822519) % $P)) % $P) AS m
       |  FROM shh s CROSS JOIN perm p
       |  GROUP BY 1, 2
       |),
       |bands AS (
       |  SELECT doc_id, i // ${DataOps.MinhashR} AS band,
       |         string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
       |  FROM sig GROUP BY 1, 2
       |),
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM bands n JOIN bands o
       |    ON n.band = o.band AND n.bkey = o.bkey
       |  WHERE $newPred AND $oldPred
       |),
       |shd AS (SELECT doc_id, ${h60("sh")} AS h FROM sh),
       |nsh AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY 1),
       |intr AS (
       |  SELECT c.new_id, c.old_id, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN shd a ON a.doc_id = c.new_id
       |  JOIN shd b ON b.doc_id = c.old_id AND b.h = a.h
       |  GROUP BY 1, 2
       |)
       |SELECT * FROM (
       |  SELECT i.new_id AS doc_id, i.old_id AS dup_of,
       |         CAST(ROUND(CAST(i.inter AS DOUBLE) /
       |           CAST(nn.nsh + no.nsh - i.inter AS DOUBLE) * $MIC)
       |           AS BIGINT) AS jac_micro
       |  FROM intr i
       |  JOIN nsh nn ON nn.doc_id = i.new_id
       |  JOIN nsh no ON no.doc_id = i.old_id
       |) WHERE jac_micro >= 500000""".stripMargin
  }

  val dedupIndexed: String =
    dedupSplit("n.doc_id % 2 = 1", "o.doc_id % 2 = 0")

  /** K4 store-telemetry mirror ([[graft.sources.MinhashIndex.statsOf]]):
    * the dedup store's integrity numbers recomputed from corpus truth
    * (distinct (band, key) strings vs the store's 64-bit band hashes —
    * the documented whp contract). */
  val minhashStats: String = {
    val k = DataOps.MinhashK
    s"""WITH $wrdsCte,
       |$shCte,
       |shh AS (SELECT doc_id, sh, ${h60("sh")} % $P AS hp FROM sh),
       |perm AS (SELECT unnest(range(0, $k)) AS i),
       |sig AS (
       |  SELECT s.doc_id, p.i,
       |         MIN(((((2 * p.i + 1) * 2654435761) % $P) * s.hp +
       |              ((p.i * 2246822519) % $P)) % $P) AS m
       |  FROM shh s CROSS JOIN perm p
       |  GROUP BY 1, 2
       |),
       |bands AS (
       |  SELECT doc_id, i // ${DataOps.MinhashR} AS band,
       |         string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS bkey
       |  FROM sig GROUP BY 1, 2
       |),
       |d AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |             CAST(COUNT(*) AS BIGINT) AS n_shingles FROM sh),
       |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_band_rows,
       |             CAST(COUNT(DISTINCT (band, bkey)) AS BIGINT)
       |               AS n_buckets
       |      FROM bands)
       |SELECT d.n_docs, d.n_shingles, b.n_band_rows, b.n_buckets
       |FROM d, b""".stripMargin
  }

  /** Survivors-only per-language rollup
    * ([[graft.sources.Forget.corpusForget]]): what the rewritten
    * published partitions must still contain after the composed
    * forget. */
  val corpusForget: String =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
      |       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
      |FROM documents WHERE doc_id % 2 = 0
      |GROUP BY lang""".stripMargin

  val dedupIncremental: String =
    dedupSplit("n.doc_id % 3 = 2", "o.doc_id % 3 < 2")

  val dedupClusters: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT doc_a, doc_b FROM ($dedupMinhash)
       |),
       |edges AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs
       |),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.doc_a, reach.r FROM edges e JOIN reach ON e.doc_b = reach.doc_id
       |)
       |SELECT doc_id, MIN(r) AS rep, doc_id = MIN(r) AS keep
       |FROM reach GROUP BY doc_id""".stripMargin

  val dedupSimhash: String =
    s"""WITH $wrdsCte,
       |wc AS (
       |  SELECT doc_id, w_, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, unnest(w) AS w_ FROM wrds)
       |  GROUP BY 1, 2
       |),
       |wh AS (
       |  SELECT doc_id, cnt, ${h60("w_")} AS h FROM wc
       |),
       |sb AS (
       |  SELECT doc_id, j,
       |         SUM(CASE WHEN ((h >> j) & 1) = 1 THEN cnt ELSE -cnt END) AS s
       |  FROM wh CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
       |  GROUP BY 1, 2
       |),
       |sim AS (
       |  SELECT doc_id,
       |         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
       |                       ELSE 0 END) AS BIGINT) AS simhash
       |  FROM sb GROUP BY 1
       |),
       |chunks AS (
       |  SELECT doc_id, c, (simhash >> (15 * c)) & 32767 AS chunk
       |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS c)
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM chunks x JOIN chunks y
       |    ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |)
       |SELECT * FROM (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(bit_count(xor(sa.simhash, sb.simhash)) AS BIGINT)
       |           AS hamming
       |  FROM cand c
       |  JOIN sim sa ON sa.doc_id = c.doc_a
       |  JOIN sim sb ON sb.doc_id = c.doc_b
       |) WHERE hamming <= 3""".stripMargin

  val dedupNgramSource: String =
    s"""WITH $wrdsCte,
       |tok AS (
       |  SELECT doc_id, source, unnest(list_distinct(w)) AS w_ FROM wrds
       |),
       |ntok AS (SELECT doc_id, COUNT(*) AS nt FROM tok GROUP BY 1),
       |intr AS (
       |  SELECT a.source AS source, a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         COUNT(*) AS inter
       |  FROM tok a JOIN tok b
       |    ON a.source = b.source AND a.w_ = b.w_ AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3
       |)
       |SELECT * FROM (
       |  SELECT i.source, i.doc_a, i.doc_b,
       |         CAST(ROUND(CAST(i.inter AS DOUBLE) /
       |           CAST(na.nt + nb.nt - i.inter AS DOUBLE) * $MIC)
       |           AS BIGINT) AS jac_micro
       |  FROM intr i
       |  JOIN ntok na ON na.doc_id = i.doc_a
       |  JOIN ntok nb ON nb.doc_id = i.doc_b
       |) WHERE jac_micro >= 800000""".stripMargin

  /** Shared substring-dedup CTE chain (mirror of
    * [[DataOps.substringRuns]] at the fixture run length): sliding
    * g-token grams with 0-based positions, hash60 fingerprints, min-doc
    * duplicated-occurrence rule, interval merge (new run when
    * pos > lag(pos) + g). Ends with `ragg` = (doc_id, n_tok, run_id,
    * s, e). */
  private val substringRunCtes: String = {
    val g = DataOps.SubstringRunFixture
    s"""$wrdsCte,
       |gl AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok,
       |         CASE WHEN len(w) >= $g THEN
       |           list_transform(range(1, len(w) - ${g - 2}),
       |             i -> ${(0 until g).map(o => s"w[i+$o]").mkString(" || ' ' || ")})
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |occ0 AS (
       |  SELECT doc_id, n_tok,
       |         CAST(generate_subscripts(gs, 1) - 1 AS BIGINT) AS pos,
       |         unnest(gs) AS gram
       |  FROM gl
       |),
       |occ AS (SELECT doc_id, n_tok, pos, ${h60("gram")} AS gh FROM occ0),
       |mind AS (SELECT gh, MIN(doc_id) AS mind FROM occ GROUP BY 1),
       |dup AS (
       |  SELECT o.doc_id, o.n_tok, o.pos
       |  FROM occ o JOIN mind m USING (gh) WHERE m.mind < o.doc_id
       |),
       |brk AS (
       |  SELECT doc_id, n_tok, pos,
       |         CASE WHEN pos > COALESCE(LAG(pos) OVER
       |             (PARTITION BY doc_id ORDER BY pos),
       |           ${Long.MinValue / 2}) + $g THEN 1 ELSE 0 END AS brk
       |  FROM dup
       |),
       |runs AS (
       |  SELECT doc_id, n_tok, pos,
       |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
       |  FROM brk
       |),
       |ragg AS (
       |  SELECT doc_id, n_tok, run_id,
       |         MIN(pos) AS s, MAX(pos) + ${g - 1} AS e
       |  FROM runs GROUP BY 1, 2, 3
       |)""".stripMargin
  }

  val dedupSubstring: String =
    s"""WITH $substringRunCtes
       |SELECT doc_id, n_tok AS n_tokens, CAST(COUNT(*) AS BIGINT) AS n_runs,
       |       CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
       |       CAST(MAX(e - s + 1) AS BIGINT) AS max_run
       |FROM ragg GROUP BY 1, 2""".stripMargin

  /** Trim mirror ([[DataOps.trimSubstringDups]]): same runs, tokens
    * outside every [s, e] re-joined by single spaces in position order;
    * a fully duplicated doc trims to the empty string. */
  val trimSubstringDups: String =
    s"""WITH $substringRunCtes,
       |flagged AS (
       |  SELECT doc_id, n_tok,
       |         CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
       |  FROM ragg GROUP BY 1, 2
       |),
       |tok AS (
       |  SELECT w.doc_id,
       |         CAST(generate_subscripts(w.w, 1) - 1 AS BIGINT) AS pos,
       |         unnest(w.w) AS tk
       |  FROM wrds w JOIN flagged f ON f.doc_id = w.doc_id
       |),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.tk
       |  FROM tok t
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM ragg r
       |    WHERE r.doc_id = t.doc_id AND t.pos BETWEEN r.s AND r.e)
       |),
       |rebuilt AS (
       |  SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS text_clean,
       |         CAST(COUNT(*) AS BIGINT) AS n_clean
       |  FROM kept GROUP BY 1
       |)
       |SELECT f.doc_id, COALESCE(r.text_clean, '') AS text_clean,
       |       CAST(COALESCE(r.n_clean, 0) AS BIGINT) AS n_clean,
       |       f.dup_tokens, f.n_tok AS n_tokens
       |FROM flagged f LEFT JOIN rebuilt r ON r.doc_id = f.doc_id""".stripMargin

  // =================================================================
  // Embedding similarity family
  // =================================================================

  /** Micro-unit integer vectors, per-element rows, and exact norms. */
  private val embCtes: String =
    """ev AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
      |           AS em
      |  FROM embeddings
      |),
      |vu AS (
      |  SELECT vec_id, unnest(em) AS v, generate_subscripts(em, 1) AS i
      |  FROM ev
      |),
      |nrm AS (SELECT vec_id, SUM(v * v) AS nrm FROM vu GROUP BY 1)""".stripMargin

  /** Cosine of each vector to each of the C refined centroids, ranked —
    * the exact mirror of DataOps.centroids + cellRanks: hash-stratified
    * seed picks (stratum = hash60(vec_id) mod C, (hash, vec_id)-minimal
    * vector per stratum), then [[DataOps.LloydT]] unrolled Lloyd rounds
    * (the fixed-round CTE discipline of dupCommunities/eventPagerank)
    * whose cell centroids are member-wise integer means (SUM // COUNT —
    * truncating division in both engines); zero-norm cells are dropped
    * in both after every round, and a cell that loses all members stops
    * existing (no reseeding in either engine). The FINAL round's
    * relations keep the historical names `cmean`/`cnrm`/`cdot`/`crank`
    * every downstream mirror joins. */
  private def crankCte(c: Int): String = {
    val head =
      s"""cent AS (
         |  SELECT stratum AS cid, vec_id AS cvid FROM (
         |    SELECT vec_id, h, h % $c AS stratum,
         |           ROW_NUMBER() OVER (PARTITION BY h % $c
         |             ORDER BY h, vec_id) AS rnk
         |    FROM (SELECT vec_id,
         |            ${h60("CAST(vec_id AS VARCHAR)")} AS h FROM ev)
         |  ) WHERE rnk = 1
         |),
         |sd AS (
         |  SELECT a.vec_id AS vec_id, c.cid AS cid, c.cvid AS cvid,
         |         SUM(a.v * b.v) AS d
         |  FROM vu a JOIN vu b ON a.i = b.i
         |  JOIN cent c ON c.cvid = b.vec_id
         |  GROUP BY 1, 2, 3
         |),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT sd.vec_id, sd.cid,
         |           ROW_NUMBER() OVER (PARTITION BY sd.vec_id ORDER BY
         |             (CAST(sd.d AS DOUBLE) /
         |              (sqrt(CAST(na.nrm AS DOUBLE)) *
         |               sqrt(CAST(nb.nrm AS DOUBLE)))) DESC, sd.cid ASC)
         |             AS rnk
         |    FROM sd
         |    JOIN nrm na ON na.vec_id = sd.vec_id
         |    JOIN nrm nb ON nb.vec_id = sd.cvid
         |  ) WHERE rnk = 1
         |)""".stripMargin
    // Intermediate-round CTE names are `lloyd`-prefixed: several
    // downstream mirrors define their own `assign1` beside crank.
    val rounds = (1 to DataOps.LloydT).map { t =>
      val last = t == DataOps.LloydT
      val prev = if (t == 1) "assign0" else s"lassign${t - 1}"
      val (cm, cn, cd, rk) =
        if (last) ("cmean", "cnrm", "cdot", "crank")
        else (s"lcmean$t", s"lcnrm$t", s"lcdot$t", s"lcrank$t")
      val assignTail =
        if (last) ""
        else s""",
           |lassign$t AS (SELECT vec_id, cid FROM $rk WHERE rnk = 1)"""
      s"""$cm AS (
         |  SELECT a0.cid, u.i, SUM(u.v) // COUNT(*) AS cv
         |  FROM vu u JOIN $prev a0 ON a0.vec_id = u.vec_id
         |  GROUP BY 1, 2
         |),
         |$cn AS (
         |  SELECT cid, SUM(cv * cv) AS cn FROM $cm
         |  GROUP BY 1 HAVING SUM(cv * cv) > 0
         |),
         |$cd AS (
         |  SELECT a.vec_id AS vec_id, m.cid AS cid, SUM(a.v * m.cv) AS d
         |  FROM vu a JOIN $cm m ON m.i = a.i
         |  GROUP BY 1, 2
         |),
         |$rk AS (
         |  SELECT cd.vec_id, cd.cid,
         |         ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY
         |           (CAST(cd.d AS DOUBLE) /
         |            (sqrt(CAST(na.nrm AS DOUBLE)) *
         |             sqrt(CAST(cnn.cn AS DOUBLE)))) DESC, cd.cid ASC) AS rnk
         |  FROM $cd cd
         |  JOIN nrm na ON na.vec_id = cd.vec_id
         |  JOIN $cn cnn ON cnn.cid = cd.cid
         |)$assignTail""".stripMargin
    }.mkString(",\n")
    head + ",\n" + rounds
  }

  /** Embedding-outlier mirror ([[graft.pipeline.DataOps.embedOutliers]]):
    * the [[crankCte]] top-1 assignment re-joined to its dot/norm CTEs
    * for the micro cosine, then the identical per-cell ceil-rank p5
    * threshold and strict-below flag. */
  val embedOutliers: String =
    s"""WITH $embCtes,
       |${crankCte(DataOps.IvfC)},
       |assign AS (
       |  SELECT cr.vec_id, cr.cid,
       |         CAST(ROUND(CAST(cd.d AS DOUBLE) /
       |           (sqrt(CAST(na.nrm AS DOUBLE)) *
       |            sqrt(CAST(cnn.cn AS DOUBLE))) * $MIC) AS BIGINT)
       |           AS cs_micro
       |  FROM crank cr
       |  JOIN cdot cd ON cd.vec_id = cr.vec_id AND cd.cid = cr.cid
       |  JOIN nrm na ON na.vec_id = cr.vec_id
       |  JOIN cnrm cnn ON cnn.cid = cr.cid
       |  WHERE cr.rnk = 1
       |),
       |hist AS (
       |  SELECT cid, cs_micro, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM assign GROUP BY 1, 2
       |),
       |cum AS (
       |  SELECT cid, cs_micro, c,
       |         SUM(c) OVER (PARTITION BY cid ORDER BY cs_micro) AS cum,
       |         SUM(c) OVER (PARTITION BY cid) AS n
       |  FROM hist
       |),
       |th AS (
       |  SELECT cid,
       |         MIN(CASE WHEN cum >= (n + 19) // 20 THEN cs_micro END)
       |           AS t5
       |  FROM cum GROUP BY 1
       |)
       |SELECT a.vec_id, a.cid, a.cs_micro,
       |       CAST(CASE WHEN a.cs_micro < th.t5 THEN 1 ELSE 0 END
       |            AS BIGINT) AS outlier
       |FROM assign a JOIN th USING (cid)""".stripMargin

  /** Class-balance mirror ([[graft.pipeline.DataOps.labelBalance]]):
    * one aggregate, identical ppm share and floor-log2 bits. */
  val labelBalance: String =
    """WITH l AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM embeddings GROUP BY 1
      |),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM l)
      |SELECT label, n,
      |       CAST((n * 1000000) // tot AS BIGINT) AS share_ppm,
      |       CAST(length(bin(tot // n)) - 1 AS BIGINT) AS surprisal_bits
      |FROM l, tot""".stripMargin

  /** SemDeDup mirror ([[graft.pipeline.DataOps.semdedup]]): same top-1
    * cell assignment, same within-cell smaller-id neighbor test at
    * [[DataOps.SemTauMicro]], same per-vector keep verdict. */
  val semdedup: String =
    s"""WITH $embCtes,
       |${crankCte(DataOps.IvfC)},
       |a1 AS (SELECT vec_id, cid FROM crank WHERE rnk = 1),
       |cand AS (
       |  SELECT x.vec_id AS vid, y.vec_id AS other
       |  FROM a1 x JOIN a1 y
       |    ON x.cid = y.cid AND y.vec_id < x.vec_id
       |),
       |pd AS (
       |  SELECT c.vid, c.other, SUM(a.v * b.v) AS d
       |  FROM cand c
       |  JOIN vu a ON a.vec_id = c.vid
       |  JOIN vu b ON b.vec_id = c.other AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |dup AS (
       |  SELECT DISTINCT pd.vid
       |  FROM pd
       |  JOIN nrm na ON na.vec_id = pd.vid
       |  JOIN nrm nb ON nb.vec_id = pd.other
       |  WHERE CAST(ROUND(CAST(pd.d AS DOUBLE) /
       |    (sqrt(CAST(na.nrm AS DOUBLE)) *
       |     sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |    >= ${DataOps.SemTauMicro}
       |)
       |SELECT a1.vec_id, a1.cid, dup.vid IS NULL AS keep
       |FROM a1 LEFT JOIN dup ON dup.vid = a1.vec_id""".stripMargin

  /** SCALED-C SemDeDup mirror
    * ([[graft.pipeline.DataOps.semdedupScaled]]): the production C ∝ N
    * tier replayed DEFINITIONALLY — N, C = max(16, N//128) and the
    * training-sample modulus are scalars derived in the `prm` CTE (the
    * cell count parameterizes a MODULUS VALUE, never the number of
    * CTEs, so one static statement replays any corpus size), seeds
    * picked per stratum over the hash sample, ONE Lloyd round of
    * member-wise truncating-integer means, full-corpus (cos DESC, cid
    * ASC) assignment, then the [[semdedup]] verdict verbatim. */
  /** Shared head of the scaled-C cell-assignment mirrors
    * ([[semdedupScaled]], [[dedupEmbedScaled]]): the knob scalars (C =
    * max(16, N//128), training-sample modulus) derive from count(*) in
    * the `prm` CTE, seeds are picked per stratum over the hash sample,
    * ONE Lloyd round of member-wise truncating-integer means, and the
    * final `srnk` relation ranks every corpus vector's cells by
    * (cosine DESC, cid ASC) — consumers pick rnk = 1 (semantic-dedup
    * verdict) or rnk <= 2 (the pair report's two probes). */
  private def scaledCellCtes: String =
    s"""prm AS (
       |  SELECT GREATEST(16, CAST(COUNT(*) AS BIGINT) // 128) AS c,
       |         GREATEST(1, CAST(COUNT(*) AS BIGINT) //
       |           (32 * GREATEST(16, CAST(COUNT(*) AS BIGINT) // 128)))
       |           AS smod
       |  FROM ev
       |),
       |svh AS (
       |  SELECT vec_id, ${h60("CAST(vec_id AS VARCHAR)")} AS h FROM ev
       |),
       |sv AS (
       |  SELECT svh.vec_id, svh.h FROM svh, prm
       |  WHERE svh.h % prm.smod = 0
       |),
       |scent AS (
       |  SELECT stratum AS cid, vec_id AS cvid FROM (
       |    SELECT sv.vec_id, sv.h, sv.h % prm.c AS stratum,
       |           ROW_NUMBER() OVER (PARTITION BY sv.h % prm.c
       |             ORDER BY sv.h, sv.vec_id) AS rnk
       |    FROM sv, prm
       |  ) WHERE rnk = 1
       |),
       |ssd AS (
       |  SELECT a.vec_id AS vec_id, c.cid AS cid, c.cvid AS cvid,
       |         SUM(a.v * b.v) AS d
       |  FROM vu a
       |  JOIN sv s ON s.vec_id = a.vec_id
       |  JOIN vu b ON a.i = b.i
       |  JOIN scent c ON c.cvid = b.vec_id
       |  GROUP BY 1, 2, 3
       |),
       |sassign0 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT ssd.vec_id, ssd.cid,
       |           ROW_NUMBER() OVER (PARTITION BY ssd.vec_id ORDER BY
       |             (CAST(ssd.d AS DOUBLE) /
       |              (sqrt(CAST(na.nrm AS DOUBLE)) *
       |               sqrt(CAST(nb.nrm AS DOUBLE)))) DESC, ssd.cid ASC)
       |             AS rnk
       |    FROM ssd
       |    JOIN nrm na ON na.vec_id = ssd.vec_id
       |    JOIN nrm nb ON nb.vec_id = ssd.cvid
       |  ) WHERE rnk = 1
       |),
       |scmean AS (
       |  SELECT a0.cid, u.i, SUM(u.v) // COUNT(*) AS cv
       |  FROM vu u JOIN sassign0 a0 ON a0.vec_id = u.vec_id
       |  GROUP BY 1, 2
       |),
       |scnrm AS (
       |  SELECT cid, SUM(cv * cv) AS cn FROM scmean
       |  GROUP BY 1 HAVING SUM(cv * cv) > 0
       |),
       |scdot AS (
       |  SELECT a.vec_id AS vec_id, m.cid AS cid, SUM(a.v * m.cv) AS d
       |  FROM vu a JOIN scmean m ON m.i = a.i
       |  GROUP BY 1, 2
       |),
       |srnk AS (
       |  SELECT cd.vec_id, cd.cid,
       |         ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY
       |           (CAST(cd.d AS DOUBLE) /
       |            (sqrt(CAST(na.nrm AS DOUBLE)) *
       |             sqrt(CAST(cnn.cn AS DOUBLE)))) DESC, cd.cid ASC)
       |           AS rnk
       |  FROM scdot cd
       |  JOIN nrm na ON na.vec_id = cd.vec_id
       |  JOIN scnrm cnn ON cnn.cid = cd.cid
       |)""".stripMargin

  val semdedupScaled: String =
    s"""WITH $embCtes,
       |$scaledCellCtes,
       |a1 AS (SELECT vec_id, cid FROM srnk WHERE rnk = 1),
       |cand AS (
       |  SELECT x.vec_id AS vid, y.vec_id AS other
       |  FROM a1 x JOIN a1 y
       |    ON x.cid = y.cid AND y.vec_id < x.vec_id
       |),
       |pd AS (
       |  SELECT c.vid, c.other, SUM(a.v * b.v) AS d
       |  FROM cand c
       |  JOIN vu a ON a.vec_id = c.vid
       |  JOIN vu b ON b.vec_id = c.other AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |dup AS (
       |  SELECT DISTINCT pd.vid
       |  FROM pd
       |  JOIN nrm na ON na.vec_id = pd.vid
       |  JOIN nrm nb ON nb.vec_id = pd.other
       |  WHERE CAST(ROUND(CAST(pd.d AS DOUBLE) /
       |    (sqrt(CAST(na.nrm AS DOUBLE)) *
       |     sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |    >= ${DataOps.SemTauMicro}
       |)
       |SELECT a1.vec_id, a1.cid, dup.vid IS NULL AS keep
       |FROM a1 LEFT JOIN dup ON dup.vid = a1.vec_id""".stripMargin

  /** Scaled-C embedding pair-report mirror
    * ([[graft.pipeline.DataOps.dedupEmbedScaled]]): the
    * [[scaledCellCtes]] head (C and the sample modulus from count(*)
    * in `prm`), TOP-2 cells per vector, then the [[dedupEmbed]] pair
    * algebra verbatim — shared-cell candidates, exact cosine ≥ 0.4. */
  val dedupEmbedScaled: String =
    s"""WITH $embCtes,
       |$scaledCellCtes,
       |assign AS (SELECT vec_id, cid FROM srnk WHERE rnk <= 2),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM assign x JOIN assign y
       |    ON x.cid = y.cid AND x.vec_id < y.vec_id
       |),
       |pd AS (
       |  SELECT c.id_a, c.id_b, SUM(a.v * b.v) AS d
       |  FROM cand c
       |  JOIN vu a ON a.vec_id = c.id_a
       |  JOIN vu b ON b.vec_id = c.id_b AND b.i = a.i
       |  GROUP BY 1, 2
       |)
       |SELECT * FROM (
       |  SELECT pd.id_a, pd.id_b,
       |         CAST(ROUND(CAST(pd.d AS DOUBLE) /
       |           (sqrt(CAST(na.nrm AS DOUBLE)) *
       |            sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |           AS cos_micro
       |  FROM pd
       |  JOIN nrm na ON na.vec_id = pd.id_a
       |  JOIN nrm nb ON nb.vec_id = pd.id_b
       |) WHERE cos_micro >= 400000""".stripMargin

  /** CAPACITY-SCALED IVF mirror
    * ([[graft.pipeline.DataOps.annIvfScaled]]): C = max(16, ⌊√N⌋),
    * probe width C//4 and the training-sample modulus all derive from
    * count(*) in the `aprm` scalar CTE (the [[semdedupScaled]]
    * discipline — knob values, never CTE structure); seeds and all
    * [[DataOps.LloydT]] Lloyd rounds run over the hash SAMPLE, the
    * full corpus assigns to the final centroids, and the probe/re-rank
    * tail is the [[annIvf]] mirror with the scalar probe width. */
  val annIvfScaled: String = {
    val cS = "(SELECT c FROM aprm)"
    val head =
      s"""WITH $embCtes,
         |aprm AS (
         |  SELECT GREATEST(16, CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))
         |           AS BIGINT)) AS c,
         |         GREATEST(4, GREATEST(16,
         |           CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))
         |             AS BIGINT)) // 4) AS nprobes,
         |         GREATEST(1, CAST(COUNT(*) AS BIGINT) //
         |           (32 * GREATEST(16,
         |             CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))
         |               AS BIGINT)))) AS smod
         |  FROM ev
         |),
         |sv AS (
         |  SELECT vec_id, ${h60("CAST(vec_id AS VARCHAR)")} AS h
         |  FROM ev
         |  WHERE ${h60("CAST(vec_id AS VARCHAR)")} %
         |    (SELECT smod FROM aprm) = 0
         |),
         |cent AS (
         |  SELECT stratum AS cid, vec_id AS cvid FROM (
         |    SELECT vec_id, h, h % $cS AS stratum,
         |           ROW_NUMBER() OVER (PARTITION BY h % $cS
         |             ORDER BY h, vec_id) AS rnk
         |    FROM sv
         |  ) WHERE rnk = 1
         |),
         |sd AS (
         |  SELECT a.vec_id AS vec_id, c.cid AS cid, c.cvid AS cvid,
         |         SUM(a.v * b.v) AS d
         |  FROM vu a
         |  JOIN sv s ON s.vec_id = a.vec_id
         |  JOIN vu b ON a.i = b.i
         |  JOIN cent c ON c.cvid = b.vec_id
         |  GROUP BY 1, 2, 3
         |),
         |assign0 AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT sd.vec_id, sd.cid,
         |           ROW_NUMBER() OVER (PARTITION BY sd.vec_id ORDER BY
         |             (CAST(sd.d AS DOUBLE) /
         |              (sqrt(CAST(na.nrm AS DOUBLE)) *
         |               sqrt(CAST(nb.nrm AS DOUBLE)))) DESC, sd.cid ASC)
         |             AS rnk
         |    FROM sd
         |    JOIN nrm na ON na.vec_id = sd.vec_id
         |    JOIN nrm nb ON nb.vec_id = sd.cvid
         |  ) WHERE rnk = 1
         |)"""
    // LloydT rounds over the SAMPLE: means from the previous
    // assignment, re-rank the sample; the FINAL round emits
    // cmean/cnrm only (the full corpus assigns below).
    val rounds = (1 to DataOps.LloydT).map { t =>
      val last = t == DataOps.LloydT
      val prev = if (t == 1) "assign0" else s"lassign${t - 1}"
      val (cm, cn) =
        if (last) ("cmean", "cnrm") else (s"lcmean$t", s"lcnrm$t")
      val reassign =
        if (last) ""
        else s""",
           |lcdot$t AS (
           |  SELECT a.vec_id AS vec_id, m.cid AS cid,
           |         SUM(a.v * m.cv) AS d
           |  FROM vu a
           |  JOIN sv s ON s.vec_id = a.vec_id
           |  JOIN lcmean$t m ON m.i = a.i
           |  GROUP BY 1, 2
           |),
           |lassign$t AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT cd.vec_id, cd.cid,
           |           ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY
           |             (CAST(cd.d AS DOUBLE) /
           |              (sqrt(CAST(na.nrm AS DOUBLE)) *
           |               sqrt(CAST(cnn.cn AS DOUBLE)))) DESC, cd.cid ASC)
           |             AS rnk
           |    FROM lcdot$t cd
           |    JOIN nrm na ON na.vec_id = cd.vec_id
           |    JOIN lcnrm$t cnn ON cnn.cid = cd.cid
           |  ) WHERE rnk = 1
           |)"""
      s"""$cm AS (
         |  SELECT a0.cid, u.i, SUM(u.v) // COUNT(*) AS cv
         |  FROM vu u JOIN $prev a0 ON a0.vec_id = u.vec_id
         |  GROUP BY 1, 2
         |),
         |$cn AS (
         |  SELECT cid, SUM(cv * cv) AS cn FROM $cm
         |  GROUP BY 1 HAVING SUM(cv * cv) > 0
         |)$reassign""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rounds,
       |cdot AS (
       |  SELECT a.vec_id AS vec_id, m.cid AS cid, SUM(a.v * m.cv) AS d
       |  FROM vu a JOIN cmean m ON m.i = a.i
       |  GROUP BY 1, 2
       |),
       |crank AS (
       |  SELECT cd.vec_id, cd.cid,
       |         ROW_NUMBER() OVER (PARTITION BY cd.vec_id ORDER BY
       |           (CAST(cd.d AS DOUBLE) /
       |            (sqrt(CAST(na.nrm AS DOUBLE)) *
       |             sqrt(CAST(cnn.cn AS DOUBLE)))) DESC, cd.cid ASC)
       |           AS rnk
       |  FROM cdot cd
       |  JOIN nrm na ON na.vec_id = cd.vec_id
       |  JOIN cnrm cnn ON cnn.cid = cd.cid
       |),
       |assign1 AS (SELECT vec_id, cid FROM crank WHERE rnk = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cid FROM crank
       |  WHERE vec_id % 50 = 0 AND rnk <= (SELECT nprobes FROM aprm)
       |),
       |candi AS (
       |  SELECT p.q_id, a.vec_id AS n_id
       |  FROM probes p JOIN assign1 a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.q_id
       |),
       |cd2 AS (
       |  SELECT c.q_id, c.n_id, SUM(a.v * b.v) AS d
       |  FROM candi c
       |  JOIN vu a ON a.vec_id = c.n_id
       |  JOIN vu b ON b.vec_id = c.q_id AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT cd2.q_id, cd2.n_id,
       |         CAST(cd2.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM cd2
       |  JOIN nrm nn ON nn.vec_id = cd2.n_id
       |  JOIN nrm nq ON nq.vec_id = cd2.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin
  }

  /** CAPACITY-SCALED PQ mirror ([[graft.pipeline.DataOps.annPqScaled]]):
    * K, the sample modulus and the √N re-rank shortlist derive from
    * count(*) in `pqprm`; training ([[pqCtesT]] with the scalar K and
    * the hash-sample train predicate) runs on the sample, coding and
    * the ADC probe on the full corpus. */
  val annPqScaled: String = {
    val pqprm =
      """pqprm AS (
        |  SELECT LEAST(64, GREATEST(16,
        |           CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))
        |             AS BIGINT))) AS k,
        |         GREATEST(1, CAST(COUNT(*) AS BIGINT) //
        |           (64 * LEAST(64, GREATEST(16,
        |             CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))
        |               AS BIGINT))))) AS smod,
        |         GREATEST(50, CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)))
        |           AS BIGINT)) AS shortlist
        |  FROM ev
        |)""".stripMargin
    annPqSql(
      pqCtesT(
        trainPred = s"${h60("CAST(vec_id AS VARCHAR)")} % " +
          "(SELECT smod FROM pqprm) = 0",
        k = "(SELECT k FROM pqprm)",
        extra = pqprm),
      "TRUE",
      shortlist = "(SELECT shortlist FROM pqprm)")
  }

  val dedupEmbed: String =
    s"""WITH $embCtes,
       |${crankCte(DataOps.IvfC)},
       |assign AS (SELECT vec_id, cid FROM crank WHERE rnk <= 2),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM assign x JOIN assign y
       |    ON x.cid = y.cid AND x.vec_id < y.vec_id
       |),
       |pd AS (
       |  SELECT c.id_a, c.id_b, SUM(a.v * b.v) AS d
       |  FROM cand c
       |  JOIN vu a ON a.vec_id = c.id_a
       |  JOIN vu b ON b.vec_id = c.id_b AND b.i = a.i
       |  GROUP BY 1, 2
       |)
       |SELECT * FROM (
       |  SELECT pd.id_a, pd.id_b,
       |         CAST(ROUND(CAST(pd.d AS DOUBLE) /
       |           (sqrt(CAST(na.nrm AS DOUBLE)) *
       |            sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |           AS cos_micro
       |  FROM pd
       |  JOIN nrm na ON na.vec_id = pd.id_a
       |  JOIN nrm nb ON nb.vec_id = pd.id_b
       |) WHERE cos_micro >= 400000""".stripMargin

  /** Embed-dedup recall mirror
    * ([[graft.pipeline.DataOps.embedDedupRecall]]): hash-sampled
    * vector ids, definitional all-pairs cosine ≥ 0.4 truth over the
    * sample, both shipped blocked tiers replayed with their own
    * model CTEs ([[crankCte]] for the fixed-C=16 model,
    * [[scaledCellCtes]] for the C ∝ N model — the two co-exist in one
    * statement, their CTE names are disjoint) restricted to the
    * sample, then the counting algebra per tier. */
  lazy val embedDedupRecall: String =
    s"""WITH $embCtes,
       |${crankCte(DataOps.IvfC)},
       |$scaledCellCtes,
       |sids AS (
       |  SELECT vec_id FROM ev
       |  WHERE ${h60("'erecall:' || vec_id")} % 2 = 0
       |),
       |tp AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         SUM(ua.v * ub.v) AS d
       |  FROM sids a JOIN sids b ON a.vec_id < b.vec_id
       |  JOIN vu ua ON ua.vec_id = a.vec_id
       |  JOIN vu ub ON ub.vec_id = b.vec_id AND ub.i = ua.i
       |  GROUP BY 1, 2
       |),
       |truth AS (
       |  SELECT id_a, id_b FROM tp
       |  JOIN nrm na ON na.vec_id = tp.id_a
       |  JOIN nrm nb ON nb.vec_id = tp.id_b
       |  WHERE CAST(ROUND(CAST(tp.d AS DOUBLE) /
       |    (sqrt(CAST(na.nrm AS DOUBLE)) *
       |     sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT) >= 400000
       |),
       |fassign AS (
       |  SELECT vec_id, cid FROM crank
       |  WHERE rnk <= 2 AND vec_id IN (SELECT vec_id FROM sids)
       |),
       |fcand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM fassign x JOIN fassign y
       |    ON x.cid = y.cid AND x.vec_id < y.vec_id
       |),
       |fpd AS (
       |  SELECT c.id_a, c.id_b, SUM(a.v * b.v) AS d
       |  FROM fcand c
       |  JOIN vu a ON a.vec_id = c.id_a
       |  JOIN vu b ON b.vec_id = c.id_b AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |fpairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT fpd.id_a, fpd.id_b,
       |           CAST(ROUND(CAST(fpd.d AS DOUBLE) /
       |             (sqrt(CAST(na.nrm AS DOUBLE)) *
       |              sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |             AS cm
       |    FROM fpd
       |    JOIN nrm na ON na.vec_id = fpd.id_a
       |    JOIN nrm nb ON nb.vec_id = fpd.id_b
       |  ) WHERE cm >= 400000
       |),
       |zassign AS (
       |  SELECT vec_id, cid FROM srnk
       |  WHERE rnk <= 2 AND vec_id IN (SELECT vec_id FROM sids)
       |),
       |zcand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM zassign x JOIN zassign y
       |    ON x.cid = y.cid AND x.vec_id < y.vec_id
       |),
       |zpd AS (
       |  SELECT c.id_a, c.id_b, SUM(a.v * b.v) AS d
       |  FROM zcand c
       |  JOIN vu a ON a.vec_id = c.id_a
       |  JOIN vu b ON b.vec_id = c.id_b AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |zpairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT zpd.id_a, zpd.id_b,
       |           CAST(ROUND(CAST(zpd.d AS DOUBLE) /
       |             (sqrt(CAST(na.nrm AS DOUBLE)) *
       |              sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |             AS cm
       |    FROM zpd
       |    JOIN nrm na ON na.vec_id = zpd.id_a
       |    JOIN nrm nb ON nb.vec_id = zpd.id_b
       |  ) WHERE cm >= 400000
       |),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM truth),
       |fagg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
       |         CAST(COALESCE(SUM(CASE WHEN t.id_a IS NOT NULL
       |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
       |  FROM fpairs p LEFT JOIN truth t
       |    ON t.id_a = p.id_a AND t.id_b = p.id_b
       |),
       |zagg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_cand,
       |         CAST(COALESCE(SUM(CASE WHEN t.id_a IS NOT NULL
       |           THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit
       |  FROM zpairs p LEFT JOIN truth t
       |    ON t.id_a = p.id_a AND t.id_b = p.id_b
       |)
       |SELECT 'blocked16' AS tier, nt.n_true, fagg.n_cand, fagg.n_hit,
       |       CAST(CASE WHEN nt.n_true > 0 THEN
       |         fagg.n_hit * 1000000 // nt.n_true
       |         ELSE 1000000 END AS BIGINT) AS recall_micro,
       |       CAST(CASE WHEN fagg.n_cand > 0 THEN
       |         fagg.n_hit * 1000000 // fagg.n_cand
       |         ELSE 1000000 END AS BIGINT) AS precision_micro
       |FROM nt, fagg
       |UNION ALL
       |SELECT 'scaledC' AS tier, nt.n_true, zagg.n_cand, zagg.n_hit,
       |       CAST(CASE WHEN nt.n_true > 0 THEN
       |         zagg.n_hit * 1000000 // nt.n_true
       |         ELSE 1000000 END AS BIGINT) AS recall_micro,
       |       CAST(CASE WHEN zagg.n_cand > 0 THEN
       |         zagg.n_hit * 1000000 // zagg.n_cand
       |         ELSE 1000000 END AS BIGINT) AS precision_micro
       |FROM nt, zagg""".stripMargin

  /** K-means readout mirror ([[graft.pipeline.DataOps.embedKmeans]]):
    * same crank CTEs (hash-stratified seeds + unrolled integer Lloyd rounds),
    * rank-1 cell per vector, cosine re-derived from the shared cdot/nrm/
    * cnrm relations with mirrored operand order. */
  val embedKmeans: String =
    s"""WITH $embCtes,
       |${crankCte(DataOps.IvfC)},
       |a1 AS (SELECT vec_id, cid FROM crank WHERE rnk = 1),
       |sc AS (
       |  SELECT a1.vec_id, a1.cid,
       |         CAST(ROUND(CAST(cd.d AS DOUBLE) /
       |           (sqrt(CAST(na.nrm AS DOUBLE)) *
       |            sqrt(CAST(cnn.cn AS DOUBLE))) * $MIC) AS BIGINT)
       |           AS cos_micro
       |  FROM a1
       |  JOIN cdot cd ON cd.vec_id = a1.vec_id AND cd.cid = a1.cid
       |  JOIN nrm na ON na.vec_id = a1.vec_id
       |  JOIN cnrm cnn ON cnn.cid = a1.cid
       |),
       |tot AS (SELECT COUNT(*) AS n_total FROM sc)
       |SELECT cid,
       |       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       |       CAST(COUNT(*) * 1000000 // n_total AS BIGINT) AS share_ppm,
       |       CAST(SUM(cos_micro) // COUNT(*) AS BIGINT) AS mean_cos_micro,
       |       CAST(MIN(cos_micro) AS BIGINT) AS min_cos_micro
       |FROM sc, tot GROUP BY cid, n_total""".stripMargin

  val embedQuantize: String =
    s"""WITH ev AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
       |           AS em
       |  FROM embeddings
       |),
       |q AS (
       |  SELECT vec_id, em, list_min(em) AS mn, list_max(em) AS mx,
       |         list_transform(em, x -> CASE WHEN list_max(em) > list_min(em)
       |           THEN CAST(ROUND(CAST(x - list_min(em) AS DOUBLE) * 254.0 /
       |             CAST(list_max(em) - list_min(em) AS DOUBLE)) AS BIGINT)
       |             - 127
       |           ELSE 0 END) AS codes
       |  FROM ev
       |)
       |SELECT vec_id, mn AS mn_micro, mx AS mx_micro,
       |  md5(array_to_string(list_transform(codes,
       |    c -> CAST(c AS VARCHAR)), ',')) AS fp,
       |  CAST(ROUND(CAST(list_sum(list_transform(range(1, len(em) + 1),
       |    i -> abs((em[i] - mn) * 254 - (codes[i] + 127) * (mx - mn))))
       |    AS DOUBLE) / (254.0 * len(em))) AS BIGINT) AS mae_micro
       |FROM q""".stripMargin

  /** Shared product-quantization CTE chain (mirror of
    * [[DataOps.pqParts]]): element relation, hash-stratified seeds,
    * [[DataOps.LloydT]] unrolled Lloyd rounds of truncating-integer
    * means (`//` here, `div` in Spark — both truncate toward zero,
    * verified on negatives), exact squared-L2 assignments with
    * (distance, cid) tie-break every round. Ends with `ref` (the final
    * round's codebook) and `a1` (codes).
    *
    * `trainPred` (over bare `vec_id`) restricts the TRAINING half —
    * seeds, every round's assignment and Lloyd means — to a sub-corpus,
    * while the coding pass (`d1`/`a1`) always codes EVERY vector against
    * the trained codebook: the frozen-codebook contract of the
    * [[graft.sources.PqIndex]] lifecycle mirrors (`annPqIncremental`
    * trains on the build half, codes build + appended batches). With
    * `TRUE` it is the self-trained full-corpus chain. */
  private def pqCtesT(trainPred: String,
      k: String = DataOps.PqK.toString,
      extra: String = ""): String = {
    val sd = DataOps.PqSubDim
    val extraCtes = if (extra.isEmpty) "" else s"$extra,\n"
    val head =
      s"""$embCtes,
         |${extraCtes}el AS (
         |  SELECT vec_id, CAST((i - 1) // $sd AS INTEGER) AS m,
         |         (i - 1) % $sd AS j, v AS x
         |  FROM vu
         |),
         |elt AS (SELECT * FROM el WHERE $trainPred),
         |sds AS (
         |  SELECT stratum AS cid, vec_id AS cvid FROM (
         |    SELECT vec_id, h, h % $k AS stratum,
         |           ROW_NUMBER() OVER (PARTITION BY h % $k
         |             ORDER BY h, vec_id) AS rnk
         |    FROM (SELECT vec_id,
         |            ${h60("'pq:' || CAST(vec_id AS VARCHAR)")} AS h
         |          FROM ev WHERE $trainPred)
         |  ) WHERE rnk = 1
         |),
         |sel AS (
         |  SELECT s.cid, e.m, e.j, e.x AS c
         |  FROM sds s JOIN elt e ON e.vec_id = s.cvid
         |),
         |d0 AS (
         |  SELECT e.vec_id, e.m, c.cid, SUM((e.x - c.c) * (e.x - c.c)) AS d
         |  FROM elt e JOIN sel c ON c.m = e.m AND c.j = e.j
         |  GROUP BY 1, 2, 3
         |),
         |a0 AS (
         |  SELECT vec_id, m, cid FROM (
         |    SELECT vec_id, m, cid,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, m
         |             ORDER BY d, cid) AS rnk
         |    FROM d0
         |  ) WHERE rnk = 1
         |)""".stripMargin
    val rounds = (1 to DataOps.LloydT).map { t =>
      val last = t == DataOps.LloydT
      val prev = if (t == 1) "a0" else s"at${t - 1}"
      val refName = if (last) "ref" else s"rf$t"
      val reassign =
        if (last) ""
        else s""",
           |dt$t AS (
           |  SELECT e.vec_id, e.m, r.cid,
           |         SUM((e.x - r.c) * (e.x - r.c)) AS d
           |  FROM elt e JOIN $refName r ON r.m = e.m AND r.j = e.j
           |  GROUP BY 1, 2, 3
           |),
           |at$t AS (
           |  SELECT vec_id, m, cid FROM (
           |    SELECT vec_id, m, cid,
           |           ROW_NUMBER() OVER (PARTITION BY vec_id, m
           |             ORDER BY d, cid) AS rnk
           |    FROM dt$t
           |  ) WHERE rnk = 1
           |)"""
      s"""$refName AS (
         |  SELECT e.m, a.cid, e.j, SUM(e.x) // COUNT(*) AS c
         |  FROM $prev a JOIN elt e ON e.vec_id = a.vec_id AND e.m = a.m
         |  GROUP BY 1, 2, 3
         |)$reassign""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rounds,
       |d1 AS (
       |  SELECT e.vec_id, e.m, r.cid, SUM((e.x - r.c) * (e.x - r.c)) AS d
       |  FROM el e JOIN ref r ON r.m = e.m AND r.j = e.j
       |  GROUP BY 1, 2, 3
       |),
       |a1 AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT vec_id, m, cid,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id, m
       |             ORDER BY d, cid) AS rnk
       |    FROM d1
       |  ) WHERE rnk = 1
       |)""".stripMargin
  }

  private lazy val pqCtes: String = pqCtesT("TRUE")

  val embedPq: String =
    s"""WITH $pqCtes,
       |code AS (
       |  SELECT vec_id,
       |         string_agg(CAST(cid AS VARCHAR), '_' ORDER BY m) AS code
       |  FROM a1 GROUP BY 1
       |),
       |mae AS (
       |  SELECT a.vec_id,
       |         CAST(SUM(ABS(e.x - r.c)) // 64 AS BIGINT) AS mae_micro
       |  FROM a1 a
       |  JOIN el e ON e.vec_id = a.vec_id AND e.m = a.m
       |  JOIN ref r ON r.m = a.m AND r.cid = a.cid AND r.j = e.j
       |  GROUP BY 1
       |)
       |SELECT c.vec_id, c.code, m.mae_micro
       |FROM code c JOIN mae m ON m.vec_id = c.vec_id""".stripMargin

  /** PQ ADC+refine ANN mirror ([[DataOps.annPq]]): same distance
    * tables (exact int64), same code-lookup sum, same (adc, n_id)
    * shortlist, same exact-cosine re-rank as the annBrute mirror.
    * `codesPred` (over `a.vec_id`) restricts which CODES the ADC scan
    * sees — the [[graft.sources.PqIndex.removeBatch]] mirror (codes
    * filtered to survivors, codebook still full-corpus-trained). */
  private def annPqSql(ctes: String, codesPred: String,
      shortlist: String = DataOps.PqShortlist.toString): String = {
    val short = shortlist
    s"""WITH $ctes,
       |qel AS (
       |  SELECT vec_id AS q_id, m, j, x AS qx FROM el
       |  WHERE vec_id % 50 = 0
       |),
       |dt AS (
       |  SELECT q.q_id, q.m, r.cid,
       |         SUM((q.qx - r.c) * (q.qx - r.c)) AS dtv
       |  FROM qel q JOIN ref r ON r.m = q.m AND r.j = q.j
       |  GROUP BY 1, 2, 3
       |),
       |adc AS (
       |  SELECT t.q_id, a.vec_id AS n_id, SUM(t.dtv) AS adc
       |  FROM a1 a JOIN dt t ON t.m = a.m AND t.cid = a.cid
       |  WHERE t.q_id <> a.vec_id AND ($codesPred)
       |  GROUP BY 1, 2
       |),
       |short AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id
       |             ORDER BY adc, n_id) AS srnk
       |    FROM adc
       |  ) WHERE srnk <= $short
       |),
       |qd AS (
       |  SELECT s.q_id, s.n_id, SUM(a.v * b.v) AS d
       |  FROM short s
       |  JOIN vu a ON a.vec_id = s.n_id
       |  JOIN vu b ON b.vec_id = s.q_id AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin
  }

  val annPq: String = annPqSql(pqCtes, "TRUE")

  /** [[graft.sources.PqIndex.annPqIncremental]] mirror: codebook
    * trained on the even-vec_id build half, EVERY vector coded against
    * it (frozen-codebook FAISS `add` semantics). */
  lazy val annPqIncremental: String =
    annPqSql(pqCtesT("vec_id % 2 = 0"), "TRUE")

  /** [[graft.sources.PqIndex.annPqRemoved]] mirror: full-corpus-trained
    * codebook, codes filtered to the surviving even vec_ids (`remove_ids`
    * never retrains). */
  lazy val annPqRemoved: String =
    annPqSql(pqCtes, "a.vec_id % 2 = 0")

  /** IVFPQ composed mirror ([[DataOps.annIvfPq]]): the annIvf mirror's
    * coarse cells prune which PQ codes enter the annPq mirror's ADC
    * sum; shortlist and exact re-rank unchanged. */
  val annIvfPq: String = {
    val short = DataOps.PqShortlist
    s"""WITH $pqCtes,
       |${crankCte(DataOps.IvfC)},
       |assign1 AS (SELECT vec_id, cid FROM crank WHERE rnk = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cid FROM crank
       |  WHERE vec_id % 50 = 0 AND rnk <= ${DataOps.IvfPqProbes}
       |),
       |candi AS (
       |  SELECT p.q_id, a.vec_id AS n_id
       |  FROM probes p JOIN assign1 a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.q_id
       |),
       |qel AS (
       |  SELECT vec_id AS q_id, m, j, x AS qx FROM el
       |  WHERE vec_id % 50 = 0
       |),
       |dt AS (
       |  SELECT q.q_id, q.m, r.cid,
       |         SUM((q.qx - r.c) * (q.qx - r.c)) AS dtv
       |  FROM qel q JOIN ref r ON r.m = q.m AND r.j = q.j
       |  GROUP BY 1, 2, 3
       |),
       |adc AS (
       |  SELECT c.q_id, c.n_id, SUM(t.dtv) AS adc
       |  FROM candi c
       |  JOIN a1 a ON a.vec_id = c.n_id
       |  JOIN dt t ON t.q_id = c.q_id AND t.m = a.m AND t.cid = a.cid
       |  GROUP BY 1, 2
       |),
       |short AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id
       |             ORDER BY adc, n_id) AS srnk
       |    FROM adc
       |  ) WHERE srnk <= $short
       |),
       |qd AS (
       |  SELECT s.q_id, s.n_id, SUM(a.v * b.v) AS d
       |  FROM short s
       |  JOIN vu a ON a.vec_id = s.n_id
       |  JOIN vu b ON b.vec_id = s.q_id AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin
  }

  /** Inverted-list-layout serve mirror
    * ([[graft.sources.PqIndex.annServeBucketed]]): the composed IVFPQ
    * result restricted to the standard set's minimum q_id — over the
    * probed cells the bucketed flat scan and the cell-join prune
    * coincide by construction, so the mirror is the [[annIvfPq]]
    * relation filtered definitionally. */
  val annServeBucketed: String =
    s"""SELECT * FROM (
       |$annIvfPq
       |) WHERE q_id = (SELECT MIN(vec_id) FROM embeddings
       |                WHERE vec_id % 50 = 0)""".stripMargin

  /** SQ8 ADC mirror ([[graft.pipeline.DataOps.annSq]]): identical
    * per-vector affine codes ([[embedQuantize]]'s rounding), identical
    * exact-integer reconstruction dot `Σ qx·(254·mn + (q+127)·rng)`,
    * same shortlist order (ad DESC, n_id ASC, width
    * [[DataOps.SqShortlist]]), same exact-cosine re-rank tail.
    * `codesPred` (over `c.vec_id`) restricts which stored codes the
    * scan sees — the [[graft.sources.SqIndex.removeBatch]] mirror. */
  private def annSqSql(codesPred: String): String =
    s"""WITH $embCtes,
       |mm AS (
       |  SELECT vec_id, list_min(em) AS mn,
       |         list_max(em) - list_min(em) AS rng
       |  FROM ev
       |),
       |cd AS (
       |  SELECT v.vec_id, v.i,
       |         254 * m.mn + (CASE WHEN m.rng > 0
       |           THEN CAST(ROUND(CAST(v.v - m.mn AS DOUBLE) * 254.0 /
       |             CAST(m.rng AS DOUBLE)) AS BIGINT) - 127
       |           ELSE 0 END + 127) * m.rng AS r254
       |  FROM vu v JOIN mm m USING (vec_id)
       |),
       |ad AS (
       |  SELECT b.vec_id AS q_id, c.vec_id AS n_id, SUM(b.v * c.r254) AS ad
       |  FROM cd c JOIN vu b
       |    ON b.i = c.i AND b.vec_id % 50 = 0 AND c.vec_id <> b.vec_id
       |       AND ($codesPred)
       |  GROUP BY 1, 2
       |),
       |short AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT q_id, n_id,
       |           ROW_NUMBER() OVER (PARTITION BY q_id
       |             ORDER BY ad DESC, n_id ASC) AS srk
       |    FROM ad
       |  ) WHERE srk <= ${DataOps.SqShortlist}
       |),
       |qd AS (
       |  SELECT s.q_id, s.n_id, SUM(a.v * b.v) AS d
       |  FROM short s
       |  JOIN vu a ON a.vec_id = s.n_id
       |  JOIN vu b ON b.vec_id = s.q_id AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin

  val annSq: String = annSqSql("TRUE")

  /** [[graft.sources.SqIndex.annSqRemoved]] mirror: the stored
    * reconstruction filtered to the surviving even vec_ids. */
  lazy val annSqRemoved: String = annSqSql("c.vec_id % 2 = 0")

  val annBrute: String =
    s"""WITH $embCtes,
       |qd AS (
       |  SELECT b.vec_id AS q_id, a.vec_id AS n_id, SUM(a.v * b.v) AS d
       |  FROM vu a JOIN vu b
       |    ON a.i = b.i AND b.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin

  /** Range-search mirror ([[graft.pipeline.DataOps.rangeSearch]]): the
    * [[annBrute]] exact scoring with the radius predicate in place of
    * the top-k rank. */
  val rangeSearch: String =
    s"""WITH $embCtes,
       |qd AS (
       |  SELECT b.vec_id AS q_id, a.vec_id AS n_id, SUM(a.v * b.v) AS d
       |  FROM vu a JOIN vu b
       |    ON a.i = b.i AND b.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(ROUND(CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |           AS cos_micro
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |)
       |SELECT q_id, n_id, cos_micro FROM scored
       |WHERE cos_micro >= ${DataOps.RangeMinCosMicro}""".stripMargin

  /** kNN-vote mirror ([[graft.pipeline.DataOps.knnClassify]]): the
    * [[annBrute]] neighbors inlined (nested-WITH pattern), majority
    * label with the smaller-id tie-break, 0/1 agreement flag. */
  lazy val knnClassify: String =
    s"""WITH nn AS ($annBrute),
       |votes AS (
       |  SELECT nn.q_id, CAST(e.label AS BIGINT) AS n_label,
       |         CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM nn JOIN embeddings e ON e.vec_id = nn.n_id
       |  GROUP BY 1, 2
       |),
       |pred AS (
       |  SELECT q_id, n_label AS pred_label, votes
       |  FROM (SELECT q_id, n_label, votes,
       |          ROW_NUMBER() OVER (PARTITION BY q_id
       |            ORDER BY votes DESC, n_label ASC) AS rk
       |        FROM votes) WHERE rk = 1
       |)
       |SELECT p.q_id, CAST(q.label AS BIGINT) AS label, p.pred_label,
       |       p.votes,
       |       CAST(CASE WHEN p.pred_label = q.label THEN 1 ELSE 0 END
       |            AS BIGINT) AS correct
       |FROM pred p JOIN embeddings q ON q.vec_id = p.q_id""".stripMargin

  /** MMR mirror ([[graft.pipeline.DataOps.mmrDiversify]]): the
    * [[annBrute]] candidates + candidate pair cosines, then the
    * [[graft.pipeline.DataOps.MmrK]]−1 selection rounds UNROLLED as
    * generated CTE chains (ms/s/p/r per round — maxsim against the
    * picked set, division-free 2×-score argmax with the n_id tie-break,
    * cumulative picked union, anti-filtered remaining). */
  lazy val mmrDiversify: String = {
    val k = DataOps.MmrK
    val steps = (2 to k).map { t =>
      s"""ms$t AS (
         |  SELECT r.q_id, r.n_id, r.cos_micro, MAX(p.sim_micro) AS maxsim
         |  FROM r${t - 1} r
         |  JOIN psim p ON p.q_id = r.q_id AND p.a = r.n_id
         |  JOIN p${t - 1} s ON s.q_id = p.q_id AND s.n_id = p.b
         |  GROUP BY 1, 2, 3
         |),
         |s$t AS (
         |  SELECT q_id, n_id, CAST($t AS BIGINT) AS pick, mmr2_micro
         |  FROM (
         |    SELECT q_id, n_id, cos_micro - maxsim AS mmr2_micro,
         |           ROW_NUMBER() OVER (PARTITION BY q_id
         |             ORDER BY cos_micro - maxsim DESC, n_id ASC) AS rn
         |    FROM ms$t
         |  ) WHERE rn = 1
         |),
         |p$t AS (SELECT * FROM p${t - 1} UNION ALL SELECT * FROM s$t),
         |r$t AS (
         |  SELECT r.* FROM r${t - 1} r
         |  WHERE NOT EXISTS (SELECT 1 FROM s$t s
         |                    WHERE s.q_id = r.q_id AND s.n_id = r.n_id)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embCtes,
       |qd AS (
       |  SELECT b.vec_id AS q_id, a.vec_id AS n_id, SUM(a.v * b.v) AS d
       |  FROM vu a JOIN vu b
       |    ON a.i = b.i AND b.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |),
       |cand AS (
       |  SELECT q_id, n_id,
       |         CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro, rnk
       |  FROM (
       |    SELECT q_id, n_id, cs,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |             ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |    FROM scored
       |  ) WHERE rnk <= 10
       |),
       |cv AS (
       |  SELECT c.q_id, c.n_id, v.i, v.v
       |  FROM cand c JOIN vu v ON v.vec_id = c.n_id
       |),
       |pd AS (
       |  SELECT x.q_id, x.n_id AS a, y.n_id AS b, SUM(x.v * y.v) AS d
       |  FROM cv x JOIN cv y
       |    ON y.q_id = x.q_id AND y.i = x.i AND y.n_id <> x.n_id
       |  GROUP BY 1, 2, 3
       |),
       |psim AS (
       |  SELECT pd.q_id, pd.a, pd.b,
       |         CAST(ROUND(CAST(pd.d AS DOUBLE) /
       |           (sqrt(CAST(na.nrm AS DOUBLE)) *
       |            sqrt(CAST(nb.nrm AS DOUBLE))) * $MIC) AS BIGINT)
       |           AS sim_micro
       |  FROM pd
       |  JOIN nrm na ON na.vec_id = pd.a
       |  JOIN nrm nb ON nb.vec_id = pd.b
       |),
       |s1 AS (
       |  SELECT q_id, n_id, CAST(1 AS BIGINT) AS pick,
       |         cos_micro AS mmr2_micro
       |  FROM cand WHERE rnk = 1
       |),
       |p1 AS (SELECT * FROM s1),
       |r1 AS (SELECT q_id, n_id, cos_micro FROM cand WHERE rnk > 1),
       |$steps
       |SELECT q_id, n_id, pick, mmr2_micro FROM p$k""".stripMargin
  }

  /** Hard-negative mirror ([[graft.pipeline.DataOps.hardNegatives]]):
    * the [[annBrute]] exact scoring with the wrong-label predicate
    * applied before the per-query rank, top
    * [[graft.pipeline.DataOps.HardNegK]] kept. */
  val hardNegatives: String =
    s"""WITH $embCtes,
       |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
       |        FROM embeddings),
       |qd AS (
       |  SELECT b.vec_id AS q_id, a.vec_id AS n_id, SUM(a.v * b.v) AS d
       |  FROM vu a JOIN vu b
       |    ON a.i = b.i AND b.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT qd.q_id, qd.n_id,
       |         CAST(qd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM qd
       |  JOIN nrm nn ON nn.vec_id = qd.n_id
       |  JOIN nrm nq ON nq.vec_id = qd.q_id
       |),
       |flt AS (
       |  SELECT s.q_id, lq.label AS q_label, s.n_id,
       |         ln.label AS n_label, s.cs
       |  FROM scored s
       |  JOIN lab lq ON lq.vec_id = s.q_id
       |  JOIN lab ln ON ln.vec_id = s.n_id AND ln.label <> lq.label
       |)
       |SELECT q_id, q_label, n_id, n_label, rnk,
       |       CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, q_label, n_id, n_label, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM flt
       |) WHERE rnk <= ${DataOps.HardNegK}""".stripMargin

  /** Centroid-drift mirror ([[graft.pipeline.DataOps.centroidDrift]]):
    * per-label truncating-integer centroids off the same micro-unit
    * element relation (`//` ≡ Spark `div`, both toward zero — verified
    * on negatives), pairwise centroid cosine with mirrored double
    * normalize, zero-norm centroids dropped. */
  val centroidDrift: String =
    s"""WITH $embCtes,
       |lv AS (
       |  SELECT CAST(e.label AS BIGINT) AS label, v.i, v.v
       |  FROM vu v JOIN embeddings e ON e.vec_id = v.vec_id
       |),
       |comps AS (
       |  SELECT label, i, SUM(v) // COUNT(*) AS c, COUNT(*) AS n
       |  FROM lv GROUP BY 1, 2
       |),
       |nc AS (
       |  SELECT label, SUM(c * c) AS nc, MIN(n) AS n
       |  FROM comps GROUP BY 1 HAVING SUM(c * c) > 0
       |),
       |pd AS (
       |  SELECT a.label AS label_a, b.label AS label_b,
       |         SUM(a.c * b.c) AS d
       |  FROM comps a JOIN comps b
       |    ON a.i = b.i AND a.label < b.label
       |  GROUP BY 1, 2
       |)
       |SELECT p.label_a, p.label_b, na.n AS n_a, nb.n AS n_b,
       |       CAST(ROUND(CAST(p.d AS DOUBLE) /
       |         (sqrt(CAST(na.nc AS DOUBLE)) *
       |          sqrt(CAST(nb.nc AS DOUBLE))) * $MIC) AS BIGINT)
       |         AS cos_micro
       |FROM pd p
       |JOIN nc na ON na.label = p.label_a
       |JOIN nc nb ON nb.label = p.label_b""".stripMargin

  val annIvf: String =
    s"""WITH $embCtes,
       |${crankCte(DataOps.IvfC)},
       |assign1 AS (SELECT vec_id, cid FROM crank WHERE rnk = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, cid FROM crank
       |  WHERE vec_id % 50 = 0 AND rnk <= 4
       |),
       |candi AS (
       |  SELECT p.q_id, a.vec_id AS n_id
       |  FROM probes p JOIN assign1 a ON a.cid = p.cid
       |  WHERE a.vec_id <> p.q_id
       |),
       |cd2 AS (
       |  SELECT c.q_id, c.n_id, SUM(a.v * b.v) AS d
       |  FROM candi c
       |  JOIN vu a ON a.vec_id = c.n_id
       |  JOIN vu b ON b.vec_id = c.q_id AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT cd2.q_id, cd2.n_id,
       |         CAST(cd2.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM cd2
       |  JOIN nrm nn ON nn.vec_id = cd2.n_id
       |  JOIN nrm nq ON nq.vec_id = cd2.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin

  /** LSH-ANN mirror: the ±1 plane matrix regenerates from the same md5
    * parity (sign = hash60('pl:h:i') mod 2), projections and signatures
    * are exact integer sums, and band extraction uses the same
    * truncating div/mod arithmetic — only the final cosine normalize is
    * double, with mirrored operand order. */
  val annLsh: String =
    s"""WITH $embCtes,
       |planes AS (
       |  SELECT h.range AS h, i.range + 1 AS i,
       |         CASE WHEN ${h60("'pl:' || h.range || ':' || i.range")}
       |           % 2 = 0 THEN 1 ELSE -1 END AS c
       |  FROM range(${DataOps.LshPlanes}) h, range(${DataOps.EmbDim}) i
       |),
       |sig AS (
       |  SELECT vec_id,
       |         SUM(CASE WHEN pd >= 0 THEN CAST(POWER(2, h) AS BIGINT)
       |             ELSE 0 END) AS sig
       |  FROM (
       |    SELECT u.vec_id, p.h, SUM(u.v * p.c) AS pd
       |    FROM vu u JOIN planes p ON p.i = u.i
       |    GROUP BY 1, 2
       |  ) t(vec_id, h, pd)
       |  GROUP BY 1
       |),
       |bands AS (
       |  SELECT vec_id, b.range AS b,
       |         (sig // CAST(POWER(2, ${DataOps.LshBandBits} * b.range)
       |            AS BIGINT)) % ${1 << DataOps.LshBandBits} AS bv
       |  FROM sig, range(${DataOps.LshBands}) b
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, d.vec_id AS n_id
       |  FROM bands q JOIN bands d ON q.b = d.b AND q.bv = d.bv
       |  WHERE q.vec_id % 50 = 0 AND d.vec_id <> q.vec_id
       |),
       |cd AS (
       |  SELECT c.q_id, c.n_id, SUM(a.v * b.v) AS d
       |  FROM cand c
       |  JOIN vu a ON a.vec_id = c.n_id
       |  JOIN vu b ON b.vec_id = c.q_id AND b.i = a.i
       |  GROUP BY 1, 2
       |),
       |scored AS (
       |  SELECT cd.q_id, cd.n_id,
       |         CAST(cd.d AS DOUBLE) /
       |           (sqrt(CAST(nn.nrm AS DOUBLE)) *
       |            sqrt(CAST(nq.nrm AS DOUBLE))) AS cs
       |  FROM cd
       |  JOIN nrm nn ON nn.vec_id = cd.n_id
       |  JOIN nrm nq ON nq.vec_id = cd.q_id
       |)
       |SELECT q_id, n_id, rnk, CAST(ROUND(cs * $MIC) AS BIGINT) AS cos_micro
       |FROM (
       |  SELECT q_id, n_id, cs,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY cs DESC, n_id ASC) AS BIGINT) AS rnk
       |  FROM scored
       |) WHERE rnk <= 10""".stripMargin

  /** Decontamination mirror: same 4-token grams, same hash60 join key,
    * same benchmark stand-in (doc_id ≡ 0 mod 97). */
  val decontaminate: String = {
    val n = DataOps.ContamN
    s"""WITH $wrdsCte,
       |gl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= $n THEN
       |           list_distinct(list_transform(range(1, len(w) - ${n - 2}),
       |             i -> ${(0 until n).map(o => s"w[i+$o]").mkString(" || ' ' || ")}))
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT doc_id, unnest(gs) AS gr FROM gl),
       |gh AS (SELECT doc_id, ${h60("gr")} AS gh FROM g),
       |bench AS (SELECT DISTINCT gh FROM gh WHERE doc_id % 97 = 0),
       |hits AS (
       |  SELECT doc_id, COUNT(*) AS hits
       |  FROM gh WHERE doc_id % 97 <> 0 AND gh IN (SELECT gh FROM bench)
       |  GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       |       CAST(CASE WHEN COALESCE(h.hits, 0) > 0 THEN 1 ELSE 0 END
       |         AS BIGINT) AS contaminated
       |FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
       |WHERE d.doc_id % 97 <> 0""".stripMargin
  }

  /** Two-tier bloom decontamination mirror
    * ([[DataOps.bloomDecontaminate]]): same grams, same md5-affine bloom
    * positions (the MinHash coefficient family over P, reduced mod
    * 2^20), same slot-complete membership rule and exact-verify tier. */
  val bloomDecontaminate: String = {
    val n = DataOps.ContamN
    val m = DataOps.BloomBits
    val k = DataOps.BloomK
    val coefs = (0 until k)
      .map(i => s"($i, ${HashFns.aCoef(i)}, ${HashFns.bCoef(i)})")
      .mkString(", ")
    s"""WITH $wrdsCte,
       |gl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= $n THEN
       |           list_distinct(list_transform(range(1, len(w) - ${n - 2}),
       |             i -> ${(0 until n).map(o => s"w[i+$o]").mkString(" || ' ' || ")}))
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT doc_id, unnest(gs) AS gr FROM gl),
       |gh AS (SELECT doc_id, ${h60("gr")} AS gh FROM g),
       |bench AS (SELECT DISTINCT gh FROM gh WHERE doc_id % 97 = 0),
       |coef AS (SELECT * FROM (VALUES $coefs) t(i, a, b)),
       |bpos AS (
       |  SELECT DISTINCT ((a * (gh % $P) + b) % $P) % $m AS pos
       |  FROM bench CROSS JOIN coef
       |),
       |slots AS (
       |  SELECT doc_id, gh, i, ((a * (gh % $P) + b) % $P) % $m AS pos
       |  FROM gh CROSS JOIN coef
       |  WHERE doc_id % 97 <> 0
       |),
       |bg AS (
       |  SELECT doc_id, gh
       |  FROM slots JOIN bpos USING (pos)
       |  GROUP BY doc_id, gh
       |  HAVING COUNT(DISTINCT i) = $k
       |),
       |bd AS (SELECT doc_id, COUNT(*) AS bloom_grams FROM bg GROUP BY 1),
       |ex AS (
       |  SELECT doc_id, COUNT(*) AS exact_grams
       |  FROM bg WHERE gh IN (SELECT gh FROM bench)
       |  GROUP BY 1
       |)
       |SELECT bd.doc_id, bd.bloom_grams,
       |       CAST(COALESCE(ex.exact_grams, 0) AS BIGINT) AS exact_grams,
       |       CAST(CASE WHEN COALESCE(ex.exact_grams, 0) = 0 THEN 1
       |            ELSE 0 END AS BIGINT) AS bloom_fp
       |FROM bd LEFT JOIN ex ON bd.doc_id = ex.doc_id""".stripMargin
  }

  /** Stratified-sample mirror ([[DataOps.stratifiedSample]]): same
    * salted hash60 bucket, same per-language basis-point rates. */
  val stratifiedSample: String = {
    val cases = DataOps.StratRates
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    s"""WITH b AS (
       |  SELECT doc_id, lang,
       |         ${h60("CAST(doc_id AS VARCHAR) || ':strat'")} % 10000
       |           AS bucket
       |  FROM documents
       |)
       |SELECT doc_id, lang, bucket FROM b
       |WHERE bucket < CASE lang $cases ELSE 0 END""".stripMargin
  }

  /** Snapshot-diff mirror: same grams, same EXCEPT set semantics. */
  val snapshotDiff: String = {
    val n = DataOps.ContamN
    s"""WITH $wrdsCte,
       |gl AS (
       |  SELECT source,
       |         CASE WHEN len(w) >= $n THEN
       |           list_distinct(list_transform(range(1, len(w) - ${n - 2}),
       |             i -> ${(0 until n).map(o => s"w[i+$o]").mkString(" || ' ' || ")}))
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT source, unnest(gs) AS gram FROM gl)
       |SELECT gram FROM g WHERE source = 'src1'
       |EXCEPT
       |SELECT gram FROM g WHERE source = 'src0'""".stripMargin
  }

  /** Per-source retention mirror: the textQuality SQL as a derived
    * table, ranked with the same (quality desc, doc_id asc) order.
    * Lazy: `textQuality` is defined further down the object. */
  lazy val keepBestPerSource: String =
    s"""WITH tq AS (SELECT * FROM ($textQuality) q),
       |j AS (
       |  SELECT d.source, t.doc_id, t.quality_micro
       |  FROM tq t JOIN documents d ON d.doc_id = t.doc_id
       |)
       |SELECT source, doc_id, quality_micro, rk FROM (
       |  SELECT source, doc_id, quality_micro,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY quality_micro DESC, doc_id ASC) AS BIGINT) AS rk
       |  FROM j
       |) WHERE rk <= 2""".stripMargin

  /** Length-quantile mirror: identical integer rank picks. */
  val lengthQuantiles: String =
    """WITH r AS (
      |  SELECT source, n_chars,
      |         ROW_NUMBER() OVER (PARTITION BY source
      |           ORDER BY n_chars ASC) AS rn,
      |         COUNT(*) OVER (PARTITION BY source) AS n
      |  FROM documents
      |)
      |SELECT source,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
      |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90,
      |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99,
      |  COUNT(*) AS docs
      |FROM r GROUP BY source""".stripMargin

  /** Source-cap mirror: same salted hash, same (h, doc_id) order. */
  val sourceCap: String =
    s"""SELECT source, doc_id, rk FROM (
       |  SELECT source, doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY h, doc_id) AS BIGINT) AS rk
       |  FROM (SELECT source, doc_id,
       |          ${h60("'cap:' || CAST(doc_id AS VARCHAR)")} AS h
       |        FROM documents)
       |) WHERE rk <= ${DataOps.SourceCapK}""".stripMargin

  /** Hash-sample mirror: identical md5-prefix bucket arithmetic. */
  val sampleByHash: String =
    s"""SELECT doc_id, source,
       |       ${h60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |FROM documents
       |WHERE ${h60("CAST(doc_id AS VARCHAR)")} % 100 < 10""".stripMargin

  // =================================================================
  // Text-analysis family
  // =================================================================

  val langId: String =
    s"""WITH ${Lexicons.langCte},
       |ltok AS (
       |  SELECT doc_id,
       |         unnest(list_filter(
       |           string_split_regex(lower(text), '[^a-z]+'),
       |           x -> x <> '')) AS t
       |  FROM documents
       |),
       |lh AS (
       |  SELECT t.doc_id, p.lang, COUNT(*) AS hits
       |  FROM ltok t JOIN langp p ON t.t = p.word
       |  GROUP BY 1, 2
       |),
       |best AS (
       |  SELECT doc_id, lang, hits FROM (
       |    SELECT doc_id, lang, hits,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY hits DESC, lang ASC) AS rnk
       |    FROM lh
       |  ) WHERE rnk = 1
       |)
       |SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred,
       |       COALESCE(b.hits, 0) AS hits
       |FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id""".stripMargin

  /** Confusion-matrix mirror: the langId SQL joined back to labels. */
  /** Cavnar-Trenkle mirror ([[graft.pipeline.DataOps.langIdNgram]]):
    * same trigram hash60 unit, same (count desc, hash asc) profile
    * ranks, same out-of-place distance with the K out-of-profile
    * penalty, same (dist asc, lang asc) argmin. */
  val langIdNgram: String = {
    val k = DataOps.CtProfK
    s"""WITH lt AS (
       |  SELECT doc_id, lang, lower(text) AS t FROM documents
       |  WHERE length(lower(text)) >= 3
       |),
       |g AS (
       |  SELECT doc_id, lang,
       |         ${h60("substr(t, CAST(i AS INTEGER), 3)")} AS h
       |  FROM (SELECT doc_id, lang,
       |          unnest(range(1, length(t) - 1)) AS i, t
       |        FROM lt)
       |),
       |lp AS (
       |  SELECT lang AS plang, h, CAST(rnk AS BIGINT) AS lrank FROM (
       |    SELECT lang, h,
       |           ROW_NUMBER() OVER (PARTITION BY lang
       |             ORDER BY COUNT(*) DESC, h ASC) AS rnk
       |    FROM g GROUP BY lang, h
       |  ) WHERE rnk <= $k
       |),
       |dp AS (
       |  SELECT doc_id, h, CAST(rnk AS BIGINT) AS drank FROM (
       |    SELECT doc_id, h,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY COUNT(*) DESC, h ASC) AS rnk
       |    FROM g GROUP BY doc_id, h
       |  ) WHERE rnk <= $k
       |),
       |np AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_prof
       |       FROM dp GROUP BY 1),
       |ls AS (SELECT DISTINCT plang FROM lp),
       |mt AS (
       |  SELECT dp.doc_id, lp.plang,
       |         CAST(SUM(ABS(dp.drank - lp.lrank)) AS BIGINT) AS s,
       |         CAST(COUNT(*) AS BIGINT) AS m
       |  FROM dp JOIN lp ON lp.h = dp.h
       |  GROUP BY 1, 2
       |),
       |dist AS (
       |  SELECT np.doc_id, ls.plang,
       |         COALESCE(mt.s, 0) +
       |           (np.n_prof - COALESCE(mt.m, 0)) * $k AS dist
       |  FROM np CROSS JOIN ls
       |  LEFT JOIN mt ON mt.doc_id = np.doc_id AND mt.plang = ls.plang
       |),
       |best AS (
       |  SELECT doc_id, plang, dist FROM (
       |    SELECT doc_id, plang, dist,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY dist ASC, plang ASC) AS rnk
       |    FROM dist
       |  ) WHERE rnk = 1
       |)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(b.plang, 'und') AS lang_pred,
       |  CAST(COALESCE(b.dist, 0) AS BIGINT) AS dist
       |FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id""".stripMargin
  }

  /** Store-probe mirror ([[graft.sources.LangProfileStore.langIdStored]]):
    * the [[langIdNgram]] CTEs with the TRAIN half (lp) restricted to
    * even doc_ids and the SCORE half (dp, output base) to odd ids —
    * the build-once/probe split replayed definitionally, so the parquet
    * round-trip through the profile store is hash-audited. */
  val langIdStored: String = {
    val k = DataOps.CtProfK
    s"""WITH lt AS (
       |  SELECT doc_id, lang, lower(text) AS t FROM documents
       |  WHERE length(lower(text)) >= 3
       |),
       |g AS (
       |  SELECT doc_id, lang,
       |         ${h60("substr(t, CAST(i AS INTEGER), 3)")} AS h
       |  FROM (SELECT doc_id, lang,
       |          unnest(range(1, length(t) - 1)) AS i, t
       |        FROM lt)
       |),
       |lp AS (
       |  SELECT lang AS plang, h, CAST(rnk AS BIGINT) AS lrank FROM (
       |    SELECT lang, h,
       |           ROW_NUMBER() OVER (PARTITION BY lang
       |             ORDER BY COUNT(*) DESC, h ASC) AS rnk
       |    FROM g WHERE doc_id % 2 = 0 GROUP BY lang, h
       |  ) WHERE rnk <= $k
       |),
       |dp AS (
       |  SELECT doc_id, h, CAST(rnk AS BIGINT) AS drank FROM (
       |    SELECT doc_id, h,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY COUNT(*) DESC, h ASC) AS rnk
       |    FROM g WHERE doc_id % 2 = 1 GROUP BY doc_id, h
       |  ) WHERE rnk <= $k
       |),
       |np AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_prof
       |       FROM dp GROUP BY 1),
       |ls AS (SELECT DISTINCT plang FROM lp),
       |mt AS (
       |  SELECT dp.doc_id, lp.plang,
       |         CAST(SUM(ABS(dp.drank - lp.lrank)) AS BIGINT) AS s,
       |         CAST(COUNT(*) AS BIGINT) AS m
       |  FROM dp JOIN lp ON lp.h = dp.h
       |  GROUP BY 1, 2
       |),
       |dist AS (
       |  SELECT np.doc_id, ls.plang,
       |         COALESCE(mt.s, 0) +
       |           (np.n_prof - COALESCE(mt.m, 0)) * $k AS dist
       |  FROM np CROSS JOIN ls
       |  LEFT JOIN mt ON mt.doc_id = np.doc_id AND mt.plang = ls.plang
       |),
       |best AS (
       |  SELECT doc_id, plang, dist FROM (
       |    SELECT doc_id, plang, dist,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY dist ASC, plang ASC) AS rnk
       |    FROM dist
       |  ) WHERE rnk = 1
       |)
       |SELECT d.doc_id, d.lang,
       |  COALESCE(b.plang, 'und') AS lang_pred,
       |  CAST(COALESCE(b.dist, 0) AS BIGINT) AS dist
       |FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
       |WHERE d.doc_id % 2 = 1""".stripMargin
  }

  lazy val langConfusion: String =
    s"""WITH li AS ($langId)
       |SELECT d.lang, li.lang_pred, COUNT(*) AS cnt
       |FROM li JOIN documents d ON d.doc_id = li.doc_id
       |GROUP BY 1, 2""".stripMargin

  val textQuality: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '' AND list_contains(${Lexicons.stopListSql}, x)))
       |      AS BIGINT) AS n_stop,
       |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
       |      AS BIGINT) AS alpha,
       |    CAST(length(text) AS BIGINT) AS nchars,
       |    CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
       |      AS BIGINT) AS punct
       |  FROM documents
       |)
       |SELECT doc_id, n_tok, n_stop,
       |  CASE WHEN n_tok = 0 THEN 0 ELSE
       |    CAST(ROUND(CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE) * $MIC)
       |      AS BIGINT) END AS stop_ratio_micro,
       |  CASE WHEN nchars = 0 THEN 0 ELSE
       |    CAST(ROUND(CAST(punct AS DOUBLE) / CAST(nchars AS DOUBLE) * $MIC)
       |      AS BIGINT) END AS punct_ratio_micro,
       |  CASE WHEN n_tok = 0 THEN 0 ELSE
       |    CAST(ROUND(CAST(alpha AS DOUBLE) / CAST(n_tok AS DOUBLE) * $MIC)
       |      AS BIGINT) END AS avg_wlen_micro,
       |  CAST(ROUND((CAST(LEAST(n_tok, 50) AS DOUBLE) / 50.0 * 0.5 +
       |    LEAST(CAST(n_stop AS DOUBLE) * 3.0 /
       |      CAST(GREATEST(n_tok, 1) AS DOUBLE), 1.0) * 0.3 +
       |    (1.0 - CAST(punct AS DOUBLE) /
       |      CAST(GREATEST(nchars, 1) AS DOUBLE)) * 0.2) * $MIC)
       |    AS BIGINT) AS quality_micro
       |FROM m""".stripMargin

  /** OLS trend mirror ([[graft.pipeline.DataOps.qualityTrend]]): the
    * identical quality formula, HUGEINT moment sums, one truncating
    * division with the same ×10^6 numerator. */
  val qualityTrend: String =
    s"""WITH m AS (
       |  SELECT source,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '' AND list_contains(${Lexicons.stopListSql}, x)))
       |      AS BIGINT) AS n_stop,
       |    CAST(length(text) AS BIGINT) AS nchars,
       |    CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
       |      AS BIGINT) AS punct
       |  FROM documents
       |),
       |q AS (
       |  SELECT source, CAST(nchars AS HUGEINT) AS x,
       |    CAST(CAST(ROUND((CAST(LEAST(n_tok, 50) AS DOUBLE) / 50.0 * 0.5 +
       |      LEAST(CAST(n_stop AS DOUBLE) * 3.0 /
       |        CAST(GREATEST(n_tok, 1) AS DOUBLE), 1.0) * 0.3 +
       |      (1.0 - CAST(punct AS DOUBLE) /
       |        CAST(GREATEST(nchars, 1) AS DOUBLE)) * 0.2) * $MIC)
       |      AS BIGINT) AS HUGEINT) AS y
       |  FROM m
       |),
       |a AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       |         SUM(x) AS sx, SUM(y) AS sy,
       |         SUM(x * y) AS sxy, SUM(x * x) AS sxx
       |  FROM q GROUP BY 1
       |)
       |SELECT source, n,
       |  CAST(sx // n AS BIGINT) AS mean_chars,
       |  CAST(sy // n AS BIGINT) AS mean_quality_micro,
       |  CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
       |       ELSE CAST(((CAST(n AS HUGEINT) * sxy - sx * sy) * 1000000)
       |              // (CAST(n AS HUGEINT) * sxx - sx * sx) AS BIGINT)
       |  END AS slope_ppm
       |FROM a""".stripMargin

  val tokenCount: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |    AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text),
      |    '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS bpe_tokens,
      |  CAST(length(text) AS BIGINT) AS nchars
      |FROM documents""".stripMargin

  /** Fertility mirror ([[graft.pipeline.DataOps.tokenFertility]]): the
    * [[tokenCount]] expressions aggregated per source with the same
    * truncating-integer ratios. */
  val tokenFertility: String =
    """WITH m AS (
      |  SELECT source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS ws,
      |    CAST(len(regexp_extract_all(lower(text),
      |      '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]')) AS BIGINT) AS bpe,
      |    CAST(length(text) AS BIGINT) AS nc
      |  FROM documents
      |),
      |a AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(ws) AS BIGINT) AS ws_tokens,
      |         CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
      |         CAST(SUM(nc) AS BIGINT) AS nchars
      |  FROM m GROUP BY 1
      |)
      |SELECT source, n_docs, ws_tokens, bpe_tokens,
      |  bpe_tokens * 1000000 // GREATEST(ws_tokens, 1) AS fertility_ppm,
      |  nchars * 1000000 // GREATEST(bpe_tokens, 1) AS chars_per_bpe_ppm
      |FROM a""".stripMargin

  val fingerprint: String =
    s"""WITH g AS (
       |  SELECT doc_id,
       |    CASE WHEN length(lower(text)) >= 5 THEN
       |      list_transform(range(1, length(lower(text)) - 3),
       |        i -> substr(lower(text), i, 5))
       |    ELSE CAST([] AS VARCHAR[]) END AS grams
       |  FROM documents
       |),
       |hsx AS (
       |  SELECT doc_id,
       |         list_sort(list_distinct(list_transform(grams,
       |           gg -> ${h60("gg")}))) AS hs
       |  FROM g
       |)
       |SELECT doc_id,
       |  md5(array_to_string(list_transform(list_slice(hs, 1, 4),
       |    x -> CAST(x AS VARCHAR)), ',')) AS fp,
       |  CAST(len(hs) AS BIGINT) AS n_grams
       |FROM hsx""".stripMargin

  /** Winnowing mirror ([[graft.pipeline.DataOps.winnowing]]): identical
    * per-position char-5-gram hash60, identical packed
    * `(h mod 2^36)·2^26 + pos` window-min selection over full windows
    * of ${DataOps.WinnowW}, identical decode. */
  val winnowing: String =
    s"""WITH lt AS (
       |  SELECT doc_id, lower(text) AS t FROM documents
       |  WHERE length(lower(text)) >= ${DataOps.WinnowK}
       |),
       |g AS (
       |  SELECT doc_id,
       |         unnest(range(1, length(t) - ${DataOps.WinnowK - 2})) AS i,
       |         t
       |  FROM lt
       |),
       |el AS (
       |  SELECT doc_id, i - 1 AS pos,
       |         (${h60(s"substr(t, CAST(i AS INTEGER), ${DataOps.WinnowK})")}
       |           % ${1L << 36}) * ${1L << 26} + (i - 1) AS packed
       |  FROM g
       |),
       |win AS (
       |  SELECT doc_id, pos,
       |         MIN(packed) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN CURRENT ROW
       |           AND ${DataOps.WinnowW - 1} FOLLOWING) AS selp,
       |         COUNT(*) OVER (PARTITION BY doc_id) AS ng
       |  FROM el
       |)
       |SELECT DISTINCT doc_id,
       |       selp // ${1L << 26} AS gram_hash,
       |       selp % ${1L << 26} AS pos
       |FROM win WHERE pos <= ng - ${DataOps.WinnowW}""".stripMargin

  /** Winnow-overlap mirror ([[graft.pipeline.DataOps.winnowOverlap]]):
    * the [[winnowing]] query inlined (nested-WITH pattern), same
    * distinct-hash collapse, df ≤ [[DataOps.WinnowMaxDf]] elimination,
    * pair join and ≥ 2 floor. */
  lazy val winnowOverlap: String =
    s"""WITH wsel AS ($winnowing),
       |sel AS (SELECT DISTINCT doc_id, gram_hash FROM wsel),
       |rare AS (
       |  SELECT gram_hash FROM sel GROUP BY 1
       |  HAVING COUNT(*) <= ${DataOps.WinnowMaxDf}
       |),
       |sr AS (SELECT s.doc_id, s.gram_hash
       |       FROM sel s JOIN rare r USING (gram_hash))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM sr a JOIN sr b
       |  ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= 2""".stripMargin

  /** Sequence-packing mirror: same per-source (source, doc_id)-ordered
    * exclusive token prefix sum, same integer chunk arithmetic. */
  val packSequences: String =
    s"""WITH $wrdsCte,
       |t AS (
       |  SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok FROM wrds
       |),
       |c AS (
       |  SELECT doc_id, source, n_tok,
       |         CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS BIGINT) - n_tok AS strt
       |  FROM t
       |)
       |SELECT doc_id, source, n_tok,
       |  strt // ${DataOps.PackBudget} AS seq_id,
       |  strt % ${DataOps.PackBudget} AS off,
       |  (strt + GREATEST(n_tok, 1) - 1) // ${DataOps.PackBudget} AS end_seq
       |FROM c""".stripMargin

  /** Fold-leakage mirror ([[graft.pipeline.DataOps.foldLeakage]]):
    * identical salted fold hash, exact distinct-fold spread per text
    * hash, same per-fold rollup. */
  lazy val foldLeakage: String =
    s"""WITH d AS (
       |  SELECT doc_id, md5(text) AS h,
       |         ${h60("concat('fold|', CAST(doc_id AS VARCHAR))")} %
       |           ${DataOps.KFolds} AS fold
       |  FROM documents
       |),
       |spread AS (
       |  SELECT h, CAST(COUNT(DISTINCT fold) AS BIGINT) AS nf
       |  FROM d GROUP BY 1
       |)
       |SELECT d.fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN s.nf > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_leaked,
       |       CAST((SUM(CASE WHEN s.nf > 1 THEN 1 ELSE 0 END) * 1000000)
       |            // COUNT(*) AS BIGINT) AS leak_ppm
       |FROM d JOIN spread s USING (h)
       |GROUP BY 1""".stripMargin

  /** Packing-efficiency mirror
    * ([[graft.pipeline.DataOps.packingEfficiency]]): the
    * [[packSequences]] relation inlined, one per-source rollup. */
  lazy val packingEfficiency: String =
    s"""WITH ps AS ($packSequences)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_tok) AS BIGINT) AS total_tok,
       |       CAST(MAX(end_seq) + 1 AS BIGINT) AS n_seqs,
       |       CAST(SUM(CASE WHEN end_seq <> seq_id THEN 1 ELSE 0 END)
       |            AS BIGINT) AS split_docs,
       |       CAST((SUM(n_tok) * 1000000) //
       |            ((MAX(end_seq) + 1) * ${DataOps.PackBudget})
       |            AS BIGINT) AS fill_ppm
       |FROM ps GROUP BY 1""".stripMargin

  /** Bigram-head mirror: same bigrams, same (cnt desc, gram asc) rank. */
  val topBigrams: String =
    s"""WITH $wrdsCte,
       |bg AS (
       |  SELECT CASE WHEN len(w) >= 2 THEN
       |           list_transform(range(1, len(w)),
       |             i -> w[i] || ' ' || w[i+1])
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT unnest(gs) AS gram FROM bg),
       |cnts AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1)
       |SELECT gram, cnt, rnk FROM (
       |  SELECT gram, cnt,
       |         ROW_NUMBER() OVER (ORDER BY cnt DESC, gram ASC) AS rnk
       |  FROM cnts
       |) WHERE rnk <= 100""".stripMargin

  /** Vocabulary-head mirror: same (tf desc, token asc) head-100 pick,
    * rank and cumulative-coverage windows over the limited head only,
    * truncating integer coverage division. */
  val vocabCoverage: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
       |vocab AS (
       |  SELECT token, CAST(SUM(cnt) AS BIGINT) AS tf, COUNT(*) AS df
       |  FROM dt GROUP BY 1
       |),
       |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS tot FROM vocab),
       |head AS (
       |  SELECT token, tf, df FROM vocab
       |  ORDER BY tf DESC, token ASC LIMIT 100
       |)
       |SELECT token, tf, df,
       |  CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS BIGINT)
       |    AS rnk,
       |  CAST((CAST(SUM(tf) OVER (ORDER BY tf DESC, token ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    * 1000000) // tot AS BIGINT) AS cum_cover_micro
       |FROM head, tot""".stripMargin

  /** BPE merge-candidate mirror: char pairs over the distinct-token
    * vocabulary weighted by frequency, same (cnt desc, pair asc) rank. */
  val bpeMerges: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT unnest(w) AS token FROM wrds),
       |vocab AS (SELECT token, COUNT(*) AS tf FROM t GROUP BY 1),
       |pr AS (
       |  SELECT substr(token, CAST(i AS INT), 2) AS pair, tf
       |  FROM vocab, LATERAL unnest(range(1, length(token))) u(i)
       |  WHERE length(token) >= 2
       |),
       |cnts AS (SELECT pair, CAST(SUM(tf) AS BIGINT) AS cnt
       |         FROM pr GROUP BY 1)
       |SELECT pair, cnt, rnk FROM (
       |  SELECT pair, cnt,
       |         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC)
       |           AS BIGINT) AS rnk
       |  FROM cnts
       |) WHERE rnk <= 20""".stripMargin

  /** Unigram-surprisal mirror: identical exact-integer bits
    * (length(bin(N // tf)) - 1), identical truncating micro division. */
  /** CCNet-bucket mirror ([[graft.pipeline.DataOps.qualityBuckets]]):
    * the [[unigramSurprisal]] query inlined (the [[dupTriangles]]
    * nested-WITH pattern), same histogram rank-picked tertile
    * thresholds (RANGE cumulative frames in both engines), same
    * ≤-threshold bucket rule. */
  lazy val qualityBuckets: String =
    s"""WITH us AS ($unigramSurprisal),
       |sc AS (
       |  SELECT d.doc_id, d.lang, us.bits_per_tok_micro AS score
       |  FROM documents d JOIN us ON us.doc_id = d.doc_id
       |),
       |hist AS (
       |  SELECT lang, score, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM sc GROUP BY 1, 2
       |),
       |cum AS (
       |  SELECT lang, score, c,
       |         SUM(c) OVER (PARTITION BY lang ORDER BY score) AS cum,
       |         SUM(c) OVER (PARTITION BY lang) AS n
       |  FROM hist
       |),
       |th AS (
       |  SELECT lang,
       |         MIN(CASE WHEN 3 * cum >= n THEN score END) AS t1,
       |         MIN(CASE WHEN 3 * cum >= 2 * n THEN score END) AS t2
       |  FROM cum GROUP BY 1
       |)
       |SELECT sc.doc_id, sc.lang, sc.score AS bits_per_tok_micro,
       |  CASE WHEN sc.score <= th.t1 THEN 'head'
       |       WHEN sc.score <= th.t2 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM sc JOIN th ON th.lang = sc.lang""".stripMargin

  val unigramSurprisal: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
       |vocab AS (
       |  SELECT token, CAST(SUM(cnt) AS BIGINT) AS tf FROM dt GROUP BY 1
       |),
       |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS tot FROM vocab),
       |per AS (
       |  SELECT doc_id,
       |    CAST(SUM(cnt * (length(bin(tot // tf)) - 1)) AS BIGINT)
       |      AS surprisal_bits,
       |    CAST(SUM(cnt) AS BIGINT) AS n_tok
       |  FROM dt JOIN vocab USING (token), tot
       |  GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(p.surprisal_bits, 0) AS BIGINT) AS surprisal_bits,
       |  CAST(COALESCE(p.n_tok, 0) AS BIGINT) AS n_tok,
       |  CAST(CASE WHEN COALESCE(p.n_tok, 0) > 0
       |       THEN (p.surprisal_bits * 1000000) // p.n_tok
       |       ELSE 0 END AS BIGINT) AS bits_per_tok_micro
       |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""".stripMargin

  /** Bigram-surprisal mirror ([[graft.pipeline.DataOps.bigramSurprisal]]):
    * same (doc, bigram) counts, same prefix-context rollup
    * (`split_part` ≡ Spark's `substring_index` on 2-token grams), same
    * `length(bin(x))−1` floor-log2 and truncating divisions. */
  val bigramSurprisal: String =
    s"""WITH $wrdsCte,
       |bgl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 2 THEN
       |           list_transform(range(1, len(w)),
       |             i -> w[i] || ' ' || w[i+1])
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |db AS (SELECT doc_id, unnest(gs) AS bg FROM bgl),
       |dbc AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM db GROUP BY 1, 2),
       |btf AS (SELECT bg, CAST(SUM(cnt) AS BIGINT) AS btf
       |        FROM dbc GROUP BY 1),
       |ctx AS (SELECT split_part(bg, ' ', 1) AS prev,
       |               CAST(SUM(btf) AS BIGINT) AS ctf
       |        FROM btf GROUP BY 1),
       |per AS (
       |  SELECT doc_id,
       |    CAST(SUM(cnt * (length(bin(ctf // btf)) - 1)) AS BIGINT)
       |      AS surprisal_bits,
       |    CAST(SUM(cnt) AS BIGINT) AS n_bigrams
       |  FROM dbc
       |  JOIN btf USING (bg)
       |  JOIN ctx ON ctx.prev = split_part(dbc.bg, ' ', 1)
       |  GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(p.surprisal_bits, 0) AS BIGINT) AS surprisal_bits,
       |  CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(CASE WHEN COALESCE(p.n_bigrams, 0) > 0
       |       THEN (p.surprisal_bits * 1000000) // p.n_bigrams
       |       ELSE 0 END AS BIGINT) AS bits_per_bigram_micro
       |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id""".stripMargin

  /** PMI-collocation mirror ([[graft.pipeline.DataOps.pmiBigrams]]):
    * same top-50 bigram head (cnt desc, gram asc), same HUGEINT triple
    * product and floor division, same `length(bin(x))−1` floor-log2. */
  val pmiBigrams: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT unnest(w) AS token FROM wrds),
       |uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
       |        FROM t GROUP BY 1),
       |nu AS (SELECT CAST(SUM(tf) AS BIGINT) AS n_uni FROM uni),
       |bgl AS (
       |  SELECT CASE WHEN len(w) >= 2 THEN
       |           list_transform(range(1, len(w)),
       |             i -> w[i] || ' ' || w[i+1])
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |bg AS (SELECT unnest(gs) AS gram FROM bgl),
       |bcnt AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
       |         FROM bg GROUP BY 1),
       |nb AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_bi FROM bcnt),
       |top AS (
       |  SELECT gram, cnt,
       |         ROW_NUMBER() OVER (ORDER BY cnt DESC, gram ASC) AS rnk,
       |         split_part(gram, ' ', 1) AS t1,
       |         split_part(gram, ' ', 2) AS t2
       |  FROM bcnt QUALIFY rnk <= 50
       |)
       |SELECT top.gram, top.cnt,
       |       CAST((CAST(top.cnt AS HUGEINT) * n_uni * n_uni * 1000000) //
       |           (CAST(u1.tf AS HUGEINT) * u2.tf * n_bi)
       |         AS BIGINT) AS lift_micro,
       |       CAST(length(bin(CAST(
       |         (CAST(top.cnt AS HUGEINT) * n_uni * n_uni) //
       |           (CAST(u1.tf AS HUGEINT) * u2.tf * n_bi)
       |         AS BIGINT))) - 1 AS BIGINT) AS pmi_bits,
       |       CAST(top.rnk AS BIGINT) AS rnk
       |FROM top
       |JOIN uni u1 ON u1.token = top.t1
       |JOIN uni u2 ON u2.token = top.t2, nu, nb""".stripMargin

  /** Repetition-signal mirror: same micro-unit truncating-division
    * ratios, same thresholds, flag as 0/1 BIGINT. */
  val repetitionSignals: String =
    s"""WITH $wrdsCte,
       |tok AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok,
       |         CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
       |  FROM wrds
       |),
       |bg AS (
       |  SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
       |  FROM wrds, LATERAL unnest(range(1, len(w))) t(i)
       |),
       |bgc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
       |mx AS (
       |  SELECT doc_id, MAX(cnt) AS mc, SUM(cnt) AS tot FROM bgc GROUP BY 1
       |),
       |sg AS (
       |  SELECT t.doc_id, t.n_tok,
       |         CASE WHEN t.n_tok > 0
       |           THEN (t.n_distinct * 1000000) // t.n_tok
       |           ELSE 1000000 END AS distinct_ratio_micro,
       |         CAST(COALESCE((mx.mc * 1000000) // mx.tot, 0) AS BIGINT)
       |           AS top_bigram_micro
       |  FROM tok t LEFT JOIN mx ON mx.doc_id = t.doc_id
       |)
       |SELECT doc_id, n_tok, distinct_ratio_micro, top_bigram_micro,
       |       CAST(CASE WHEN distinct_ratio_micro <
       |                    ${DataOps.RepDistinctMinMicro}
       |                 OR top_bigram_micro >
       |                    ${DataOps.RepTopBigramMaxMicro}
       |            THEN 1 ELSE 0 END AS BIGINT) AS flag_repetitive
       |FROM sg""".stripMargin

  // =================================================================
  // Multimodal plumbing
  // =================================================================

  /** Decoded-feature relation shared by the media-pipeline oracles. */
  private val mediaCte: String =
    s"""med AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 3 AS INTEGER)
      |      WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
      |      ELSE 'video/mp4' END AS mime,
      |    CAST(strlen(text) AS BIGINT) AS n_bytes,
      |    64 + h % 897 AS width,
      |    64 + (h // 1000) % 897 AS height,
      |    CASE WHEN doc_id % 3 = 2 THEN 1 + h % 240 ELSE 1 END AS frames
      |  FROM (
      |    SELECT doc_id, text, ${h60("text")} AS h
      |    FROM documents
      |  )
      |)""".stripMargin

  val multimodal: String =
    s"""WITH $mediaCte
       |SELECT doc_id, mime, n_bytes, width, height, frames FROM med""".stripMargin

  val mediaResize: String =
    s"""WITH $mediaCte
       |SELECT doc_id, width, height,
       |  CASE WHEN width >= height THEN 256
       |       ELSE GREATEST(1, (width * 256) // height) END AS thumb_w,
       |  CASE WHEN width >= height THEN GREATEST(1, (height * 256) // width)
       |       ELSE 256 END AS thumb_h
       |FROM med""".stripMargin

  val frameSample: String =
    s"""WITH $mediaCte
       |SELECT doc_id, mime, frames,
       |  unnest(list_transform(range(0, CAST(LEAST(frames, 8) AS INTEGER)),
       |    j -> (j * frames) // LEAST(frames, 8))) AS frame_idx
       |FROM med""".stripMargin

  /** Chunking mirror ([[DataOps.chunkDocuments]]): same whitespace
    * tokens, same ceil-by-stride chunk count in integer arithmetic. */
  val chunkDocuments: String =
    s"""WITH $wrdsCte,
       |n AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok
       |  FROM wrds WHERE len(w) > 0
       |),
       |c AS (
       |  SELECT doc_id, n_tok,
       |         unnest(range(0, (n_tok + ${DataOps.ChunkStride - 1})
       |           // ${DataOps.ChunkStride})) AS chunk_id
       |  FROM n
       |)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |       CAST(chunk_id * ${DataOps.ChunkStride} AS BIGINT)
       |         AS tok_start,
       |       CAST(LEAST(${DataOps.ChunkTokens},
       |         n_tok - chunk_id * ${DataOps.ChunkStride}) AS BIGINT)
       |         AS chunk_len
       |FROM c""".stripMargin

  /** Cross-modal stats mirror ([[DataOps.docEmbedStats]]): the quality
    * oracle inlined as a derived table, micro-int embedding norms,
    * truncating-division means. */
  def docEmbedStats: String =
    s"""WITH ev AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0)
       |             AS BIGINT)) AS em
       |  FROM embeddings
       |),
       |vu AS (
       |  SELECT vec_id, unnest(em) AS v FROM ev
       |),
       |nr AS (SELECT vec_id, CAST(SUM(v * v) AS BIGINT) AS nrm
       |       FROM vu GROUP BY 1)
       |SELECT d.lang, COUNT(*) AS docs,
       |       CAST(SUM(q.quality_micro) // COUNT(*) AS BIGINT)
       |         AS mean_quality_micro,
       |       CAST(SUM(nr.nrm) // COUNT(*) AS BIGINT) AS mean_norm2
       |FROM documents d
       |JOIN ($textQuality) q ON q.doc_id = d.doc_id
       |JOIN nr ON nr.vec_id = d.doc_id
       |GROUP BY 1""".stripMargin

  /** Source-matrix mirror ([[DataOps.dupSourceMatrix]]): the minhash
    * pair oracle inlined as a derived table, joined to sources twice;
    * integer mean via truncating division of exact micro sums. */
  def dupSourceMatrix: String =
    s"""SELECT LEAST(da.source, db.source) AS src_a,
       |       GREATEST(da.source, db.source) AS src_b,
       |       COUNT(*) AS pairs,
       |       CAST(SUM(m.jac_micro) // COUNT(*) AS BIGINT)
       |         AS mean_jac_micro
       |FROM ($dedupMinhash) m
       |JOIN documents da ON da.doc_id = m.doc_a
       |JOIN documents db ON db.doc_id = m.doc_b
       |GROUP BY 1, 2""".stripMargin

  /** Retention-decision mirror ([[DataOps.retentionDecision]]): each
    * component oracle inlined verbatim as a derived table (DuckDB
    * supports WITH inside subqueries), joined on doc_id — so this
    * composition can never drift from the per-stage oracles. A `def`
    * because it references vals of this object (a val here would read
    * nulls during object initialization). */
  def retentionDecision: String =
    s"""SELECT d.doc_id,
       |  CAST(CASE WHEN l.lang_pred <> 'und' THEN 1 ELSE 0 END AS BIGINT)
       |    AS lang_keep,
       |  CAST(CASE WHEN q.quality_micro >= ${DataOps.QualityFloorMicro}
       |    THEN 1 ELSE 0 END AS BIGINT) AS quality_keep,
       |  CAST(1 - r.flag_repetitive AS BIGINT) AS rep_keep,
       |  CAST(CASE WHEN c.keep THEN 1 ELSE 0 END AS BIGINT) AS dup_keep,
       |  CAST(COALESCE(1 - x.contaminated, 0) AS BIGINT) AS contam_keep,
       |  CAST(CASE WHEN l.lang_pred <> 'und'
       |        AND q.quality_micro >= ${DataOps.QualityFloorMicro}
       |        AND r.flag_repetitive = 0
       |        AND c.keep
       |        AND COALESCE(1 - x.contaminated, 0) = 1
       |    THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM documents d
       |JOIN ($langId) l ON l.doc_id = d.doc_id
       |JOIN ($textQuality) q ON q.doc_id = d.doc_id
       |JOIN ($repetitionSignals) r ON r.doc_id = d.doc_id
       |JOIN ($dedupClusters) c ON c.doc_id = d.doc_id
       |LEFT JOIN ($decontaminate) x ON x.doc_id = d.doc_id""".stripMargin

  /** Curation-funnel mirror ([[DataOps.curationFunnel]]): the
    * [[retentionDecision]] mirror nested verbatim, rolled up with
    * first-gate drop attribution in the fixed pipeline order — the
    * funnel can never drift from the per-doc verdicts. */
  def curationFunnel: String =
    s"""WITH rd AS ($retentionDecision),
       |a AS (
       |  SELECT COUNT(*) AS n0,
       |         COALESCE(SUM(lang_keep), 0) AS n1,
       |         COALESCE(SUM(lang_keep * quality_keep), 0) AS n2,
       |         COALESCE(SUM(lang_keep * quality_keep * rep_keep), 0)
       |           AS n3,
       |         COALESCE(SUM(lang_keep * quality_keep * rep_keep *
       |           dup_keep), 0) AS n4,
       |         COALESCE(SUM(lang_keep * quality_keep * rep_keep *
       |           dup_keep * contam_keep), 0) AS n5
       |  FROM rd
       |),
       |f AS (
       |  SELECT 1 AS stage_ord, 'language' AS stage, n0 AS n_in,
       |         n1 AS n_out FROM a
       |  UNION ALL SELECT 2, 'quality', n1, n2 FROM a
       |  UNION ALL SELECT 3, 'repetition', n2, n3 FROM a
       |  UNION ALL SELECT 4, 'dedup', n3, n4 FROM a
       |  UNION ALL SELECT 5, 'decontamination', n4, n5 FROM a
       |)
       |SELECT CAST(stage_ord AS BIGINT) AS stage_ord, stage,
       |       CAST(n_in AS BIGINT) AS n_in,
       |       CAST(n_out AS BIGINT) AS n_out,
       |       CAST(n_in - n_out AS BIGINT) AS n_dropped,
       |       CAST(CASE WHEN n_in > 0
       |                 THEN ((n_in - n_out) * 1000000) // n_in
       |                 ELSE 0 END AS BIGINT) AS drop_ppm
       |FROM f""".stripMargin

  /** Common-vocabulary mirror ([[graft.pipeline.DataOps.commonVocab]]):
    * the same per-source distinct-token sets, INTERSECT instead of
    * EXCEPT. */
  val commonVocab: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT source, unnest(list_distinct(w)) AS token FROM wrds)
       |SELECT token FROM t WHERE source = 'src0'
       |INTERSECT
       |SELECT token FROM t WHERE source = 'src1'""".stripMargin

  /** Keyword mirror ([[graft.pipeline.DataOps.keywordsTfidf]]): same
    * integer floor-log2 IDF bits, same (score desc, token asc) top-3. */
  /** AMS-F2 mirror ([[graft.pipeline.DataOps.amsF2Skew]]): same ±1
    * md5-parity signs, same one-aggregate Z/F2 sums (HUGEINT ≡ Spark
    * DECIMAL(38,0)), same middle-two-mean median. */
  val amsF2Skew: String = {
    val r = DataOps.AmsGroups * DataOps.AmsPerGroup
    val zSums = (0 until r).map { i =>
      s"SUM(CAST(tf AS HUGEINT) * (1 - 2 * " +
        s"(${h60(s"'ams$i:' || token")} % 2))) AS z$i"
    }.mkString(",\n       |    ")
    val gDefs = (0 until DataOps.AmsGroups).map { g =>
      val terms = (0 until DataOps.AmsPerGroup)
        .map(j => s"z${g * DataOps.AmsPerGroup + j} * " +
          s"z${g * DataOps.AmsPerGroup + j}")
        .mkString(" + ")
      s"($terms) // ${DataOps.AmsPerGroup} AS g$g"
    }.mkString(",\n       |    ")
    s"""WITH $wrdsCte,
       |t AS (SELECT unnest(w) AS token FROM wrds),
       |tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t GROUP BY 1),
       |z AS (
       |  SELECT $zSums,
       |    SUM(CAST(tf AS HUGEINT) * CAST(tf AS HUGEINT)) AS f2,
       |    CAST(SUM(tf) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS nd
       |  FROM tf
       |),
       |g AS (
       |  SELECT f2, n, nd,
       |    $gDefs
       |  FROM z
       |),
       |m AS (
       |  SELECT f2, n, nd,
       |    (g0 + g1 + g2 + g3 - GREATEST(g0, g1, g2, g3)
       |      - LEAST(g0, g1, g2, g3)) // 2 AS f2a
       |  FROM g
       |)
       |SELECT n AS n_occurrences, nd AS n_distinct,
       |  CAST(f2 AS BIGINT) AS f2_exact, CAST(f2a AS BIGINT) AS f2_ams,
       |  CAST(abs(f2a - f2) * 1000000 // f2 AS BIGINT) AS err_ppm
       |FROM m""".stripMargin
  }

  /** Zipf-fit mirror ([[graft.pipeline.DataOps.zipfFit]]): same
    * per-source frequency head, same floor-log2 points, same integer
    * OLS closed form (`//` ≡ Spark `div`, both truncate toward zero —
    * the [[qualityTrend]] precedent on negative slopes). */
  val zipfFit: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT source, unnest(w) AS token FROM wrds),
       |st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t GROUP BY 1, 2),
       |hd AS (
       |  SELECT source,
       |         CAST(length(bin(rnk)) - 1 AS BIGINT) AS x,
       |         CAST(length(bin(tf)) - 1 AS BIGINT) AS y
       |  FROM (
       |    SELECT source, token, tf,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY source
       |             ORDER BY tf DESC, token ASC) AS BIGINT) AS rnk
       |    FROM st
       |  ) WHERE rnk <= ${DataOps.ZipfHead}
       |),
       |a AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_head,
       |         SUM(x) AS sx, SUM(y) AS sy,
       |         SUM(x * y) AS sxy, SUM(x * x) AS sxx
       |  FROM hd GROUP BY 1
       |),
       |s AS (
       |  SELECT source, n_head, sx, sy,
       |         CAST(CASE WHEN n_head * sxx - sx * sx = 0 THEN 0
       |           ELSE ((n_head * sxy - sx * sy) * 1000000)
       |                // (n_head * sxx - sx * sx) END AS BIGINT)
       |           AS slope_micro
       |  FROM a
       |)
       |SELECT source, n_head, slope_micro,
       |       CAST((sy * 1000000 - slope_micro * sx) // n_head AS BIGINT)
       |         AS intercept_micro
       |FROM s""".stripMargin

  /** Ranked-retrieval mirror ([[graft.pipeline.DataOps.tfidfSearch]]):
    * same 3-term distinctiveness query head, same integer tf·idf_bits
    * scoring, same (score desc, doc_id asc) top-10. */
  val tfidfSearch: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM t GROUP BY 1, 2),
       |vocab AS (SELECT token, CAST(SUM(cnt) AS BIGINT) AS tf,
       |                 CAST(COUNT(*) AS BIGINT) AS df
       |          FROM dt GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |q AS (
       |  SELECT token,
       |         CAST(length(bin(n.n // df)) - 1 AS BIGINT) AS idf_bits
       |  FROM vocab, n
       |  ORDER BY tf * (length(bin(n.n // df)) - 1) DESC, token ASC
       |  LIMIT 3
       |),
       |sc AS (
       |  SELECT dt.doc_id,
       |         CAST(SUM(dt.cnt * q.idf_bits) AS BIGINT) AS score,
       |         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
       |  FROM dt JOIN q USING (token) GROUP BY 1
       |)
       |SELECT doc_id, score, rnk, n_terms_hit FROM (
       |  SELECT doc_id, score, n_terms_hit,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
       |           AS BIGINT) AS rnk
       |  FROM sc WHERE score > 0
       |) WHERE rnk <= 10""".stripMargin

  /** BM25 mirror ([[graft.pipeline.DataOps.bm25Search]]): same 3-term
    * query head, same exact-rational reduction of k1=6/5, b=3/4 to one
    * HUGEINT division per term, same top-10. */
  val bm25Search: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM t GROUP BY 1, 2),
       |dls AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS dl
       |        FROM dt GROUP BY 1),
       |vocab AS (SELECT token, CAST(SUM(cnt) AS BIGINT) AS tf,
       |                 CAST(COUNT(*) AS BIGINT) AS df
       |          FROM dt GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |s AS (SELECT CAST(SUM(dl) AS HUGEINT) AS sdl FROM dls),
       |q AS (
       |  SELECT token,
       |         CAST(length(bin(n.n // df)) - 1 AS BIGINT) AS idf_bits
       |  FROM vocab, n
       |  ORDER BY tf * (length(bin(n.n // df)) - 1) DESC, token ASC
       |  LIMIT 3
       |),
       |terms AS (
       |  SELECT dt.doc_id,
       |         CAST((CAST(44 AS HUGEINT) * q.idf_bits * dt.cnt * s.sdl
       |                 * 1000000)
       |              // (CAST(20 AS HUGEINT) * dt.cnt * s.sdl + 6 * s.sdl
       |                 + CAST(18 AS HUGEINT) * dls.dl * n.n)
       |           AS BIGINT) AS term_micro
       |  FROM dt
       |  JOIN q USING (token)
       |  JOIN dls USING (doc_id), n, s
       |),
       |sc AS (
       |  SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS score_micro,
       |         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
       |  FROM terms GROUP BY 1
       |)
       |SELECT doc_id, score_micro, rnk, n_terms_hit FROM (
       |  SELECT doc_id, score_micro, n_terms_hit,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC,
       |           doc_id ASC) AS BIGINT) AS rnk
       |  FROM sc WHERE score_micro > 0
       |) WHERE rnk <= 10""".stripMargin

  /** RRF mirror ([[graft.pipeline.DataOps.rrfFusion]]): the two ranker
    * mirrors inlined (nested-WITH pattern), full-outer joined, fused by
    * the exact-integer `10^6 // (k + rank)` sum, re-ranked. */
  lazy val rrfFusion: String =
    s"""WITH tf AS ($tfidfSearch),
       |bm AS ($bm25Search),
       |j AS (
       |  SELECT COALESCE(tf.doc_id, bm.doc_id) AS doc_id,
       |         CAST(COALESCE(tf.rnk, 0) AS BIGINT) AS tfidf_rnk,
       |         CAST(COALESCE(bm.rnk, 0) AS BIGINT) AS bm25_rnk
       |  FROM tf FULL OUTER JOIN bm ON bm.doc_id = tf.doc_id
       |),
       |s AS (
       |  SELECT doc_id, tfidf_rnk, bm25_rnk,
       |         CAST((CASE WHEN tfidf_rnk > 0
       |                 THEN 1000000 // (${DataOps.RrfK} + tfidf_rnk)
       |                 ELSE 0 END) +
       |              (CASE WHEN bm25_rnk > 0
       |                 THEN 1000000 // (${DataOps.RrfK} + bm25_rnk)
       |                 ELSE 0 END) AS BIGINT) AS rrf_micro
       |  FROM j
       |)
       |SELECT doc_id, tfidf_rnk, bm25_rnk, rrf_micro,
       |       CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC,
       |         doc_id ASC) AS BIGINT) AS rnk
       |FROM s""".stripMargin

  /** CDC mirror ([[graft.pipeline.DataOps.cdcChunks]]): boundary
    * prefix-sum chunk ids per doc, HUGEINT positional fingerprints
    * (≡ the engine's DECIMAL(38) arithmetic), duplicate rollup. */
  val cdcChunks: String =
    s"""WITH $wrdsCte,
       |wu AS (SELECT doc_id, unnest(w) AS t,
       |              generate_subscripts(w, 1) - 1 AS pos
       |       FROM wrds),
       |th AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |              ${h60("t")} AS h
       |       FROM wu),
       |ck AS (
       |  SELECT doc_id, pos, h,
       |         COALESCE(SUM(CASE WHEN h % ${DataOps.CdcMod} = 0
       |             THEN 1 ELSE 0 END) OVER
       |           (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           0) AS chunk
       |  FROM th
       |),
       |agg AS (
       |  SELECT doc_id, chunk, MIN(pos) AS start_pos,
       |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         SUM(CAST(h AS HUGEINT) * (pos + 1)) AS pw,
       |         SUM(CAST(h AS HUGEINT)) AS hs
       |  FROM ck GROUP BY 1, 2
       |),
       |fps AS (
       |  SELECT doc_id, n_tokens,
       |         CAST((pw - start_pos * hs) % ${1L << 60} AS BIGINT) AS fp
       |  FROM agg
       |)
       |SELECT fp, n_tokens,
       |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(COUNT(*) AS BIGINT) AS n_occ,
       |       MIN(doc_id) AS min_doc
       |FROM fps GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin

  /** Source-profile mirror ([[graft.pipeline.DataOps.sourceKeywords]]):
    * same (source, token) count relation, HUGEINT lift products,
    * truncating division, floor-log2 score, per-source top-5. */
  val sourceKeywords: String =
    s"""WITH $wrdsCte,
       |tk AS (SELECT source, unnest(w) AS t FROM wrds),
       |st AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM tk GROUP BY 1, 2),
       |rs AS (SELECT source, SUM(cnt) AS r FROM st GROUP BY 1),
       |cs AS (SELECT t, SUM(cnt) AS c FROM st GROUP BY 1),
       |n AS (SELECT SUM(cnt) AS n FROM st),
       |scored AS (
       |  SELECT st.source, st.t AS token, st.cnt,
       |         CAST((CAST(st.cnt AS HUGEINT) * n.n * 1000000)
       |              // (CAST(rs.r AS HUGEINT) * cs.c) AS BIGINT)
       |           AS lift_micro,
       |         CAST((CAST(st.cnt AS HUGEINT) * n.n)
       |              // (CAST(rs.r AS HUGEINT) * cs.c) AS BIGINT) AS q
       |  FROM st JOIN rs USING (source) JOIN cs USING (t), n
       |),
       |sc AS (
       |  SELECT source, token, cnt, lift_micro,
       |         cnt * CAST(length(bin(q)) - 1 AS BIGINT) AS score
       |  FROM scored WHERE q >= 2
       |)
       |SELECT source, token, cnt, lift_micro, score, rk
       |FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY score DESC, token ASC) AS BIGINT) AS rk
       |  FROM sc
       |) WHERE rk <= ${DataOps.SourceKeyK}""".stripMargin

  val keywordsTfidf: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       |       FROM t GROUP BY 1, 2),
       |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
       |          FROM dt GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |scored AS (
       |  SELECT dt.doc_id, dt.token, dt.tf,
       |         CAST(length(bin(n.n // dfreq.df)) - 1 AS BIGINT)
       |           AS idf_bits,
       |         CAST(dt.tf * (length(bin(n.n // dfreq.df)) - 1)
       |           AS BIGINT) AS score
       |  FROM dt JOIN dfreq USING (token), n
       |),
       |r AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, token ASC) AS BIGINT) AS rk
       |  FROM scored
       |)
       |SELECT doc_id, token, tf, idf_bits, score, rk
       |FROM r WHERE rk <= 3""".stripMargin

  /** Triangle mirror ([[graft.pipeline.DataOps.dupTriangles]]): the
    * definitional three-way join over the inlined [[dedupMinhash]] pair
    * set (pairs are doc_a < doc_b, so each triangle matches exactly
    * once and arrives id-sorted). */
  val dupTriangles: String =
    s"""WITH pairs AS ($dedupMinhash)
       |SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b, e2.doc_b AS doc_c
       |FROM pairs e1
       |JOIN pairs e2 ON e1.doc_b = e2.doc_a
       |JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b""".stripMargin

  /** Typo-pair mirror ([[graft.pipeline.DataOps.typoPairs]]): the
    * DEFINITIONAL all-pairs Levenshtein join over the same
    * length-capped vocabulary — correct by construction at oracle scale,
    * which is exactly what the deletion-neighborhood plan must match. */
  val typoPairs: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT unnest(w) AS token FROM wrds),
       |v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
       |      FROM t WHERE length(token) <= ${DataOps.MaxTypoTokenLen}
       |      GROUP BY 1)
       |SELECT a.token AS tok_a, b.token AS tok_b,
       |       CAST(levenshtein(a.token, b.token) AS BIGINT) AS dist,
       |       a.tf AS tf_a, b.tf AS tf_b
       |FROM v a JOIN v b ON a.token < b.token
       |WHERE levenshtein(a.token, b.token) <= 2""".stripMargin

  /** KMV quantile-sketch mirror
    * ([[graft.pipeline.DataOps.kmvQuantiles]]): same salted hash order
    * (ties by doc_id), same k-smallest sample, same rank-pick
    * convention as the exact lengthQuantiles mirror. */
  val kmvQuantiles: String =
    s"""WITH h AS (
       |  SELECT source, doc_id, n_chars,
       |         ${h60("'kmvq:' || CAST(doc_id AS VARCHAR)")} AS h,
       |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
       |           AS docs
       |  FROM documents
       |),
       |k AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY h, doc_id) AS hrk FROM h)
       |  WHERE hrk <= ${DataOps.KmvQuantK}
       |),
       |r AS (
       |  SELECT source, docs, n_chars,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY n_chars ASC) AS rn,
       |         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS m
       |  FROM k
       |)
       |SELECT source, MAX(docs) AS docs, MAX(m) AS sample_n,
       |  MAX(CASE WHEN rn = (m + 1) // 2 THEN n_chars END) AS p50_est,
       |  MAX(CASE WHEN rn = (9 * m + 9) // 10 THEN n_chars END)
       |    AS p90_est,
       |  MAX(CASE WHEN rn = (99 * m + 99) // 100 THEN n_chars END)
       |    AS p99_est
       |FROM r GROUP BY source""".stripMargin

  /** Heavy-hitter mirror ([[graft.pipeline.DataOps.heavyHitters]]): the
    * DEFINITIONAL full-vocabulary aggregate + share filter — exactly
    * what the two-phase candidate plan must reproduce (a phase-1
    * completeness failure would surface as missing rows here). */
  val heavyHitters: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT unnest(w) AS token FROM wrds),
       |v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
       |      FROM t GROUP BY 1),
       |n AS (SELECT CAST(SUM(tf) AS BIGINT) AS n FROM v)
       |SELECT token, tf,
       |       CAST(tf * 1000000 // n.n AS BIGINT) AS support_ppm
       |FROM v, n WHERE tf * ${DataOps.HeavyInv} >= n.n""".stripMargin

  /** Count-Min mirror ([[graft.pipeline.DataOps.cmsFrequency]]): same
    * salts, same bucket arithmetic, same min-over-rows estimate. */
  val cmsFrequency: String = {
    val d = DataOps.CmsD
    val w = DataOps.CmsW
    val bucketSql = (r: Int, tok: String) =>
      s"${h60(s"'cms$r:' || $tok")} % $w"
    s"""WITH $wrdsCte,
       |t AS (SELECT unnest(w) AS token FROM wrds),
       |cells AS (
       |  ${(0 until d).map(r =>
            s"SELECT $r AS r, ${bucketSql(r, "token")} AS bucket FROM t")
            .mkString("\n  UNION ALL\n  ")}
       |),
       |sketch AS (SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS c
       |           FROM cells GROUP BY 1, 2),
       |head AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM t
       |  GROUP BY 1 ORDER BY tf DESC, token ASC LIMIT 10
       |),
       |probes AS (
       |  ${(0 until d).map(r =>
            s"SELECT token, tf, $r AS r, ${bucketSql(r, "token")} AS bucket FROM head")
            .mkString("\n  UNION ALL\n  ")}
       |)
       |SELECT p.token, p.tf AS tf_exact, MIN(s.c) AS tf_cms,
       |       MIN(s.c) - p.tf AS overcount
       |FROM probes p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
       |GROUP BY p.token, p.tf""".stripMargin
  }

  /** Gopher-rule filter mirror ([[graft.pipeline.DataOps.gopherFilter]]):
    * identical cross-multiplied integer rules, identical fixed-order
    * reason join. */
  /** Shared PII-fixture CTE ([[graft.pipeline.DataOps.withPiiText]]):
    * identical integer-derived email/IPv4/phone appendage. */
  // NOTE: no line below may START with '||' — this CTE is interpolated
  // into outer s"""...""".stripMargin strings, whose stripMargin would
  // eat the first pipe of a leading '||'.
  private val piiCte: String =
    """pii AS (
      |  SELECT doc_id, text ||
      |    CASE WHEN doc_id % 7 = 0 THEN ' mail u' ||
      |         CAST(doc_id AS VARCHAR) || '@ex' ||
      |         CAST(doc_id % 13 AS VARCHAR) || '.org' ELSE '' END ||
      |    CASE WHEN doc_id % 11 = 0 THEN ' from 10.' ||
      |         CAST(doc_id % 256 AS VARCHAR) || '.' ||
      |         CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
      |         CAST(doc_id % 97 AS VARCHAR) ELSE '' END ||
      |    CASE WHEN doc_id % 13 = 0 THEN ' call +' ||
      |         CAST(10 + doc_id % 90 AS VARCHAR) || '-' ||
      |         CAST(100 + doc_id % 900 AS VARCHAR) || '-' ||
      |         CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
      |    AS t
      |  FROM documents
      |)""".stripMargin

  /** PII-scan mirror ([[graft.pipeline.DataOps.piiScan]]): same
    * fixture injection, same character-class-only patterns (identical
    * spans under Java and RE2). */
  val piiScan: String =
    s"""WITH $piiCte
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '${DataOps.EmailRe}')) AS BIGINT)
       |    AS n_email,
       |  CAST(len(regexp_extract_all(t, '${DataOps.IpRe}')) AS BIGINT)
       |    AS n_ip,
       |  CAST(len(regexp_extract_all(t, '${DataOps.PhoneRe}')) AS BIGINT)
       |    AS n_phone,
       |  CAST(len(regexp_extract_all(t, '${DataOps.EmailRe}'))
       |    + len(regexp_extract_all(t, '${DataOps.IpRe}'))
       |    + len(regexp_extract_all(t, '${DataOps.PhoneRe}')) AS BIGINT)
       |    AS n_pii,
       |  len(regexp_extract_all(t, '${DataOps.EmailRe}'))
       |    + len(regexp_extract_all(t, '${DataOps.IpRe}'))
       |    + len(regexp_extract_all(t, '${DataOps.PhoneRe}')) > 0
       |    AS has_pii
       |FROM pii""".stripMargin

  /** PII-redact mirror: same mask order (email, ip, phone), global
    * replacement ('g' — Spark's regexp_replace is global by default). */
  val piiRedact: String =
    s"""WITH $piiCte
       |SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '${DataOps.EmailRe}', '<EMAIL>', 'g'),
       |    '${DataOps.IpRe}', '<IP>', 'g'),
       |    '${DataOps.PhoneRe}', '<PHONE>', 'g') AS clean_text,
       |  CAST(len(regexp_extract_all(t, '${DataOps.EmailRe}'))
       |    + len(regexp_extract_all(t, '${DataOps.IpRe}'))
       |    + len(regexp_extract_all(t, '${DataOps.PhoneRe}')) AS BIGINT)
       |    AS n_redacted
       |FROM pii""".stripMargin

  val gopherFilter: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |      x -> x <> '' AND list_contains(${Lexicons.stopListSql}, x)))
       |      AS BIGINT) AS n_stop,
       |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
       |      AS BIGINT) AS alpha,
       |    CAST(length(text) AS BIGINT) AS nchars,
       |    CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
       |      AS BIGINT) AS punct
       |  FROM documents
       |),
       |r AS (
       |  SELECT doc_id,
       |    n_tok < 20 AS r_short, n_tok > 100000 AS r_long,
       |    alpha < 4 * n_tok AS r_wlow, alpha > 10 * n_tok AS r_whigh,
       |    10 * punct > nchars AS r_sym, n_stop = 0 AS r_nostop
       |  FROM m
       |)
       |SELECT doc_id,
       |  NOT (r_short OR r_long OR r_wlow OR r_whigh OR r_sym OR r_nostop)
       |    AS keep,
       |  concat_ws(',',
       |    CASE WHEN r_short THEN 'too_short' END,
       |    CASE WHEN r_long THEN 'too_long' END,
       |    CASE WHEN r_wlow THEN 'word_len_low' END,
       |    CASE WHEN r_whigh THEN 'word_len_high' END,
       |    CASE WHEN r_sym THEN 'symbol_heavy' END,
       |    CASE WHEN r_nostop THEN 'no_stopwords' END) AS reasons
       |FROM r""".stripMargin

  /** Mix-quota mirror ([[graft.pipeline.DataOps.mixQuotas]]): identical
    * corrected integer sqrt and Hamilton largest-remainder
    * apportionment. */
  val mixQuotas: String = mixQuotasSql(DataOps.MixBudget)

  private def mixQuotasSql(B: Long): String =
    s"""WITH ps AS (
       |  SELECT source,
       |    CAST(SUM(CAST(len(regexp_extract_all(lower(text),
       |      '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT))
       |      AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |),
       |w AS (
       |  SELECT source, tokens,
       |    CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT)
       |      - CASE WHEN CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT)
       |               * CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE))) AS BIGINT)
       |               > tokens THEN 1 ELSE 0 END AS w0
       |  FROM ps
       |),
       |wt AS (
       |  SELECT source, tokens,
       |    w0 + CASE WHEN (w0 + 1) * (w0 + 1) <= tokens THEN 1 ELSE 0 END
       |      AS weight
       |  FROM w
       |),
       |b AS (
       |  SELECT source, tokens, weight,
       |    $B * weight // (SELECT SUM(weight) FROM wt) AS base,
       |    ($B * weight) % (SELECT SUM(weight) FROM wt) AS rem
       |  FROM wt
       |)
       |SELECT source, tokens, weight,
       |  CAST(base + CASE WHEN
       |      ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
       |        <= $B - (SELECT SUM(base) FROM b)
       |    THEN 1 ELSE 0 END AS BIGINT) AS quota
       |FROM b""".stripMargin

  /** Quota-sample mirror ([[graft.pipeline.DataOps.quotaSample]]): the
    * straightforward full-sort form — per source, the greedy prefix in
    * (h, doc_id) order whose running token sum fits the quota. The Spark
    * side's bucket decomposition orders by (h div 2^44, h, doc_id) ≡
    * (h, doc_id), so the kept sets are identical. */
  val quotaSample: String =
    s"""WITH q AS (${mixQuotasSql(DataOps.SampleBudget)}),
       |d AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(lower(text),
       |      '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT)
       |      AS tokens,
       |    ${h60("concat('mix|', CAST(doc_id AS VARCHAR))")} AS h
       |  FROM documents
       |),
       |c AS (
       |  SELECT doc_id, source, tokens,
       |    SUM(tokens) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d WHERE tokens > 0
       |)
       |SELECT c.doc_id, c.source, c.tokens
       |FROM c JOIN q ON c.source = q.source
       |WHERE c.cum <= q.quota""".stripMargin

  /** Positional-posting CTE shared by the search-index mirrors: one row
    * per (doc, 0-based token position), tokens = the whitespace unit of
    * [[wrdsCte]] (≡ WordGramsExpr n=1). */
  private val posCte: String =
    s"""$wrdsCte,
       |pos AS (
       |  SELECT doc_id, unnest(w) AS t,
       |         generate_subscripts(w, 1) - 1 AS pos
       |  FROM wrds
       |)""".stripMargin

  /** Inverted-index mirror
    * ([[graft.pipeline.DataOps.invertedIndex]]): tokenize with
    * positions, one GROUP BY (token, doc). */
  val invertedIndex: String =
    s"""WITH $posCte
       |SELECT t, doc_id, COUNT(*) AS tf,
       |       CAST(MIN(pos) AS BIGINT) AS first_pos,
       |       CAST(MAX(pos) AS BIGINT) AS last_pos
       |FROM pos GROUP BY 1, 2""".stripMargin

  /** Phrase-search mirror ([[graft.pipeline.DataOps.phraseSearch]]):
    * same modal-trigram head (count DESC, gram ASC LIMIT 1), same
    * start-anchor alignment aggregate (a posting for part i at position
    * p votes for start p − i; a start with 3 votes is an occurrence). */
  /** Phrase-search mirror, parameterized by the POSITIONAL-side
    * predicate (over `pos.doc_id`): the phrase head stays the full
    * corpus's modal trigram (the query stand-in comes from outside the
    * store), while the position algebra sees only the predicate's
    * documents — the [[graft.sources.PositionsIndex.removeBatch]]
    * mirror. */
  private def phraseSearchT(postingsPred: String): String =
    s"""WITH $posCte,
       |tri AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 3 THEN
       |           list_transform(range(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT doc_id, unnest(gs) AS gr FROM tri),
       |top AS (SELECT gr FROM (SELECT gr, COUNT(*) AS c FROM g GROUP BY 1
       |                        ORDER BY c DESC, gr ASC LIMIT 1)),
       |parts AS (
       |  SELECT gr, unnest(string_split(gr, ' ')) AS t,
       |         generate_subscripts(string_split(gr, ' '), 1) - 1 AS i
       |  FROM top
       |),
       |starts AS (
       |  SELECT pos.doc_id, parts.gr, pos.pos - parts.i AS strt,
       |         COUNT(*) AS k
       |  FROM pos JOIN parts ON pos.t = parts.t
       |  WHERE $postingsPred
       |  GROUP BY 1, 2, 3
       |)
       |SELECT doc_id, gr AS phrase, COUNT(*) AS n_hits,
       |       CAST(MIN(strt) AS BIGINT) AS first_pos
       |FROM starts WHERE k = 3 GROUP BY 1, 2""".stripMargin

  val phraseSearch: String = phraseSearchT("TRUE")

  /** Proximity-search mirror ([[DataOps.proximitySearch]]): the modal
    * trigram's first/last words as the standard term pair, windowed
    * position-pair algebra (same-position pairs excluded), min
    * distance + within-window pair count, HAVING the window. */
  val proximitySearch: String = {
    val w = DataOps.ProximityWindow
    s"""WITH $posCte,
       |tri AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 3 THEN
       |           list_transform(range(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT doc_id, unnest(gs) AS gr FROM tri),
       |top AS (SELECT gr FROM (SELECT gr, COUNT(*) AS c FROM g GROUP BY 1
       |                        ORDER BY c DESC, gr ASC LIMIT 1)),
       |terms AS (
       |  SELECT string_split(gr, ' ')[1] AS ta,
       |         string_split(gr, ' ')[3] AS tb
       |  FROM top
       |),
       |pa AS (SELECT pos.doc_id, t.ta, pos.pos AS pos_a
       |       FROM pos JOIN terms t ON pos.t = t.ta),
       |pb AS (SELECT pos.doc_id, t.tb, pos.pos AS pos_b
       |       FROM pos JOIN terms t ON pos.t = t.tb),
       |pr AS (
       |  SELECT pa.doc_id, pa.ta AS t_a, pb.tb AS t_b,
       |         ABS(pos_a - pos_b) AS d
       |  FROM pa JOIN pb ON pa.doc_id = pb.doc_id
       |  WHERE pos_a <> pos_b
       |)
       |SELECT doc_id, t_a, t_b,
       |       CAST(MIN(d) AS BIGINT) AS min_dist,
       |       CAST(SUM(CASE WHEN d <= $w THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_pairs_w
       |FROM pr GROUP BY 1, 2, 3
       |HAVING MIN(d) <= $w""".stripMargin
  }

  /** [[graft.sources.PositionsIndex.phraseRemoved]] mirror: positions
    * filtered to the surviving even doc_ids. */
  lazy val phraseRemoved: String = phraseSearchT("pos.doc_id % 2 = 0")

  /** Multi-pair serving mirror ([[DataOps.proximityServe]]): the top-2
    * modal trigrams each contribute their (first, last)-word pair,
    * q_id-keyed through the identical windowed position-pair algebra. */
  val proximityServe: String = {
    val w = DataOps.ProximityWindow
    s"""WITH $posCte,
       |tri AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= 3 THEN
       |           list_transform(range(1, len(w) - 1),
       |             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT doc_id, unnest(gs) AS gr FROM tri),
       |top2 AS (
       |  SELECT gr, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, gr ASC)
       |             AS BIGINT) AS q_id
       |  FROM (SELECT gr, COUNT(*) AS c FROM g GROUP BY 1
       |        ORDER BY c DESC, gr ASC LIMIT 2)
       |),
       |terms AS (
       |  SELECT q_id, string_split(gr, ' ')[1] AS ta,
       |         string_split(gr, ' ')[3] AS tb
       |  FROM top2
       |),
       |pa AS (SELECT t.q_id, pos.doc_id, t.ta, pos.pos AS pos_a
       |       FROM pos JOIN terms t ON pos.t = t.ta),
       |pb AS (SELECT t.q_id, pos.doc_id, t.tb, pos.pos AS pos_b
       |       FROM pos JOIN terms t ON pos.t = t.tb),
       |pr AS (
       |  SELECT pa.q_id, pa.doc_id, pa.ta AS t_a, pb.tb AS t_b,
       |         ABS(pos_a - pos_b) AS d
       |  FROM pa JOIN pb ON pa.q_id = pb.q_id AND pa.doc_id = pb.doc_id
       |  WHERE pos_a <> pos_b
       |)
       |SELECT q_id, doc_id, t_a, t_b,
       |       CAST(MIN(d) AS BIGINT) AS min_dist,
       |       CAST(SUM(CASE WHEN d <= $w THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_pairs_w
       |FROM pr GROUP BY 1, 2, 3, 4
       |HAVING MIN(d) <= $w""".stripMargin
  }

  /** DSIR importance-weight mirror
    * ([[graft.pipeline.DataOps.dsirWeights]]): identical hashed-bigram
    * bucketing (hash60 % B), identical add-one-smoothed exact-integer
    * floor-log2 bit difference, identical keep rule. */
  /** DSIR mirror, parameterized by the TRAINING predicate (over bare
    * `doc_id`): the bucket statistics derive from the `trainPred`
    * sub-corpus while every document scores — the
    * [[graft.sources.DsirStore.removeBatch]] mirror (`dsirRemoved`
    * trains on the surviving evens, scores all). The score join is
    * LEFT + coalesce-0 exactly like the Spark side: a bucket the
    * training half never produced falls to the add-one smoothing
    * floor instead of dropping (with `TRUE` the left join is
    * definitionally inner — every scored bucket exists). */
  private def dsirWeightsT(trainPred: String): String = {
    val B = DataOps.DsirBuckets
    s"""WITH wl AS (
       |  SELECT doc_id, lang,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents
       |),
       |bg AS (
       |  SELECT doc_id, lang, unnest(
       |    CASE WHEN len(w) >= 2 THEN
       |      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |    ELSE CAST([] AS VARCHAR[]) END) AS bg
       |  FROM wl
       |),
       |db AS (
       |  SELECT doc_id, lang, ${h60("bg")} % $B AS b,
       |         CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM bg GROUP BY 1, 2, 3
       |),
       |dbt AS (SELECT * FROM db WHERE $trainPred),
       |rawc AS (
       |  SELECT b, CAST(SUM(cnt) AS BIGINT) AS raw_cnt FROM dbt GROUP BY 1
       |),
       |tgtc AS (
       |  SELECT b, CAST(SUM(cnt) AS BIGINT) AS tgt_cnt FROM dbt
       |  WHERE lang = '${DataOps.DsirTargetLang}' GROUP BY 1
       |),
       |bk AS (
       |  SELECT rawc.b, raw_cnt, COALESCE(tgt_cnt, 0) AS tgt_cnt
       |  FROM rawc LEFT JOIN tgtc ON tgtc.b = rawc.b
       |),
       |tot AS (
       |  SELECT CAST(SUM(raw_cnt) AS BIGINT) AS raw_tot,
       |         CAST(SUM(tgt_cnt) AS BIGINT) AS tgt_tot
       |  FROM bk
       |),
       |per AS (
       |  SELECT doc_id,
       |    CAST(SUM(cnt * (
       |      (length(bin((raw_tot + $B) // (COALESCE(raw_cnt, 0) + 1)))
       |        - 1)
       |      - (length(bin((tgt_tot + $B) // (COALESCE(tgt_cnt, 0) + 1)))
       |        - 1)))
       |      AS BIGINT) AS weight_bits,
       |    CAST(SUM(cnt) AS BIGINT) AS n_bigrams
       |  FROM db LEFT JOIN bk USING (b), tot
       |  GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(COALESCE(p.weight_bits, 0) AS BIGINT) AS weight_bits,
       |  CAST(CASE WHEN COALESCE(p.weight_bits, 0) >= 0 THEN 1 ELSE 0 END
       |       AS BIGINT) AS keep
       |FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id""".stripMargin
  }

  val dsirWeights: String = dsirWeightsT("TRUE")

  /** [[graft.sources.DsirStore.dsirRemoved]] mirror: statistics from
    * the surviving even half, every document scored against them. */
  lazy val dsirRemoved: String = dsirWeightsT("doc_id % 2 = 0")

  /** Source-Jaccard mirror ([[graft.pipeline.DataOps.sourceJaccard]]):
    * same distinct (source, token) collapse, ordered pair join on the
    * token key, exact ppm. */
  val sourceJaccard: String =
    s"""WITH $wrdsCte,
       |st AS (
       |  SELECT DISTINCT source, unnest(w) AS token FROM wrds
       |),
       |sizes AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS vs FROM st GROUP BY 1
       |),
       |inter AS (
       |  SELECT x.source AS src_a, y.source AS src_b,
       |         CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM st x JOIN st y
       |    ON y.token = x.token AND x.source < y.source
       |  GROUP BY 1, 2
       |)
       |SELECT i.src_a, i.src_b, i.inter,
       |       a.vs + b.vs - i.inter AS uni,
       |       CAST((i.inter * 1000000) // (a.vs + b.vs - i.inter)
       |            AS BIGINT) AS jaccard_ppm
       |FROM inter i
       |JOIN sizes a ON a.source = i.src_a
       |JOIN sizes b ON b.source = i.src_b""".stripMargin

  /** k-anonymity mirror ([[graft.pipeline.DataOps.kAnonymity]]): one
    * aggregate on the identical quasi-identifier tuple, identical
    * truncating length bucket and k threshold. */
  val kAnonymity: String =
    s"""SELECT lang, source, n_chars // 100 AS len_bucket,
       |       CAST(COUNT(*) AS BIGINT) AS group_size,
       |       CAST(CASE WHEN COUNT(*) < ${DataOps.KAnonK} THEN 1 ELSE 0
       |            END AS BIGINT) AS at_risk
       |FROM documents
       |GROUP BY 1, 2, 3""".stripMargin

  /** BPE-application mirror ([[graft.pipeline.DataOps.bpeSegment]]):
    * the learned merge table ([[bpeMerges]] inlined) replayed
    * relationally — a recursive CTE applies merge k at step k (the
    * join on `rnk = it + 1` both selects the merge and terminates the
    * recursion past the last rank), with the identical `·`-delimited
    * unit rendering and single non-overlapping replace per merge. */
  lazy val bpeSegment: String =
    s"""WITH RECURSIVE mg AS ($bpeMerges),
       |wl AS (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents
       |),
       |tk AS (SELECT unnest(w) AS token FROM wl),
       |vocab AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM tk
       |  WHERE instr(token, '·') = 0 GROUP BY 1
       |),
       |seg0 AS (
       |  SELECT token, tf,
       |         regexp_replace(token, '(.)', '·\\1·', 'g') AS seg
       |  FROM vocab
       |),
       |mx AS (SELECT CAST(MAX(rnk) AS BIGINT) AS k FROM mg),
       |rec AS (
       |  SELECT CAST(0 AS BIGINT) AS it, token, tf, seg FROM seg0
       |  UNION ALL
       |  SELECT it + 1, token, tf,
       |         replace(seg,
       |           '·' || substr(m.pair, 1, 1) || '··' ||
       |             substr(m.pair, 2, 1) || '·',
       |           '·' || m.pair || '·')
       |  FROM rec JOIN mg m ON m.rnk = rec.it + 1
       |)
       |SELECT token, tf, seg,
       |       CAST((length(seg) - length(replace(seg, '·', ''))) // 2
       |            AS BIGINT) AS n_units
       |FROM rec, mx WHERE it = k""".stripMargin

  /** TextRank mirror ([[graft.pipeline.DataOps.textrankKeywords]]):
    * identical truncating-integer power iteration over the symmetric
    * co-occurrence graph, unrolled by a recursive CTE (the
    * [[OracleSqlRel.eventPagerank]] pattern — zero-probability
    * self-loops keep the contribution join total). */
  val textrankKeywords: String =
    s"""WITH RECURSIVE $wrdsCte,
       |bgl AS (
       |  SELECT CASE WHEN len(w) >= 2 THEN
       |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |  ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |bgp AS (
       |  SELECT split_part(bg, ' ', 1) AS a, split_part(bg, ' ', 2) AS b
       |  FROM (SELECT unnest(gs) AS bg FROM bgl)
       |  WHERE split_part(bg, ' ', 1) <> split_part(bg, ' ', 2)
       |),
       |und AS (SELECT a, b FROM bgp UNION ALL SELECT b, a FROM bgp),
       |ew AS (
       |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM und GROUP BY 1, 2
       |),
       |outw AS (SELECT a, CAST(SUM(w) AS BIGINT) AS wsum FROM ew GROUP BY 1),
       |edges AS (
       |  SELECT ew.a AS from_t, ew.b AS to_t,
       |         (w * 1000000) // wsum AS prob_ppm
       |  FROM ew JOIN outw ON outw.a = ew.a
       |),
       |nodes AS (SELECT DISTINCT from_t AS node FROM edges),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       |t2 AS (
       |  SELECT from_t, to_t, prob_ppm FROM edges
       |  UNION ALL SELECT node, node, CAST(0 AS BIGINT) FROM nodes
       |),
       |pr AS (
       |  SELECT 0 AS it, node, (SELECT 1000000 // n FROM nn) AS r
       |  FROM nodes
       |  UNION ALL
       |  SELECT it + 1, node,
       |         (SELECT 150000 // n FROM nn) + (85 * contrib) // 100
       |  FROM (
       |    SELECT p.it AS it, t.to_t AS node,
       |           CAST(SUM(p.r * t.prob_ppm // 1000000) AS BIGINT)
       |             AS contrib
       |    FROM pr p JOIN t2 t ON t.from_t = p.node
       |    WHERE p.it < ${DataOps.TextrankIters}
       |    GROUP BY 1, 2
       |  )
       |)
       |SELECT token, rank_ppm, rnk FROM (
       |  SELECT node AS token, r AS rank_ppm,
       |         CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node ASC)
       |              AS BIGINT) AS rnk
       |  FROM pr WHERE it = ${DataOps.TextrankIters}
       |) WHERE rnk <= 20""".stripMargin

  /** Recall-audit mirror ([[graft.pipeline.DataOps.annRecallEval]]):
    * each tier's full mirror inlined as a nested CTE (DuckDB supports
    * nested WITH), brute-force ground truth joined on (q_id, n_id),
    * truncating integer recall. */
  lazy val annRecallEval: String = recallEvalSql(Seq(
    "ivf" -> annIvf, "ivfpq" -> annIvfPq,
    "lsh" -> annLsh, "pq" -> annPq, "sq" -> annSq))

  /** Store-tier recall mirror ([[DataOps.annStoreRecall]]): same audit
    * algebra, tiers = the persistent-store round-trip/lifecycle
    * mirrors (pristine stores replay their model mirrors verbatim;
    * append/remove tiers their split mirrors). */
  /** Scaled-tier recall mirror ([[DataOps.annScaledRecall]]): the
    * audit algebra over the capacity-scaled tiers' own mirrors — their
    * knob scalars replay from count(*) exactly as in the standalone
    * entries, so the composition proves the AUDIT, the tiers having
    * been proven already. */
  lazy val annScaledRecall: String = recallEvalSql(Seq(
    "ivf_scaled" -> annIvfScaled, "pq_scaled" -> annPqScaled))

  lazy val annStoreRecall: String = recallEvalSql(Seq(
    "ivfpq_store" -> annIvfPq,
    "pq_add" -> annPqIncremental, "pq_rm" -> annPqRemoved,
    "pq_store" -> annPq,
    "sq_add" -> annSq, "sq_rm" -> annSqRemoved,
    "sq_store" -> annSq))

  /** The shared recall-audit SQL: each tier's full mirror inlined as a
    * nested CTE (DuckDB accepts nested WITH) over the brute-truth CTE,
    * then the counting algebra on the bounded tier relations. */
  private def recallEvalSql(tiers: Seq[(String, String)]): String = {
    val tierCtes = tiers.map { case (n, sql) =>
      s"t_$n AS (\n$sql\n)" }.mkString(",\n")
    val unions = tiers.map { case (n, _) =>
      s"SELECT '$n' AS tier, q_id, n_id FROM t_$n" }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH brute AS (
       |$annBrute
       |),
       |$tierCtes,
       |tr AS (
       |  $unions
       |),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM brute),
       |ag AS (
       |  SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |         CAST(SUM(CASE WHEN b.q_id IS NOT NULL THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_hit
       |  FROM tr LEFT JOIN brute b
       |    ON b.q_id = tr.q_id AND b.n_id = tr.n_id
       |  GROUP BY 1
       |)
       |SELECT tier, nt.n_true, n_cand, n_hit,
       |       CAST(n_hit * 1000000 // nt.n_true AS BIGINT) AS recall_micro
       |FROM ag, nt""".stripMargin
  }

  /** Novelty mirror ([[graft.pipeline.DataOps.docNovelty]]): same
    * distinct-gram hashes, df by counting, truncating micro share. */
  val docNovelty: String = {
    val n = DataOps.ContamN
    s"""WITH $wrdsCte,
       |gl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(w) >= $n THEN
       |           list_distinct(list_transform(range(1, len(w) - ${n - 2}),
       |             i -> ${(0 until n).map(o => s"w[i+$o]").mkString(" || ' ' || ")}))
       |         ELSE CAST([] AS VARCHAR[]) END AS gs
       |  FROM wrds
       |),
       |g AS (SELECT doc_id, ${h60("gr")} AS gh
       |      FROM (SELECT doc_id, unnest(gs) AS gr FROM gl)),
       |gdf AS (SELECT gh, COUNT(*) AS gdf FROM g GROUP BY 1),
       |per AS (
       |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |         CAST(SUM(CASE WHEN gdf.gdf = 1 THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_novel
       |  FROM g JOIN gdf USING (gh) GROUP BY 1
       |)
       |SELECT d.doc_id, COALESCE(per.n_grams, 0) AS n_grams,
       |       COALESCE(per.n_novel, 0) AS n_novel,
       |       CAST(CASE WHEN COALESCE(per.n_grams, 0) = 0 THEN 0
       |            ELSE per.n_novel * 1000000 // per.n_grams END
       |         AS BIGINT) AS novelty_micro
       |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id""".stripMargin
  }

  /** Shard-plan mirror ([[graft.pipeline.DataOps.shardPlan]]): the
    * engine's two-phase rank replayed as one definitional ROW_NUMBER
    * (they agree by construction), same modulo fan-out and ppm share. */
  val shardPlan: String = {
    val sc = DataOps.ShardCount
    s"""WITH $wrdsCte,
       |tok AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok FROM wrds),
       |r AS (
       |  SELECT n_tok,
       |         ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id ASC) AS rn
       |  FROM tok
       |),
       |g AS (
       |  SELECT CAST((rn - 1) % $sc AS BIGINT) AS shard,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
       |  FROM r GROUP BY 1
       |),
       |t AS (SELECT SUM(sum_tokens) AS t FROM g)
       |SELECT shard, n_docs, sum_tokens,
       |       CAST(sum_tokens * 1000000 // t.t AS BIGINT) AS share_ppm
       |FROM g, t""".stripMargin
  }

  /** Serving mirror ([[graft.pipeline.DataOps.bm25Serve]]): the
    * [[bm25Search]] CTEs with the 6-term two-query head and per-query
    * score/rank partitions. */
  val bm25Serve: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM t GROUP BY 1, 2),
       |dls AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS dl
       |        FROM dt GROUP BY 1),
       |vocab AS (SELECT token, CAST(SUM(cnt) AS BIGINT) AS tf,
       |                 CAST(COUNT(*) AS BIGINT) AS df
       |          FROM dt GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |s AS (SELECT CAST(SUM(dl) AS HUGEINT) AS sdl FROM dls),
       |q AS (
       |  SELECT (CAST(ROW_NUMBER() OVER (
       |            ORDER BY tf * (length(bin(n.n // df)) - 1) DESC,
       |              token ASC) AS BIGINT) - 1) // 3 + 1 AS q_id,
       |         token,
       |         CAST(length(bin(n.n // df)) - 1 AS BIGINT) AS idf_bits
       |  FROM vocab, n
       |  ORDER BY tf * (length(bin(n.n // df)) - 1) DESC, token ASC
       |  LIMIT 6
       |),
       |terms AS (
       |  SELECT q.q_id, dt.doc_id,
       |         CAST((CAST(44 AS HUGEINT) * q.idf_bits * dt.cnt * s.sdl
       |                 * 1000000)
       |              // (CAST(20 AS HUGEINT) * dt.cnt * s.sdl + 6 * s.sdl
       |                 + CAST(18 AS HUGEINT) * dls.dl * n.n)
       |           AS BIGINT) AS term_micro
       |  FROM dt
       |  JOIN q USING (token)
       |  JOIN dls USING (doc_id), n, s
       |),
       |sc AS (
       |  SELECT q_id, doc_id, CAST(SUM(term_micro) AS BIGINT)
       |           AS score_micro,
       |         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
       |  FROM terms GROUP BY 1, 2
       |)
       |SELECT q_id, doc_id, score_micro, rnk, n_terms_hit FROM (
       |  SELECT q_id, doc_id, score_micro, n_terms_hit,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
       |           ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) AS rnk
       |  FROM sc WHERE score_micro > 0
       |) WHERE rnk <= 10""".stripMargin

  /** Deletion mirror ([[graft.sources.PostingsIndex.bm25Removed]]): the
    * [[bm25Search]] CTEs recomputed from scratch over the SURVIVING
    * (even-doc_id) half — exactly what a store that physically forgot
    * the odd half must serve, query head statistics included. */
  val bm25Removed: String =
    s"""WITH wrds AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents WHERE doc_id % 2 = 0
       |),
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM t GROUP BY 1, 2),
       |dls AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS dl
       |        FROM dt GROUP BY 1),
       |vocab AS (SELECT token, CAST(SUM(cnt) AS BIGINT) AS tf,
       |                 CAST(COUNT(*) AS BIGINT) AS df
       |          FROM dt GROUP BY 1),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
       |      WHERE doc_id % 2 = 0),
       |s AS (SELECT CAST(SUM(dl) AS HUGEINT) AS sdl FROM dls),
       |q AS (
       |  SELECT token,
       |         CAST(length(bin(n.n // df)) - 1 AS BIGINT) AS idf_bits
       |  FROM vocab, n
       |  ORDER BY tf * (length(bin(n.n // df)) - 1) DESC, token ASC
       |  LIMIT 3
       |),
       |terms AS (
       |  SELECT dt.doc_id,
       |         CAST((CAST(44 AS HUGEINT) * q.idf_bits * dt.cnt * s.sdl
       |                 * 1000000)
       |              // (CAST(20 AS HUGEINT) * dt.cnt * s.sdl + 6 * s.sdl
       |                 + CAST(18 AS HUGEINT) * dls.dl * n.n)
       |           AS BIGINT) AS term_micro
       |  FROM dt
       |  JOIN q USING (token)
       |  JOIN dls USING (doc_id), n, s
       |),
       |sc AS (
       |  SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS score_micro,
       |         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
       |  FROM terms GROUP BY 1
       |)
       |SELECT doc_id, score_micro, rnk, n_terms_hit FROM (
       |  SELECT doc_id, score_micro, n_terms_hit,
       |         CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC,
       |           doc_id ASC) AS BIGINT) AS rnk
       |  FROM sc WHERE score_micro > 0
       |) WHERE rnk <= 10""".stripMargin

  /** Telemetry mirror ([[graft.sources.PostingsIndex.postingsStats]]):
    * the store's own integrity numbers recomputed from corpus truth. */
  val postingsStats: String =
    s"""WITH $wrdsCte,
       |t AS (SELECT doc_id, unnest(w) AS token FROM wrds),
       |dt AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM t GROUP BY 1, 2),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |v AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS n_terms
       |      FROM dt),
       |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_postings,
       |             CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS sdl
       |      FROM dt)
       |SELECT n.n AS n_docs, v.n_terms, p.n_postings,
       |       p.sdl AS sum_dl,
       |       CAST(p.sdl * 1000000 // n.n AS BIGINT) AS avg_dl_micro
       |FROM n, v, p""".stripMargin

  /** K5 telemetry mirror ([[graft.sources.PqIndex.pqStats]]): the
    * vector store's integrity numbers recomputed by re-training both
    * quantizers from the embeddings table — the code-cid checksum pins
    * every persisted PQ assignment against corpus truth. */
  lazy val pqStats: String =
    s"""WITH $pqCtes,
       |${crankCte(DataOps.IvfC)},
       |ca AS (
       |  SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
       |         CAST(COUNT(*) AS BIGINT) AS n_code_rows,
       |         CAST(SUM(cid) AS BIGINT) AS sum_code_cid
       |  FROM a1
       |),
       |cb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_codebook_rows
       |       FROM ref),
       |cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_centroids FROM cnrm),
       |ce AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells
       |       FROM crank WHERE rnk = 1)
       |SELECT ca.n_vectors, ca.n_code_rows, ca.sum_code_cid,
       |       cb.n_codebook_rows, cc.n_centroids, ce.n_cells
       |FROM ca, cb, cc, ce""".stripMargin

  /** K7 telemetry mirror ([[graft.sources.SqIndex.sqStats]]): the SQ8
    * store's integrity numbers recomputed by re-quantizing the
    * embeddings table — the element checksum pins every stored
    * reconstruction value. */
  val sqStats: String =
    s"""WITH $embCtes,
       |mm AS (
       |  SELECT vec_id, list_min(em) AS mn,
       |         list_max(em) - list_min(em) AS rng
       |  FROM ev
       |),
       |cd AS (
       |  SELECT v.vec_id, v.i,
       |         254 * m.mn + (CASE WHEN m.rng > 0
       |           THEN CAST(ROUND(CAST(v.v - m.mn AS DOUBLE) * 254.0 /
       |             CAST(m.rng AS DOUBLE)) AS BIGINT) - 127
       |           ELSE 0 END + 127) * m.rng AS r254
       |  FROM vu v JOIN mm m USING (vec_id)
       |)
       |SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
       |       CAST(COUNT(*) AS BIGINT) AS n_elems,
       |       CAST(SUM(r254) AS BIGINT) AS sum_r254
       |FROM cd""".stripMargin

  /** K6 telemetry mirror ([[graft.sources.LangProfileStore.langStats]]):
    * the classifier store's integrity numbers recomputed from the
    * documents table — the count checksum pins the additive training
    * state the append/remove lifecycle maintains. */
  val langStats: String = {
    val k = DataOps.CtProfK
    s"""WITH lt AS (
       |  SELECT doc_id, lang, lower(text) AS t FROM documents
       |  WHERE length(lower(text)) >= 3
       |),
       |g AS (
       |  SELECT doc_id, lang,
       |         ${h60("substr(t, CAST(i AS INTEGER), 3)")} AS h
       |  FROM (SELECT doc_id, lang,
       |          unnest(range(1, length(t) - 1)) AS i, t
       |        FROM lt)
       |),
       |lc AS (
       |  SELECT lang, h, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM g GROUP BY 1, 2
       |),
       |lp AS (
       |  SELECT lang, h FROM (
       |    SELECT lang, h,
       |           ROW_NUMBER() OVER (PARTITION BY lang
       |             ORDER BY c DESC, h ASC) AS rnk
       |    FROM lc
       |  ) WHERE rnk <= $k
       |),
       |ca AS (
       |  SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |         CAST(COUNT(*) AS BIGINT) AS n_count_rows,
       |         CAST(SUM(c) AS BIGINT) AS sum_c
       |  FROM lc
       |),
       |cp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_profile_rows FROM lp)
       |SELECT ca.n_langs, ca.n_count_rows, ca.sum_c, cp.n_profile_rows
       |FROM ca, cp""".stripMargin
  }

  /** K8 telemetry mirror ([[graft.sources.DsirStore.dsirStats]]): the
    * importance store's bucket statistics recomputed from the documents
    * table — the raw/target sums pin the additive state. */
  val dsirStats: String = {
    val B = DataOps.DsirBuckets
    s"""WITH wl AS (
       |  SELECT doc_id, lang,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS w
       |  FROM documents
       |),
       |bg AS (
       |  SELECT doc_id, lang, unnest(
       |    CASE WHEN len(w) >= 2 THEN
       |      list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |    ELSE CAST([] AS VARCHAR[]) END) AS bg
       |  FROM wl
       |),
       |db AS (
       |  SELECT doc_id, lang, ${h60("bg")} % $B AS b,
       |         CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM bg GROUP BY 1, 2, 3
       |),
       |rawc AS (
       |  SELECT b, CAST(SUM(cnt) AS BIGINT) AS raw_cnt FROM db GROUP BY 1
       |),
       |tgtc AS (
       |  SELECT b, CAST(SUM(cnt) AS BIGINT) AS tgt_cnt FROM db
       |  WHERE lang = '${DataOps.DsirTargetLang}' GROUP BY 1
       |),
       |bk AS (
       |  SELECT rawc.b, raw_cnt, COALESCE(tgt_cnt, 0) AS tgt_cnt
       |  FROM rawc LEFT JOIN tgtc ON tgtc.b = rawc.b
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |       CAST(SUM(raw_cnt) AS BIGINT) AS sum_raw,
       |       CAST(SUM(tgt_cnt) AS BIGINT) AS sum_tgt
       |FROM bk""".stripMargin
  }

  /** K10 telemetry mirror
    * ([[graft.sources.PositionsIndex.positionsStats]]): the positional
    * store's integrity numbers recomputed by re-tokenizing the
    * documents table — the position checksum pins every stored
    * (doc, pos, token) row. */
  val positionsStats: String =
    s"""WITH $posCte
       |SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(COUNT(DISTINCT t) AS BIGINT) AS n_terms,
       |       CAST(COUNT(*) AS BIGINT) AS n_positions,
       |       CAST(SUM(pos) AS BIGINT) AS sum_pos
       |FROM pos""".stripMargin
}
