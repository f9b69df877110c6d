package graft.nlp

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, Tokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.ParityQueries

/**
 * Model-backed sentiment variant (SURVEY.md §2.5 X1, BASELINE.json's
 * "Structured Streaming + MLlib sentiment" approach line): a
 * Tokenizer → HashingTF → LogisticRegression pipeline self-trained on the
 * deterministic lexicon scorer's polarity labels, then applied back to
 * the same W1 message blocks. The lexicon expression remains the
 * oracle-checked scorer; this is the MLlib tier behind the same surface
 * (text in, polarity out).
 *
 * Scale: training aggregates gradients over the feature matrix
 * (treeAggregate — no driver-side data); scoring is one broadcast model
 * application inside a projection. Registered driver-side as a rows-only
 * query (LBFGS float reduction order is partition-dependent, so
 * per-row predictions are not oracle-replayable by design).
 *
 * Correctness anchor (since per-row hashes are off the table): training
 * input is canonically repartitioned + sorted, pinning partition contents
 * and in-partition order (the remaining run-to-run jitter is only the
 * cross-partition float combine order), and the fit ASSERTS an aggregate
 * quality bound — train accuracy vs the lexicon labels ≥ [[MinTrainAcc]]
 * — so a silently degenerate model (e.g. the ~0.57 constant-class
 * accuracy) fails loudly instead of passing a rows-only check.
 * (LogisticRegression exposes no seed param — its init is deterministic
 * zeros; nothing random to pin.)
 */
object MlSentiment {

  /** Observed train accuracy is ≈ 0.99 at sf0.001/sf0.01; the majority
    * class sits at ≈ 0.57. The floor splits the two decisively. */
  val MinTrainAcc = 0.8

  /** (wsec, channel, username, pred_pos): model polarity per W1 block. */
  def x1SentimentMl(spark: SparkSession, sfDir: String): DataFrame = {
    val blocks = ParityQueries.sentimented(spark, sfDir)
      .select(col("wsec"), col("channel"), col("username"), col("text"),
        (col("score_micro") > 0).cast("double").as("label"))
      .repartition(8, col("channel"), col("username"), col("wsec"))
      .sortWithinPartitions("channel", "username", "wsec")
      .persist()
    val pipeline = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new HashingTF().setInputCol("words").setOutputCol("features")
        .setNumFeatures(1024),
      new LogisticRegression().setMaxIter(25).setRegParam(0.01)))
    val model = pipeline.fit(blocks)
    val scored = model.transform(blocks)
    val acc = scored
      .select(avg((col("prediction") === col("label")).cast("double")))
      .head().getDouble(0)
    require(acc >= MinTrainAcc,
      f"x1SentimentMl degenerate model: train accuracy $acc%.3f < $MinTrainAcc")
    // Materialize the small result and release the cached training set —
    // callers get a lineage-free frame, the session keeps no cached plans.
    val out = scored
      .select(col("wsec"), col("channel"), col("username"),
        col("prediction").cast("long").as("pred_pos"))
      .localCheckpoint(true)
    blocks.unpersist()
    out
  }
}
