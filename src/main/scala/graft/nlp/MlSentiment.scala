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
 */
object MlSentiment {

  /** (wsec, channel, username, pred_pos): model polarity per W1 block. */
  def x1SentimentMl(spark: SparkSession, sfDir: String): DataFrame = {
    val blocks = ParityQueries.sentimented(spark, sfDir)
      .select(col("wsec"), col("channel"), col("username"), col("text"),
        (col("score_micro") > 0).cast("double").as("label"))
      .persist()
    val pipeline = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol("text").setOutputCol("words"),
      new HashingTF().setInputCol("words").setOutputCol("features")
        .setNumFeatures(1024),
      new LogisticRegression().setMaxIter(25).setRegParam(0.01)))
    val model = pipeline.fit(blocks)
    model.transform(blocks)
      .select(col("wsec"), col("channel"), col("username"),
        col("prediction").cast("long").as("pred_pos"))
  }
}
