package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise precision/recall/F1 of predicted match pairs against labeled
 * ground truth — the evaluation the reference enables by shipping
 * `customer_relations.csv` ("for analysis",
 * reference: dbloader/gen_testdata.py:578-591) but never automates.
 *
 * The north-rule criterion restricts recall to labeled pairs that share a
 * blocking key (a pair no blocking pass can see is a blocking-recall issue,
 * measured separately as `blocking_recall`).
 */
object Eval {

  case class F1(tp: Long, fp: Long, fn: Long,
                precision: Double, recall: Double, f1: Double,
                blockingRecall: Double)

  /**
   * @param predicted  (main_url, sub_url) predicted match pairs
   * @param labeled    (main_url, sub_url) ground-truth pairs
   * @param candidates (main_url, sub_url) pairs sharing ≥1 blocking key
   */
  def pairwiseF1(predicted: DataFrame, labeled: DataFrame,
                 candidates: DataFrame): F1 = {
    val pred = predicted.select("main_url", "sub_url").distinct().cache()
    val lab = labeled.select("main_url", "sub_url").distinct().cache()
    val labeledBlocked = lab.join(candidates.distinct(),
      Seq("main_url", "sub_url"), "left_semi").cache()
    val tp = pred.join(labeledBlocked, Seq("main_url", "sub_url"), "left_semi").count()
    val fp = pred.join(lab, Seq("main_url", "sub_url"), "left_anti").count()
    val fnB = labeledBlocked.join(pred, Seq("main_url", "sub_url"), "left_anti").count()
    val nLab = lab.count()
    val nLabB = labeledBlocked.count()
    val precision = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val recall = if (nLabB == 0) 1.0 else tp.toDouble / nLabB
    val f1 = if (precision + recall == 0) 0.0 else 2 * precision * recall / (precision + recall)
    val blockingRecall = if (nLab == 0) 1.0 else nLabB.toDouble / nLab
    pred.unpersist(); lab.unpersist(); labeledBlocked.unpersist()
    F1(tp, fp, fnB, precision, recall, f1, blockingRecall)
  }

  import org.apache.spark.sql.SparkSession

  def asDF(spark: SparkSession, m: F1): DataFrame = {
    import spark.implicits._
    Seq(m).toDF()
  }
}
