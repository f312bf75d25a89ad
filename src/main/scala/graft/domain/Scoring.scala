package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernels.Pelt
import graft.ops.{Aggs, Exprs}

/** Entry point 3 — deception + recovery scores (reference
  * `src/metrics/`). One shuffle on the play key; the sequential PELT
  * kernel (K2/K3) runs JVM-local per play via `groupByKey.mapGroups`
  * over the explicitly frame-ordered probability series. */
object Scoring {

  /** Per-play row of the inference results table (inference.py:72-77).
    * Public: the encoder's generated code instantiates it reflectively —
    * a private case class fails Janino compilation at runtime. */
  case class ResultRow(game_id: Long, play_id: Long, frame_id: Int,
                       receiver_id: Long, defender_id: Long,
                       pass_result: String, non_completion_probability: Double)

  /** K2+K3 (deception.py:83-136): change-point deception score per play,
    * emitted with the play's last-frame ids. */
  def deceptionScores(spark: SparkSession, results: DataFrame): DataFrame = {
    import spark.implicits._
    results.select(col("game_id"), col("play_id"), col("frame_id"),
      col("receiver_id"), col("defender_id"), col("pass_result"),
      col("non_completion_probability"))
      .as[ResultRow]
      .groupByKey(r => (r.game_id, r.play_id))
      .mapGroups { (key: (Long, Long), it: Iterator[ResultRow]) =>
        val rows = it.toArray.sortBy(_.frame_id) // explicit frame order
        val signal = rows.map(_.non_completion_probability)
        val last = rows.last
        (key._1, key._2, last.frame_id, last.receiver_id, last.defender_id,
          Pelt.deceptionScore(signal))
      }
      .toDF("game_id", "play_id", "frame_id", "receiver_id", "defender_id",
        "deception_score")
  }

  /** X12 (recovery.py:65-79): outcome-weighted score on the last frame. */
  def recoveryScores(results: DataFrame): DataFrame =
    Aggs.topRowPerGroup(results,
      Seq(col("game_id"), col("play_id")), Seq(col("frame_id").desc))
      .select(col("game_id"), col("play_id"), col("frame_id"),
        Exprs.recoveryScore(col("pass_result"), col("non_completion_probability"))
          .as("recovery_score"))

  /** J7 assembly (compute_scores.py:13-50): deception ⋈ recovery →
    * final scores table. */
  def computeScores(spark: SparkSession, results: DataFrame): DataFrame =
    deceptionScores(spark, results)
      .join(recoveryScores(results), Seq("game_id", "play_id", "frame_id"), "left")
      .select(col("game_id"), col("play_id"), col("defender_id"),
        col("receiver_id"), col("deception_score"), col("recovery_score"))
}
