package graft.domain

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.kernels.Pelt
import graft.ops.Exprs

/** Domain-pipeline spec over a deterministic synthetic tracking fixture
  * covering FIXTURES.md's edge cases: a valid 1v1 play, a two-receiver
  * play (dropped), a far-ball-landing play (dropped), a left-direction
  * play (flipped), a missing-QB play (dropped by the role-count filter),
  * and a filtered route (dropped in plays cleaning). */
class DomainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----- fixture ------------------------------------------------------
  // before-throw rows: (game, play, nfl, frame, dir, side, role, x, y, s, a, dirAngle, o,
  //                     absYard, ballX, ballY, name, height, weight, bdate, position, week)
  private def beforeRow(play: Long, nfl: Long, frame: Int, role: String, side: String,
                        x: Double, y: Double, direction: String = "right",
                        ballX: Double = 63.5, ballY: Double = 30.2,
                        position: String = "CB") =
    (1L, play, nfl, frame, direction, side, role, x, y, 5.0, 1.0, 90.0, 45.0,
      60, ballX, ballY, s"P$nfl", "6-2", 200.0, "1995-01-01", position, 1)

  private val beforeCols = Seq("game_id", "play_id", "nfl_id", "frame_id",
    "play_direction", "player_side", "player_role", "x", "y", "s", "a", "dir", "o",
    "absolute_yardline_number", "ball_land_x", "ball_land_y",
    "player_name", "player_height", "player_weight", "player_birth_date",
    "player_position", "week")

  private def play(playId: Long, withQb: Boolean = true, nReceivers: Int = 1,
                   ballX: Double = 63.5, ballY: Double = 30.2,
                   direction: String = "right") = {
    val frames = 1 to 3
    val qb = if (withQb) frames.map(f =>
      beforeRow(playId, 10, f, Schemas.Passer, Schemas.Offense, 40.0, 25.0,
        direction, ballX, ballY, "QB")) else Seq.empty
    val recs = (0 until nReceivers).flatMap(i => frames.map(f =>
      beforeRow(playId, 20 + i, f, Schemas.TargetedReceiver, Schemas.Offense,
        50.0 + f, 30.0, direction, ballX, ballY, "WR")))
    val db = frames.map(f =>
      beforeRow(playId, 30, f, "Defensive Coverage", Schemas.Defense,
        52.0 + f, 30.0, direction, ballX, ballY, "CB"))
    val farDef = frames.map(f =>
      beforeRow(playId, 31, f, "Defensive Coverage", Schemas.Defense,
        80.0, 10.0, direction, ballX, ballY, "CB"))
    qb ++ recs ++ db ++ farDef
  }

  private lazy val before: DataFrame =
    (play(1) ++ play(2, nReceivers = 2) ++ play(3, ballX = 10.0, ballY = 5.0) ++
      play(4, direction = "left") ++ play(5, withQb = false))
      .toDF(beforeCols: _*)

  // after-throw: ids + coordinates only (schema A3); frames 4..6;
  // receiver/defender converge on the landing spot, far defender stays far
  private lazy val after: DataFrame = {
    val rows = for {
      playId <- Seq(1L, 2L, 3L, 4L, 5L)
      (nfl, baseX, baseY) <- Seq((20L, 54.0, 30.0), (21L, 54.0, 32.0),
        (30L, 56.0, 30.0), (31L, 80.0, 10.0))
      if nfl != 21L || playId == 2L // second receiver exists only in play 2
      frame <- 4 to 6
    } yield (1L, playId, nfl, frame,
      if (nfl == 31L) 80.0 else baseX + (frame - 3) * 3.0,
      if (nfl == 31L) 10.0 else baseY)
    rows.toDF("game_id", "play_id", "nfl_id", "frame_id", "x", "y")
  }

  private lazy val rawPlays: DataFrame = {
    val rows = Seq(1L, 2L, 3L, 4L, 5L).map(p => Row(1L, p, 2023, 1, 1, "10:00", 1,
      "H", "V", "desc", 10, "H", "V", 30, "N", if (p == 1L) "C" else "I", 10.0,
      "SG", "3x1", if (p == 5L) "GO" else "IN", "N", "TRADITIONAL", 5.0,
      "MAN_COVERAGE", "C1"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.rawPlays)
  }

  private lazy val players = Cleaning.playersDataset(before)
  private lazy val cleanedPlays = Cleaning.processPlays(rawPlays, before)
  private lazy val cleaned = Cleaning.cleanTracking(before, after, players, rawPlays, cleanedPlays)

  // ----- cleaning -----------------------------------------------------

  test("players dataset is unique by nfl_id with validated weights") {
    val p = players.collect()
    assert(p.map(_.getLong(0)).distinct.length == p.length)
    assert(p.length == 5) // 10, 20, 21, 30, 31
  }

  test("plays cleaning keeps routes IN/OUT/HITCH and flips left ball landings") {
    val plays = cleanedPlays.collect()
    // play 5 (route GO) dropped
    assert(!plays.map(_.getLong(1)).contains(5L))
    // play 4 is left-direction: ball_land flipped 120-63.5=56.5, 53.3-30.2=23.1
    val p4 = cleanedPlays.filter(col("play_id") === 4).head()
    assert(p4.getAs[Double]("ball_land_x") == 56.5)
    assert(p4.getAs[Double]("ball_land_y") == 23.1)
  }

  test("closest defender picks the minimum-mean-distance defender only") {
    val enriched = after.join(
      before.select(col("game_id"), col("play_id"), col("nfl_id"),
        col("player_side"), col("player_role"), col("play_direction"))
        .dropDuplicates("game_id", "play_id", "nfl_id"),
      Seq("game_id", "play_id", "nfl_id"), "left")
    val out = Cleaning.closestDefender(enriched.filter(col("play_id") === 1))
    val ids = out.select("nfl_id").distinct().as[Long].collect().toSet
    assert(ids == Set(20L, 30L)) // receiver + closest defender; 31 dropped
  }

  test("cleaning keeps the valid plays and drops 2-receiver / far-ball / no-QB plays") {
    val (beforeFinal, afterFinal) = cleaned
    val beforePlays = beforeFinal.select("play_id").distinct().as[Long].collect().toSet
    val afterPlays = afterFinal.select("play_id").distinct().as[Long].collect().toSet
    assert(beforePlays == Set(1L, 4L), s"before plays: $beforePlays")
    // play 2: two receivers → dropped; play 3: ball far → dropped;
    // play 5: no QB → role count 2 → dropped from before (after keeps it
    // only if it survived earlier filters — route GO removed it from
    // cleaned plays, so the ball-landing inner join drops it too)
    assert(afterPlays == Set(1L, 4L), s"after plays: $afterPlays")
  }

  test("left-direction play is flipped to left-to-right in cleaned output") {
    val (beforeFinal, _) = cleaned
    val rec4 = beforeFinal
      .filter(col("play_id") === 4 && col("player_role") === Schemas.TargetedReceiver &&
        col("frame_id") === 1)
      .head()
    assert(rec4.getAs[Double]("x") == 69.0) // 120 - 51
    assert(rec4.getAs[Double]("y") == 23.3) // r2(53.3 - 30.0) — rounded at flip
    assert(rec4.getAs[Double]("dir") == 270.0) // (90+180)%360
  }

  // ----- features -----------------------------------------------------

  test("featurizer: one row per valid play with hand-checked geometry") {
    val (beforeFinal, _) = cleaned
    val feats = Datasets.trainingFeatures(beforeFinal, cleanedPlays)
    val rows = feats.collect()
    assert(rows.length == 2) // plays 1 and 4
    val f1 = feats.filter(col("play_id") === 1).head()
    // last frame (3): qb (40,25), rec (53,30), def (55,30)
    assert(f1.getAs[Double]("air_yards") == 13.0)
    assert(f1.getAs[Double]("separation") == 2.0)
    assert(f1.getAs[Long]("receiver_id") == 20L)
    assert(f1.getAs[Long]("defender_id") == 30L)
    assert(f1.getAs[Int]("target") == 0) // play 1 pass_result C
    assert(f1.getAs[Double]("rec_boundary_dist") == 23.3) // min(30, 23.3, 53, 67)
    // defender at (55,30) moving dir=90° (unit vec (cos90, sin90)=(0,1));
    // rec-def = (-2, 0) → closing = -(5*0*-2 + 5*1*0)/2 = 0
    assert(f1.getAs[Double]("closing_speed") == 0.0)
  }

  test("per-frame inference features carry pass_result and one row per frame") {
    val (beforeFinal, _) = cleaned
    val inf = Datasets.inferenceFeatures(beforeFinal, cleanedPlays)
    assert(inf.filter(col("play_id") === 1).count() == 3) // frames 1..3
    assert(inf.filter(col("play_id") === 1).select("target")
      .distinct().as[String].collect().toSeq == Seq("C"))
  }

  // ----- scoring ------------------------------------------------------

  test("scores: deception matches the Pelt kernel, recovery is piecewise") {
    val probs1 = Array(0.2, 0.2, 0.2, 0.2, 0.2, 0.8, 0.8, 0.8, 0.8, 0.8)
    val probs2 = Array(0.5, 0.5, 0.5)
    val results =
      (probs1.zipWithIndex.map { case (p, i) => (1L, 1L, i + 1, 20L, 30L, "C", p) } ++
        probs2.zipWithIndex.map { case (p, i) => (1L, 2L, i + 1, 21L, 31L, "IN", p) })
        .toSeq.toDF("game_id", "play_id", "frame_id", "receiver_id", "defender_id",
          "pass_result", "non_completion_probability")
    val scores = Scoring.computeScores(spark, results).collect()
      .map(r => r.getLong(1) -> r).toMap
    val s1 = scores(1L)
    assert(s1.getAs[Long]("defender_id") == 30L)
    assert(math.abs(s1.getAs[Double]("deception_score") - Pelt.deceptionScore(probs1)) < 1e-12)
    assert(math.abs(s1.getAs[Double]("deception_score") - 0.6) < 1e-12)
    // play1 C → recovery = -p_last = -0.8
    assert(math.abs(s1.getAs[Double]("recovery_score") - (-0.8)) < 1e-12)
    // play2 IN → 1.2*(1-0.5) = 0.6
    assert(math.abs(scores(2L).getAs[Double]("recovery_score") - 0.6) < 1e-12)
  }

  // ----- presentation-layer data prep (teams dim, animation) ----------

  test("teams dim: 32 rows, unique abbrs, known lookups") {
    assert(Teams.All.size == 32)
    assert(Teams.All.map(_.abbr).distinct.size == 32)
    assert(Teams.byAbbr("KC").exists(t => t.name == "Chiefs" && t.primary == "#E31837"))
    assert(Teams.byAbbr("GB").exists(_.city == "Green Bay"))
    val dim = Teams.dim(spark)
    assert(dim.count() == 32)
    assert(dim.columns.toSeq == Seq("team_id", "abbr", "city", "team_name",
      "primary_color", "secondary_color"))
  }

  test("frameOffsetUnion stitches after-frames past max(before), play.py:130-133 semantics") {
    val before = Seq((1L, 1L, 0.1), (1L, 2L, 0.2), (1L, 7L, 0.3))
      .toDF("play_id", "frame_id", "v")
    val after = Seq((1L, 1L, 0.4), (1L, 2L, 0.5))
      .toDF("play_id", "frame_id", "v")
    val got = Animation.frameOffsetUnion(before, after, "frame_id")
      .orderBy("frame_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 0.1), (2L, 0.2), (7L, 0.3), (8L, 0.4), (9L, 0.5)))
    // empty before: offset degenerates to 0, no null frames
    val emptyBefore = before.filter(col("frame_id") < 0)
    val still = Animation.frameOffsetUnion(emptyBefore, after, "frame_id")
      .orderBy("frame_id").collect().map(_.getLong(1)).toSeq
    assert(still == Seq(1L, 2L))
  }

  test("line of scrimmage + first down flip under left play direction (play.py:194-203)") {
    val df = Seq(("left", 80.0, 7.0), ("right", 80.0, 7.0))
      .toDF("play_direction", "absolute_yardline_number", "yards_to_go")
    val got = df.select(col("play_direction"),
      Exprs.lineOfScrimmage(col("play_direction"), col("absolute_yardline_number")).as("los"),
      Exprs.firstDownLine(col("play_direction"), col("absolute_yardline_number"),
        col("yards_to_go")).as("fd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got("left") == ((120.0 - 80.0 - 10.0, 30.0 + 7.0)))
    assert(got("right") == ((70.0, 77.0)))
  }
}
