package graft.domain

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic synthetic season generator (FIXTURES.md §A shapes) for
  * driving the domain pipeline end-to-end without the Kaggle data: a
  * seeded mix of valid 1v1 plays, multi-receiver plays, far-ball plays,
  * and left-direction plays across 18 weeks. Pure driver-side generation
  * of a bounded play list, parallelized into DataFrames — at real scale
  * the inputs are the weekly files, not this generator. */
object SyntheticSeason {

  case class PlaySpec(gameId: Long, playId: Long, week: Int, valid: Boolean,
                      left: Boolean, extraReceiver: Boolean, farBall: Boolean,
                      passResult: String, nFrames: Int)

  def playSpecs(nPlays: Int, seed: Long = 42L): Seq[PlaySpec] = {
    val rng = new scala.util.Random(seed)
    (1 to nPlays).map { i =>
      val week = (i - 1) * 18 / nPlays + 1
      val extraRec = rng.nextDouble() < 0.1
      val farBall = !extraRec && rng.nextDouble() < 0.1
      PlaySpec(
        gameId = 2023000000L + week * 100 + (i % 7),
        playId = i.toLong,
        week = week,
        valid = !extraRec && !farBall,
        left = rng.nextDouble() < 0.4,
        extraReceiver = extraRec,
        farBall = farBall,
        passResult = Seq("C", "I", "IN")(rng.nextInt(3)),
        nFrames = 8 + rng.nextInt(12))
    }
  }

  /** Raw pre-throw tracking rows for all plays (schema A2 + week). */
  def trackingBefore(spark: SparkSession, specs: Seq[PlaySpec]): DataFrame = {
    val rows = specs.flatMap { p =>
      val rng = new scala.util.Random(p.playId * 7919)
      val dirStr = if (p.left) "left" else "right"
      val (ballX, ballY) =
        if (p.farBall) (5.0, 5.0)
        else (60.0 + p.nFrames + rng.nextInt(3), 28.0 + rng.nextInt(4))
      def row(nfl: Long, frame: Int, role: String, side: String, pos: String,
              x: Double, y: Double, s: Double, dir: Double, o: Double) =
        Row(p.gameId, p.playId, nfl, frame, dirStr, side, role,
          math.rint(x * 100) / 100, math.rint(y * 100) / 100, s, 1.0, dir, o,
          60, ballX, ballY, s"P$nfl", "6-2", 180.0 + nfl % 40, "1995-01-01", pos,
          p.week)
      (1 to p.nFrames).flatMap { f =>
        val qb = row(1000 + p.playId % 50, f, Schemas.Passer, Schemas.Offense,
          "QB", 40.0, 26.0, 1.5, 0.0, 0.0)
        val rec = row(2000 + p.playId % 80, f, Schemas.TargetedReceiver,
          Schemas.Offense, "WR", 48.0 + f * 1.2, 28.0 + f * 0.2,
          6.5, 10.0, 10.0)
        val db = row(3000 + p.playId % 60, f, "Defensive Coverage",
          Schemas.Defense, "CB", 50.0 + f * 1.2, 28.5 + f * 0.2,
          6.0, 190.0, 200.0)
        val lb = row(3500 + p.playId % 60, f, "Defensive Coverage",
          Schemas.Defense, "CB", 70.0, 12.0, 2.0, 90.0, 90.0)
        val extra = if (p.extraReceiver)
          Seq(row(2500 + p.playId % 80, f, Schemas.TargetedReceiver,
            Schemas.Offense, "WR", 30.0, 40.0, 4.0, 45.0, 45.0))
        else Seq.empty
        Seq(qb, rec, db, lb) ++ extra
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      Schemas.rawTrackingBefore.fields :+
        org.apache.spark.sql.types.StructField("week",
          org.apache.spark.sql.types.IntegerType))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
  }

  /** Raw post-throw tracking (schema A3): players converge on the ball. */
  def trackingAfter(spark: SparkSession, specs: Seq[PlaySpec]): DataFrame = {
    val rows = specs.flatMap { p =>
      val rng = new scala.util.Random(p.playId * 104729)
      val (ballX, ballY) =
        if (p.farBall) (5.0, 5.0)
        else (60.0 + p.nFrames + rng.nextInt(3), 28.0 + rng.nextInt(4))
      val ids = Seq(2000 + p.playId % 80, 3000 + p.playId % 60, 3500 + p.playId % 60) ++
        (if (p.extraReceiver) Seq(2500 + p.playId % 80) else Seq.empty)
      (p.nFrames + 1 to p.nFrames + 5).flatMap { f =>
        ids.map { nfl =>
          val isLb = nfl >= 3500
          val (bx, by) = if (p.farBall) (62.0, 30.0) else (ballX, ballY)
          val t = (f - p.nFrames) / 5.0
          val x0 = if (isLb) 70.0 else 48.0 + p.nFrames * 1.2
          val y0 = if (isLb) 12.0 else 28.0 + p.nFrames * 0.2
          Row(p.gameId, p.playId, nfl.toLong, f,
            math.rint((x0 + (bx - x0) * t * (if (isLb) 0.05 else 0.9)) * 100) / 100,
            math.rint((y0 + (by - y0) * t * (if (isLb) 0.05 else 0.9)) * 100) / 100)
        }
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), Schemas.rawTrackingAfter)
  }

  /** Raw plays table (schema A1). */
  def rawPlays(spark: SparkSession, specs: Seq[PlaySpec]): DataFrame = {
    val routes = Seq("IN", "OUT", "HITCH", "GO")
    val rows = specs.map { p =>
      val rng = new scala.util.Random(p.playId * 31337)
      Row(p.gameId, p.playId, 2023, p.week, 1 + rng.nextInt(4), "10:00",
        1 + rng.nextInt(4), "H", "V", "synthetic play", 10, "H", "V", 30, "N",
        p.passResult, 10.0, "SHOTGUN", "3x1",
        routes(if (rng.nextDouble() < 0.9) rng.nextInt(3) else 3),
        "N", "TRADITIONAL", 5.0, "MAN_COVERAGE", "C1")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), Schemas.rawPlays)
  }
}
