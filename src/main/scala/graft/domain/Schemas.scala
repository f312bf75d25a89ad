package graft.domain

import org.apache.spark.sql.types._

/** Explicit StructTypes for the tracking-domain tables (FIXTURES.md §A;
  * reconstructed from the reference's column lists: plays.py:13-48,
  * tracking.py:14-28, players.py:13-20). Schema-on-read — production
  * paths never rely on CSV inference (the reference infers via
  * `pd.read_csv(low_memory=False)`, datasets.py:24). */
object Schemas {

  /** raw plays (supplementary data) — one row per (game_id, play_id). */
  val rawPlays: StructType = StructType(Seq(
    StructField("game_id", LongType), StructField("play_id", LongType),
    StructField("season", IntegerType), StructField("week", IntegerType),
    StructField("quarter", IntegerType), StructField("game_clock", StringType),
    StructField("down", IntegerType),
    StructField("home_team_abbr", StringType), StructField("visitor_team_abbr", StringType),
    StructField("play_description", StringType), StructField("yards_to_go", IntegerType),
    StructField("possession_team", StringType), StructField("defensive_team", StringType),
    StructField("yardline_number", IntegerType),
    StructField("play_nullified_by_penalty", StringType),
    StructField("pass_result", StringType), StructField("pass_length", DoubleType),
    StructField("offense_formation", StringType), StructField("receiver_alignment", StringType),
    StructField("route_of_targeted_receiver", StringType),
    StructField("play_action", StringType), StructField("dropback_type", StringType),
    StructField("dropback_distance", DoubleType),
    StructField("team_coverage_man_zone", StringType), StructField("team_coverage_type", StringType)))

  /** raw pre-throw tracking — one row per (game, play, nfl, frame), plus
    * play-level and player-level carrier columns (tracking.py:14-28,
    * plays.py:41-48, players.py:13-20). */
  val rawTrackingBefore: StructType = StructType(Seq(
    StructField("game_id", LongType), StructField("play_id", LongType),
    StructField("nfl_id", LongType), StructField("frame_id", IntegerType),
    StructField("play_direction", StringType),
    StructField("player_side", StringType), StructField("player_role", StringType),
    StructField("x", DoubleType), StructField("y", DoubleType),
    StructField("s", DoubleType), StructField("a", DoubleType),
    StructField("dir", DoubleType), StructField("o", DoubleType),
    StructField("absolute_yardline_number", IntegerType),
    StructField("ball_land_x", DoubleType), StructField("ball_land_y", DoubleType),
    StructField("player_name", StringType), StructField("player_height", StringType),
    StructField("player_weight", DoubleType), StructField("player_birth_date", StringType),
    StructField("player_position", StringType)))

  /** raw post-throw tracking (tracking.py:48-90: only ids + coordinates;
    * side/role re-attached by join). */
  val rawTrackingAfter: StructType = StructType(Seq(
    StructField("game_id", LongType), StructField("play_id", LongType),
    StructField("nfl_id", LongType), StructField("frame_id", IntegerType),
    StructField("x", DoubleType), StructField("y", DoubleType)))

  /** Field constants (settings.py:72-75) + role/position vocabulary. */
  val FieldLength = 120.0
  val FieldWidth = 53.3
  val DbPositions: Seq[String] = Seq("CB", "DB", "FS", "SS") // settings.py:64
  val ReceiverRoutes: Seq[String] = Seq("IN", "OUT", "HITCH") // plays.py:50
  val Passer = "Passer"
  val TargetedReceiver = "Targeted Receiver"
  val Defense = "Defense"
  val Offense = "Offense"
}
