package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** The 32-team metadata dim (reference `src/core/teams.py:43-76`): the
  * last named table in the reference catalog — abbreviation → city /
  * name / brand colors, joined by notebooks and the animation CLI for
  * labeling and drawing. Public factual data (team identities and brand
  * hex colors), re-declared here as a proper broadcast dimension: 32
  * rows live driver-side and hash-join map-side against any fact frame,
  * the canonical tiny-dim shape at any scale.
  */
object Teams {

  case class Team(teamId: Int, abbr: String, city: String, name: String,
                  primary: String, secondary: String)

  /** teamId is the stable join surrogate (row index) so facts without a
    * team column can still exercise the dim via a deterministic key. */
  val All: Seq[Team] = Seq(
    ("ARI", "Arizona", "Cardinals", "#97233F", "#FFB612"),
    ("ATL", "Atlanta", "Falcons", "#A71930", "#000000"),
    ("BAL", "Baltimore", "Ravens", "#241773", "#9E7C0C"),
    ("BUF", "Buffalo", "Bills", "#00338D", "#C60C30"),
    ("CAR", "Carolina", "Panthers", "#0085CA", "#101820"),
    ("CHI", "Chicago", "Bears", "#0B162A", "#C83803"),
    ("CIN", "Cincinnati", "Bengals", "#FB4F14", "#000000"),
    ("CLE", "Cleveland", "Browns", "#311D00", "#FF3C00"),
    ("DAL", "Dallas", "Cowboys", "#003594", "#869397"),
    ("DEN", "Denver", "Broncos", "#FB4F14", "#002244"),
    ("DET", "Detroit", "Lions", "#0076B6", "#B0B7BC"),
    ("GB", "Green Bay", "Packers", "#203731", "#FFB612"),
    ("HOU", "Houston", "Texans", "#03202F", "#A71930"),
    ("IND", "Indianapolis", "Colts", "#002C5F", "#B0B7BC"),
    ("JAX", "Jacksonville", "Jaguars", "#006778", "#D7A22A"),
    ("KC", "Kansas City", "Chiefs", "#E31837", "#FFB81C"),
    ("LA", "Los Angeles", "Rams", "#003594", "#FFD100"),
    ("LAC", "Los Angeles", "Chargers", "#0080C6", "#FFC20E"),
    ("LV", "Las Vegas", "Raiders", "#000000", "#A5ACAF"),
    ("MIA", "Miami", "Dolphins", "#008E97", "#FC4C02"),
    ("MIN", "Minnesota", "Vikings", "#4F2683", "#FFC62F"),
    ("NE", "New England", "Patriots", "#002244", "#C60C30"),
    ("NO", "New Orleans", "Saints", "#D3BC8D", "#101820"),
    ("NYG", "New York", "Giants", "#0B2265", "#A71930"),
    ("NYJ", "New York", "Jets", "#125740", "#000000"),
    ("PHI", "Philadelphia", "Eagles", "#004C54", "#A5ACAF"),
    ("PIT", "Pittsburgh", "Steelers", "#FFB612", "#101820"),
    ("SEA", "Seattle", "Seahawks", "#002244", "#69BE28"),
    ("SF", "San Francisco", "49ers", "#AA0000", "#B3995D"),
    ("TB", "Tampa Bay", "Buccaneers", "#D50A0A", "#0A0A08"),
    ("TEN", "Tennessee", "Titans", "#0C2340", "#4B92DB"),
    ("WAS", "Washington", "Commanders", "#773141", "#FFB612")
  ).zipWithIndex.map { case ((a, c, n, p, s), i) => Team(i, a, c, n, p, s) }

  def byAbbr(abbr: String): Option[Team] = All.find(_.abbr == abbr)

  /** The dim as a broadcast DataFrame:
    * (team_id, abbr, city, team_name, primary_color, secondary_color). */
  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    broadcast(All.map(t => (t.teamId, t.abbr, t.city, t.name, t.primary, t.secondary))
      .toDF("team_id", "abbr", "city", "team_name", "primary_color", "secondary_color"))
  }

  /** The same 32 rows as a DuckDB VALUES list — generated from [[All]]
    * so the oracle can never drift from the engine's dim. */
  def oracleValues: String =
    All.map(t => s"(${t.teamId}, '${t.abbr}', '${t.name}', '${t.primary}')")
      .mkString(", ")
}
