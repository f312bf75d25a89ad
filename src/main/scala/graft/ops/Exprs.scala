package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X1–X17 scalar expression library (SURVEY.md §2.8).
  *
  * Every helper is a pure `Column` expression — whole-stage-codegen
  * friendly, zero UDFs. The reference implements these as numpy /
  * row-wise-Python in `src/data_processing/training/features.py` and
  * `src/data_processing/cleaning/tracking.py`; here they are Catalyst
  * expression trees so they fuse into scans and aggregates.
  */
object Exprs {

  /** X11: fixed-dp rounding kept at emission points — part of
    * golden-output equality in the reference (features.py:126-144,
    * tracking.py:194).
    *
    * Implemented as `floor(x·10^k + 0.5) / 10^k` (pure IEEE double ops)
    * rather than Spark's `round`: Spark rounds the *shortest decimal
    * representation* (`BigDecimal.valueOf`) while other engines round
    * the exact binary value, so `round()` disagrees across engines for
    * values like 4201.31499999999996 (repr "4201.315"). The floor form
    * is bit-identical on any IEEE-754 engine; the DuckDB oracles spell
    * out the same formula.
    *
    * Spark's `floor(double)` returns LONG, which silently saturates at
    * Long.MaxValue (±9.2e18 scaled, so |x| ≳ 9.2e14 at k=4) and maps
    * NaN to 0 — both silent corruption, found by the hostile-fixture
    * sweep (r10). Past ±2^53 every double is already integral, so
    * `floor(v) = v` there on any IEEE engine: branch around the long
    * hop for |v| ≥ 2^53 and pass NaN through, which is exactly what
    * the external `floor(x·10^k + 0.5)/10^k` double form computes. */
  def rnd(c: Column, k: Int): Column = {
    val s = math.pow(10, k)
    val v = c * s + 0.5
    // ONE comparison (rnd runs per candidate PAIR in the similarity
    // joins — a second branch showed up on the sf0.1 bench): the
    // in-range test fails for huge v (integral past 2^53: floor(v)=v,
    // so v/s IS the floor form), for ±Inf, and for NaN (any NaN
    // comparison is false; v/s propagates NaN exactly like the
    // external floor(v)/s), and for NULL (null branch either way).
    when(abs(v) < 9007199254740992d, floor(v) / s).otherwise(v / s)
  }
  def r2(c: Column): Column = rnd(c, 2)
  def r4(c: Column): Column = rnd(c, 4)

  /** Order-independent sum of doubles: quantize to 1e-7 fixed-point
    * integers (floor-form, engine-portable) and sum integers — exact and
    * associative, so the aggregate is identical under any partitioning,
    * where a double sum would differ in final ulps from a
    * single-threaded oracle and flap 2-dp rounding at .xx5 boundaries.
    *
    * The per-row quantized value is cast to decimal(19,0) — wide enough
    * for any long (±9.2e18), so the documented per-row bound |x| < 1e11
    * (quantized < 1e18) has an order of magnitude of headroom before the
    * non-ANSI double→decimal cast would null out (and silently drop) a
    * row; still a compact-long decimal internally. Spark widens the sum
    * result to decimal(29,0), so the accumulated total is overflow-safe
    * to 1e29: at the 100-TB design point (~1e13 rows of 1e5-magnitude
    * values ⇒ total ≈ 1e25 in 1e-7 units) a plain int64 sum would
    * silently wrap at 9.2e18. The final decimal→double cast is the IEEE
    * round-to-nearest of the exact integer, matching DuckDB's
    * hugeint-sum→double.
    *
    * The domain bound is ENFORCED, not just documented: Spark's
    * `floor(double)` returns LONG and silently saturates at ±9.2e18
    * scaled (|x| ≳ 9.2e11), and maps NaN/±Inf to 0/Long.Max — a sum
    * that quietly clamps one corrupt row is the worst failure mode an
    * exact aggregate can have (hostile-fixture sweep, r10). Rows
    * outside |x| < 9e11, and non-finite rows, abort the job with the
    * offending value in the message; nulls still skip (SQL SUM). */
  def sumExact(c: Column): Column =
    sum(when(abs(c) < 9e11, floor(c * 1e7 + 0.5))
      .when(isnull(c), lit(null))
      .otherwise(raise_error(format_string(
        "sumExact: |input| outside exact-quantization domain (<9e11): %s",
        c.cast("string"))).cast("long"))
      .cast("decimal(19,0)")).cast("double") / 1e7

  /** Order-independent mean: exact decimal sum, then one double divide.
    * Divides by `count(c)` — the NON-NULL count, SQL `AVG` semantics —
    * not `count(*)`: [[sumExact]]'s quantization nulls out (skips) null
    * inputs, so a row-count denominator would silently bias the mean
    * low on nullable columns. An all-null group yields null (the sum is
    * null and division is null-intolerant before any zero check), same
    * as `avg`. */
  def avgExact(c: Column): Column = sumExact(c) / count(c)

  /** X1: Euclidean distance (tracking.py:368-375, features.py:95-97). */
  def dist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt(pow(x1 - x2, 2) + pow(y1 - y2, 2))

  /** X3: smallest absolute difference of two bearings, in [0, 180]
    * (features.py:11-23: `d=(a−b)%360; min(d, 360−d)`). */
  def angleDiff(a: Column, b: Column): Column =
    least(pmod(a - b, lit(360.0)), lit(360.0) - pmod(a - b, lit(360.0)))

  /** X4: unit vector components from a bearing in degrees
    * (features.py:26-37). */
  def unitX(thetaDeg: Column): Column = cos(radians(thetaDeg))
  def unitY(thetaDeg: Column): Column = sin(radians(thetaDeg))

  /** X5: bearing of (dx, dy) in degrees (features.py:111). */
  def bearing(dy: Column, dx: Column): Column = degrees(atan2(dy, dx))

  /** X6: clamp from below (features.py:105-107 `np.clip(d, 0.01, None)`). */
  def clampMin(c: Column, lo: Double): Column = greatest(c, lit(lo))

  /** X8: distance to nearest field boundary on a 120 × 53.3 field
    * (features.py:40-60). */
  def boundaryDist(x: Column, y: Column): Column =
    least(y, lit(53.3) - y, x, lit(120.0) - x)

  /** X9/X10: boolean → 0/1 int flag (features.py:137,140;
    * create_datasets.py:28-43). */
  def flag(cond: Column): Column = cond.cast("int")

  /** X2: field-standardization flip applied when `play_direction='left'`
    * (tracking.py:168-201; constants settings.py:72-75). */
  def flipCoord(isLeft: Column, c: Column, fieldMax: Double): Column =
    when(isLeft, r2(lit(fieldMax) - c)).otherwise(c)

  /** X2 angle half: `(θ+180) % 360` under flip. */
  def flipAngle(isLeft: Column, theta: Column): Column =
    when(isLeft, r2(pmod(theta + 180.0, lit(360.0)))).otherwise(theta)

  /** X14: closing speed of a defender toward a receiver
    * (features.py:105-107): −(v⃗_def · (rec−def)) / max(‖rec−def‖, 0.01)
    * with v⃗_def = s·[cos(rad(dir)), sin(rad(dir))]. */
  def closingSpeed(defX: Column, defY: Column, defS: Column, defDir: Column,
                   recX: Column, recY: Column): Column = {
    val dx = recX - defX
    val dy = recY - defY
    val vx = defS * unitX(defDir)
    val vy = defS * unitY(defDir)
    -(vx * dx + vy * dy) / clampMin(dist(defX, defY, recX, recY), 0.01)
  }

  /** Line of scrimmage on the 120-yd standardized field
    * (visualization/play.py:194-203): the absolute yardline counts from
    * the back of the home end zone (10 yd deep), flipped when the play
    * runs left. */
  def lineOfScrimmage(playDirection: Column, absoluteYardline: Column): Column =
    when(playDirection === "left", lit(120.0) - absoluteYardline - 10.0)
      .otherwise(absoluteYardline - 10.0)

  /** First-down marker: LOS + yards to go (play.py:203). */
  def firstDownLine(playDirection: Column, absoluteYardline: Column,
                    yardsToGo: Column): Column =
    lineOfScrimmage(playDirection, absoluteYardline) + yardsToGo

  /** X12: outcome-weighted piecewise recovery score
    * (recovery.py:33-62; weights docs/submission.md:59):
    * C → −p; I → 1−p; IN → 1.2·(1−p). */
  def recoveryScore(passResult: Column, p: Column): Column =
    when(passResult === "C", -p)
      .when(passResult === "I", lit(1.0) - p)
      .when(passResult === "IN", lit(1.2) * (lit(1.0) - p))
      .otherwise(lit(0.0))
}
