package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.kernels.Pelt

/** Sequential per-group kernels (SURVEY.md §2.9): PELT change-point +
  * deception score over per-user ordered event-value series — the one
  * operator family that is genuinely not SQL-expressible (excluded from
  * the oracle map per the driver contract; covered by PeltSpec).
  */
object Kernels {
  import Relational.Q

  /** K2/K3: one shuffle on the group key, then a JVM-local kernel per
    * group (`groupByKey.mapGroups`) over the explicitly frame-ordered
    * series — the Spark shape of deception.py:83-136. */
  val queries: Map[String, Q] = Map(
    "k2_pelt_changepoint" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"), unix_micros(col("ts")).as("tsm"), col("event_id"))
        .as[(Long, Double, Long, Long)]
      ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          // explicit total order (ts, event_id) — pandas relied on file
          // order — collected under the Pelt.MaxSeriesPoints cap so one
          // pathological key cannot OOM the task (bounded heap, not
          // it.toArray)
          val signal = Pelt.boundedCollect(
            it.map(r => (r._3, r._4, r._2)), Pelt.MaxSeriesPoints,
            Ordering.by((x: (Long, Long, Double)) => (x._1, x._2))).map(_._3)
          val cp = Pelt.changePoint(signal)
          val score = Pelt.deceptionScore(signal)
          (uid, signal.length, cp, math.rint(score * 10000) / 10000)
        }
        .toDF("user_id", "n_points", "change_point", "deception_score")
    }),

    // K2/K3 as the native Catalyst aggregate (functions.PeltDeception,
    // injected via spark.sql.extensions): same kernel, but composable
    // inside a plain groupBy.agg / SQL call. No oracle (kernel); PeltSpec
    // + KernelAggSpec assert it matches the mapGroups form exactly.
    "k2_pelt_agg" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("value"),
          unix_micros(col("ts")).as("tsm"), col("event_id"))
        .groupBy(col("user_id"))
        .agg(call_function("pelt_deception",
          col("value"), col("tsm"), col("event_id")).as("pd"))
        .select(col("user_id"), col("pd.n_points").as("n_points"),
          col("pd.change_point").as("change_point"),
          (rint(col("pd.deception_score") * 10000) / 10000).as("deception_score")))
  )

  val oracles: Map[String, String] = Map.empty
}
