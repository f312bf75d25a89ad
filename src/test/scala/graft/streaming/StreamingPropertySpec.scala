package graft.streaming

import java.sql.Timestamp
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom-state transition function: on random
  * per-user event sequences split at ARBITRARY micro-batch boundaries
  * — the crash/replay-relevant shape, since the engine never promises
  * how events group into batches — the folded state must equal a
  * one-batch run and a driver fold: count, 1e-7-quantized sum
  * (batching-invariant by the integer-quanta accumulation), and max
  * event id (out-of-order arrivals keep the latest, not the last
  * seen). Runs entirely on Spark's public TestGroupState harness — no
  * engine clock, no micro-batch scheduler. */
class StreamingPropertySpec extends AnyFunSuite {

  private def ts(m: Long) = new Timestamp(60000L * m)

  private val caseGen: Gen[(Seq[Streaming.Ev], Seq[Int])] = for {
    n <- Gen.chooseNum(1, 40)
    evs <- Gen.listOfN(n, for {
      eid <- Gen.chooseNum(0L, 999L) // random order: out-of-order ids
      v <- Gen.chooseNum(-2000, 2000).map(_ / 100.0)
      m <- Gen.chooseNum(0L, 120L)
    } yield Streaming.Ev(1L, eid, ts(m), v))
    cuts <- Gen.listOfN(n, Gen.chooseNum(0, 4)) // batch index per event
  } yield (evs, cuts)

  private def run(batches: Seq[Seq[Streaming.Ev]]): Streaming.UserStat = {
    var stateOpt: Option[Streaming.UserStat] = None
    var out: Streaming.UserStat = null
    batches.filter(_.nonEmpty).foreach { b =>
      val st = TestGroupState.create[Streaming.UserStat](
        stateOpt.map(Optional.of[Streaming.UserStat]).getOrElse(Optional.empty()),
        GroupStateTimeout.ProcessingTimeTimeout,
        1000L, Optional.empty[Long](), hasTimedOut = false)
      out = Streaming.userStatsFunc(Some("30 minutes"))(1L, b.iterator, st)
      stateOpt = if (st.exists) Some(st.get) else None
    }
    out
  }

  test("userStatsFunc: any micro-batch split equals one batch equals the driver fold") {
    val cases = Gen.listOfN(8, caseGen).sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    cases.foreach { case (evs, cuts) =>
      // batches ordered by index — events keep their sequence within
      // and across batches (the file/kafka source ordering contract)
      val batches = evs.zip(cuts).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      val split = run(batches)
      val single = run(Seq(evs))
      val want = Streaming.UserStat(1L, evs.size.toLong,
        evs.map(e => math.floor(e.value * 1e7 + 0.5).toLong).sum.toDouble / 1e7,
        evs.map(_.event_id).max)
      assert(split == want, s"split run diverged: $split vs $want (evs=$evs cuts=$cuts)")
      assert(single == want, s"single-batch run diverged: $single vs $want")
    }
  }
}
