package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries
import graft.sources.Tables

/** Invariant pins for the round-5 session-8 operators. */
class Round5hOpsSpec extends AnyFunSuite {
  import TestSpark._

  // ---- ts_kalman -----------------------------------------------------

  test("ts_kalman: windowed closed form equals the direct sequential recursion") {
    val out = TimeSeries.tsKalman.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // replay l_t = l_{t-1} + k_t (x_t - l_{t-1}) per type on the
    // collected O(types×days) series (l_0 = 0 matches the closed
    // form's empty-sum start) and require the distributed closed
    // form to match to rounding
    val q = 0.01; val r = 1.0
    out.groupBy(_._1).foreach { case (_, rows) =>
      val series = rows.sortBy(_._2.getTime)
      var p = 1.0; var l = 0.0
      series.foreach { case (_, _, n, gain, level) =>
        val k = (p + q) / (p + q + r)
        p = r * k
        l = l + k * (n.toDouble - l)
        assert(math.abs(gain - k) < 1e-6)
        assert(math.abs(level - l) < 2e-3,
          s"closed form $level != recursion $l")
      }
    }
    // the gain must converge DOWN toward the steady state from above
    val gains = out.filter(_._1 == out.head._1).sortBy(_._2.getTime).map(_._4)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      "gain sequence must be monotone non-increasing")
    val steady = { // fixed point of the gain recursion, numerically
      var p = 1.0; var k = 0.0
      (1 to 500).foreach { _ => k = (p + q) / (p + q + r); p = r * k }
      k
    }
    assert(math.abs(gains.last - steady) < 0.01,
      s"gain ${gains.last} should approach steady state ~$steady")
  }

  test("ts_kalman smooths: filtered level variance below raw variance") {
    val out = TimeSeries.tsKalman.fn(spark, sf).collect()
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      // skip the warm-up (first 5 days) where the level is still rising
      val tail = rows.sortBy(_.getTimestamp(1).getTime).drop(5)
      if (tail.length > 10) {
        def variance(xs: Seq[Double]): Double = {
          val m = xs.sum / xs.size
          xs.map(x => (x - m) * (x - m)).sum / xs.size
        }
        val raw = variance(tail.map(_.getLong(2).toDouble).toSeq)
        val filt = variance(tail.map(_.getDouble(4)).toSeq)
        assert(filt < raw, s"filter must smooth: $filt !< $raw")
      }
    }
  }
}
