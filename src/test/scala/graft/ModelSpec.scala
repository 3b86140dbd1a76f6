package graft

import graft.model.Backoff
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("backoff matches reference formula: min(round(500*count*1.5), 10000)") {
    // queue/backoff.ex:6-16 with config.ex:3-4 defaults
    assert(Backoff.nextDelayMs(1) === 750)
    assert(Backoff.nextDelayMs(2) === 1500)
    assert(Backoff.nextDelayMs(5) === 3750)
    assert(Backoff.nextDelayMs(100) === 10000) // capped
  }

  test("backoff is monotonic non-decreasing and capped (property)") {
    val prop = Prop.forAll(
      Gen.choose(0, 10000), Gen.choose(1L, 5000L), Gen.choose(1L, 60000L)) {
      (count: Int, initial: Long, max: Long) =>
        val d = Backoff.nextDelayMs(count, initial, max)
        d <= max && d >= 0 && Backoff.nextDelayMs(count + 1, initial, max) >= d
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
