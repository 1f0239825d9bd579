package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper (the scalatest<->scalacheck
  * bridge artifact isn't in the offline cache; plain scalacheck Gen is). */
trait PropHelpers {
  def forAllG[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      val a = gen.pureApply(Gen.Parameters.default, seed)
      try f(a)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"property failed at case #$i for input: $a", e)
      }
      seed = seed.next
      i += 1
    }
  }

  def forAllG2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 200)(f: (A, B) => Unit): Unit =
    forAllG(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }
}
