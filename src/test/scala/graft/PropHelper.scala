package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal seeded forAll over scalacheck Gens (scalatestplus is not in the
  * offline cache, so we sample deterministically ourselves). */
trait PropHelper {
  val propRuns: Int = 200

  private def sample[A](g: Gen[A], seed: Seed): A =
    g.pureApply(Gen.Parameters.default, seed)

  def forAll[A](ga: Gen[A])(f: A => Unit): Unit = {
    var s = Seed(42L)
    (0 until propRuns).foreach { _ =>
      f(sample(ga, s)); s = s.next
    }
  }

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    var s = Seed(42L)
    (0 until propRuns).foreach { _ =>
      f(sample(ga, s), sample(gb, s.next)); s = s.next.next
    }
  }

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit = {
    var s = Seed(42L)
    (0 until propRuns).foreach { _ =>
      f(sample(ga, s), sample(gb, s.next), sample(gc, s.next.next)); s = s.next.next.next
    }
  }
}
