package graft.vec

import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {

  private def randomVecs(n: Int, dim: Int, seed: Long): Seq[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)((rnd.nextDouble() * 10 - 5).toFloat))
  }

  test("dot of identical unit vectors is 1") {
    val v = VectorOps.normalize(Array(1f, 2f, 3f, 4f))
    assert(math.abs(VectorOps.dot(v, v) - 1.0) < 1e-6)
  }

  test("normalize produces unit vectors; zero vector is untouched") {
    randomVecs(100, 16, seed = 1).foreach { v =>
      val n = VectorOps.l2norm(VectorOps.normalize(v))
      assert(math.abs(n - 1.0) < 1e-4)
    }
    val z = new Array[Float](8)
    assert(VectorOps.l2norm(VectorOps.normalize(z)) == 0.0)
  }

  test("combine: empty -> None; non-empty -> unit vector (SURVEY Q10/Q11)") {
    assert(VectorOps.combine(Nil).isEmpty)
    val rnd = new java.util.Random(2)
    randomVecs(100, 16, seed = 3).grouped(4).foreach { g =>
      val terms = g.map(v => (rnd.nextFloat() * 6 - 3) -> v)
      val c = VectorOps.combine(terms).get
      val n = VectorOps.l2norm(c)
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-4)
    }
  }

  test("combine(+a, -a) degenerates to zero") {
    val a = Array(1f, 2f, 3f)
    val c = VectorOps.combine(Seq(1f -> a, -1f -> a)).get
    assert(c.forall(_ == 0f))
  }

  test("scaling all magnitudes uniformly does not change the combined direction") {
    val a = Array(1f, 0f, 0f, 2f); val b = Array(0f, 1f, 1f, 0f)
    val c1 = VectorOps.combine(Seq(2f -> a, 1f -> b)).get
    val c2 = VectorOps.combine(Seq(4f -> a, 2f -> b)).get
    assert(math.abs(VectorOps.dot(c1, c2) - 1.0) < 1e-6)
  }

  test("sqlDoubleArray round-trips the widened floats exactly") {
    val v = Array(0.1f, -1.5f, 3.14159f)
    val rendered = VectorOps.sqlDoubleArray(v)
    val parsed = rendered.stripPrefix("[").takeWhile(_ != ']').split(",").map(_.toDouble)
    assert(parsed.sameElements(v.map(_.toDouble)))
  }

  test("embedder is deterministic across instances and unit-norm") {
    val e1 = new graft.embed.DeterministicEmbedder(64)
    val e2 = new graft.embed.DeterministicEmbedder(64)
    val v1 = e1.embedText("zebra stripes")
    val v2 = e2.embedText("zebra stripes")
    assert(v1.sameElements(v2))
    assert(math.abs(VectorOps.l2norm(v1) - 1.0) < 1e-4)
    assert(!v1.sameElements(e1.embedText("spots")))
  }
}
