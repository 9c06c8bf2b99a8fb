package graft.ann

import graft.SparkSpec
import graft.ops.VectorQueries
import graft.vec.VectorOps
import org.apache.spark.sql.functions._

class AnnPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val q = VectorQueries.flagshipVec

  private def refEncode(v: Array[Float], flat: Array[Float],
      m: Int, k: Int): Array[Int] = {
    val sub = flat.length / (m * k)
    Array.tabulate(m) { mm =>
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var dist = 0.0; var dd = 0
        while (dd < sub) {
          val diff = v(mm * sub + dd).toDouble - flat((mm * k + j) * sub + dd).toDouble
          dist += diff * diff; dd += 1
        }
        if (dist < bestD) { bestD = dist; best = j }
        j += 1
      }
      best
    }
  }

  test("packed encode and packed ADC match a driver-side reference " +
    "recompute exactly (every unpacked code AND the score, bit-exact)") {
    import spark.implicits._
    val m = 8; val k = 16
    // derive bits = ceil(log2 k) exactly as VecPqEncodePacked does, so a
    // future k change can't silently desync the unpack below
    val bits = 32 - Integer.numberOfLeadingZeros(k - 1)
    val idx = PqIndex.build(emb, m = m, k = k, iters = 3)
    val vecs = emb.orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    val lut = idx.lutOf(q)
    val got = idx.codes
      .select(col("vec_id"), col("code"),
        VectorOps.pqAdcPacked(col("code"), lut, m, k).as("adc"))
      .orderBy(col("vec_id")).collect()
    assert(got.length == vecs.length)
    got.zip(vecs).foreach { case (r, (id, v)) =>
      assert(r.getLong(0) == id)
      val word = r.getLong(1)
      val want = refEncode(v, idx.flatCodebook, m, k)
      val codes = Array.tabulate(m)(mm =>
        ((word >>> (mm * bits)) & ((1L << bits) - 1)).toInt)
      assert(codes.sameElements(want), s"codes for vec $id")
      val wantAdc = want.zipWithIndex
        .foldLeft(0.0) { case (acc, (c, mm)) => acc + lut(mm * k + c) }
      assert(r.getDouble(2) == wantAdc, s"adc for vec $id") // bit-exact
    }
  }

  test("build is deterministic, and the packed word agrees nibble-for-" +
    "nibble with the unpacked vec_pq_encode in one projection") {
    val m = 8; val k = 16
    val bits = 32 - Integer.numberOfLeadingZeros(k - 1)
    val a = PqIndex.build(emb, m = m, k = k, iters = 3)
    val b = PqIndex.build(emb, m = m, k = k, iters = 3)
    // training is entirely driver-side sequential arithmetic over a
    // deterministic sample — bitwise equality, unlike the distributed
    // vecSum caveat IvfIndex documents
    assert(a.flatCodebook.sameElements(b.flatCodebook))
    // packed and array kernels side by side (also exercises the
    // freshName discipline: two 3-level generated loops in one function)
    val mismatches = emb
      .select(
        VectorOps.pqEncodePacked(col("embedding"), a.flatCodebook, m, k).as("w"),
        VectorOps.pqEncode(col("embedding"), a.flatCodebook, m, k).as("cs"))
      .filter(expr(
        s"aggregate(zip_with(cs, sequence(0, ${m - 1})," +
          s" (c, i) -> shiftleft(CAST(c AS BIGINT), $bits * i)), 0L," +
          " (acc, x) -> acc + x) != w"))
      .count()
    assert(mismatches == 0)
  }

  test("trained ADC ranking: direct recall@10 >= 0.4 and the exact " +
    "top-10 sits inside the ADC top-100 (the coarse->rerank contract)") {
    // m=16 (4-dim subspaces) fits this weakly-clustered 64-dim corpus:
    // measured recall@10 = 0.5 and top10-in-top100 = 1.0 for the
    // flagship query (m=8 drops to 0.1/0.6 — quantization error swamps
    // the tightly packed top scores). The production shape is ADC
    // coarse top-R -> exact rerank (n05's pattern), so the second
    // metric is the operative one; both asserted with margin.
    val exact = emb
      .select(col("vec_id"),
        round(VectorOps.dotQueryNative(col("embedding"), q), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val trained = PqIndex.build(emb, m = 16, k = 16, iters = 5)
    val adc100 = trained.search(q, 100).collect().map(_.getLong(0))
    val recall10 = adc100.take(10).count(exact).toDouble / 10.0
    val inTop100 = adc100.count(exact).toDouble / 10.0
    assert(recall10 >= 0.4, s"direct ADC recall@10 = $recall10")
    assert(inTop100 >= 0.9, s"exact top-10 inside ADC top-100 = $inTop100")
  }

  test("save/load round-trips: the reloaded artifact returns the " +
    "identical top-10 (ids and scores)") {
    val idx = PqIndex.build(emb, m = 8, k = 16, iters = 3)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq").toString
    idx.save(tmp)
    idx.codes.unpersist()
    val loaded = PqIndex.load(spark, tmp)
    assert(loaded.m == idx.m && loaded.k == idx.k &&
      loaded.flatCodebook.sameElements(idx.flatCodebook))
    val a = idx.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = loaded.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.sameElements(b))
  }

  test("ADC search plan: one narrow codes scan + TakeOrderedAndProject, " +
    "zero Exchange (the 100 TB codes-only scan shape)") {
    val idx = PqIndex.build(emb, m = 8, k = 16, iters = 1)
    val p = idx.search(q, 10).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }
}
