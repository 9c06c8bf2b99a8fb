package graft.engine

import graft.SparkSpec
import graft.embed.DeterministicEmbedder

/** Golden fixtures (FIXTURES.md "Golden query seeds"): checked-in expected
  * id lists for the five canonical queries at sf0.001. Fully deterministic
  * end-to-end (DeterministicEmbedder + seeded engine + explicit
  * tie-breaks), so any drift in parser, resolver, combine, scoring, or
  * ordering shows up as a golden diff. */
class GoldenSpec extends SparkSpec {

  private lazy val engine: RClipEngine = {
    val dir = java.nio.file.Files.createTempDirectory("golden").toString
    val store = new SnapshotStore(dir)
    store.initFrom(spark, s"$sf/embeddings.parquet")
    new RClipEngine(spark, store, new DeterministicEmbedder(64))
  }

  private def ids(q: String): Seq[Long] =
    engine.search(q, 12).collect().toSeq.map(_.getLong(0))

  test("golden 1: single positive term via centroid table") {
    assert(ids("label5") ==
      Seq(354L, 440, 268, 458, 485, 390, 359, 105, 116, 92, 475, 395))
  }

  test("golden 2: zebra -stripes shape (README.md:15)") {
    assert(ids("label5 -label6") ==
      Seq(78L, 268, 105, 395, 354, 458, 190, 138, 273, 279, 338, 285))
  }

  test("golden 3: image-difference query (README.md:23)") {
    assert(ids("""{"image_id":0} -{"image_id":1}""") ==
      Seq(0L, 398, 71, 394, 105, 299, 17, 131, 421, 104, 225, 346))
  }

  test("golden 4: seeded-random determinism") {
    assert(ids("""{"random_seed":7}""") ==
      Seq(73L, 276, 297, 262, 446, 0, 354, 390, 136, 126, 346, 483))
  }

  test("golden 5: dedup is a no-op on the pristine corpus and idempotent") {
    assert(engine.dedupByEmbedding() == 0L)
    assert(engine.dedupByEmbedding() == 0L) // idempotence
  }
}
