package graft

/** Pins the Verify failure-path contract (VERDICT r05 #4): a throwing
  * query must leave a loud `<name>.err` marker in the output dir — the
  * driver's correctness JSON can then report `err` instead of silently
  * dropping the row — while healthy queries still dump parquet. */
class VerifySpec extends SparkSpec {

  test("a throwing query writes an .err marker; a healthy one writes parquet") {
    val out = java.nio.file.Files.createTempDirectory("graft-verify-spec").toString
    // nonexistent sfDir → every query throws at read time
    Verify.runQueries(spark, "/nonexistent-graft-sf", out,
      Some(Set("v01_search_topk")))
    val err = new java.io.File(s"$out/v01_search_topk.err")
    assert(err.isFile, "throwing query must leave an .err marker")
    val body = new String(java.nio.file.Files.readAllBytes(err.toPath), "UTF-8")
    assert(body.contains("PATH_NOT_FOUND") || body.contains("Path does not exist"),
      s"marker should carry the cause, got:\n$body")

    Verify.runQueries(spark, sf, out, Some(Set("q08_distinct_sources")))
    assert(new java.io.File(s"$out/q08_distinct_sources").isDirectory,
      "healthy query must dump its parquet dir")
    assert(!new java.io.File(s"$out/q08_distinct_sources.err").exists())
  }

  test("driver contract: SparkEntry.entry returns rows (the per-round " +
    "smoke the driver itself runs — pinned here so a regression fails " +
    "in-repo first)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 12)
    assert(rows.map(_.getDouble(1)).toSeq == rows.map(_.getDouble(1)).sortBy(-(_: Double)).toSeq)
  }
}
