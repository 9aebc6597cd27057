package graft

/** Smoke test for the flagship example (the reference's
  * KinesisWordCountASL shape): fake stream in, word counts out.
  */
class ExampleSpec extends GraftSpec {
  test("KinesisWordCount counts words exactly once across shards") {
    val out = graft.examples.KinesisWordCount.run(spark, Seq(
      "a b b", "c a", "b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 3L, "c" -> 1L))
  }
}
