package graft

/** Pins the gridmix-style soak harness at miniature scale: all five
  * job families run end-to-end in sequence, every family's internal
  * validation (row counts, sort validators, non-empty stages) holds,
  * and the result shape is stable. The measured run is `graft.Soak`
  * at the SCALE.md dials; this spec keeps the harness itself from
  * rotting between measured rounds.
  */
class SoakSpec extends SparkSpec {

  test("all five gridmix families run and validate at miniature scale") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val got = Soak.run(spark, dir, fixRows = 4000, varRows = 1500,
      textRows = 3000, parts = 4)
    assert(got.map(_._1) == Seq("three_stage", "var_sort", "ref_select",
      "indirect_read", "api_sort"))
    val byName = got.toMap
    // three_stage funnels: 10% of 4000 keys, then two keep-stages
    val ts = byName("three_stage").rows
    assert(ts > 0 && ts < 400, s"three_stage rows $ts")
    assert(byName("var_sort").rows == 1500)
    assert(byName("api_sort").rows == 3000)
    assert(byName("indirect_read").rows > 0)
    got.foreach { case (n, r) =>
      assert(r.seconds > 0, s"$n must be timed")
    }
  }
}
