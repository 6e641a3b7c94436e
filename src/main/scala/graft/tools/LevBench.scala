package graft.tools

import org.apache.spark.unsafe.types.UTF8String

/** Dev-only microbench behind [[graft.functions.BandedLevenshtein]]:
  * Spark's builtin `levenshteinDistance(other, k)` vs the custom banded
  * DP, on the three pair regimes a verify stage sees. The builtin walks
  * UTF8String.charAt per DP cell — O(position) — so SIMILAR pairs (the
  * operator's own output!) measured ~400µs while far pairs early-exit in
  * ~2µs; the custom DP decodes each operand once and runs the band over
  * arrays (~3µs on the same near pair). Run: runMain graft.tools.LevBench
  */
object LevBench {
  def main(args: Array[String]): Unit = {
    val r = new scala.util.Random(7)
    def randStr(n: Int) = UTF8String.fromString(
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
    // near pairs differ at one position (no memcmp shortcut on either
    // implementation); identical pairs exercise the equality fast path
    val pairsSame = (0 until 6000).map { _ =>
      val s = randStr(300); (s, UTF8String.fromString(s.toString))
    }
    val pairsNear = (0 until 6000).map { _ =>
      val s = randStr(300)
      (s, UTF8String.fromString(s.toString.updated(150, 'Z')))
    }
    val pairsFar = (0 until 6000).map(_ => (randStr(300), randStr(300)))

    def bench(label: String, ps: Seq[(UTF8String, UTF8String)],
              f: (UTF8String, UTF8String) => Int): Unit = {
      var acc = 0L
      val t0 = System.nanoTime()
      ps.foreach { case (a, b) => acc += f(a, b) }
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e3 / ps.size}%8.2f us/pair (acc=$acc)")
    }
    val builtin = (a: UTF8String, b: UTF8String) => a.levenshteinDistance(b, 5)
    val banded = (a: UTF8String, b: UTF8String) =>
      graft.functions.BandedLevenshtein.compute(a, b, 5)
    for (round <- 1 to 2) { // round 1 is JIT warmup
      println(s"-- round $round --")
      bench("builtin k=5 identical", pairsSame, builtin)
      bench("builtin k=5 1-edit", pairsNear, builtin)
      bench("builtin k=5 far", pairsFar, builtin)
      bench("banded  k=5 identical", pairsSame, banded)
      bench("banded  k=5 1-edit", pairsNear, banded)
      bench("banded  k=5 far", pairsFar, banded)
    }
  }
}
