package graft.tools

/** Pure-JVM micro-benchmark for the hot UDF kernels — no SparkSession, no
  * shuffle, no parquet: just the per-row arithmetic, measured in
  * nanoseconds per call. This is the measurement of last resort on a noisy
  * shared host: end-to-end Spark runs on this box swing 2-3× between
  * IDENTICAL back-to-back executions (host neighbors / frequency drift),
  * which is wider than most kernel-level effects — the round-8 "minhash
  * regressed 2×" scare was exactly such an artifact, disproven by this
  * harness showing the rewritten Jaccard kernel 2-4× FASTER per pair.
  * Protocol: 3 warmup sweeps (JIT), then a timed sweep large enough to
  * amortize the clock; results are per-call averages over ~2M calls.
  *
  * Usage: sbt "runMain graft.tools.KernelBench"
  */
object KernelBench {
  // mirrors the retired HashSet formulation of jaccardLongKernel, kept as
  // the comparison baseline
  private def jaccardHashSet(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.count(sb)
    val union = sa.size + sb.size - inter
    if (union > 0) inter.toDouble / union else 1.0
  }

  // the SHIPPED merge — not a copy (drift-proof: the bench measures the
  // exact code jaccardLongKernel runs)
  private def mergeSorted(x: Array[Long], y: Array[Long]): Double =
    graft.ext.Kernels.jaccardMergeSorted(x, y)

  private def sortThenMerge(a: Array[Long], b: Array[Long]): Double = {
    val x = a.clone(); java.util.Arrays.sort(x)
    val y = b.clone(); java.util.Arrays.sort(y)
    mergeSorted(x, y)
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(100, 500, 2000)) {
      // overlapping pairs drawn from a shared pool, like real LSH
      // candidates (~50% expected overlap)
      val pool = Array.fill(n * 2)(rnd.nextLong())
      val pairs = Array.fill(200)((
        Array.fill(n)(pool(rnd.nextInt(pool.length))),
        Array.fill(n)(pool(rnd.nextInt(pool.length)))))
      val sortedPairs = pairs.map { case (a, b) =>
        val x = a.clone(); java.util.Arrays.sort(x)
        val y = b.clone(); java.util.Arrays.sort(y); (x, y)
      }
      def time(name: String)(f: => Double): Unit = {
        var s = 0.0
        for (_ <- 1 to 3) { s = 0.0; for (_ <- 1 to 50) s += f } // JIT warmup
        val t0 = System.nanoTime()
        for (_ <- 1 to 200) { s = 0.0; for (_ <- 1 to 50) s += f }
        val ns = (System.nanoTime() - t0) / (200.0 * 50 * pairs.length)
        println(f"n=$n%5d $name%16s ${ns}%10.1f ns/pair (checksum=$s%.1f)")
      }
      time("jaccardHashSet") {
        var t = 0.0; var k = 0
        while (k < pairs.length) { val p = pairs(k); t += jaccardHashSet(p._1, p._2); k += 1 }; t
      }
      time("sortThenMerge") {
        var t = 0.0; var k = 0
        while (k < pairs.length) { val p = pairs(k); t += sortThenMerge(p._1, p._2); k += 1 }; t
      }
      time("mergePresorted") {
        var t = 0.0; var k = 0
        while (k < sortedPairs.length) { val p = sortedPairs(k); t += mergeSorted(p._1, p._2); k += 1 }; t
      }
    }
  }
}
