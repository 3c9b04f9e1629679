package graft.jobs

/** Latency bench for the NO-SPARK point-lookup tier in the JVM shape
  * it actually deploys in: a lean serving process that never created a
  * SparkSession. `StreamBench --lookup` measures [[LocalLookup]] too,
  * but inside the bench JVM — after the Spark index-build and serving
  * phases its heap is full of executor state and the GC stripes the
  * tail (p95 jumps ~25× at 300 lookups). This main reads an export
  * that an earlier `--lookup` run left behind (its `export_dir` field)
  * and reports the clean p50/p95/max.
  *
  * Usage: runMain graft.jobs.LocalLookupBench <bm25ExportDir> [nLookups]
  *
  * The query stream mirrors the probe's (3 uniform terms from the
  * w0..w199 vocabulary, the same shape the parity-asserted in-probe
  * loop serves).
  */
object LocalLookupBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: LocalLookupBench <bm25ExportDir> [nLookups]")
    val dir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(300)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    val rnd = new scala.util.Random(7)
    def q() = Seq.fill(3)(vocab(rnd.nextInt(vocab.size)))
    (0 until 10).foreach(_ => LocalLookup.bm25Single(dir, q(), 10))
    var rows = 0L
    val durs = (0 until n).map { _ =>
      val terms = q()
      val t0 = System.nanoTime()
      rows += LocalLookup.bm25Single(dir, terms, 10).length
      (System.nanoTime() - t0) / 1e6
    }.sorted
    def pct(p: Double): Double = durs(math.round(p * (durs.length - 1)).toInt)
    println(s"""{"probe":"local_lookup_bench","op":"bm25_lookup_local",""" +
      s""""n_lookups":$n,"p50_ms":${f"${pct(0.5)}%.1f"},""" +
      s""""p95_ms":${f"${pct(0.95)}%.1f"},"max_ms":${f"${durs.last}%.1f"},""" +
      s""""result_rows":$rows,"spark":false}""")
  }
}
