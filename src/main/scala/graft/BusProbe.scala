package graft

/** Spark-free memory-bus probe. Streams 2 GB of reads over a 256 MB buffer
  * (far beyond LLC) — the same memory-bandwidth-bound character as record
  * decode — and prints the elapsed seconds for the fixed work.
  *
  * Bench launches 1 instance, then 4 CONCURRENT instances (separate JVM
  * processes, zero communication, zero Spark): any per-process slowdown in
  * the 4-way run is pure hardware memory-path contention, an inflation
  * floor that NO engine design can scale past on this box. The measured
  * floor is reported next to the executor-pair scaling efficiencies so the
  * hardware ceiling is separated from engine overhead by numbers.
  */
object BusProbe {

  def kernelSeconds(): Double = {
    val buf = new Array[Long](32 << 20) // 256 MB
    var i = 0
    while (i < buf.length) { buf(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    val t0 = System.nanoTime()
    var h = 0L
    var pass = 0
    while (pass < 8) { // 8 passes x 256 MB = 2 GB streamed
      var j = 0
      while (j < buf.length) { h ^= buf(j) * 0xC2B2AE3D27D4EB4FL; j += 1 }
      pass += 1
    }
    if (h == 42L) System.err.println("") // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    kernelSeconds() // JIT warm-up pass, untimed
    println(f"${kernelSeconds()}%.4f")
  }
}
