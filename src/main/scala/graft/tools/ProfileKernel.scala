package graft.tools

import org.apache.spark.unsafe.types.UTF8String

/** Dev-only: single-threaded microbench of the U256Conv kernels. */
object ProfileKernel {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(7)
    val n = 600000
    val inputs = Array.fill(n)(UTF8String.fromString(
      Seq.fill(64)("0123456789abcdef".charAt(rnd.nextInt(16))).mkString))
    // warm
    var i = 0; var acc = 0L
    while (i < 50000) { acc += graft.functions.U256Conv.decString(inputs(i)).numChars(); i += 1 }
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[k] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.3f s for $n rows (1 thread)")
    }
    time("decString") { var j = 0; while (j < n) { acc += graft.functions.U256Conv.decString(inputs(j)).numChars(); j += 1 } }
    time("limbs") { var j = 0; while (j < n) { acc += graft.functions.U256Conv.limbs(inputs(j)).numElements(); j += 1 } }
    time("limbs+render") { var j = 0; while (j < n) { acc += graft.functions.U256Conv.render(graft.functions.U256Conv.limbs(inputs(j))).numChars(); j += 1 } }
    println("[k] acc " + acc)
  }
}
