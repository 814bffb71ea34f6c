package graft
import graft.core.{PageDoc, PromptMode}
import graft.gen.InputGen
import graft.kernel.ExtractKernel
import java.util.concurrent.atomic.AtomicLong

/** Pure-thread kernel microbench (no Spark): isolates whether scaling
  * limits come from the kernel+hardware or from Spark machinery. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val nDocs = if (args.length > 1) args(1).toInt else 200000
    val docs = (0 until nDocs).map { i =>
      val r = InputGen.generate(42L, i.toLong)
      PageDoc(r.url, r.warc_ts, r.html, r.text, r.lang)
    }.toArray
    def run(): Double = {
      val idx = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = idx.getAndIncrement()
          var sink = 0L
          while (i < nDocs) {
            ExtractKernel.parseDoc(docs(i.toInt), PromptMode.LayoutAll)
              .foreach(p => sink += p.md.length)
            i = idx.getAndIncrement()
          }
          if (sink == -1) println("")
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    val times = (1 to 4).map(_ => { System.gc(); run() })
    println(f"KSECONDS=${times.min}%.2f RAW=${times.map(t => f"$t%.2f").mkString(",")} DOCS_PER_SEC=${nDocs / times.min}%.0f")
  }
}
