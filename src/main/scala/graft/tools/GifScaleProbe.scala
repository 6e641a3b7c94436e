package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Dev-only probe for the r21 GIF anti-scaling work: times the m19/m04/
  * m08 codec kernels over plain JVM thread pools of varying width — no
  * Spark involved — to separate JVM-level contention (javax.imageio
  * locks, allocation, GC) from anything Spark does. The clean r21
  * baseline reads m19 2.87 s at 32 cores vs 0.57 s at 8 cores on the
  * SAME code: 5x anti-scaling that must live below the query layer.
  */
object GifScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val ids = (0L until n.toLong).toArray

    def run(label: String, threads: Int)(kernel: Long => Unit): Unit = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val tasks = new java.util.ArrayList[Callable[Unit]]()
      val chunk = (n + threads - 1) / threads
      ids.grouped(chunk).foreach { g =>
        tasks.add(() => g.foreach(kernel))
      }
      pool.invokeAll(tasks)
      pool.shutdown(); pool.awaitTermination(60, TimeUnit.SECONDS)
      println(f"$label%-28s threads=$threads%2d  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    import graft.datapipe.Multimodal.{VideoCodec, GifWalk}
    // warmup
    (0L until 200L).foreach(id => GifWalk.walk(id, VideoCodec.synthVideoTimed(id)))

    for (rep <- 1 to 2; t <- Seq(1, 4, 8, 16, 32)) {
      run(s"m19 synth+walk (rep $rep)", t)(id =>
        GifWalk.walk(id, VideoCodec.synthVideoTimed(id)))
    }
    for (t <- Seq(1, 8, 32)) {
      run("m19 synth only", t)(id => VideoCodec.synthVideoTimed(id))
    }
    val payloads = ids.map(id => VideoCodec.synthVideoTimed(id))
    for (t <- Seq(1, 8, 32)) {
      run("m19 walk only", t)(id => GifWalk.walk(id, payloads(id.toInt)))
    }
    for (t <- Seq(1, 8, 32)) {
      run("m04 synth+features", t)(id =>
        VideoCodec.features(id, VideoCodec.synthVideo(id)))
    }
  }
}
