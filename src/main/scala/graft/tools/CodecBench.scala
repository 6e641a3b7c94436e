package graft.tools

/** Dev-only microbenchmark for the multimodal codec kernels: isolates
  * where the per-asset time goes (writer/reader acquisition, per-frame
  * encode, container scan, per-frame decode, pixel access) so the
  * optimization targets the measured component. No Spark — the kernels
  * are plain JVM functions; the numbers are per-asset CPU costs.
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val ids = (0L until n.toLong).toArray
    def time(label: String)(body: => Unit): Unit = {
      // one warmup pass then the timed pass
      body
      val t0 = System.nanoTime()
      body
      val el = (System.nanoTime() - t0) / 1e9
      println(f"$label%-40s ${el}%7.3f s  (${el * 1e6 / n}%8.1f us/asset)")
    }

    import graft.datapipe.Multimodal.{VideoCodec, ImageCodec}

    // --- GIF video path (m04/m08/m19) ---
    time("gif: synthVideoScenes (encode)") {
      ids.foreach(id => VideoCodec.synthVideoScenes(id))
    }
    val scenePayloads = ids.map(id => VideoCodec.synthVideoScenes(id))
    time("gif: sceneCuts (decode all frames)") {
      ids.foreach(i => VideoCodec.sceneCuts(i, scenePayloads(i.toInt)))
    }
    val payloads = ids.map(id => VideoCodec.synthVideo(id))
    time("gif: features (decode 4 frames)") {
      ids.foreach(i => VideoCodec.features(i, payloads(i.toInt)))
    }
    // decode sub-steps
    time("gif: reader acquire only") {
      ids.foreach { _ =>
        val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        r.dispose()
      }
    }
    time("gif: reader + getNumImages(true)") {
      ids.foreach { i =>
        val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(scenePayloads(i.toInt)))
        r.setInput(iis)
        r.getNumImages(true)
        r.dispose(); iis.close()
      }
    }

    // --- PNG image path (m02 etc.) ---
    time("png: synthPng (encode)") {
      ids.foreach(id => ImageCodec.synthPng(id))
    }
    val pngs = ids.map(id => ImageCodec.synthPng(id))
    time("png: decode") {
      ids.foreach(i => ImageCodec.decode(pngs(i.toInt)))
    }
    time("png: ImageIO.write via fresh writer") {
      ids.foreach { i =>
        val img = ImageCodec.decode(pngs(i.toInt))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
      }
    }
  }
}
