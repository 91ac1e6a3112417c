package graft

/** Ad-hoc stage-timing probe for local perf iteration (test scope only —
  * never shipped). Edit the body to time the plan under investigation;
  * `sbt "Test/runMain graft.PerfProbe"`. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val payloads = (0L until 5000L).map(
      graft.multimodal.Multimodal.SyntheticWav.render).toArray
    import scala.jdk.CollectionConverters._
    val readers = java.util.ServiceLoader.load(
      classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toVector
    println("readers: " + readers.map(_.getClass.getName))
    def openOnly(p: Array[Byte]): Unit = {
      val in = readers.iterator.map { r =>
        try r.getAudioInputStream(new java.io.ByteArrayInputStream(p))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => null }
      }.find(_ != null).get
      in.close()
    }
    def sumOnly(p: Array[Byte]): Long = {
      val bb = java.nio.ByteBuffer.wrap(p, 44, p.length - 44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var s = 0L
      while (bb.remaining() >= 2) s += bb.getShort.toLong
      s
    }
    def readAll(p: Array[Byte]): Long = {
      val in = readers.iterator.map { r =>
        try r.getAudioInputStream(new java.io.ByteArrayInputStream(p))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => null }
      }.find(_ != null).get
      val b = in.readAllBytes(); in.close(); b.length.toLong
    }
    payloads.take(200).foreach(openOnly)
    val decF = () => new graft.multimodal.Multimodal.AudioDecoder
    def par(n: Int)(f: Array[Byte] => Unit): Unit = {
      val groups = payloads.grouped(payloads.length / n + 1).toSeq
      val ts = groups.map { g => val t = new Thread(() => g.foreach(f)); t.start(); t }
      ts.foreach(_.join())
    }
    for (r <- 1 to 2) {
      time(s"r$r open_1t")(payloads.foreach(openOnly))
      time(s"r$r open_16t")(par(16)(openOnly))
      time(s"r$r readall_1t")(payloads.foreach(p => readAll(p)))
      time(s"r$r readall_16t")(par(16)(p => readAll(p)))
      time(s"r$r sum_1t")(payloads.foreach(p => sumOnly(p)))
      time(s"r$r sum_16t")(par(16)(p => sumOnly(p)))
      time(s"r$r decoder_1t"){ val d = decF(); payloads.foreach(d.features) }
      time(s"r$r decoder_16t"){
        val groups = payloads.grouped(payloads.length / 16 + 1).toSeq
        val ts = groups.map { g => val t = new Thread(() => { val d = decF(); g.foreach(d.features) }); t.start(); t }
        ts.foreach(_.join())
      }
    }
  }
}
