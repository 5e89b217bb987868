package graft

/** Throwaway timing harness (test scope, not committed). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    import graft.operators.MultiModal
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[phase] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val n = 20000
    def work(id: Long): Long = {
      val rate = 8000 + (id % 8).toInt * 1000
      val channels = 1 + (id % 2).toInt
      val frames = 200 + (id % 1000).toInt
      val bytes = MultiModal.encodeWavPcm16(rate, channels, frames)
      MultiModal.decodeAudio(bytes).map(_.nFrames).getOrElse(-1L)
    }
    val payloads = (0 until n).map { id =>
      val rate = 8000 + (id % 8) * 1000
      val channels = 1 + (id % 2)
      val frames = 200 + (id % 1000)
      MultiModal.encodeWavPcm16(rate, channels, frames)
    }.toArray
    def decodeOnly(id: Int): Long =
      MultiModal.decodeAudio(payloads(id)).map(_.nFrames).getOrElse(-1L)
    def threads32(f: Int => Long): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong()
      val ts = (0 until 32).map { t =>
        new Thread(() => {
          var s = 0L; var i = t
          while (i < n) { s += f(i); i += 32 }
          acc.addAndGet(s); ()
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      acc.get()
    }
    (0 until 2000).foreach(i => decodeOnly(i))
    System.err.println(s"[pid] ${ProcessHandle.current().pid()}")
    (1 to 2).foreach { rep =>
      timed(s"decode 1-thread #$rep") {
        var s = 0L; var i = 0; while (i < n) { s += decodeOnly(i); i += 1 }; s }
      timed(s"decode 32-thread #$rep") { threads32(decodeOnly) }
    }
    // warmup
    (0 until 2000).foreach(i => work(i.toLong))
    (1 to 2).foreach { rep =>
      timed(s"1-thread x$n #$rep") {
        var s = 0L; var i = 0
        while (i < n) { s += work(i.toLong); i += 1 }
        s
      }
      timed(s"32-thread x$n #$rep") {
        val acc = new java.util.concurrent.atomic.AtomicLong()
        val ts = (0 until 32).map { t =>
          new Thread(() => {
            var s = 0L
            var i = t
            while (i < n) { s += work(i.toLong); i += 32 }
            acc.addAndGet(s); ()
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
        acc.get()
      }
    }
  }
}
