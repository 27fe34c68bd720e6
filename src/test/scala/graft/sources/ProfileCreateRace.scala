package graft.sources

import org.apache.hadoop.fs.Path

/** Probe: is `FileSystem.create(path, overwrite = false)` on the LOCAL
  * filesystem a true arbitration point under real concurrency? Hadoop's
  * RawLocalFileSystem implements the no-overwrite case as an exists() check
  * followed by a plain FileOutputStream open (O_CREAT without O_EXCL), so
  * two racing writers can BOTH win. This probe measures how often. */
object ProfileCreateRace {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_create_race")
    val fs = new Path(dir.toString)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val threads = 8
    val rounds = if (args.nonEmpty) args(0).toInt else 2000
    def race(tag: String, attempt: Path => Unit): Unit = {
      var doubleWins = 0
      for (r <- 0 until rounds) {
        val p = new Path(dir.toString, s"probe_${tag}_$r")
        val wins = new java.util.concurrent.atomic.AtomicInteger(0)
        val gate = new java.util.concurrent.CountDownLatch(1)
        val done = new java.util.concurrent.CountDownLatch(threads)
        for (_ <- 0 until threads) {
          new Thread(() => {
            gate.await()
            try { attempt(p); wins.incrementAndGet() }
            catch { case _: java.io.IOException => () }
            finally done.countDown()
          }).start()
        }
        gate.countDown(); done.await()
        if (wins.get > 1) doubleWins += 1
      }
      println(s"$tag: rounds=$rounds threads=$threads double_wins=$doubleWins")
    }
    // measured 2026-08-16: hadoop_create double_wins ≈ 47% of rounds;
    // create_exclusive must read 0 (kernel O_EXCL)
    race("hadoop_create", p => fs.create(p, false).close())
    race("create_exclusive", p => StoreManifest.createExclusive(fs, p).close())
  }
}
