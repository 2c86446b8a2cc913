package graft

import java.nio.file.{Files, Paths}

/** Dev-only cross-PROCESS arbitration racer (r18): claims a range of
  * commit slots through `ObjectStoreArbiter(FileObjectStore(storeRoot))`
  * so a spec (CrossProcessArbiterSpec) can race two real JVMs on the
  * same durable store — the contention mode in-process thread races
  * structurally cannot exercise, and the deployment story the
  * file-backed store exists for (two writers on a shared filesystem).
  * No SparkSession: slot arbitration is pure NIO, so the child JVM
  * boots in well under a second.
  *
  * Args: storeRoot slotDir writerId slotCount goFile
  * Protocol: print "ready", busy-wait for goFile to exist (the parent
  * creates it once BOTH children are ready, so the two JVMs race
  * simultaneously rather than in startup order), claim every slot
  * 0..slotCount-1 with 8 threads, print one "won <slot>" line per win.
  */
object ArbiterRace {
  def main(args: Array[String]): Unit = {
    val Array(storeRoot, slotDir, writerId, slotCountS, goFile) = args
    val arb = new graft.io.ObjectStoreArbiter(
      new graft.io.FileObjectStore(Paths.get(storeRoot)))
    val dir = Paths.get(slotDir)
    Files.createDirectories(dir)
    val n = slotCountS.toInt
    println("ready")
    Console.flush()
    while (!Files.exists(Paths.get(goFile))) Thread.sleep(2)
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        var s = t
        while (s < n) {
          if (arb.tryClaim(dir, dir.resolve(s"$s.json"), s"$writerId:$s"))
            wins.add(s)
          s += 8
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    wins.forEach(s => println(s"won $s"))
  }
}
