package graft.ops

/** Machine-speed witness shared by every wall-clock-bearing harness
  * (Bench, GeoScaleEvidence, StreamScaleEvidence).
  *
  * VM-host noise windows cut effective CPU speed ~1.5x for hours at a
  * time (BASELINE.md "Machine-speed witness": 21 unrelated queries flagged
  * together at uniform 1.5-1.9x, reproduced on an idle machine, window
  * held 90+ min), so recorded seconds are only comparable across runs
  * whose witness values match. Two spins:
  *
  *  - `singleThread`: 400M FNV-1a steps, min of 3 — the dependent-chain
  *    ALU rate one core sustains (slow window ~0.57, quiet projected
  *    ~0.35-0.40);
  *  - `multiThread(n)`: the same spin on n cores at once (100M steps
  *    each), min of 3 — separates frequency cuts (both values inflate
  *    together; slow window read 0.155 at 32 threads, ~92% per-core
  *    efficiency) from CPU-steal (mt inflates disproportionately).
  *
  * tools/CpuRef.java is the standalone twin (same constants) for probing
  * without a JVM+Spark startup; tools/quietbench.sh gates the canonical
  * bench on it.
  */
object CpuWitness {

  private def fnvSpin(steps: Long): Long = {
    var h = 1469598103934665603L
    var i = 0L
    while (i < steps) { h = (h ^ i) * 1099511628211L; i += 1 }
    h
  }

  def singleThread(): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      require(fnvSpin(400000000L) != 42L) // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }.min

  def multiThread(threads: Int): Double =
    (1 to 3).map { _ =>
      val n = math.max(1, threads)
      val t0 = System.nanoTime()
      val ts = (1 to n).map { _ =>
        new Thread(() => { require(fnvSpin(100000000L) != 42L); () })
      }
      ts.foreach(_.start())
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }.min
}
