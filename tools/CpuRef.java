/** Standalone machine-speed probe: the SAME fixed FNV-1a spins Bench.scala
 * times as cpu_ref_sec (single-thread, 400M steps) and cpu_ref_mt_sec
 * (one thread per core x 100M steps), min of 3 each, runnable without an
 * sbt/Spark startup. Keep constants in lockstep with graft.Bench's cpuRef
 * blocks. Prints "st mt". Usage: see tools/quietbench.sh. */
public class CpuRef {
  static long fnv(long steps) {
    long h = 1469598103934665603L;
    for (long i = 0; i < steps; i++) h = (h ^ i) * 1099511628211L;
    return h;
  }

  public static void main(String[] a) throws Exception {
    double st = 1e9;
    for (int r = 0; r < 3; r++) {
      long t0 = System.nanoTime();
      if (fnv(400000000L) == 42L) System.out.print("");
      st = Math.min(st, (System.nanoTime() - t0) / 1e9);
    }
    int cores = Runtime.getRuntime().availableProcessors();
    double mt = 1e9;
    for (int r = 0; r < 3; r++) {
      Thread[] ts = new Thread[cores];
      long t0 = System.nanoTime();
      for (int i = 0; i < cores; i++) {
        ts[i] = new Thread(() -> { if (fnv(100000000L) == 42L) System.out.print(""); });
        ts[i].start();
      }
      for (Thread t : ts) t.join();
      mt = Math.min(mt, (System.nanoTime() - t0) / 1e9);
    }
    System.out.printf(java.util.Locale.ROOT, "%.3f %.3f%n", st, mt);
  }
}
