/** Standalone machine-speed probe: the SAME fixed witnesses Bench.scala
 * emits - cpu_ref_sec (single-thread 400M-step FNV spin), cpu_ref_mt_sec
 * (one thread per core x 100M steps), mem_ref_sec (8 sequential sum passes
 * over a 256 MB long array = 2 GB of traffic), mem_ref_mt_sec (every core
 * streaming the same array at once) - min of 3 each, runnable without an
 * sbt/Spark startup. Keep constants in lockstep with graft.ops.CpuWitness.
 * Prints "st mt mem memMt". Usage: see tools/quietbench.sh. */
public class CpuRef {
  static long fnv(long steps) {
    long h = 1469598103934665603L;
    for (long i = 0; i < steps; i++) h = (h ^ i) * 1099511628211L;
    return h;
  }

  static final int MEM_WORDS = 1 << 25;
  static final int MEM_PASSES = 8;

  // Staggered start offsets keep the MT streams as distinct memory
  // traffic (same-offset threads ride one another's cache lines and the
  // probe measures LLC, not the bus).
  static long memSum(long[] a, int start) {
    long s = 0;
    int j = start;
    for (int pass = 0; pass < MEM_PASSES; pass++)
      for (int c = 0; c < MEM_WORDS; c++) {
        s += a[j];
        j++; if (j == MEM_WORDS) j = 0;
      }
    return s;
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
    long[] arr = new long[MEM_WORDS];
    for (int i = 0; i < MEM_WORDS; i++) arr[i] = i * 0x9E3779B97F4A7C15L;
    double mem = 1e9;
    for (int r = 0; r < 3; r++) {
      long t0 = System.nanoTime();
      if (memSum(arr, 0) == 42L) System.out.print("");
      mem = Math.min(mem, (System.nanoTime() - t0) / 1e9);
    }
    double memMt = 1e9;
    for (int r = 0; r < 3; r++) {
      Thread[] ts = new Thread[cores];
      long t0 = System.nanoTime();
      for (int i = 0; i < cores; i++) {
        final int start = (int) ((i * (long) MEM_WORDS) / cores);
        ts[i] = new Thread(() -> { if (memSum(arr, start) == 42L) System.out.print(""); });
        ts[i].start();
      }
      for (Thread t : ts) t.join();
      memMt = Math.min(memMt, (System.nanoTime() - t0) / 1e9);
    }
    System.out.printf(java.util.Locale.ROOT, "%.3f %.3f %.3f %.3f%n", st, mt, mem, memMt);
  }
}
