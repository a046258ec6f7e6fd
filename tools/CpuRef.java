/** Standalone machine-speed probe: the SAME fixed single-thread FNV-1a
 * spin Bench.scala times as cpu_ref_sec (400M steps, min of 3), runnable
 * without an sbt/Spark startup. Keep the constants in lockstep with
 * graft.Bench's cpuRef block. Usage: see tools/quietbench.sh. */
public class CpuRef {
  public static void main(String[] a) {
    double best = 1e9;
    for (int r = 0; r < 3; r++) {
      long t0 = System.nanoTime();
      long h = 1469598103934665603L;
      for (long i = 0; i < 400000000L; i++) h = (h ^ i) * 1099511628211L;
      if (h == 42L) System.out.print("");
      best = Math.min(best, (System.nanoTime() - t0) / 1e9);
    }
    System.out.printf(java.util.Locale.ROOT, "%.3f%n", best);
  }
}
