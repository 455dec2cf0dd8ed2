// Standalone JVM host-state probe (r17b): byte-for-byte the same two
// signals graft.Bench.hostProbe() embeds in its artifacts — the 2^28
// rotate-multiply CPU spin and the 50-call 4 KB fsync loop on /tmp —
// runnable via `java tools/HostProbeJvm.java [reps]` without sbt or a
// SparkSession. The r17 gate polled a PYTHON probe whose spin is not
// comparable to the JVM spin the artifact's "drifted" stamp checks
// (different codegen; no recorded python-spin quiet baseline exists),
// so it could only gate on fsync and still produced drift-stamped
// captures when CPU steal was the active signal. This probe makes the
// gate's quiet test THE SAME predicate as the artifact's stamp:
// fsync < 0.15 ms AND spin < 0.65 s (the Bench defaults).
//
// The spin loop JIT-compiles via OSR within the first few ms of its
// ~0.5 s quiet runtime, same as inside the Bench JVM, so readings are
// comparable despite the cold java(1) launch; rep 0 can read a few
// percent high — gate decisions should use the later reps.
public final class HostProbeJvm {
  public static void main(String[] args) throws Exception {
    int reps = args.length > 0 ? Integer.parseInt(args[0]) : 3;
    for (int r = 0; r < reps; r++) {
      double spin;
      {
        long x = 0x9E3779B97F4A7C15L;
        long i = 0L;
        long t0 = System.nanoTime();
        while (i < (1L << 28)) {
          x = Long.rotateLeft(x * 0xBF58476D1CE4E5B9L, 31) ^ i;
          i += 1;
        }
        spin = (System.nanoTime() - t0) / 1e9;
        if (x == 42L) System.err.println(); // keep the loop live
      }
      double fsyncMs;
      java.io.File f = java.io.File.createTempFile("graft_probe", ".bin",
          new java.io.File("/tmp"));
      try (java.nio.channels.FileChannel ch = java.nio.channels.FileChannel
          .open(f.toPath(), java.nio.file.StandardOpenOption.WRITE)) {
        java.nio.ByteBuffer buf = java.nio.ByteBuffer.allocate(4096);
        int n = 50;
        long t1 = System.nanoTime();
        for (int j = 0; j < n; j++) {
          buf.rewind();
          ch.write(buf, 0);
          ch.force(true);
        }
        fsyncMs = (System.nanoTime() - t1) / 1e6 / n;
      } finally {
        f.delete();
      }
      System.out.printf("probe[%d] spin_s=%.3f fsync_ms=%.4f%n", r, spin, fsyncMs);
      System.out.flush();
      if (r + 1 < reps) Thread.sleep(2000);
    }
  }
}
