import java.util.concurrent.*;
import java.util.concurrent.atomic.*;

/** Per-thread ALU throughput and aggregate memory bandwidth at N threads.
 *  Usage: java CoreScale [alu|mem] nThreads [perThreadMB]
 *  perThreadMB (default 256 = always beyond L3) sizes each thread's private
 *  streaming working set: at sizes under the shared L3 (260 MB on this host)
 *  a 1-thread run is cache-resident while a 4-thread run of the same kernel
 *  spills — the L3-capacity scaling term that fixed-footprint kernels miss. */
public class CoreScale {
  static final long ALU_ITERS = 2_000_000_000L;

  public static void main(String[] args) throws Exception {
    String mode = args[0];
    int n = Integer.parseInt(args[1]);
    final int memMb = args.length > 2 ? Integer.parseInt(args[2]) : 256;
    ExecutorService pool = Executors.newFixedThreadPool(n);
    CountDownLatch ready = new CountDownLatch(n), go = new CountDownLatch(1);
    AtomicLong sink = new AtomicLong();
    Callable<Double> task = () -> {
      if (mode.equals("alu")) {
        long x = 12345, y = 6789;
        ready.countDown(); go.await();
        long t0 = System.nanoTime();
        for (long i = 0; i < ALU_ITERS; i++) { x = x * 6364136223846793005L + y; y ^= x >>> 17; }
        double s = (System.nanoTime() - t0) / 1e9;
        sink.addAndGet(x + y);
        return ALU_ITERS / s / 1e9;     // G-iters/s per thread
      } else {
        int len = memMb * 1024 * 1024 / 8;
        long[] a = new long[len], b = new long[len];
        for (int i = 0; i < len; i++) { a[i] = i; }
        ready.countDown(); go.await();
        long t0 = System.nanoTime(); long acc = 0;
        // ~constant bytes/thread; clamped so memMb > 12288 still does work
        // (an unclamped truncation to 0 passes reports garbage bandwidth)
        int passes = Math.max(1, (int) (48L * 256 / memMb));
        for (int p = 0; p < passes; p++)
          for (int i = 0; i < len; i++) { b[i] = a[i] + p; acc += b[i]; }
        double s = (System.nanoTime() - t0) / 1e9;
        sink.addAndGet(acc);
        // bytes touched: read a + write b (+RFO read of b) per pass
        return passes * (double) len * 8 * 3 / s / 1e9;  // GB/s per thread
      }
    };
    java.util.List<Future<Double>> fs = new java.util.ArrayList<>();
    for (int i = 0; i < n; i++) fs.add(pool.submit(task));
    ready.await(); long w0 = System.nanoTime(); go.countDown();
    double per = 0; for (Future<Double> f : fs) per += f.get();
    double wall = (System.nanoTime() - w0) / 1e9;
    System.out.printf("mode=%s threads=%d mb=%d perThreadMean=%.3f aggregate=%.3f wall=%.1fs sink=%d%n",
        mode, n, memMb, per / n, per, wall, sink.get() & 1);
    pool.shutdown();
  }
}
