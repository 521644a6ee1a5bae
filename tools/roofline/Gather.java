import java.util.concurrent.*;
import java.util.concurrent.atomic.*;

/** Random-gather throughput (hash-probe model) at N threads over an array
 *  of given MB (shared, read-only, like a broadcast model table).
 *  Usage: java Gather <mb> <nThreads> */
public class Gather {
  public static void main(String[] args) throws Exception {
    int mb = Integer.parseInt(args[0]);
    int n = Integer.parseInt(args[1]);
    int len = mb * 1024 * 1024 / 8;
    long[] table = new long[len];
    for (int i = 0; i < len; i++) table[i] = 0x9E3779B97F4A7C15L * i;
    final long PROBES = 200_000_000L;
    ExecutorService pool = Executors.newFixedThreadPool(n);
    CountDownLatch ready = new CountDownLatch(n), go = new CountDownLatch(1);
    AtomicLong sink = new AtomicLong();
    Callable<Double> task = () -> {
      long x = Thread.currentThread().getId() * 0x5851F42D4C957F2DL + 1;
      ready.countDown(); go.await();
      long acc = 0; long t0 = System.nanoTime();
      for (long i = 0; i < PROBES; i++) {
        x = x * 6364136223846793005L + 1442695040888963407L;
        int idx = (int) ((x >>> 33) % len);
        acc += table[idx];
      }
      double s = (System.nanoTime() - t0) / 1e9;
      sink.addAndGet(acc);
      return PROBES / s / 1e6;   // M-probes/s per thread
    };
    java.util.List<Future<Double>> fs = new java.util.ArrayList<>();
    for (int i = 0; i < n; i++) fs.add(pool.submit(task));
    ready.await(); go.countDown();
    double per = 0; for (Future<Double> f : fs) per += f.get();
    System.out.printf("gather mb=%d threads=%d perThread=%.1f Mp/s aggregate=%.1f Mp/s sink=%d%n",
        mb, n, per / n, per, sink.get() & 1);
    pool.shutdown();
  }
}
