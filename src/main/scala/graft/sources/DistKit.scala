package graft.sources

import org.apache.hadoop.conf.Configuration

/** Shared kit for the distributed-maintenance paths — ONE home for the
  * ship-the-Hadoop-conf pattern and the bounded-concurrency window that
  * [[ColumnIndex]], [[DeltaWriter]] and [[IcebergWriter]] each carried a
  * private copy of (review finding: a fix to one copy silently missed the
  * others). */
private[graft] object DistKit {

  /** Hadoop Configuration is not serializable: ship its entries and
    * rebuild per task (object-store creds/endpoints must reach tasks). */
  def confEntries(conf: Configuration): Array[(String, String)] = {
    val it = conf.iterator(); val b = Array.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  def rebuildConf(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Run `f` over `items` through a bounded thread pool — independent
    * Spark jobs overlap instead of serializing. The first failure stops
    * the QUEUED items (no point paying for work whose commit will never
    * happen) and rethrows. */
  def runBounded[A, B](items: Seq[A], width: Int = 4)(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    if (items.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(width, math.max(1, items.size)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(items.map(a => Future(f(a)))), Duration.Inf)
    catch {
      case e: Throwable =>
        pool.shutdownNow()
        throw e
    } finally pool.shutdown()
  }
}
