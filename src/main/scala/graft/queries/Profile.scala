package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev tool: per-query cost breakdown for optimization work — wall time
  * split into plan-construction vs execution, plus executor-side totals
  * (jobs, stages, tasks, task time, shuffle bytes) from a listener.
  * Usage: runMain graft.queries.Profile <sfDir> <query1> [query2 ...]
  * (or `all` to profile the whole catalog). Each query runs once warm
  * (codegen, fixture memos) before the measured run. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names =
      if (args.drop(1).headOption.contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq

    object L extends SparkListener {
      @volatile var jobs = 0
      @volatile var stages = 0
      @volatile var tasks = 0L
      @volatile var taskTimeMs = 0L
      @volatile var shufReadB = 0L
      @volatile var shufWriteB = 0L
      @volatile var inputB = 0L
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0L; taskTimeMs = 0L
        shufReadB = 0L; shufWriteB = 0L; inputB = 0L }
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          shufReadB += m.shuffleReadMetrics.totalBytesRead
          shufWriteB += m.shuffleWriteMetrics.bytesWritten
          inputB += m.inputMetrics.bytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(L)

    println(f"${"query"}%-28s ${"build"}%7s ${"exec"}%7s ${"jobs"}%5s " +
      f"${"stages"}%6s ${"tasks"}%6s ${"taskT"}%7s ${"shufR"}%8s ${"shufW"}%8s ${"input"}%8s")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warm: fixtures, codegen, footer caches
        System.gc()
        L.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        Thread.sleep(120) // listener events are async; let the bus drain
        def mb(b: Long): String = f"${b / 1048576.0}%7.1fM"
        println(f"$name%-28s ${(t1 - t0) / 1e6}%6.0fms ${(t2 - t1) / 1e6}%6.0fms " +
          f"${L.jobs}%5d ${L.stages}%6d ${L.tasks}%6d ${L.taskTimeMs / 1000.0}%6.1fs " +
          f"${mb(L.shufReadB)} ${mb(L.shufWriteB)} ${mb(L.inputB)}")
      } catch {
        case e: Throwable =>
          println(f"$name%-28s FAILED: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
