package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one (or more) registered queries with the bench's exact
  * methodology — noop sink, persistent-RDD/cache hygiene between runs —
  * repeated N times, printing each rep and the min. The optimization
  * round's inner loop: fast feedback on a single query without paying
  * for the full 235-query bench pass.
  *
  * Usage: runMain graft.tools.TimeOne <reps> <query...>
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS   (default 32)
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: TimeOne <reps> <query...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // shipped engine config (see Bench.scala for the rationale)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // A/B experiment seam: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as Bench: parquet reader, codegen, shuffle, noop sink
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      li.groupBy("l_returnflag").count()
        .join(broadcast(li.select("l_returnflag").distinct()), "l_returnflag")
        .orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
    }
    // optional per-job breakdown: SPARK_GRAFT_JOBLOG=1 prints each
    // job's wall time + task-time sum, separating driver/scheduling
    // overhead (wall >> task time) from real compute
    if (sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val taskNs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
          private val jobOfStage = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            t0.put(j.jobId, System.nanoTime())
            taskNs.put(j.jobId, new java.util.concurrent.atomic.AtomicLong())
            j.stageIds.foreach(s => jobOfStage.put(s, j.jobId))
          }
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val jid = jobOfStage.getOrDefault(t.stageId, -1)
            if (jid >= 0 && t.taskMetrics != null)
              taskNs.get(jid).addAndGet(t.taskMetrics.executorRunTime * 1000000L)
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val wall = (System.nanoTime() - t0.getOrDefault(j.jobId, 0L)) / 1e9
            val task = taskNs.getOrDefault(j.jobId,
              new java.util.concurrent.atomic.AtomicLong()).get() / 1e9
            println(f"[joblog] job ${j.jobId}%3d wall $wall%7.3f s  taskSum $task%7.3f s")
          }
          override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val ms = si.taskMetrics
            if (ms != null && ms.executorRunTime > 500)
              println(f"[stagelog] stage ${si.stageId}%3d tasks ${si.numTasks}%3d " +
                f"taskSum ${ms.executorRunTime / 1e3}%7.3f s  " +
                s"${si.name.take(90)}")
          }
        })
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep $i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        println(f"[timeone] $name rep$i: $t%.3f s")
        t
      }
      println(f"[timeone] $name min: ${times.min}%.3f s  med: ${times.sorted.apply(reps / 2)}%.3f s")
    }
    spark.stop()
  }
}
