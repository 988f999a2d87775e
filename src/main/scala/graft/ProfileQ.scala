package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler._

/** Dev tool: per-job wall-time breakdown of a registered query (guide §1.1:
  * decide whether time goes to jobs — and which — or to driver-side work).
  *
  * `runMain graft.ProfileQ <sfDir> <name>[,<name>…]` — each query runs once
  * to warm (JIT/codegen/page cache), then once profiled: every Spark job's
  * duration, task count and description is printed, plus the gap between
  * the query wall time and the sum of job times (= driver-side planning,
  * filesystem metadata work, AQE re-optimization, lock waits).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val spark = GraftSession.getOrCreate()

    final case class Job(id: Int, desc: String, ms: Long, tasks: Int, stages: Int)
    val jobStart = new ConcurrentHashMap[Int, (Long, String)]()
    val stageTasks = new ConcurrentHashMap[Int, Int]()   // stageId -> numTasks
    val jobStages = new ConcurrentHashMap[Int, Seq[Int]]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties.getProperty("spark.job.description"))
          .orElse(Option(j.properties.getProperty("callSite.short"))).getOrElse("")
        jobStart.put(j.jobId, (j.time, d))
        jobStages.put(j.jobId, j.stageIds)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageTasks.put(s.stageInfo.stageId, s.stageInfo.numTasks)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (t0, d) =>
          val sids = Option(jobStages.get(j.jobId)).getOrElse(Nil)
          val nt = sids.map(sid => Option(stageTasks.get(sid)).map(_.toInt).getOrElse(0)).sum
          done.add(Job(j.jobId, d, j.time - t0, nt, sids.size))
        }
      }
    })

    spark.range(100000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      try { SparkEntry.queries(n)(spark, sfDir).count(): Unit } // warm run
      finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      done.clear()
      val t0 = System.nanoTime()
      val fn = SparkEntry.queries(n)
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      Thread.sleep(200) // let job-end events drain
      val jobs = done.toArray(Array.empty[Job]).sortBy(_.id)
      val jobSum = jobs.map(_.ms).sum / 1e3
      println(f"[profileq] $n fixture=${(t1 - t0) / 1e9}%.2f s graded=${(t2 - t1) / 1e9}%.2f s " +
        f"jobs=${jobs.length} jobSum=$jobSum%.2f s driverGap=${(t2 - t0) / 1e9 - jobSum}%.2f s")
      jobs.foreach { j =>
        println(f"[profileq]   job ${j.id}%4d ${j.ms}%6d ms stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
