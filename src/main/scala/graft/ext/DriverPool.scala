package graft.ext

import java.util.concurrent.Executors

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Small dedicated pool for OVERLAPPED driver-side Spark actions (guide
  * §2.6: independent jobs back-fill each other's stragglers). Not the
  * global ExecutionContext, for two reasons the export review called
  * out: global pool threads INHERIT whatever Spark local properties
  * (job group, description, scheduler pool) the thread that created
  * them happened to carry and then keep them across unrelated tasks —
  * so overlapped jobs could escape `cancelJobGroup` or wear stale
  * descriptions; and the global pool is shared with arbitrary library
  * code. Here every task runs with the SUBMITTER's local properties
  * captured at submit time and restored around the task, so an
  * overlapped job belongs to exactly the job group / description /
  * pool its caller had — cancellation and UI attribution behave as if
  * the action ran inline.
  */
object DriverPool {

  /** A handful of threads is plenty: overlap is for filling stragglers,
    * not for fanning out (the cluster parallelism lives in the tasks).
    */
  private val pool = Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-driver-pool")
    t.setDaemon(true)
    t
  })
  val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

  /** Run `body` on the pool with the CALLER's Spark local properties
    * (cloned at submit time) installed for the duration — and the
    * thread's previous properties restored after, so a reused pool
    * thread never leaks one submitter's job group into the next task.
    */
  def submit[T](spark: SparkSession)(body: => T): Future[T] = {
    val sc = spark.sparkContext
    // getLocalProperties clones (thread-inheritance uses the same copy
    // path), so mutations after submit don't race the task
    val props = org.apache.spark.sql.graft.GraftExec.cloneLocalProperties(sc)
    Future {
      val prev = org.apache.spark.sql.graft.GraftExec.cloneLocalProperties(sc)
      org.apache.spark.sql.graft.GraftExec.setLocalProperties(sc, props)
      try body
      finally org.apache.spark.sql.graft.GraftExec.setLocalProperties(sc, prev)
    }(ec)
  }
}
