package graft.operators

import java.util.concurrent.ArrayBlockingQueue

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Dataset, Encoder}

/** Async enrichment — the reference's AsyncDataStream surface
  * (`/root/reference` flink-streaming-java AsyncDataStream.java:
  * orderedWait with a capacity of in-flight requests), for
  * per-record calls to an external service (feature store, vector
  * DB, inference endpoint) where latency, not CPU, bounds
  * throughput.
  *
  * Spark shape: mapPartitions with a bounded in-flight window —
  * results stay in INPUT ORDER (Flink's orderedWait semantics) by
  * completing from the head of a FIFO of Futures while at most
  * `capacity` calls run concurrently. Executor cores stay busy with
  * other partitions while a partition's calls wait, so total
  * concurrency ≈ partitions × capacity.
  */
object AsyncOps {

  /** One bounded daemon pool per partition-task. Tear-down rides the
    * task-completion listener, NOT iterator exhaustion — a
    * limit()/failure that abandons the iterator must not leak
    * `capacity` threads for the executor's lifetime. Shared by both
    * wait orders so the teardown contract can't silently diverge. */
  private def boundedPool(capacity: Int): ExecutionContext = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(capacity, r => {
      val t = new Thread(r); t.setDaemon(true); t
    })
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => pool.shutdownNow())
    ExecutionContext.fromExecutor(pool)
  }

  def asyncMapOrdered[I, O: Encoder](ds: Dataset[I], capacity: Int,
      timeout: Duration = Duration.Inf)(f: I => O): Dataset[O] = {
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = boundedPool(capacity)
      val inFlight = new ArrayBlockingQueue[Future[O]](capacity)
      new Iterator[O] {
        private def fill(): Unit =
          while (inFlight.remainingCapacity() > 0 && it.hasNext) {
            val rec = it.next()
            inFlight.put(Future(f(rec)))
          }
        override def hasNext: Boolean = {
          fill()
          !inFlight.isEmpty
        }
        override def next(): O = {
          fill()
          val fut = inFlight.poll() // single consumer: empty means exhausted
          if (fut == null) throw new NoSuchElementException("next() past end of async iterator")
          Await.result(fut, timeout)
        }
      }
    }
  }

  /** The reference's unorderedWait sibling: results are emitted in
    * COMPLETION order — a slow call never head-of-line-blocks the
    * fast ones behind it, so per-partition latency is bounded by the
    * slowest in-flight call, not the slowest prefix. Same bounded
    * in-flight window and task-completion teardown as
    * [[asyncMapOrdered]]. */
  def asyncMapUnordered[I, O: Encoder](ds: Dataset[I], capacity: Int,
      timeout: Duration = Duration.Inf)(f: I => O): Dataset[O] = {
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = boundedPool(capacity)
      // completion funnel: pool threads enqueue as they finish; the
      // (single-threaded) consuming iterator drains — in-flight count
      // is only touched by the consumer, so no lock is needed
      val done = new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, O]]()
      var inFlight = 0
      new Iterator[O] {
        private def fill(): Unit =
          while (inFlight < capacity && it.hasNext) {
            val rec = it.next()
            inFlight += 1
            Future(f(rec)).onComplete {
              case scala.util.Success(v) => done.put(Right(v))
              case scala.util.Failure(e) => done.put(Left(e))
            }
          }
        override def hasNext: Boolean = { fill(); inFlight > 0 }
        override def next(): O = {
          fill()
          if (inFlight == 0) throw new NoSuchElementException("next() past end of async iterator")
          val r =
            if (timeout.isFinite) {
              val v = done.poll(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
              if (v == null) throw new java.util.concurrent.TimeoutException(
                s"no async result within $timeout")
              v
            } else done.take()
          inFlight -= 1
          r match {
            case Right(v) => v
            case Left(e) => throw e
          }
        }
      }
    }
  }
}
