package graft.index

/** Driver-thread overlap for independent Spark actions (optimization
  * guide §2.6): actions are only sequential because driver code calls
  * them sequentially, and the index lifecycle verbs are full of short
  * independent ones — a tier save writes its big frame plus 1-2
  * driver-local sidecar frames, a load collects 1-2 tiny parquet
  * sidecars — each costing more in driver planning/commit latency than
  * in cluster work. Submitting them concurrently lets one action's jobs
  * back-fill the idle slots another's driver step leaves.
  *
  * Bodies hold blocking Spark actions, so each runs under
  * `scala.concurrent.blocking`: the shared fork-join pool spawns
  * replacement workers instead of starving when overlapped blocks nest
  * or outnumber pool threads. Callers may only overlap blocks with
  * disjoint outputs (different files/collections) — then results are
  * identical to sequential execution by construction. */
object Overlap {
  import scala.concurrent.{Await, Future, blocking}
  import scala.concurrent.ExecutionContext.Implicits.global
  import scala.concurrent.duration.Duration

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val fa = Future(blocking(a))
    val fb = Future(blocking(b))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = Future(blocking(a))
    val fb = Future(blocking(b))
    val fc = Future(blocking(c))
    (Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf),
      Await.result(fc, Duration.Inf))
  }
}
