package graft.ops

/** Driver-side overlap of INDEPENDENT job chains (optimization guide
  * §2.6): Spark's scheduler happily runs several jobs at once inside
  * one application — actions are only sequential because the driver
  * calls them sequentially. Model-fit pairs (coarse quantizer vs PQ
  * codebooks), store-build pairs (coarse-assignment vs code store)
  * are independent collect/checkpoint chains whose wall time should
  * be max, not sum. Two lanes only — enough to fill the tail of a
  * small fit job, not so many they fight for executors. Exceptions
  * from either lane propagate (Await rethrows).
  */
object Par {

  def both[A, B](fa: => A, fb: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val f1 = Future(fa)
    val f2 = Future(fb)
    (Await.result(f1, Duration.Inf), Await.result(f2, Duration.Inf))
  }
}
