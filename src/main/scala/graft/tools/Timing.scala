package graft.tools

/** Shared timing core for the scratch profilers (ProfileBm25,
  * ProfileFind, TimeQuery): one warm pass, three timed runs, min —
  * methodology changes happen here once.
  */
object Timing {
  /** Returns (min seconds, all run seconds, first run's row count). */
  def measure(f: => Long): (Double, Seq[Double], Long) = {
    f // warm: plan codegen + JIT
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (runs.map(_._1).min, runs.map(_._1), runs.head._2)
  }

  def time(label: String)(f: => Long): Unit = {
    val (min, _, rows) = measure(f)
    println(f"[profile] $label%-44s $min%6.3fs rows=$rows")
  }
}
