package graft.tools

/**
 * /proc/stat CPU accounting for the shared-tenant bench host.
 *
 * Hypervisor steal on this box is CONCURRENCY-DEPENDENT (measured in one
 * window: 2% of wanted CPU stolen with one busy thread, 82% with four, 55%
 * with thirty-two — an effective vCPU quota that only binds when several
 * threads go busy). Consequences baked into the protocol:
 *   - any window gate must probe AT the parallelism it is gating for — a
 *     single-thread probe sails through a window that will shred a local[4]
 *     measurement;
 *   - the 1-core level of the N-vs-4N pair is essentially steal-immune, so
 *     retries should re-roll only the multi-core side.
 * Gating chooses WHEN to measure; the measured sections separately report
 * the steal they actually experienced (see ScaleRunner), so the JSON shows
 * both the policy and the outcome.
 */
object HostStat {

  /** (busyCoreSec, stealCoreSec) across all cpus since boot; NaN off-Linux. */
  def procStat(): (Double, Double) = {
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toDouble)
        val hz = 100.0 // USER_HZ
        val busy = (f(0) + f(1) + f(2) + f(5) + f(6)) / hz
        (busy, if (f.length > 7) f(7) / hz else 0.0)
      } finally src.close()
    } catch { case _: Exception => (Double.NaN, Double.NaN) }
  }

  // 64 MB shared scratch (beyond LLC) so the probe threads touch memory the
  // way the pipeline does, not just ALU
  private lazy val scratch = new Array[Long](8 << 20)

  /** Steal fraction steal/(busy+steal) observed while `threads` threads run
    * a memory-touching busy loop for ~`millis` ms. */
  def stealUnderLoad(threads: Int, millis: Long): Double = {
    val arr = scratch
    val (b0, s0) = procStat()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ts = (1 to threads).map { _ =>
      val t = new Thread(() => {
        var acc = 0L
        while (!stop.get()) {
          var i = 0; val n = arr.length
          while (i < n) { acc += arr(i) + i; i += 8 } // 64 B stride
        }
        sink.addAndGet(acc) // defeat DCE
      })
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep(millis)
    stop.set(true); ts.foreach(_.join())
    val (b1, s1) = procStat()
    val (db, ds) = (b1 - b0, s1 - s0)
    if (db.isNaN || ds.isNaN || db + ds <= 0) 0.0 else ds / (db + ds)
  }

  /** Bounded wait for a window whose `threads`-wide steal is ≤ `okSteal`.
    * Returns the last observed steal fraction; `canWait` is the budget
    * check re-evaluated before each sleep. Opt out: SPARK_GRAFT_STEAL_GATE=0
    * (gates become no-ops, e.g. for a real cluster via spark-submit). */
  def awaitQuiet(threads: Int, maxTries: Int, okSteal: Double,
                 canWait: () => Boolean, log: String => Unit): Double = {
    if (sys.env.get("SPARK_GRAFT_STEAL_GATE").contains("0")) return 0.0
    // threads == 1 still gates: steal mostly binds under OUR concurrency
    // (the vCPU quota), but a sufficiently loaded neighbor steals from a
    // single busy thread too (measured: 58% at 1 thread in one window)
    var s = stealUnderLoad(math.max(1, threads), 800)
    var tries = 0
    while (s > okSteal && tries < maxTries && canWait()) {
      log(f"steal gate: ${s * 100}%.0f%% stolen at $threads threads — waiting 15s")
      Thread.sleep(15000)
      s = stealUnderLoad(threads, 800)
      tries += 1
    }
    s
  }
}
