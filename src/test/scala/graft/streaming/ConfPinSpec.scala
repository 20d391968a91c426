package graft.streaming

import graft.SparkSpec

/** The refcounted session-conf pin: concurrent holders of the same pin
  * never see it stripped mid-body (the Verify-thread-pool hazard the
  * naive save/restore had), the LAST release restores the prior value,
  * and a conflicting value refuses loudly.
  */
class ConfPinSpec extends SparkSpec {

  test("nested/concurrent holders keep the pin; last release restores; " +
      "conflicting value refuses") {
    val key = "spark.graft.test.confpin"
    spark.conf.set(key, "orig")
    ConfPin.withValue(spark, key, "pinned") {
      assert(spark.conf.get(key) == "pinned")
      // a second (re-entrant) holder of the SAME value releases without
      // stripping the outer holder's pin
      ConfPin.withValue(spark, key, "pinned") {
        assert(spark.conf.get(key) == "pinned")
      }
      assert(spark.conf.get(key) == "pinned",
        "inner release must not strip the outer pin")
      // a conflicting pin refuses instead of clobbering
      val e = intercept[IllegalArgumentException] {
        ConfPin.withValue(spark, key, "other") {}
      }
      assert(e.getMessage.contains("pinned"))
    }
    assert(spark.conf.get(key) == "orig",
      "last release must restore the prior value")

    // unset-prior keys restore to unset
    val key2 = "spark.graft.test.confpin2"
    ConfPin.withValue(spark, key2, "v") {
      assert(spark.conf.get(key2) == "v")
    }
    assert(spark.conf.getOption(key2).isEmpty)

    // truly CONCURRENT holders: 8 threads pin the same value; the conf
    // must read pinned for every body, and restore exactly once at the
    // end — the interleaved save/restore bug this guard exists for
    spark.conf.set(key2, "before")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val ok = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val tasks = (1 to 32).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = ConfPin.withValue(spark, key2, "pinned") {
            Thread.sleep(2)
            if (spark.conf.get(key2) == "pinned") ok.incrementAndGet()
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(ok.get() == 32, s"only ${ok.get()}/32 bodies saw the pin")
    assert(spark.conf.get(key2) == "before")
  }
}
