package graft.streaming

import org.apache.spark.sql.SparkSession

/** Process-wide guard for SESSION-CONF pins that concurrent writers may
  * overlap. `graft.Verify` runs gates on a thread pool over ONE
  * SparkSession: with a naive save/restore, gate A's restore-to-unset
  * can strip a pin while gate B's export is mid-write (benign today
  * only while Spark's default happens to equal the pinned value).
  * Refcounted per (session, key): the FIRST acquirer records the prior
  * value and sets the pin, only the LAST release restores it, and
  * pinning the same key to a DIFFERENT value while held refuses loudly
  * rather than silently clobbering a concurrent writer.
  */
object ConfPin {

  private final class Slot(val value: String, val prior: Option[String],
      var refs: Int)

  private val slots =
    scala.collection.mutable.Map.empty[(Int, String), Slot]

  def withValue[T](spark: SparkSession, key: String, value: String)(
      body: => T): T = {
    val k = (System.identityHashCode(spark), key)
    slots.synchronized {
      slots.get(k) match {
        case Some(s) =>
          require(s.value == value,
            s"session conf '$key' is pinned to '${s.value}' by a " +
              s"concurrent writer — cannot pin to '$value'")
          s.refs += 1
        case None =>
          val slot = new Slot(value, spark.conf.getOption(key), 1)
          spark.conf.set(key, value)
          slots(k) = slot
      }
    }
    try body finally slots.synchronized {
      val s = slots(k)
      s.refs -= 1
      if (s.refs == 0) {
        slots.remove(k)
        s.prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    }
  }
}
