package graft.util

/** Epoch-microsecond ↔ `java.sql.Timestamp` conversion, full precision.
  * One definition: the formula (and its floor-div inverse, which must not
  * truncate sub-millisecond digits through the millis-only constructor)
  * was previously duplicated across the stateful streaming operators.
  */
object Micros {

  def fromTimestamp(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  def toTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
