package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — b24's range join on unbounded inputs:
  * each right-side event joins left-side events of the same key whose
  * event time falls in the preceding `window`. Both sides carry
  * watermarks, and the time-bound join condition is what lets Spark
  * evict buffered state: a left row older than the right watermark minus
  * `window` can never match again and is dropped, so state stays
  * proportional to the window, not the stream. Inner joins emit in
  * append mode as soon as a match lands.
  */
object StreamJoin {

  /** Join two streaming frames on `key`, matching left rows whose
    * `leftTs` lies in `[rightTs - window, rightTs)`. `leftTs`/`rightTs`
    * must be distinct event-time column names (stream-stream joins need
    * unambiguous time attributes), and apart from `key` the two frames'
    * columns must not collide — the right key is deduplicated internally.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   window: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    require(leftTs != rightTs, "leftTs and rightTs must be distinct column names")
    val rKey = s"__${key}_r"
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(key, rKey).withWatermark(rightTs, watermark)
    l.join(r,
        col(key) === col(rKey) &&
          col(leftTs) >= col(rightTs) - expr(s"INTERVAL $window") &&
          col(leftTs) < col(rightTs))
      .drop(rKey)
  }
}
