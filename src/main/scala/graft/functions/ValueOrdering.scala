package graft.functions

import org.apache.spark.sql.types._

/** Driver-side total orders that MATCH Spark SQL's ordering for the
  * corresponding column type — for operators that pull a bounded,
  * model-sized set of rows to the driver (a union-find over a tiny
  * edge list, a k-means init sample) and must pick the same minimum /
  * sort order the distributed aggregate would. Strings compare as
  * unsigned UTF-8 bytes (`UTF8String.binaryCompare`), NOT as UTF-16
  * `String.compareTo`, which diverges beyond the BMP.
  */
object ValueOrdering {

  val utf8: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = {
      val x = a.asInstanceOf[String].getBytes("UTF-8")
      val y = b.asInstanceOf[String].getBytes("UTF-8")
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** The Spark-equivalent ordering for `dt`, when this utility knows
    * one. None for types the caller should keep distributed.
    */
  def forType(dt: DataType): Option[Ordering[Any]] = dt match {
    case LongType => Some(Ordering.by((v: Any) => v.asInstanceOf[Long]))
    case IntegerType => Some(Ordering.by((v: Any) => v.asInstanceOf[Int]))
    case ShortType => Some(Ordering.by((v: Any) => v.asInstanceOf[Short]))
    case ByteType => Some(Ordering.by((v: Any) => v.asInstanceOf[Byte]))
    case StringType => Some(utf8)
    case _ => None
  }
}
