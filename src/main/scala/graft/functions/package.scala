package graft

import org.apache.spark.sql.Column

/** Public entry points for graft's custom Catalyst expressions. */
package object functions {

  /** Exact int64 dot product of two `array<long>` columns (codegen'd;
    * see org.apache.spark.sql.graftexpr.LongArrayDotExpr).
    */
  object LongArrayDot {
    def apply(a: Column, b: Column): Column =
      org.apache.spark.sql.graftexpr.LongArrayDotExpr.column(a, b)
  }

  /** Milli-unit fixed-point quantization `round(x*1000) : array<long>`
    * of a float/double array (codegen'd; see
    * org.apache.spark.sql.graftexpr.QuantizeMilliExpr).
    */
  object QuantizeMilli {
    def apply(a: Column): Column =
      org.apache.spark.sql.graftexpr.QuantizeMilliExpr.column(a)
  }
}
