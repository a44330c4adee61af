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

  /** Int8 scalar quantization of milli-quantized vectors — codes as
    * BINARY (1 byte/dim), per-vector `maxabs` scale, and the
    * query×codes dot kernel (codegen'd; see
    * org.apache.spark.sql.graftexpr.Int8EncodeExpr).
    */
  object Int8 {
    def encode(a: Column): Column =
      org.apache.spark.sql.graftexpr.Int8EncodeExpr.column(a)
    def maxAbs(a: Column): Column =
      org.apache.spark.sql.graftexpr.Int8EncodeExpr.maxAbs(a)
    def byteDot(q: Column, code: Column): Column =
      org.apache.spark.sql.graftexpr.Int8EncodeExpr.byteDot(q, code)
  }

  /** KMV bottom-k distinct sketch over 60-bit hashes: bounded-memory
    * mergeable aggregate with union AND intersection estimators (see
    * org.apache.spark.sql.graftexpr.KmvSketch).
    */
  object Kmv {
    def sketchAgg(hash60: Column, k: Int): Column =
      org.apache.spark.sql.graftexpr.KmvSketchAgg.column(hash60, k)
    def estimate(sketch: Column): Column =
      org.apache.spark.sql.graftexpr.KmvSketchAgg.estimate(sketch)
    def intersect(a: Column, b: Column): Column =
      org.apache.spark.sql.graftexpr.KmvSketchAgg.intersect(a, b)
    def union(a: Column, b: Column): Column =
      org.apache.spark.sql.graftexpr.KmvSketchAgg.union(a, b)
  }

  /** All `tables` sign-LSH bucket ids of a milli-quantized vector as
    * one `array<long>` (codegen'd; the shared deterministic hyperplane
    * family — see org.apache.spark.sql.graftexpr.SignBucketsExpr and
    * graft.sim.CosineSim.planeVector).
    */
  object SignBuckets {
    def apply(qvec: Column, planes: Int, tables: Int): Column =
      org.apache.spark.sql.graftexpr.SignBucketsExpr.column(qvec, planes, tables)
  }
}
