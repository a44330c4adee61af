package graft.scd

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, concat_ws, sha2}

/** Change-detection hash keys.
  *
  * Hash-compatible with the reference (scd_handler.py:102-103):
  * `sha2(concat_ws("", cols...), 256)` with an EMPTY separator, which means
  * `concat_ws` silently skips NULLs — `("a", NULL)` and `(NULL, "a")`
  * collide. That quirk is part of the on-disk contract (stored `scd_key` /
  * `upd_key` values must stay stable across engine versions), so we keep it.
  */
object Hashing {
  /** sha2-256 over the empty-separator concatenation of `cols`, in order. */
  def key(cols: Seq[String]): Column =
    sha2(concat_ws("", cols.map(col): _*), 256)

  def key(first: Column, rest: Column*): Column =
    sha2(concat_ws("", (first +: rest): _*), 256)
}
