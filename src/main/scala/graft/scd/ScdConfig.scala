package graft.scd

import java.time.Instant

/** Configuration for a hybrid SCD1+SCD2 apply.
  *
  * Mirrors the parameter surface of the reference `apply_scd`
  * (`/root/reference/delta_hybrid_scd/scd_handler.py:58`) but immutable:
  * the reference mutates the caller's `scd_key_col` list in place
  * (scd_handler.py:83); we never do.
  *
  * @param pkCols            business-key columns (scd_handler.py:63)
  * @param scdKeyCols        columns whose change opens a new version row
  *                          (scd_handler.py:62)
  * @param selectCols        columns to keep from the source; None = all
  *                          (scd_handler.py:65)
  * @param effectiveFromCol  source column giving the time a record became
  *                          effective, e.g. last_modify_ts (scd_handler.py:66)
  * @param initialEffDateCol source column giving the FIRST-ever effective
  *                          date, e.g. registration date (scd_handler.py:67)
  * @param clock             injectable wall clock. The reference captures
  *                          `datetime.now()` once per run (scd_handler.py:85)
  *                          and reuses the single value everywhere; tests and
  *                          the DuckDB oracle pin it for reproducibility.
  */
final case class ScdConfig(
    pkCols: Seq[String],
    scdKeyCols: Seq[String],
    selectCols: Option[Seq[String]] = None,
    effectiveFromCol: Option[String] = None,
    initialEffDateCol: Option[String] = None,
    clock: () => Instant = () => Instant.now()
)

object ScdConfig {
  /** The seven mandatory system columns of the schema contract
    * (scd_handler.py:79, README.md:8-15).
    */
  val SystemCols: Seq[String] = Seq(
    "record_status", "effective_from", "effective_to",
    "dw_inserted_at", "dw_updated_at", "scd_key", "upd_key")
}
