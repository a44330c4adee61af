package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BOILERPLATE LINE REMOVAL — the C4 (Raffel et al. 2020, §2.2
  * "any line that occurred more than once in the dataset was removed"
  * scoped per site, as RefinedWeb/CCNet refine it): a line recurring
  * trimmed-identical across many of a DOMAIN's documents is site
  * chrome (nav menus, cookie banners, footers), not content, and is
  * stripped from every document of that domain.
  *
  * Rule: a non-empty trimmed line key (SPACE-only trim — the exact
  * semantics of SQL `trim()`, so the oracle replays it; tabs are
  * content) is boilerplate within domain `d`
  * iff it occurs in ≥ `minDocs` distinct documents AND in ≥
  * `minDocFracBp`/10000 of the domain's documents — the fraction test
  * is EXACT integer arithmetic (`nd · 10000 ≥ domDocs · bp`), so a
  * replaying SQL oracle lands on the same side of every edge (no
  * float threshold can drift a line across the cut).
  *
  * Scale shape (100 TB): one narrow line explode; the frequency
  * aggregate and the removal anti-join both key on (domain, lineKey),
  * sharing a hash partitioning; the domain-size aggregate is
  * group-cardinality small; reconstruction is one groupBy(doc) with a
  * row-local `array_sort` (positions are unique per doc — no window,
  * no skewed global sort). Nothing collects to the driver.
  *
  * Output: one row per input document —
  * `(doc_id, lines_total, lines_kept, new_text)`; a fully-stripped
  * document keeps `lines_kept = 0, new_text = ''`.
  */
object Boilerplate {

  def strip(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, minDocFracBp: Int = 5000, minDocs: Int = 3)
      : DataFrame = {
    require(minDocFracBp >= 0 && minDocFracBp <= 10000,
      s"minDocFracBp=$minDocFracBp must be basis points in [0, 10000]")
    require(minDocs >= 1, s"minDocs=$minDocs must be >= 1")
    val base = docs.select(col(idCol).as("doc_id"),
      col(domainCol).as("dom"), col(textCol).as("text"))
    // -1 keeps trailing empty lines, matching SQL string_split
    val lines = base.select(col("doc_id"), col("dom"),
      posexplode(split(col("text"), "\n", -1)).as(Seq("pos", "line")))
      .withColumn("lk", trim(col("line")))
    // distinct-document frequency per (domain, trimmed key); empty
    // keys are never boilerplate (blank separators always survive)
    val freq = lines.filter(length(col("lk")) > 0)
      .groupBy("dom", "lk").agg(countDistinct(col("doc_id")).as("nd"))
    val domDocs = base.groupBy("dom")
      .agg(countDistinct(col("doc_id")).as("dd"))
    val boiler = freq.join(domDocs, Seq("dom"))
      .filter(col("nd") >= minDocs &&
        col("nd") * 10000L >= col("dd") * minDocFracBp)
      .select(col("dom"), col("lk"))
    val kept = lines.join(boiler, Seq("dom", "lk"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("lines_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("new_text"))
    base.select(col("doc_id"),
      size(split(col("text"), "\n", -1)).cast("long").as("lines_total"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lines_total"),
        coalesce(col("lines_kept"), lit(0L)).as("lines_kept"),
        coalesce(col("new_text"), lit("")).as("new_text"))
  }
}
