package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus versioning: content-level diff between two snapshots of a
  * document set — the audit step between training-data releases ("what
  * changed since the last crawl/curation run, and how much of it").
  */
object VersionOps {

  /** Diff snapshot `b` (new) against snapshot `a` (old) by id: rows only
    * in `b` are `added`, rows only in `a` are `removed`, rows whose
    * normalized content fingerprint ([[TextOps.fingerprint]]) differs are
    * `changed`; unchanged rows are NOT emitted (at 100 TB the diff is the
    * interesting minority — emitting the unchanged majority would make
    * the audit as large as the corpus).
    *
    * Scale shape: each side reduces to (id, 32-byte fingerprint) BEFORE
    * the full-outer join — document text never crosses the wire, and the
    * one shuffle carries two slim columns per side, hash-partitioned on
    * the id. NULL text fingerprints as NULL; two NULL-content rows
    * compare as unchanged (null-safe equality), a NULL-vs-text flip is
    * `changed` — content presence is content.
    *
    * @return (id, status) with status in {added, removed, changed}
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"__id_$side"),
        TextOps.fingerprint(col(textCol)).as(s"__fp_$side"))
    fp(a, "a").join(fp(b, "b"), col("__id_a") === col("__id_b"), "full_outer")
      .select(
        coalesce(col("__id_a"), col("__id_b")).as(idCol),
        when(col("__id_a").isNull, lit("added"))
          .when(col("__id_b").isNull, lit("removed"))
          .when(not(col("__fp_a") <=> col("__fp_b")), lit("changed"))
          .as("status"))
      .filter(col("status").isNotNull)
  }
}
