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

  /** SCD Type-2 history (round 17): turn a per-key change stream into
    * versioned validity intervals — (key, value, valid_from, valid_to,
    * is_current), the warehouse dimension-history shape ([[snapshotDiff]]
    * answers "what changed between two snapshots"; this answers "what was
    * X's value at time t" for every t). Two window passes on ONE key
    * exchange:
    *
    *  1. run-collapse: a row opens a new version iff its value differs
    *     from the previous row's (null-safe `<=>` — NULL is a value, and
    *     a NULL→text flip is a real version change), so consecutive
    *     duplicates never mint spurious versions;
    *  2. interval close: each version's `valid_to` is the NEXT version's
    *     `valid_from` (lead over the collapsed frame); the last version
    *     per key has NULL `valid_to` and `is_current = true`.
    *
    * Ordering within a key is (`tsCol`, `tieCol`) — the tiebreak makes
    * equal-timestamp streams deterministic (the q52/LIMIT house rule
    * applied to versioning). Timestamps are surfaced as unix micros so
    * the interval arithmetic—and the oracle hash—is integer-exact.
    *
    * Scale shape: both windows and the filter ride one hash exchange on
    * the key; output size is the number of VALUE CHANGES, not rows.
    *
    * @return (key, value, valid_from_us, valid_to_us, is_current)
    */
  def scd2History(df: DataFrame, idCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tie"))
    val ordered = df
      .filter(col(s"`$idCol`").isNotNull && col(s"`$tsCol`").isNotNull)
      .select(col(s"`$idCol`").as("key"),
        unix_micros(col(s"`$tsCol`")).as("__ts"),
        col(s"`$tieCol`").as("__tie"),
        col(s"`$valueCol`").as("value"))
    val opens = ordered
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col("value") <=> col("__prev")))
    val w2 = Window.partitionBy(col("key")).orderBy(col("__ts"), col("__tie"))
    opens
      .withColumn("valid_to_us", lead(col("__ts"), 1).over(w2))
      .select(col("key"), col("value"), col("__ts").as("valid_from_us"),
        col("valid_to_us"), col("valid_to_us").isNull.as("is_current"))
  }
}
