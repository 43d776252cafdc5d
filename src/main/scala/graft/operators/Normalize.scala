package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-normalization and safe type-coercion transforms.
  *
  * Re-expresses the reference's per-row normalization
  * (etl/transformers/data_transformer.py:14-82: whitespace-collapse names,
  * digits-only phones, lowercase emails, float/int coercion with
  * default-on-error, ISO timestamp parse with 'Z' handling) as pure Catalyst
  * `Column` expressions — fully codegen'd, no UDFs, safe under ANSI mode
  * (coercions never throw; they fall back to a default, matching the
  * reference's try/except semantics).
  */
object Normalize {

  /** Trim + collapse internal whitespace runs to a single space
    * (data_transformer.py:25-27 `" ".join(s.split())`). */
  def collapseWs(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")

  /** Keep digits only (data_transformer.py:33 phone normalization). */
  def digitsOnly(c: Column): Column = regexp_replace(c, "[^0-9]", "")

  /** Lowercased trimmed string (data_transformer.py:41 email). */
  def lowerNorm(c: Column): Column = lower(trim(c))

  /** Empty-string → NULL (the reference maps "" to None throughout). */
  def emptyToNull(c: Column): Column = when(length(c) === 0, lit(null)).otherwise(c)

  /** Integer coercion with default-on-error (data_transformer.py:160-176).
    * Guarded so it never throws under ANSI mode: only digit strings are
    * cast, and the cast itself is a try_cast — a digit string that
    * OVERFLOWS int (passes the regex, e.g. 20 digits) falls back to the
    * default instead of throwing the ANSI range error. */
  def coerceInt(c: Column, default: Int): Column =
    coalesce(when(trim(c).rlike("^-?[0-9]+$"), trim(c).try_cast("int")), lit(default))

  /** Double coercion with default-on-error (data_transformer.py:55-66). */
  def coerceDouble(c: Column, default: Double): Column =
    when(trim(c).rlike("^-?[0-9]+(\\.[0-9]+)?$"), trim(c).cast("double"))
      .otherwise(lit(default))

  /** ISO-8601 timestamp parse handling the trailing `Z`
    * (data_transformer.py:74-82 `fromisoformat(s.replace('Z','+00:00'))`).
    * Returns NULL (not an error) on unparseable input; pair with
    * `coalesce(..., fallback)` for the reference's default-now semantics. */
  def parseIsoZ(c: Column): Column =
    try_to_timestamp(
      regexp_replace(c, "Z$", ""),
      lit("yyyy-MM-dd'T'HH:mm:ss"))
}
