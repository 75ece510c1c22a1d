package graft.functions

import org.apache.spark.sql.{Column, graftshim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** T24 — Unicode NFC normalization as a native codegen'd Expression (the
  * JDK's `java.text.Normalizer`, no external library): the same logical
  * character can arrive precomposed (é = U+00E9) or decomposed
  * (e + U+0301) from different scrapes, and every downstream exact-match
  * operation — dedup fingerprints, shingles, token hashes — silently
  * treats them as different documents unless ingestion canonicalizes.
  * ASCII (the overwhelming bulk of a web corpus) takes the
  * `isNormalized` fast path and returns the input UTF8String untouched —
  * no allocation, no copy.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object TextNorm {
  /** Column API for [[NfcNormalize]]. */
  def nfc(c: Column): Column =
    graftshim.toColumn(NfcNormalize(graftshim.toExpression(c)))

  /** T24 — the standard pre-tokenization cleanup pipeline, one narrow
    * codegen'd projection: NFC canonicalization → control chars to spaces
    * → lowercase → whitespace collapse → trim. Deterministic and
    * engine-reproducible (the t24 oracle replays the identical steps in
    * SQL); the control-char pass runs BEFORE the whitespace collapse so
    * engine disagreements about which controls count as whitespace (Java
    * `\s` includes VT, RE2's does not) can never surface.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(regexp_replace(nfc(c), "[\\p{Cc}]", " ")), "\\s+", " "))
}
