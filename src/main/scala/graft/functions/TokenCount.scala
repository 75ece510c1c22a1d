package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish token count as a native codegen'd Expression: ONE code-point
  * scan with a 3-state run machine, replacing
  * `size(regexp_extract_all(text, "[a-z]+|[0-9]+|[^a-z0-9\\s]"))` — which
  * runs the regex engine AND materializes an array of every match just to
  * take its length. On the curation rows that tokenize the whole corpus
  * (t5/t6/s5i/s5k/s5l), the scan is the hot loop; the state machine is
  * allocation-free and ~an order of magnitude cheaper per byte
  * (measured: BENCH_SCALE.md round-12).
  *
  * Semantics are EXACTLY the regex's non-overlapping left-to-right match
  * count over its input, for any Unicode input — not an approximation:
  *   - `[a-z]+` / `[0-9]+` are greedy runs → one token per maximal run;
  *   - `[^a-z0-9\s]` matches one CODE POINT (Java regex character classes
  *     are code-point-wise) → one token per such point;
  *   - `\s` (no UNICODE_CHARACTER_CLASS flag) is the ASCII set
  *     `[ \t\n\x0B\f\r]` only — anything else non-alnum, including
  *     Unicode whitespace, counts as a token, exactly like the regex.
  * Case handling stays with Spark's own `Lower` (compose as
  * `TokenCount(Lower(e))` — see [[Text.bpeTokensExpr]]), so there is no
  * second lowercasing implementation to drift.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_count expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(s: Any): Any =
    TokenCount.count(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenCount {
  /** Shared by interpreted eval and generated code. States: 0 = none,
    * 1 = inside a letter run, 2 = inside a digit run.
    */
  def count(s: UTF8String): Int = {
    val str = s.toString
    val len = str.length
    var i = 0
    var n = 0
    var state = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') {
        if (state != 1) { n += 1; state = 1 }
      } else if (cp >= '0' && cp <= '9') {
        if (state != 2) { n += 1; state = 2 }
      } else if (cp == ' ' || (cp >= '\t' && cp <= '\r')) {
        state = 0 // the regex's \s: ASCII 0x09-0x0D and space
      } else {
        n += 1; state = 0 // one token per non-alnum code point
      }
      i += Character.charCount(cp)
    }
    n
  }
}
