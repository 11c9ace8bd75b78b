package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen'd expression — the first transform of any text-curation
  * pipeline that deduplicates or hashes content: "café" spelled
  * e+COMBINING ACUTE and precomposed é are the SAME text to a reader but
  * different bytes to md5/minhash/equality, so un-normalized corpora leak
  * duplicates past every hash-based stage.
  *
  * NFC (not NFKC) deliberately: canonical composition is lossless, while
  * compatibility folding (ﬁ→fi, ²→2) changes content — a curation
  * pipeline wants the reversible one by default. The kernel takes the
  * `isNormalized` fast path first, so the (overwhelmingly common) already
  * -NFC document costs one scan and zero allocations.
  *
  * Cross-engine: DuckDB's `nfc_normalize` implements the same UAX #15
  * algorithm over the same Unicode tables — outputs agree byte-for-byte
  * (q_normalize_text hash-matches).
  */
object UnicodeNorm {

  /** ICU-free NFC via java.text.Normalizer; fast path for already-NFC. */
  def nfcKernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfcKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNorm.nfcKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
