package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Magic-byte media-format sniffing — the first stage of any real
  * multimodal ingest, where the binary column arrives with no
  * trustworthy format label. One pure per-row kernel shared by the
  * interpreted and codegen paths; every rule requires its full magic
  * to be present (short blobs fall through), and an unrecognized
  * blob returns NULL rather than a guess. Rule ORDER is part of the
  * contract (the DuckDB oracle mirrors it as a CASE chain): the
  * long unambiguous signatures first, the loose two-byte ones
  * ("BM", "P6 ") last. */
object MediaSniff {
  private val Png = UTF8String.fromString("image/png")
  private val Jpeg = UTF8String.fromString("image/jpeg")
  private val Gif = UTF8String.fromString("image/gif")
  private val Tiff = UTF8String.fromString("image/tiff")
  private val Wav = UTF8String.fromString("audio/wav")
  private val Webp = UTF8String.fromString("image/webp")
  private val Flac = UTF8String.fromString("audio/flac")
  private val Ppm = UTF8String.fromString("image/ppm")
  private val Bmp = UTF8String.fromString("image/bmp")

  def sniff(b: Array[Byte]): UTF8String = {
    @inline def at(i: Int): Int = b(i) & 0xff
    if (b.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' &&
      at(3) == 'G' && at(4) == 0x0d && at(5) == 0x0a && at(6) == 0x1a &&
      at(7) == 0x0a) Png
    else if (b.length >= 3 && at(0) == 0xff && at(1) == 0xd8 &&
      at(2) == 0xff) Jpeg
    else if (b.length >= 6 && at(0) == 'G' && at(1) == 'I' &&
      at(2) == 'F' && at(3) == '8' && (at(4) == '7' || at(4) == '9') &&
      at(5) == 'a') Gif
    else if (b.length >= 4 &&
      ((at(0) == 'I' && at(1) == 'I' && at(2) == 42 && at(3) == 0) ||
        (at(0) == 'M' && at(1) == 'M' && at(2) == 0 && at(3) == 42))) Tiff
    else if (b.length >= 12 && at(0) == 'R' && at(1) == 'I' &&
      at(2) == 'F' && at(3) == 'F' && at(8) == 'W' && at(9) == 'A' &&
      at(10) == 'V' && at(11) == 'E') Wav
    else if (b.length >= 12 && at(0) == 'R' && at(1) == 'I' &&
      at(2) == 'F' && at(3) == 'F' && at(8) == 'W' && at(9) == 'E' &&
      at(10) == 'B' && at(11) == 'P') Webp
    else if (b.length >= 4 && at(0) == 'f' && at(1) == 'L' &&
      at(2) == 'a' && at(3) == 'C') Flac
    else if (b.length >= 3 && at(0) == 'P' && at(1) == '6' &&
      (at(2) == ' ' || at(2) == '\t' || at(2) == '\n' ||
        at(2) == '\r')) Ppm
    else if (b.length >= 2 && at(0) == 'B' && at(1) == 'M') Bmp
    else null
  }
}

/** BINARY → STRING media format from magic bytes ([[MediaSniff]]),
  * NULL when unrecognized. Registered as `vfs_media_format`. */
case class MediaFormat(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.shims.AbstractDataType] =
    Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "vfs_media_format"

  override def nullSafeEval(v: Any): Any =
    MediaSniff.sniff(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MediaSniff.sniff($c);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
