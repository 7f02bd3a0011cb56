package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scanner-based tokenization kernels replacing the regex hot loops.
  *
  * Every text/corpus/dedup operator tokenizes the corpus per query —
  * `regexp_extract_all` (BPE-ish subword split), `split(trim, "\s+")`
  * (whitespace tokens), and `size(regexp_extract_all(...))` character-
  * class counts (quality ratios, language ID). Java's `Pattern` walks
  * those simple character-class alternations through the generic NFA
  * machinery with a `Matcher` allocation and a `String` copy per row —
  * measured as the dominant per-task cost of the whole text family.
  * These expressions are single-pass byte scanners over the raw UTF-8
  * with identical output (see each kernel's parity contract), fused
  * into WholeStageCodegen like the other graft.plans expressions.
  *
  * Parity rationale shared by all kernels: the regexes involved are
  * alternations of ASCII character classes (`[A-Za-z]+|[0-9]+|
  * [^A-Za-z0-9\s]`, `\s+`, single-char classes). Java regex (without
  * UNICODE_CHARACTER_CLASS) defines `\s` as the six ASCII whitespace
  * chars and `[A-Za-z0-9]` as ASCII, and matches negated classes per
  * CODE POINT — so a maximal-munch byte/code-point scanner reproduces
  * the match stream exactly: at any position the regex engine takes
  * the longest ASCII letter run, else the longest digit run, else (if
  * not whitespace) exactly one code point. Non-ASCII code points are
  * never letters/digits/whitespace under these classes, so they are
  * always single-code-point matches of the negated class — which is a
  * whole UTF-8 sequence, never a split surrogate.
  */
object Tokenize {

  @inline private def isWs(b: Int): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)
  @inline private def isLetter(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isDigit(b: Int): Boolean = b >= '0' && b <= '9'

  /** Kernel for [[BpeTokenize]] — parity with
    * `regexp_extract_all(s, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]", 0)`.
    */
  def bpeTokenize(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[AnyRef](math.min(n, 64))
    var i = 0
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) {
        if (isLetter(c)) {
          var j = i + 1
          while (j < n && isLetter(b(j) & 0xFF)) j += 1
          out.add(UTF8String.fromBytes(b, i, j - i)); i = j
        } else if (isDigit(c)) {
          var j = i + 1
          while (j < n && isDigit(b(j) & 0xFF)) j += 1
          out.add(UTF8String.fromBytes(b, i, j - i)); i = j
        } else if (isWs(c)) i += 1
        else { out.add(UTF8String.fromBytes(b, i, 1)); i += 1 }
      } else {
        // one non-ASCII code point = one match of the negated class
        val len = UTF8String.numBytesForFirstByte(b(i))
        val end = math.min(i + len, n)
        out.add(UTF8String.fromBytes(b, i, end - i)); i = end
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Kernel for [[WsTokenize]] — parity with
    * `split(trim(s), "\\s+")` (limit −1): Spark's `trim` strips only
    * 0x20; Java `Pattern.split` emits a leading empty element when the
    * (trimmed) string starts with whitespace, keeps a trailing empty
    * element when it ends with whitespace, and returns `[""]` for the
    * empty string.
    */
  def wsTokenize(s: UTF8String): ArrayData = {
    val b = s.getBytes
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == 0x20) lo += 1
    while (hi > lo && b(hi - 1) == 0x20) hi -= 1
    // direct port of Pattern.split(input, -1) over \s+ runs: emit the
    // substring before each separator run (empty for a leading run),
    // then the remainder after the last run (empty for a trailing
    // run); no run at all -> the whole (trimmed) input, even if empty
    val out = new java.util.ArrayList[AnyRef](16)
    var idx = lo
    var p = lo
    var any = false
    while (p < hi) {
      if (isWs(b(p) & 0xFF)) {
        any = true
        out.add(UTF8String.fromBytes(b, idx, p - idx))
        var q = p + 1
        while (q < hi && isWs(b(q) & 0xFF)) q += 1
        idx = q
        p = q
      } else p += 1
    }
    if (!any) out.add(UTF8String.fromBytes(b, lo, hi - lo))
    else out.add(UTF8String.fromBytes(b, idx, hi - idx))
    new GenericArrayData(out.toArray)
  }

  /** Kernel for [[Shingles]] — parity with
    * `transform(sequence(0, size(ws) - n), i -> concat_ws(" ",
    * element_at(ws, i+1), …, element_at(ws, i+n)))` guarded by
    * `when(size(ws) < n, array())`: `concat_ws` skips null elements,
    * which [[UTF8String.concatWs]] reproduces.
    */
  def shingles(ws: ArrayData, n: Int): ArrayData = {
    val sz = ws.numElements()
    if (sz < n) return new GenericArrayData(new Array[AnyRef](0))
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](sz - n + 1)
    val window = new Array[UTF8String](n)
    var s = 0
    while (s <= sz - n) {
      var j = 0
      while (j < n) { window(j) = toks(s + j); j += 1 }
      out(s) = UTF8String.concatWs(Tokenize.Space, window: _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  private[plans] val Space: UTF8String = UTF8String.fromString(" ")

  /** Kernel for [[CountAsciiLetters]] — parity with
    * `size(regexp_extract_all(s, "[A-Za-z]", 0))`.
    */
  def countAsciiLetters(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var c = 0
    while (i < b.length) {
      if (isLetter(b(i) & 0xFF)) c += 1
      i += 1
    }
    c
  }

  /** Kernel for [[CountNonAlnumWs]] — parity with
    * `size(regexp_extract_all(s, "[^A-Za-z0-9\\s]", 0))`: one match
    * per code point outside ASCII alnum/whitespace; every non-ASCII
    * code point matches (count its lead byte only).
    */
  def countNonAlnumWs(s: UTF8String): Int = {
    val b = s.getBytes
    var i = 0
    var c = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      if (v < 0x80) {
        if (!isLetter(v) && !isDigit(v) && !isWs(v)) c += 1
      } else if (v >= 0xC0) c += 1 // lead byte = one code point
      i += 1
    }
    c
  }

  /** Kernel for [[CountCjk]] — parity with
    * `size(regexp_extract_all(s, "[\\x{4e00}-\\x{9fff}]", 0))`: the
    * range is exactly the 3-byte UTF-8 code points U+4E00–U+9FFF.
    */
  def countCjk(s: UTF8String): Int = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var c = 0
    while (i < n) {
      val v = b(i) & 0xFF
      if (v < 0x80) i += 1
      else {
        val len = UTF8String.numBytesForFirstByte(b(i))
        if (len == 3 && i + 2 < n) {
          val cp = ((v & 0x0F) << 12) |
            ((b(i + 1) & 0x3F) << 6) | (b(i + 2) & 0x3F)
          if (cp >= 0x4E00 && cp <= 0x9FFF) c += 1
        }
        i += math.max(len, 1)
      }
    }
    c
  }
}

/** `array<string>` of BPE-ish subword tokens — the scanner form of
  * `regexp_extract_all(c, TextFunctions.BpePattern, 0)` (see
  * [[Tokenize.bpeTokenize]] for the parity argument).
  */
case class BpeTokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BpeTokenize needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Tokenize.bpeTokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.Tokenize.bpeTokenize($s)")
  override protected def withNewChildInternal(newChild: Expression)
      : BpeTokenize = copy(child = newChild)
}

/** `array<string>` of whitespace tokens — the scanner form of
  * `split(trim(c), "\\s+")` (see [[Tokenize.wsTokenize]] for the
  * parity contract, leading/trailing empties included).
  */
case class WsTokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WsTokenize needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Tokenize.wsTokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.Tokenize.wsTokenize($s)")
  override protected def withNewChildInternal(newChild: Expression)
      : WsTokenize = copy(child = newChild)
}

/** Word n-gram shingle array from a token array — the codegen form of
  * the `transform(sequence(...), concat_ws(...))` HOF chain, whose
  * lambdas run on the interpreted path per element (see
  * [[Tokenize.shingles]]).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Shingles needs an array<string> child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Tokenize.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.Tokenize.shingles($a, $n)")
  override protected def withNewChildInternal(newChild: Expression)
      : Shingles = copy(child = newChild)
}

/** Count of ASCII letters — `size(regexp_extract_all(c, "[A-Za-z]"))`. */
case class CountAsciiLetters(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CountAsciiLetters needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Tokenize.countAsciiLetters(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.plans.Tokenize.countAsciiLetters($s)")
  override protected def withNewChildInternal(newChild: Expression)
      : CountAsciiLetters = copy(child = newChild)
}

/** Count of code points outside ASCII alnum/whitespace —
  * `size(regexp_extract_all(c, "[^A-Za-z0-9\\s]"))`.
  */
case class CountNonAlnumWs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CountNonAlnumWs needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Tokenize.countNonAlnumWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.plans.Tokenize.countNonAlnumWs($s)")
  override protected def withNewChildInternal(newChild: Expression)
      : CountNonAlnumWs = copy(child = newChild)
}

/** Count of CJK-range code points —
  * `size(regexp_extract_all(c, "[\\x{4e00}-\\x{9fff}]"))`.
  */
case class CountCjk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"CountCjk needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Tokenize.countCjk(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.Tokenize.countCjk($s)")
  override protected def withNewChildInternal(newChild: Expression)
      : CountCjk = copy(child = newChild)
}

/** Column APIs for the scanner kernels. */
object TokenizeApi {
  def bpe_tokenize(c: Column): Column =
    GraftSqlBridge.toColumn(BpeTokenize(GraftSqlBridge.toExpression(c)))
  def ws_tokenize(c: Column): Column =
    GraftSqlBridge.toColumn(WsTokenize(GraftSqlBridge.toExpression(c)))
  def shingles(c: Column, n: Int): Column =
    GraftSqlBridge.toColumn(Shingles(GraftSqlBridge.toExpression(c), n))
  def count_ascii_letters(c: Column): Column =
    GraftSqlBridge.toColumn(
      CountAsciiLetters(GraftSqlBridge.toExpression(c)))
  def count_non_alnum_ws(c: Column): Column =
    GraftSqlBridge.toColumn(
      CountNonAlnumWs(GraftSqlBridge.toExpression(c)))
  def count_cjk(c: Column): Column =
    GraftSqlBridge.toColumn(CountCjk(GraftSqlBridge.toExpression(c)))
}

/** `array<string>` with the elements at 0-based indices in `pos`
  * (an `array<bigint>`) removed — the scanner form of
  * `filter(ws, (x, i) -> !array_contains(pos, CAST(i AS BIGINT)))`:
  * one hash-set build per row plus one linear pass, instead of the
  * interpreted HOF lambda probing the position list per element.
  * Value parity: same kept elements in order; null in either child
  * propagates null (the callers guard the null-position case
  * upstream exactly as before).
  */
case class DropIndexed(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"DropIndexed needs (array<string>, array<bigint>), got $a, $b")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    DropIndexed.drop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.DropIndexed.drop($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropIndexed =
    copy(left = newLeft, right = newRight)
}

object DropIndexed {
  def drop(ws: ArrayData, pos: ArrayData): ArrayData = {
    val np = pos.numElements()
    val set = new java.util.HashSet[java.lang.Long](np * 2)
    var i = 0
    while (i < np) {
      if (!pos.isNullAt(i)) set.add(pos.getLong(i))
      i += 1
    }
    val n = ws.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    i = 0
    while (i < n) {
      if (!set.contains(i.toLong))
        out.add(if (ws.isNullAt(i)) null else ws.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def drop_indexed(ws: Column, pos: Column): Column =
    GraftSqlBridge.toColumn(DropIndexed(
      GraftSqlBridge.toExpression(ws), GraftSqlBridge.toExpression(pos)))
}
