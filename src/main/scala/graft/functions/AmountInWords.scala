package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cheque amount-in-words (reference dev_print_cheque
  * report/print_cheque.py:34-60 `amount_word`: num2words on the integer
  * part, "and NN / 100" when cents are present, trailing "only").
  * English wording, standard short-scale units to billions, hyphenated
  * tens — the reference delegates to num2words; this is a self-contained
  * equivalent (no comma separators). The two-line cheque split is plain
  * Column logic over the phrase (split/slice/concat), not part of the
  * kernel. */
final case class AmountInWordsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"amount_in_words expects double, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "amount_in_words"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      AmountInWordsExpr.phrase(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"${classOf[AmountInWordsExpr].getName}$$.MODULE$$.phrase($c))")

  override protected def withNewChildInternal(newChild: Expression): AmountInWordsExpr =
    copy(child = newChild)
}

object AmountInWordsExpr {
  private val units = Array("", "one", "two", "three", "four", "five", "six",
    "seven", "eight", "nine", "ten", "eleven", "twelve", "thirteen",
    "fourteen", "fifteen", "sixteen", "seventeen", "eighteen", "nineteen")
  private val tens = Array("", "", "twenty", "thirty", "forty", "fifty",
    "sixty", "seventy", "eighty", "ninety")

  private def under100(n: Int): String =
    if (n < 20) units(n)
    else if (n % 10 == 0) tens(n / 10)
    else s"${tens(n / 10)}-${units(n % 10)}"

  private def under1000(n: Int): String = {
    val h = n / 100
    val r = n % 100
    if (h == 0) under100(r)
    else if (r == 0) s"${units(h)} hundred"
    else s"${units(h)} hundred and ${under100(r)}"
  }

  /** Integer part in words (short scale, to billions). */
  def toWords(n: Long): String = {
    require(n >= 0, "cheque amounts are non-negative")
    require(n < 1000000000000L,
      s"amount $n exceeds the supported short scale (max 999,999,999,999)")
    if (n == 0) return "zero"
    val scales = Seq((1000000000L, "billion"), (1000000L, "million"),
      (1000L, "thousand"), (1L, ""))
    val parts = scala.collection.mutable.ListBuffer[String]()
    var rem = n
    scales.foreach { case (m, name) =>
      val q = (rem / m).toInt
      if (q > 0) {
        parts += (if (name.isEmpty) under1000(q) else s"${under1000(q)} $name")
        rem %= m
      }
    }
    parts.mkString(" ")
  }

  /** The full cheque phrase, mirroring the reference's assembly: integer
    * words, then "and NN / 100" for cents, then "only". */
  def phrase(amount: Double): String = {
    val cents = math.floor(amount * 100 + 0.5).toLong
    val intPart = cents / 100
    val frac = (cents % 100).toInt
    val base = toWords(intPart)
    if (frac > 0) f"$base and $frac%02d / 100 only" else s"$base only"
  }
}

object AmountInWords {
  /** Column-API entry point: the cheque phrase for a double amount. */
  def of(c: Column): Column =
    Bridge.column(AmountInWordsExpr(Bridge.expression(c)))
}
