package graft.dsl

import scala.util.parsing.combinator.RegexParsers

/** Pointy-Lang front end.
  *
  * Re-implements the reference grammar (nexus/parser/lexer.py:12-35,
  * nexus/parser/grammar.py:14-125) with scala-parser-combinators:
  *
  *   - tokens: `,` `->` `|->` `||` `*` TASKNAME `(` `)` NUMBER, comments
  *     `#...`, directives `@name:value` (lexed and ignored — our lowering
  *     is iterative so `@recursive-depth` is a no-op, lexer.py:42-53)
  *   - one left-associative precedence level for all four binary operators
  *     (grammar.py:11)
  *   - a bare NUMBER is not an expression: it is legal only as a
  *     descriptor on the left of `->`/`|->` (0..9, grammar.py:41-54) or as
  *     a retry factor on either side of `*` (>= 2, grammar.py:57-69)
  *   - conditional: `task ( expr , expr [, expr]* )` (grammar.py:80-94)
  *
  * The parse yields an AST (`PointyAst`); `StageGraph.lower` turns it into
  * the executable stage tree. This DSL never touches Catalyst — the graph
  * is lowered to DataFrame transformations by the runner.
  */
object Pointy {

  sealed trait PointyAst
  final case class TaskNameA(value: String) extends PointyAst
  final case class NumberA(value: Int) extends PointyAst
  final case class BinOpA(op: String, left: PointyAst, right: PointyAst) extends PointyAst
  /** `parent ( exprs... )`; descriptor→branch mapping is resolved at
    * lowering by walking each expr's leftmost leaf (nexus/parser/ast.py:28-44). */
  final case class CondA(parent: TaskNameA, exprs: List[PointyAst]) extends PointyAst

  private object P extends RegexParsers {
    override val whiteSpace = """(\s|#[^\n]*|@[a-zA-Z0-9-]+:[a-zA-Z0-9]+)+""".r

    private val taskName: Parser[TaskNameA] =
      """[a-zA-Z_][a-zA-Z0-9_]*""".r ^^ TaskNameA.apply
    private val number: Parser[NumberA] =
      """\d+""".r ^^ (s => NumberA(s.toInt))
    private val binop: Parser[String] = "|->" | "->" | "||" | "*"

    private lazy val task: Parser[PointyAst] =
      taskName ~ opt("(" ~> group <~ ")") ^^ {
        case n ~ None        => n
        case n ~ Some(exprs) => CondA(n, exprs)
      }

    private lazy val group: Parser[List[PointyAst]] =
      rep1sep(expression, ",") ^? (
        { case es if es.size >= 2 => es },
        _ => "a conditional group needs at least two comma-separated branches")

    private lazy val operand: Parser[PointyAst] = task | number

    /** Left-associative fold over a single precedence level (grammar.py:11). */
    private lazy val expression: Parser[PointyAst] =
      operand ~ rep(binop ~ operand) ^^ { case first ~ rest =>
        rest.foldLeft(first) { case (acc, op ~ rhs) => BinOpA(op, acc, rhs) }
      }

    def parseAll(code: String): PointyAst = this.parse(phrase(expression), code) match {
      case Success(ast, _) => ast
      case NoSuccess.I(msg, next) =>
        throw new IllegalArgumentException(
          s"Syntax error in input at line ${next.pos.line}, column ${next.pos.column}: $msg\n${next.pos.longString}")
    }
  }

  /** Validate number placement exactly like the reference grammar:
    * descriptors 0..9 left of `->`/`|->`; retry factors >= 2 beside `*`;
    * numbers illegal anywhere else (grammar.py:41-94). */
  private def validate(root: PointyAst): Unit = {
    // worklist, not recursion: left-deep spines go thousands deep
    var work: List[PointyAst] = List(root)
    while (work.nonEmpty) {
      val ast = work.head
      work = work.tail
      ast match {
        case BinOpA("*", NumberA(n), r) =>
          if (n < 2) fail(s"Task cannot be retried less than 2 times. Offending token: $n")
          work = r :: work
        case BinOpA("*", l, NumberA(n)) =>
          if (n < 2) fail(s"Task cannot be retried less than 2 times. Offending token: $n")
          work = l :: work
        case BinOpA("*", _, _) =>
          fail("Retry operator '*' requires a numeric factor on one side")
        case BinOpA(op, NumberA(n), r) if op == "->" || op == "|->" =>
          if (n < 0 || n > 9)
            fail(s"Descriptors cannot be either greater 9 or less than 0. Offending token: $n")
          work = r :: work
        case BinOpA(_, _, NumberA(n)) =>
          fail(s"Unexpected number '$n' on the right of an operator")
        case BinOpA("||", NumberA(n), _) =>
          fail(s"Unexpected number '$n' beside '||'")
        case BinOpA(_, l, r) => work = l :: r :: work
        case CondA(_, exprs) => work = exprs ++: work
        case NumberA(n) => fail(s"A bare number '$n' is not a pipeline expression")
        case TaskNameA(_) => ()
      }
    }
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Parse Pointy source to a validated AST.
    * @throws IllegalArgumentException with line/column context on bad input
    *         (mirrors grammar.py:97-115 SyntaxError behavior). */
  def parse(code: String): PointyAst = {
    if (code == null || code.trim.isEmpty)
      throw new IndexOutOfBoundsException("No pointy code provided")
    val ast = P.parseAll(code)
    validate(ast)
    ast
  }
}
