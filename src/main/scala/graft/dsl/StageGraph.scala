package graft.dsl

import scala.collection.mutable
import graft.core.PipeType
import Pointy._

/** One node of the executable stage tree.
  *
  * Mirrors the reference's PipelineTask (nexus/task.py:664-761): children
  * are `onSuccess` / `onFailure` (conditional descriptors 1 / 0), custom
  * descriptors 2..9 reachable only via goto, plus a `sink` that runs after
  * a conditional region completes. Built mutably during lowering, then
  * treated as read-only by the runner.
  */
final class StageNode(val event: String) {
  var onSuccess: Option[StageNode] = None
  var onSuccessPipe: Option[PipeType] = None
  var onFailure: Option[StageNode] = None
  var onFailurePipe: Option[PipeType] = None
  var sink: Option[StageNode] = None
  var sinkPipe: Option[PipeType] = None
  var parent: Option[StageNode] = None
  /** Retry factor from `A * n` (nexus/task.py:896-917). */
  var retries: Option[Int] = None
  /** Set while this node is the head of a descriptor branch during
    * lowering (nexus/task.py:700-702 _descriptor/_descriptor_pipe). */
  var descriptor: Option[Int] = None
  var descriptorPipe: Option[PipeType] = None
  /** Custom descriptors 2..9 → (pipe, branch head) (nexus/task.py:606-632). */
  val extraDescriptors: mutable.LinkedHashMap[Int, (PipeType, StageNode)] =
    mutable.LinkedHashMap.empty

  val id: String = java.util.UUID.randomUUID().toString.take(8)

  /** Conditional iff it has custom descriptors or both branches
    * (nexus/task.py:745-749). */
  def isConditional: Boolean =
    extraDescriptors.nonEmpty || (onSuccess.isDefined && onFailure.isDefined)

  def isDescriptorTask: Boolean = descriptor.isDefined || descriptorPipe.isDefined

  /** Sink = a child queued until its parent's conditional region drains
    * (nexus/task.py:747-761). */
  def isSink: Boolean =
    parent.exists(p => !isDescriptorTask && p.sink.contains(this))

  def getRoot: StageNode = {
    var cur = this
    while (cur.parent.isDefined) cur = cur.parent.get
    cur
  }

  /** Pipe type on the edge arriving at this node (nexus/task.py:763-781). */
  def pointerTypeToThis: Option[PipeType] = parent.flatMap { p =>
    if (p.onSuccess.contains(this)) p.onSuccessPipe
    else if (p.onFailure.contains(this)) p.onFailurePipe
    else if (p.sink.contains(this)) p.sinkPipe
    else p.extraDescriptors.collectFirst { case (_, (pipe, n)) if n eq this => pipe }
  }

  def isParallelNode: Boolean =
    onSuccessPipe.contains(PipeType.Parallelism) ||
      pointerTypeToThis.contains(PipeType.Parallelism)

  def children: Seq[StageNode] =
    (onFailure.toSeq ++ onSuccess.toSeq ++ sink.toSeq ++
      extraDescriptors.valuesIterator.map(_._2)).distinct

  /** Descriptor lookup for goto routing: 0 → failure branch, 1 → success
    * branch, 2..9 → extraDescriptors (nexus/task.py:522-535). */
  def getDescriptor(d: Int): Option[StageNode] = d match {
    case 0 => onFailure
    case 1 => onSuccess
    case _ => extraDescriptors.get(d).map(_._2)
  }

  def count: Int = {
    // iterative: chains can be thousands of stages deep
    var n = 0
    var stack = List(this)
    while (stack.nonEmpty) {
      val cur = stack.head
      stack = cur.children.toList ++ stack.tail
      n += 1
    }
    n
  }

  /** ASCII rendering of the tree (analog of nexus/pipeline.py:414-496). */
  def treeString: String = {
    val sb = new StringBuilder
    def draw(n: StageNode, prefix: String, label: String): Unit = {
      val retry = n.retries.map(r => s" *$r").getOrElse("")
      sb.append(prefix).append(label).append(n.event).append(retry).append('\n')
      val kids: Seq[(String, StageNode)] =
        n.onFailure.map(("[0]-> ", _)).toSeq ++
          n.extraDescriptors.toSeq.map { case (d, (_, b)) => (s"[$d]-> ", b) } ++
          n.onSuccess.map(c =>
            (n.onSuccessPipe.map(_.token + " ").getOrElse(""), c)).toSeq ++
          n.sink.map(("[sink]-> ", _)).toSeq
      kids.zipWithIndex.foreach { case ((lbl, kid), i) =>
        val last = i == kids.size - 1
        draw(kid, prefix + (if (last) "    " else "│   "),
          (if (last) "└── " else "├── ") + lbl)
      }
    }
    draw(this, "", "")
    sb.result()
  }

  override def toString: String = s"StageNode<$event>"
}

/** Lowers a Pointy AST into a StageNode tree, mirroring the reference's
  * recursive `_parse_ast` (nexus/task.py:857-967). `lower` returns the
  * chain tail; `build` returns the root.
  */
object StageGraph {

  def build(code: String): StageNode = lower(Pointy.parse(code)).getRoot

  /** Walk an expression's leftmost leaf (nexus/parser/ast.py:28-44) to find
    * the descriptor number that names a conditional branch. */
  private def leftmostDescriptor(ast: PointyAst): Option[Int] = ast match {
    case NumberA(n)        => Some(n)
    case BinOpA(_, l, _)   => leftmostDescriptor(l)
    case _                 => None
  }

  def lower(ast: PointyAst): StageNode = ast match {
    case TaskNameA(name) => new StageNode(name)

    case b: BinOpA =>
      // left-deep spines get thousands of levels deep ("A -> B -> ...");
      // unroll iteratively, then fold left-to-right
      var spine = List.empty[(String, PointyAst)]
      var cur: PointyAst = b
      while (cur.isInstanceOf[BinOpA]) {
        val bin = cur.asInstanceOf[BinOpA]
        spine = (bin.op, bin.right) :: spine
        cur = bin.left
      }
      var acc = lowerOperand(cur)
      spine.foreach { case (op, rhs) =>
        acc = Left(combine(op, acc, lowerOperand(rhs)))
      }
      acc match {
        case Left(node) => node
        case Right(n) =>
          throw new IllegalArgumentException(s"dangling number '$n' in $ast")
      }

    case CondA(parentName, exprs) =>
      val parent = new StageNode(parentName.value)
      // descriptor → whole branch expression, keyed by leftmost leaf
      val branches = exprs.flatMap(e => leftmostDescriptor(e).map(_ -> e))
      val byDescriptor = branches.toMap
      // 1 and 0 become onSuccess / onFailure (nexus/task.py:938-952);
      // iterate [1, 0] to mirror the reference's [right, left] order.
      Seq(1, 0).foreach { d =>
        byDescriptor.get(d).foreach { expr =>
          val head = lower(expr).getRoot
          head.parent = Some(parent)
          if (head.descriptor.contains(0)) {
            parent.onFailure = Some(head)
            parent.onFailurePipe = head.descriptorPipe
          } else {
            parent.onSuccess = Some(head)
            parent.onSuccessPipe = head.descriptorPipe
          }
        }
      }
      // custom descriptors 2..9 (nexus/task.py:954-963, add_descriptor
      // accepts 1 < d < 10)
      branches.filter { case (d, _) => d != 0 && d != 1 }.foreach { case (d, expr) =>
        if (d > 1 && d < 10) {
          val head = lower(expr).getRoot
          head.parent = Some(parent)
          parent.extraDescriptors(d) =
            (head.descriptorPipe.getOrElse(PipeType.Pointer), head)
        }
      }
      parent

    case NumberA(n) =>
      throw new IllegalArgumentException(s"A bare number '$n' is not a pipeline expression")
  }

  private def lowerOperand(ast: PointyAst): Either[StageNode, Int] = ast match {
    case NumberA(n) => Right(n)
    case other      => Left(lower(other))
  }

  /** One binary-op step (nexus/task.py:873-917): node∘node chains or
    * sinks; number∘node is a retry factor or descriptor head. */
  private def combine(
      op: String,
      l: Either[StageNode, Int],
      r: Either[StageNode, Int]): StageNode = (l, r) match {
    case (Left(leftNode), Left(rightNode)) =>
      val pipe = PipeType.fromToken(op)
      if (leftNode.isConditional) {
        leftNode.sink = Some(rightNode)
        leftNode.sinkPipe = Some(pipe)
      } else {
        leftNode.onSuccess = Some(rightNode)
        leftNode.onSuccessPipe = Some(pipe)
      }
      rightNode.parent = Some(leftNode)
      rightNode
    case (Left(node), Right(n)) => applyNumber(op, node, n)
    case (Right(n), Left(node)) => applyNumber(op, node, n)
    case (Right(a), Right(b)) =>
      throw new IllegalArgumentException(s"AST is malformed: $a $op $b")
  }

  /** `A * n` sets the retry factor; `n -> A` marks A's root as the head of
    * descriptor branch n (nexus/task.py:896-917). */
  private def applyNumber(op: String, node: StageNode, n: Int): StageNode =
    if (op == PipeType.Retry.token) {
      node.retries = Some(n)
      node
    } else {
      val root = node.getRoot
      root.descriptor = Some(n)
      root.descriptorPipe = Some(PipeType.fromToken(op))
      root
    }
}
