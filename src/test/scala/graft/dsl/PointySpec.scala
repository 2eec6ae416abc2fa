package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import graft.core.PipeType

/** Pins the DSL semantics the reference tests pin
  * (tests/unittests/test_task.py:39-110). */
class PointySpec extends AnyFunSuite {

  test("A->B->C builds a right-leaning chain with POINTER pipes") {
    val p = StageGraph.build("A->B->C")
    assert(p.event == "A")
    assert(p.onSuccessPipe.contains(PipeType.Pointer))
    val b = p.onSuccess.get
    assert(b.event == "B")
    assert(b.onSuccessPipe.contains(PipeType.Pointer))
    val c = b.onSuccess.get
    assert(c.event == "C")
    assert(c.onSuccessPipe.isEmpty)
    assert(p.count == 3)
    assert(c.getRoot eq p)
  }

  test("A||B|->C: parallel chain then pipe") {
    val p = StageGraph.build("A||B|->C")
    assert(p.onSuccessPipe.contains(PipeType.Parallelism))
    assert(p.onSuccess.get.onSuccessPipe.contains(PipeType.PipePointer))
  }

  test("A(0->B,1->C)->S: conditional with sink") {
    val p = StageGraph.build("A(0->B,1->C)->S")
    assert(p.isConditional)
    assert(p.onSuccess.get.isDescriptorTask)
    assert(p.onFailure.get.isDescriptorTask)
    assert(p.sink.isDefined)
    assert(p.sinkPipe.contains(PipeType.Pointer))
    assert(p.sink.get.isSink)
    assert(p.children.size == 3)
    assert(StageGraph.build("A->B->C").children.size == 1)
  }

  test("2 * A -> B * 4 -> C: prefix and postfix retry factors") {
    val p = StageGraph.build("2 * A -> B * 4 ->C")
    assert(p.retries.contains(2))
    assert(p.onSuccess.get.retries.contains(4))
    assert(p.onSuccess.get.onSuccess.get.retries.isEmpty)
  }

  test("descriptor out of 0..9 is a syntax error") {
    intercept[IllegalArgumentException](StageGraph.build("A(10->C,40->B)"))
  }

  test("retry factor < 2 is a syntax error") {
    intercept[IllegalArgumentException](StageGraph.build("1 * A -> B"))
    intercept[IllegalArgumentException](StageGraph.build("A -> B * 0"))
  }

  test("pointer type to node") {
    val p = StageGraph.build("A->B")
    assert(p.pointerTypeToThis.isEmpty)
    assert(p.onSuccess.get.event == "B")
    assert(p.onSuccess.get.pointerTypeToThis.contains(PipeType.Pointer))
  }

  test("custom descriptors 3..9 attach as extra branches") {
    val p = StageGraph.build("A(0->B,1->C,3->D,5->E)")
    assert(p.isConditional)
    assert(p.extraDescriptors.keySet == Set(3, 5))
    assert(p.getDescriptor(3).get.event == "D")
    assert(p.getDescriptor(5).get.event == "E")
    assert(p.getDescriptor(0).get.event == "B")
    assert(p.getDescriptor(1).get.event == "C")
  }

  test("descriptor branches can be chains") {
    val p = StageGraph.build("A(0->B->X,1->C)")
    val b = p.onFailure.get
    assert(b.event == "B")
    assert(b.onSuccess.get.event == "X")
  }

  test("comments and directives are ignored") {
    val p = StageGraph.build(
      "@recursive-depth:200\n# a comment\nA->B # trailing\n->C")
    assert(p.count == 3)
  }

  test("empty source raises") {
    intercept[IndexOutOfBoundsException](StageGraph.build(""))
  }

  test("conditional sink queues after either branch: tree shape") {
    val p = StageGraph.build("A(0->B,1->C)->S")
    assert(p.sink.get.event == "S")
    // branches do NOT own the sink
    assert(p.onFailure.get.sink.isEmpty)
    assert(p.onSuccess.get.sink.isEmpty)
  }
}
