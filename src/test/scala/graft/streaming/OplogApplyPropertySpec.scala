package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}
import graft.model.OplogEntry

/** ScalaCheck property: the apply-state LWW fold is ARRIVAL-ORDER
  * INVARIANT — folding any permutation of the same op multiset lands on
  * the same final state. This is the property that makes the operator
  * safe downstream of a quorum dedup whose emission order depends on
  * replica interleaving (and is exactly what the clock-carrying
  * tombstone fix guarantees: an out-of-order older op can neither
  * resurrect a deleted doc nor roll back a newer write). */
object OplogApplyPropertySpec extends Properties("OplogApply") {

  private def op(kind: String, id: Int, sec: Int, inc: Int): OplogEntry =
    OplogEntry(new java.sql.Timestamp(1700000000000L + sec * 1000L), inc, sec.toLong,
      kind, "t.c", None, s"""{"_id":$id,"v":$sec}""",
      if (kind == "u") Some(s"""{"_id":$id}""") else None, "r1")

  private val gen = for {
    nOps <- Gen.choose(1, 40)
    kinds <- Gen.listOfN(nOps, Gen.oneOf("i", "u", "d"))
    ids <- Gen.listOfN(nOps, Gen.choose(0, 5))
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    // distinct (sec, inc) clock per op — the oplog contract: the BSON
    // logical clock totally orders a namespace's ops
    val ops = kinds.zip(ids).zipWithIndex.map { case ((k, id), i) =>
      op(k, id, sec = i / 4, inc = i % 4)
    }
    (ops, new scala.util.Random(seed).shuffle(ops))
  }

  private def fold(ops: Seq[OplogEntry]): Map[String, (String, Long, Int)] = {
    val state = scala.collection.mutable.Map.empty[String, OplogApply.DocState]
    ops.foreach { e =>
      val id = OplogApply.docIdOf(e)
      OplogApply.lww(state.get(id), e, id) match {
        case Some(s) => state(id) = s
        case None => state.remove(id)
      }
    }
    state.view.mapValues(s => (s.op, s.tsUs, s.tsInc)).toMap
  }

  property("final state is invariant under arrival order") =
    Prop.forAll(gen) { case (ops, shuffled) =>
      fold(ops) == fold(shuffled)
    }
}
