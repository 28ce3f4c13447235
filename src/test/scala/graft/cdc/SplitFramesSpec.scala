package graft.cdc

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Frame-splitter edge cases for the binary replication segments
  * ([[PgOutputExpressions.splitFrames]]). */
class SplitFramesSpec extends AnyFunSuite {

  private def frame(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte,
      (n >>> 8).toByte, n.toByte) ++ payload
  }
  private def frames(a: ArrayData): Seq[Array[Byte]] =
    (0 until a.numElements()).map(a.getBinary)

  test("splits a multi-message segment, empty payloads included") {
    val m1 = "hello".getBytes("UTF-8")
    val m2 = Array.empty[Byte]
    val m3 = Array[Byte](0, 1, 2, -1)
    val seg = frame(m1) ++ frame(m2) ++ frame(m3)
    val out = frames(PgOutputExpressions.splitFrames(seg))
    assert(out.length === 3)
    assert(out(0).sameElements(m1) && out(1).isEmpty && out(2).sameElements(m3))
  }

  test("empty segment yields zero frames") {
    assert(PgOutputExpressions.splitFrames(Array.empty).numElements() === 0)
  }

  test("truncated header and overrun length are rejected") {
    intercept[IllegalArgumentException] {
      PgOutputExpressions.splitFrames(Array[Byte](0, 0))
    }
    intercept[IllegalArgumentException] {
      PgOutputExpressions.splitFrames(Array[Byte](0, 0, 0, 9, 1)) // len 9, 1 byte
    }
  }

  test("roundtrips real pgoutput messages") {
    val msgs = Seq(
      PgOutput.encode(PgOutput.Insert(1, Seq(Some("42"), Some("x")))),
      PgOutput.encode(PgOutput.Delete(1, viaKey = true, Seq(Some("42")))))
    val seg = msgs.flatMap(m => frame(m)).toArray
    val out = frames(PgOutputExpressions.splitFrames(seg))
    assert(out.zip(msgs).forall { case (a, b) => a.sameElements(b) })
    assert(PgOutput.decode(out.head).isInstanceOf[PgOutput.Insert])
  }
}
