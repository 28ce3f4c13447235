package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Kernel-level properties of the hash/vector primitives. */
class HashOpsSpec extends AnyFunSuite {

  private def strs(xs: String*) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def dbls(xs: Double*) = new GenericArrayData(xs.toArray)

  test("fnv64 is deterministic and spreads") {
    val h1 = HashOps.fnv64(UTF8String.fromString("spark"))
    assert(h1 === HashOps.fnv64(UTF8String.fromString("spark")))
    assert(h1 !== HashOps.fnv64(UTF8String.fromString("spary")))
  }

  test("minhash signature estimates jaccard") {
    val a = (1 to 200).map("tok" + _)
    val b = (41 to 240).map("tok" + _) // |∩|=160, |∪|=240 → J = 2/3
    val sa = HashOps.minhashSig(strs(a: _*), 256).toLongArray()
    val sb = HashOps.minhashSig(strs(b: _*), 256).toLongArray()
    assert(HashOps.minhashSig(strs(a: _*), 256).toLongArray().sameElements(sa))
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 2.0 / 3.0) < 0.12, s"estimate $est")
    // identical sets → identical signatures
    assert(HashOps.minhashSig(strs(a: _*), 256).toLongArray().sameElements(sa))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val doc = (1 to 100).map("w" + _)
    val near = doc.updated(5, "CHANGED").updated(50, "ALSO")
    val far = (200 to 300).map("w" + _)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h0 = HashOps.simhash64(strs(doc: _*))
    assert(ham(h0, HashOps.simhash64(strs(near: _*))) < 12)
    assert(ham(h0, HashOps.simhash64(strs(far: _*))) > 20)
  }

  test("fingerprint64 equals iff bytes equal (base-31 Horner)") {
    val f = (s: String) => HashOps.fingerprint64(UTF8String.fromString(s))
    assert(f("abc") === ('a' * 31L * 31L + 'b' * 31L + 'c'))
    assert(f("same text") === f("same text"))
    assert(f("same text") !== f("same text "))
  }

  test("cosine matches the naive formula") {
    val a = Array(1.0, 2.0, 3.0); val b = Array(-1.0, 0.5, 2.0)
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val want = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(math.abs(HashOps.cosine(dbls(a: _*), dbls(b: _*)) - want) < 1e-12)
    assert(HashOps.cosine(dbls(0.0, 0.0), dbls(1.0, 1.0)) === 0.0)
    assert(math.abs(HashOps.cosine(dbls(1.0, 1.0), dbls(1.0, 1.0)) - 1.0) < 1e-12)
  }

  test("vecValid: null element, NaN element, zero norm all invalid; positive norm valid") {
    assert(HashOps.vecValid(dbls(0.5, -0.25)))
    assert(!HashOps.vecValid(dbls(0.0, 0.0)))           // zero norm
    assert(!HashOps.vecValid(new GenericArrayData(Array[Any](0.5, null)))) // NULL element
    assert(!HashOps.vecValid(dbls(Double.NaN, 1.0)))     // NaN: non-finite norm (oracle carries isfinite twin)
    assert(!HashOps.vecValid(dbls(Double.PositiveInfinity))) // Inf: non-finite norm (r12 review)
    assert(!HashOps.vecValid(dbls(1e200, 1.0)))          // finite element, overflowing norm
    assert(!HashOps.vecValid(dbls(1e20, 1.0)))           // finite norm BEYOND VecNormCap (r13:
    // the float-square-overflow class — kept, it blows int64 fixed-point envelopes downstream)
    assert(HashOps.vecValid(dbls(1e19)))                 // huge but inside the float envelope: valid
    assert(!HashOps.vecValid(dbls()))                    // empty → sum 0
  }

  test("hyperplane codes are deterministic, bounded, and sign-sensitive") {
    val v = dbls(0.5, -0.25, 0.125, 1.0)
    val c = HashOps.hyperplaneCode(v, 6, 42L)
    assert(c === HashOps.hyperplaneCode(dbls(0.5, -0.25, 0.125, 1.0), 6, 42L))
    assert(c >= 0 && c < 64)
    // opposite vector flips every plane's sign (modulo exact-zero dots)
    val opp = HashOps.hyperplaneCode(dbls(-0.5, 0.25, -0.125, -1.0), 6, 42L)
    assert((c ^ opp) === 63)
  }

  test("phash32 kernel equals the 32-band substring+byte_sum derivation") {
    // the C38/C56 pair generators replaced a 32 × substring projection
    // with this one-pass kernel; the band arithmetic (l = len/32,
    // trailing len%32 bytes outside every band, bit set iff band sum
    // beats the 32-band mean) must stay bit-identical
    val rnd = new scala.util.Random(42)
    for (len <- Seq(32, 33, 63, 64, 100, 2048, 4097)) {
      val payload = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      val l = len / 32
      val sums = (0 until 32).map(b =>
        payload.slice(b * l, b * l + l).map(x => (x & 0xff).toLong).sum)
      val tot = sums.sum
      val want = (0 until 32)
        .map(b => if (sums(b) * 32 > tot) 1L << b else 0L).sum
      assert(HashOps.phash32(payload) === want, s"len=$len")
    }
  }

  test("phash64 kernel equals the 64-band substring+byte_sum derivation") {
    // r15 widening (C38's 4×16-bit band LSH): same band arithmetic at
    // B = 64 — l = len/64, trailing len%64 bytes outside every band,
    // bit set iff band sum beats the 64-band mean — including bit 63's
    // sign-bit landing (two's complement), which the DuckDB oracle
    // reconstructs via a HUGEINT wrap
    val rnd = new scala.util.Random(43)
    for (len <- Seq(64, 65, 127, 128, 200, 2048, 4097)) {
      val payload = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      val l = len / 64
      val sums = (0 until 64).map(b =>
        payload.slice(b * l, b * l + l).map(x => (x & 0xff).toLong).sum)
      val tot = sums.sum
      val want = (0 until 64)
        .map(b => if (sums(b) * 64 > tot) 1L << b else 0L).sum
      assert(HashOps.phash64(payload) === want, s"len=$len")
    }
    // bit 63 must be reachable: a payload whose LAST band dominates
    val hot = Array.tabulate[Byte](128)(i => if (i >= 126) 0xff.toByte else 0x01)
    assert(HashOps.phash64(hot) < 0L, "band 63 above the mean must set the sign bit")
  }
}
