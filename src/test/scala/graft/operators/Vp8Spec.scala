package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Vp8._

/** VP8 (lossy WebP) codec properties: boolean-coder roundtrips, tree
  * coding, fixture encode→decode consistency, and exactness invariants
  * of the integer transforms. Real-encoder bit-exactness (all intra
  * modes, both loop filters, segments, partitions) is pinned separately
  * by [[graft.Vp8RealStreamSpec]] against the system libwebp.
  */
class Vp8Spec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 60)(check: A => Unit): Unit = {
    var seed = Seed(20091L)
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => check(a)
        case None => fail(s"gen failed at sample $i")
      }
      seed = seed.next
    }
  }

  test("boolean coder round-trips arbitrary (bit, probability) sequences") {
    val seqGen: Gen[List[(Int, Int)]] = Gen.listOfN(400, for {
      b <- Gen.choose(0, 1)
      p <- Gen.choose(1, 254)
    } yield (b, p))
    forAllSamples(seqGen, n = 40) { bits =>
      val be = new BoolEncoder
      bits.foreach { case (b, p) => be.bool(b, p) }
      val bytes = be.toBytes
      val bd = new BoolDecoder(bytes, 0, bytes.length)
      bits.foreach { case (b, p) =>
        assert(bd.bool(p) == b, s"roundtrip mismatch in $bits")
      }
    }
  }

  test("literals and signed literals round-trip") {
    forAllSamples(Gen.listOfN(50, Gen.choose(-127, 127)), n = 20) { vs =>
      val be = new BoolEncoder
      vs.foreach { v => be.literal(math.abs(v) % 128, 7); be.signedLiteral(v % 16, 4) }
      val bytes = be.toBytes
      val bd = new BoolDecoder(bytes, 0, bytes.length)
      vs.foreach { v =>
        assert(bd.literal(7) == math.abs(v) % 128)
        assert(bd.signedLiteral(4) == v % 16)
      }
    }
  }

  test("tree coder round-trips every leaf of every mode tree") {
    import Vp8Tables._
    val trees = Seq(
      (KfYModeTree, KfYModeProbs, Seq(DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED)),
      (UvModeTree, KfUvModeProbs, Seq(DC_PRED, V_PRED, H_PRED, TM_PRED)),
      (BModeTree, Array(145, 156, 163, 128, 180, 150, 120, 200, 90),
        (0 to 9).toSeq))
    trees.foreach { case (t, p, leaves) =>
      val be = new BoolEncoder
      leaves.foreach(l => be.tree(t, p, l))
      val bytes = be.toBytes
      val bd = new BoolDecoder(bytes, 0, bytes.length)
      leaves.foreach(l => assert(bd.tree(t, p) == l))
    }
  }

  test("inverse WHT of a DC-only block spreads (dc+3)>>3 uniformly") {
    (-1000 to 1000 by 37).foreach { dc =>
      val b = new Array[Int](16)
      b(0) = dc
      iwht4x4(b)
      assert(b.forall(_ == ((dc + 3) >> 3)), s"dc=$dc")
    }
  }

  test("inverse DCT of a DC-only block spreads (dc+4)>>3 uniformly") {
    (-2000 to 2000 by 61).foreach { dc =>
      val b = new Array[Int](16)
      b(0) = dc
      idct4x4(b)
      assert(b.forall(_ == ((dc + 4) >> 3)), s"dc=$dc")
    }
  }

  test("fixture streams decode deterministically with exact dims/digest") {
    // the mm_webp_lossy coefficient script at three representative ids:
    // the decode is a pure integer function, so repeated decodes (and
    // decodes on other threads) must agree byte-for-byte
    def fixture(id: Long): Array[Byte] =
      Vp8.encodeVp8Fixture(16, 16, (id % 128).toInt,
        (id % 7).toInt - 3, ((id / 2) % 7).toInt - 3,
        ((id / 3) % 5).toInt - 2, ((id / 4) % 7).toInt - 3,
        ((id / 5) % 5).toInt - 2,
        (_, _) => {
          val blk = Array.fill(25)(new Array[Int](16))
          blk(24)(0) = (id % 21).toInt - 10
          blk(24)(1) = ((id / 3) % 9).toInt - 4
          (0 until 16).foreach { sb =>
            blk(sb)(1) = ((id + 5 * sb) % 9).toInt - 4
            blk(sb)(2) = ((id + 3 * sb) % 5).toInt - 2
          }
          (0 until 4).foreach { cb =>
            blk(16 + cb)(0) = ((id + cb) % 17).toInt - 8
            blk(16 + cb)(1) = (((id / 2) + cb) % 5).toInt - 2
            blk(20 + cb)(0) = ((2 * id + cb) % 17).toInt - 8
            blk(20 + cb)(1) = (((id / 4) + cb) % 5).toInt - 2
          }
          blk
        })
    Seq(0L, 77L, 199L).foreach { id =>
      val bytes = fixture(id)
      val a = Vp8.decodeWebpLossy(bytes)
      val b = Vp8.decodeWebpLossy(bytes)
      assert(a.width == 16 && a.height == 16)
      assert(a.y.sameElements(b.y) && a.u.sameElements(b.u) && a.v.sameElements(b.v))
      // encode is deterministic too
      assert(fixture(id).sameElements(bytes))
    }
  }

  test("malformed and out-of-scope inputs fail with clear errors") {
    def expectMsg(sub: String)(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains(sub), s"got: ${e.getMessage}")
    }
    expectMsg("short")(Vp8.decodeWebpLossy(Array[Byte](1, 2, 3)))
    expectMsg("not a webp")(
      Vp8.decodeWebpLossy(("X" * 32).getBytes("US-ASCII")))
    val good = Vp8.encodeVp8Fixture(16, 16, 40, 0, 0, 0, 0, 0,
      (_, _) => Array.fill(25)(new Array[Int](16)))
    // truncations at every interesting boundary fail, never AIOOBE
    Seq(16, 21, 24, good.length / 2, good.length - 2).foreach { n =>
      intercept[IllegalArgumentException](
        Vp8.decodeWebpLossy(java.util.Arrays.copyOf(good, n)))
    }
    // animation chunk rejected by name
    val anim = good.clone()
    System.arraycopy("ANIM".getBytes("US-ASCII"), 0, anim, 12, 4)
    expectMsg("animated")(Vp8.decodeWebpLossy(anim))
    // a lossless stream routed to the lossy entry names the right API
    val vp8l = Webp.encodeWebpLossless(4, 4, (_, _) => 0x112233)
    expectMsg("VP8L")(Vp8.decodeWebpLossy(vp8l))
  }

  test("token encode/decode round-trips random coefficient blocks") {
    val blkGen: Gen[(Int, List[Int])] = for {
      qi <- Gen.choose(0, 127)
      lv <- Gen.listOfN(16 * 16 + 16 + 8 * 16,
        Gen.frequency(6 -> Gen.const(0), 3 -> Gen.choose(-10, 10),
          1 -> Gen.choose(-900, 900)))
    } yield (qi, lv)
    forAllSamples(blkGen, n = 30) { case (qi, lv) =>
      val it = lv.iterator
      val bytes = Vp8.encodeVp8Fixture(16, 16, qi, 0, 0, 0, 0, 0,
        (_, _) => {
          val blk = Array.fill(25)(new Array[Int](16))
          blk(24)(0) = it.next() % 500 // Y2 DC
          (0 until 16).foreach { sb =>
            (1 until 16).foreach(p => blk(sb)(p) = it.next())
          }
          (0 until 8).foreach { cb =>
            (0 until 16).foreach(p => blk(16 + cb)(p) = it.next())
          }
          blk
        })
      // must decode without error and deterministically
      val img = Vp8.decodeWebpLossy(bytes)
      assert(img.width == 16 && img.height == 16)
      val img2 = Vp8.decodeWebpLossy(bytes)
      assert(img.y.sameElements(img2.y))
    }
  }
}
