package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{SimHash64, WordShingles}

/** ScalaCheck properties over the pure compute kernels of the native
  * expressions (no Spark session — these run per-row on executors, so
  * the kernels themselves must be total and deterministic).
  */
object NativePropertySpec extends Properties("NativeKernels") {

  private val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokens = Gen.listOf(token)

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  property("shingle count = max(n-k+1, 1)") = forAll(tokens, Gen.choose(1, 5)) {
    (ts, k) =>
      WordShingles.compute(arr(ts), k).numElements() ==
        math.max(ts.length - k + 1, 1)
  }

  property("every shingle of k tokens joins k consecutive tokens") =
    forAll(tokens, Gen.choose(1, 4)) { (ts, k) =>
      val out = WordShingles.compute(arr(ts), k)
      (0 until out.numElements()).forall { i =>
        val expect =
          if (ts.length < k) ts.mkString(" ")
          else ts.slice(i, i + k).mkString(" ")
        out.getUTF8String(i).toString == expect
      }
    }

  property("simhash is deterministic") = forAll(tokens) { ts =>
    SimHash64.compute(arr(ts)) == SimHash64.compute(arr(ts))
  }

  property("simhash is order-insensitive (bag semantics)") = forAll(tokens) { ts =>
    SimHash64.compute(arr(ts)) == SimHash64.compute(arr(ts.reverse))
  }

  property("duplicating every token preserves simhash sign votes") =
    forAll(Gen.nonEmptyListOf(token)) { ts =>
      // doubling all vote weights cannot flip any bit's sign
      SimHash64.compute(arr(ts)) == SimHash64.compute(arr(ts ++ ts))
    }
}
