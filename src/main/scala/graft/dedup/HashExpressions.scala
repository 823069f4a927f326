package graft.dedup

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for the signature kernels (MinHash-128,
  * SimHash-64, LSH band hashing) — the same upgrade [[JaccardSorted]] gave
  * the verify kernel: generated code calls an allocation-light kernel
  * straight on Tungsten `ArrayData`, skipping the per-element boxing and
  * Seq conversion a ScalaUDF pays on every row. On the 1.5M-file bench
  * corpus the UDF versions spent a large share of the signatures stage in
  * allocation + GC (which also distorts scaling legs: GC threads borrow
  * host cores beyond the measured worker count).
  *
  * Semantics are IDENTICAL to the scala kernels in [[MinHash]] / [[SimHash]]
  * (asserted by the test suite): h_i(x) = (a_i x + b_i) mod (2^31 - 1)
  * min-folded per permutation; SplitMix64-mixed sign votes per bit.
  */
object HashKernels {
  val P: Long = (1L << 31) - 1

  final class MinHashKernel(numPerms: Int, seed: Long) extends Serializable {
    private val coef = MinHash.coefficients(numPerms, seed)
    private val as = coef._1
    private val bs = coef._2

    def signature(tokens: ArrayData): ArrayData = {
      val k = as.length
      val sig = new Array[Long](k)
      java.util.Arrays.fill(sig, Long.MaxValue)
      val n = tokens.numElements()
      var t = 0
      while (t < n) {
        val x = tokens.getInt(t).toLong & 0x7fffffffL
        var i = 0
        while (i < k) {
          // exact (a*x + b) mod 2^31-1 via Mersenne folding (2^31 ≡ 1):
          // v < 2^62, two folds + conditional subtract replace the hardware
          // division `%` costs — this loop runs perms × tokens times per doc
          // and dominated the signatures stage CPU profile
          val v = as(i) * x + bs(i)
          val f1 = (v & P) + (v >>> 31)
          var h = (f1 & P) + (f1 >>> 31)
          if (h >= P) h -= P
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        t += 1
      }
      // every value is an exact residue mod 2^31-1, so the signature ships
      // as array<int> — HALF the bytes of round 3's array<long> through the
      // signatures checkpoint and the candidates scan; band hashes are
      // bit-identical because the long values were zero-extended ints.
      // EXCEPTION: an EMPTY token array leaves the Long.MaxValue init
      // sentinel in every slot, which narrows to -1 (not a residue) — empty
      // docs must be filtered upstream (Pipeline drops size==0 sig_tokens;
      // Vocabulary.encode drops n_tokens==0 docs), and a -1-signature doc
      // would only ever bucket with other empty docs anyway
      val out = new Array[Int](k)
      var j = 0
      while (j < k) { out(j) = sig(j).toInt; j += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  final class SimHashKernel(seed: Long) extends Serializable {
    def simhash(tokens: ArrayData): Long = {
      val votes = new Array[Int](64)
      val n = tokens.numElements()
      var t = 0
      while (t < n) {
        val h = SimHash.mix64(tokens.getInt(t).toLong ^ seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        t += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** Sorted-set difference: drop the (sorted, small) `drop` ids from a
    * sorted token array — two-pointer merge, O(|tokens| + |drop|). Replaces
    * `array_except(tokens, lit(hot))`, whose codegen rebuilds a hash set
    * from the literal array on EVERY row (O(|hot|) per row — with a few
    * hundred hot ids that was several times the row's own work). */
  final class SortedDiffKernel(drop: Array[Int]) extends Serializable {
    def diff(tokens: ArrayData): ArrayData = {
      val n = tokens.numElements()
      val out = new Array[Int](n)
      var k = 0
      var j = 0
      var i = 0
      while (i < n) {
        val x = tokens.getInt(i)
        while (j < drop.length && drop(j) < x) j += 1
        if (j >= drop.length || drop(j) != x) { out(k) = x; k += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(
        if (k == n) out else java.util.Arrays.copyOf(out, k)
      )
    }
  }

  final class BandHashKernel(bands: Int, rows: Int) extends Serializable {
    def bandHashes(sig: ArrayData): ArrayData = {
      val out = new Array[Long](bands)
      var band = 0
      while (band < bands) {
        var h = 0x9e3779b97f4a7c15L * (band + 1)
        var i = band * rows
        val end = i + rows
        while (i < end) {
          // int signature values are non-negative residues: toLong equals
          // the round-3 long representation bit-for-bit
          h ^= sig.getInt(i).toLong
          h *= 0xbf58476d1ce4e5b9L
          h ^= (h >>> 31)
          i += 1
        }
        out(band) = h
        band += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }
}

private[dedup] trait ArrayArgExpression extends UnaryExpression {
  protected def elementType: DataType
  protected def name: String
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == elementType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$name expects array<$elementType>, got $other")
    }
}

/** array<int> token ids -> array<int> MinHash signature (residues mod
  * 2^31-1 always fit). */
case class MinHashSig(child: Expression, numPerms: Int, seed: Long) extends ArrayArgExpression {
  override protected def elementType: DataType = IntegerType
  override protected def name: String = prettyName
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val kernel = new HashKernels.MinHashKernel(numPerms, seed)

  override def nullSafeEval(t: Any): Any = kernel.signature(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashKernel", kernel, classOf[HashKernels.MinHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.signature($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** array<int> token ids -> 64-bit SimHash. */
case class SimHash64(child: Expression, seed: Long) extends ArrayArgExpression {
  override protected def elementType: DataType = IntegerType
  override protected def name: String = prettyName
  override def dataType: DataType = LongType
  @transient private lazy val kernel = new HashKernels.SimHashKernel(seed)

  override def nullSafeEval(t: Any): Any = kernel.simhash(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashKernel", kernel, classOf[HashKernels.SimHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.simhash($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** array<int> signature -> array<long> of per-band bucket hashes. */
case class BandHashes(child: Expression, bands: Int, rows: Int) extends ArrayArgExpression {
  override protected def elementType: DataType = IntegerType
  override protected def name: String = prettyName
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val kernel = new HashKernels.BandHashKernel(bands, rows)

  override def nullSafeEval(t: Any): Any = kernel.bandHashes(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandHashKernel", kernel, classOf[HashKernels.BandHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.bandHashes($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "band_hashes"
}

/** array<int> (sorted asc) minus a constant sorted id set. */
case class ArrayExceptSorted(child: Expression, drop: Array[Int]) extends ArrayArgExpression {
  override protected def elementType: DataType = IntegerType
  override protected def name: String = prettyName
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val kernel = new HashKernels.SortedDiffKernel(drop)

  override def nullSafeEval(t: Any): Any = kernel.diff(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedDiffKernel", kernel, classOf[HashKernels.SortedDiffKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.diff($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "array_except_sorted"
}

object ArrayExceptSorted {
  def apply(tokens: Column, drop: Array[Int]): Column =
    GraftBridge.column(ArrayExceptSorted(GraftBridge.expression(tokens), drop))
}

object MinHashSig {
  def apply(tokens: Column, cfg: Config): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(tokens), cfg.numPerms, cfg.seed))
}

object SimHash64 {
  def apply(tokens: Column, cfg: Config): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens), cfg.seed))
}

object BandHashes {
  def apply(sig: Column, cfg: Config): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(sig), cfg.bands, cfg.rowsPerBand))
}
