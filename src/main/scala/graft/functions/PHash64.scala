package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 63-bit perceptual hash (pHash) of a media payload — the
  * re-encode-robust signature behind `mm_phash_dct` (reference intent:
  * near-duplicate media detection; cf. the DCT hash of Zauner,
  * "Implementation and Benchmarking of Perceptual Image Hash Functions",
  * 2010, and the classic pHash.org scheme):
  *
  *   1. DECODE SEAM (stub): a real image decoder would emit the 32×32
  *      grayscale luma plane here; absent codecs in this container, the
  *      plane tiles the payload bytes row-major (`pix(p) = payload(p mod
  *      len)`), so byte-level edits perturb few pixels and the hash
  *      demonstrably survives them (spec-pinned). A real decoder drops
  *      into [[PHash64.plane]] without touching anything downstream.
  *   2. 2-D DCT-II of the plane, SEPARABLE and truncated: only the 8
  *      lowest frequencies per axis are computed (8·32·32 + 8·8·32
  *      multiplies, not 32⁴).
  *   3. The 8×8 low-frequency block minus the DC term = 63 AC
  *      coefficients; bit (u·8+v−1) is set iff F(u,v) exceeds the LOWER
  *      MEDIAN (32nd smallest) of the 63.
  *
  * The DCT runs in Q14 FIXED-POINT INTEGER arithmetic (cosines
  * pre-scaled by 2¹⁴ and rounded once, per-axis α(u) normalization
  * dropped — it only rescales rows, and the hash compares against an
  * order statistic). Integers rather than doubles is a deliberate
  * production choice, not a shortcut: signatures must be bit-identical
  * across JVMs, libm versions, and engines for a distributed dedup to be
  * re-runnable, and the exactness is what lets the DuckDB oracle (the
  * cosine table embedded as literals) replay the hash bit-for-bit.
  * Magnitudes: |pix| ≤ 255, |C| ≤ 2¹⁴ ⇒ |g| ≤ 1.4e8, |F| ≤ 7.1e13 —
  * Long headroom everywhere, ANSI-safe. 63 bits also keeps the sign bit
  * clear, so the signature is an ordinary non-negative BIGINT in both
  * engines and rides the shared 16-bit piece-blocked pair machinery
  * (pigeonhole-exact for hamming ≤ 3) unchanged.
  *
  * Codegen: a static call, so the projection stays inside whole-stage
  * codegen. Null payload → null (quarantine upstream); the empty
  * payload is rejected by the caller (a 0-byte image is not decodable).
  */
case class PHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else PHash64.hash(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PHash64$$.MODULE$$.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PHash64 = copy(child = newChild)
}

object PHash64 {
  private val N = 32
  private val K = 8 // low-frequency block edge

  /** Q14 cosine table: cosQ14(u)(x) = round(2¹⁴ · cos((2x+1)uπ/64)),
    * u < 8, x < 32. Built once per JVM from libm cos, then FROZEN into
    * integers — all downstream arithmetic is exact, and the oracle
    * generator embeds these very values as SQL literals. */
  val cosQ14: Array[Array[Long]] = Array.tabulate(K, N)((u, x) =>
    math.round(math.cos(((2 * x + 1) * u * math.Pi) / (2.0 * N)) * 16384.0))

  /** Decode seam: payload bytes → 32×32 luma plane (row-major). */
  private def plane(payload: Array[Byte], f: Array[Int]): Unit = {
    val len = payload.length
    var i = 0
    while (i < N * N) {
      f(i) = payload(i % len) & 0xff
      i += 1
    }
  }

  def hash(payload: Array[Byte]): Long = {
    if (payload.length == 0) return 0L // callers filter; defensive only
    val f = new Array[Int](N * N)
    plane(payload, f)
    // row pass: g(u, y) = Σ_x f(y·32 + x) · C(u, x), u < 8
    val g = new Array[Long](K * N)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < K) {
        val cu = cosQ14(u)
        var s = 0L
        var x = 0
        while (x < N) { s += f(y * N + x) * cu(x); x += 1 }
        g(u * N + y) = s
        u += 1
      }
      y += 1
    }
    // column pass: F(u, v) = Σ_y g(u, y) · C(v, y), v < 8
    val ac = new Array[Long](K * K - 1)
    val fuv = new Array[Long](K * K)
    var u = 0
    while (u < K) {
      var v = 0
      while (v < K) {
        val cv = cosQ14(v)
        var s = 0L
        var yy = 0
        while (yy < N) { s += g(u * N + yy) * cv(yy); yy += 1 }
        fuv(u * K + v) = s
        v += 1
      }
      u += 1
    }
    System.arraycopy(fuv, 1, ac, 0, K * K - 1) // drop DC = F(0,0)
    // lower median (32nd smallest of 63) as the bit threshold
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val thr = sorted(31)
    var sig = 0L
    var b = 0
    while (b < K * K - 1) {
      if (ac(b) > thr) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column API: 63-bit DCT pHash of a binary payload column. */
  def phash(c: Column): Column =
    GraftBridge.column(PHash64(GraftBridge.expression(c.cast("binary"))))
}
