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
  *   1. DECODE: payloads that are well-formed binary NetPBM images —
  *      P5 (grayscale) or P6 (RGB), maxval 255, exact payload length —
  *      are actually PARSED: pixels decode per the format, RGB collapses
  *      to integer luma ((299R+587G+114B) div 1000, the ITU-R 601
  *      weights in exact fixed-point), and the image is nearest-neighbor
  *      resampled to the 32×32 plane (integer index math — the classic
  *      pHash "resize small" step). Everything is pure integer
  *      arithmetic, so the bit-reproducibility guarantee is unchanged.
  *      Any other payload falls back to TILING the bytes row-major
  *      (`pix(p) = payload(p mod len)`) — the documented stand-in for
  *      codecs this container lacks (JPEG etc.), kept so arbitrary
  *      binary media still hashes deterministically; byte-level edits
  *      perturb few pixels and the hash demonstrably survives them
  *      (spec-pinned). A production decoder for compressed formats drops
  *      into [[PHash64.plane]] without touching anything downstream.
  *      The conformance test is strict (magic, whitespace grammar,
  *      1..4096 dims, maxval 255, EXACT length) so no natural text or
  *      fixture payload can parse accidentally — which is also why the
  *      DuckDB oracle's tiled-plane model stays exact on the fixtures;
  *      the PNM path is pinned by a hand-built fixture in
  *      DedupSimilaritySpec, and Verify CHECKS the no-conforming-payload
  *      invariant over the phash corpora per run (round 13) instead of
  *      assuming it.
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
    * u < 8, x < 32. Built once per JVM from StrictMath.cos — fdlibm,
    * bit-identical on every JVM and platform, so the frozen-integer
    * guarantee is STRUCTURAL rather than resting on java.lang.Math's
    * 1-ulp licence happening to land on the same rounding side
    * (review-caught). All downstream arithmetic is exact, and the
    * oracle generator embeds these very values as SQL literals. */
  val cosQ14: Array[Array[Long]] = Array.tabulate(K, N)((u, x) =>
    math.round(StrictMath.cos(((2 * x + 1) * u * math.Pi) / (2.0 * N)) * 16384.0))

  /** Decode seam: payload bytes → 32×32 luma plane (row-major). A
    * strictly-conforming binary PGM/PPM payload is decoded and
    * nearest-neighbor resampled; everything else tiles (see scaladoc). */
  private def plane(payload: Array[Byte], f: Array[Int]): Unit = {
    if (decodePnm(payload, f)) return
    val len = payload.length
    var i = 0
    while (i < N * N) {
      f(i) = payload(i % len) & 0xff
      i += 1
    }
  }

  /** Parsed strict-PNM header: image dims, channel count (1 = P5
    * grayscale, 3 = P6 RGB), and the offset of the first pixel byte. */
  private[graft] final case class PnmHeader(
      width: Int, height: Int, channels: Int, pixelOffset: Int)

  /** Strict binary-NetPBM header parse — the shared conformance test
    * behind both the pHash decode and [[graft.multimodal.Multimodal]]'s
    * metadata decoder. Returns null unless the payload is a byte-exact
    * P5/P6 image: magic, whitespace-separated decimal header fields
    * (with `#` comments, per the published format), dims in [1, 4096],
    * maxval exactly 255, ONE whitespace byte after maxval, and total
    * length exactly header + w·h·channels. The exact-length rule keeps
    * accidental conformance of natural payloads impossible in practice
    * and the decode a pure function of the bytes. (Null rather than
    * Option: this sits under the per-payload hash hot path.) */
  private[graft] def parsePnm(p: Array[Byte]): PnmHeader = {
    if (p == null || p.length < 7 || p(0) != 'P') return null
    val channels = p(1) match {
      case '5' => 1
      case '6' => 3
      case _   => return null
    }
    var i = 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 11 || b == 12
    // read one decimal field, skipping whitespace and '#' comments first;
    // -1 = malformed
    def field(): Int = {
      var guard = true
      while (guard) {
        if (i >= p.length) return -1
        if (isWs(p(i))) i += 1
        else if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else guard = false
      }
      var v = 0
      var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0')
        if (v > (1 << 24)) return -1 // overflow guard
        i += 1
        any = true
      }
      if (any) v else -1
    }
    if (i >= p.length || !isWs(p(i))) return null // magic must end at ws
    val w = field(); val h = field(); val maxv = field()
    if (w < 1 || w > 4096 || h < 1 || h > 4096 || maxv != 255) return null
    if (i >= p.length || !isWs(p(i))) return null // exactly one ws byte
    i += 1
    val need = w.toLong * h * channels
    if (p.length.toLong - i != need) return null
    PnmHeader(w, h, channels, i)
  }

  /** True iff the payload passes the strict PNM conformance test —
    * i.e. [[hash]] would genuinely decode it rather than tile it.
    * Verify's corpus invariant uses this to keep the tiled-model phash
    * oracles honest (advisor-caught: the tiling assumption was
    * unchecked). */
  def conforms(p: Array[Byte]): Boolean = parsePnm(p) != null

  /** Decode a conforming payload + integer nearest-neighbor resample
    * into `f`. Returns false (leaving `f` untouched) on non-conforming
    * payloads; P6 collapses to ITU-R 601 integer luma. */
  private[functions] def decodePnm(p: Array[Byte], f: Array[Int]): Boolean = {
    val hdr = parsePnm(p)
    if (hdr == null) return false
    fillPlane(p, hdr.pixelOffset, hdr.width, hdr.height, hdr.channels, f)
    true
  }

  /** Integer nearest-neighbor resample of a raw interleaved pixel block
    * (`w`×`h`, `channels` bytes per pixel, starting at `off`) into the
    * 32×32 luma plane `f` — the shared "resize small" step (round 14:
    * factored out so a filmstrip FRAME band hashes with the same
    * arithmetic as a whole image, [[hashBand]]). */
  private def fillPlane(p: Array[Byte], off: Int, w: Int, h: Int,
      channels: Int, f: Array[Int]): Unit = {
    var y = 0
    while (y < N) {
      val sy = y * h / N
      var x = 0
      while (x < N) {
        val sx = x * w / N
        val o = off + (sy.toLong * w + sx).toInt * channels
        f(y * N + x) =
          if (channels == 1) p(o) & 0xff
          else ((p(o) & 0xff) * 299 + (p(o + 1) & 0xff) * 587 +
            (p(o + 2) & 0xff) * 114) / 1000
        x += 1
      }
      y += 1
    }
  }

  /** 63-bit pHash of ONE raw pixel band inside a payload — the
    * per-frame variant for decoded filmstrips (round 14): `w`×`h`
    * pixels, `channels` interleaved bytes each, starting at byte `off`.
    * Identical arithmetic to [[hash]]'s decoded path (nearest-neighbor
    * resample to 32×32, Q14 integer DCT, lower-median sign bits), so a
    * frame's signature is a genuine PERCEPTUAL hash: near-identical
    * frames land within a few bits, a content change flips many —
    * which is what makes a scene-cut threshold on the hamming distance
    * measure visual change instead of hash inequality. */
  def hashBand(p: Array[Byte], off: Int, w: Int, h: Int,
      channels: Int): Long = {
    val f = new Array[Int](N * N)
    fillPlane(p, off, w, h, channels, f)
    dctSig(f)
  }

  def hash(payload: Array[Byte]): Long = {
    if (payload.length == 0) return 0L // callers filter; defensive only
    val f = new Array[Int](N * N)
    plane(payload, f)
    dctSig(f)
  }

  /** Q14 separable truncated DCT-II + lower-median sign pack of a
    * 32×32 plane — steps 2–3 of the scaladoc, shared by [[hash]] and
    * [[hashBand]]. */
  private def dctSig(f: Array[Int]): Long = {
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
