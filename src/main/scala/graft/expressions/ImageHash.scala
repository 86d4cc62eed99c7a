package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit difference hash (dHash — the standard perceptual image
  * fingerprint for near-duplicate IMAGE detection; Krawetz's classic
  * 9×8-gradient construction) over row-major 8-bit grayscale, in the
  * exact-integer form this repo's oracles require: the image divides into
  * an 8-row × 9-column grid of equal pixel blocks, and bit `r·8 + c` is
  * set iff `blockSum(r, c) > blockSum(r, c + 1)` — block SUMS compared
  * directly, so there is no division, no float resampling kernel, and any
  * engine replays the hash bit-for-bit. (Real dHash implementations
  * compare means of a resampled 9×8 image; equal-size blocks make the
  * mean comparison ≡ the sum comparison, and a deterministic area-sum is
  * the one resample every engine agrees on.)
  *
  * Dimensions must be multiples of 9 (width) and 8 (height) — callers
  * crop/pad to the grid first (the resize stage of the multimodal
  * pipeline); anything else fails loudly rather than hashing a skewed
  * grid. Hamming distance between hashes = perceptual distance; bucket
  * with [[graft.operators.Dedup.hammingNearDup]].
  */
object ImageHash {

  /** The doc-local kernel (one pass over the pixels, no allocation beyond
    * the 72 block sums). */
  def dhash64(pixels: Array[Byte], width: Int, height: Int): Long = {
    require(width > 0 && height > 0 && width % 9 == 0 && height % 8 == 0,
      s"dhash64 needs width % 9 == 0 and height % 8 == 0, got ${width}x$height")
    require(pixels.length == width * height,
      s"dhash64: ${pixels.length} bytes for a ${width}x$height image")
    val bw = width / 9
    val bh = height / 8
    val sums = new Array[Long](72) // row-major 8x9
    var y = 0
    while (y < height) {
      val rBase = (y / bh) * 9
      var x = 0
      while (x < width) {
        sums(rBase + x / bw) += pixels(y * width + x) & 0xFF
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (sums(r * 9 + c) > sums(r * 9 + c + 1))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }
}

/** 64-bit energy-envelope fingerprint over little-endian PCM16 audio — the
  * audio analogue of [[ImageHash.dhash64]] (the Haitsma–Kalker family's
  * sign-of-energy-difference construction, restricted to the time axis so
  * it stays exact-integer): the signal divides into 65 equal frames, frame
  * energy `E(f) = Σ s²` over the frame's samples (exact longs — a sample²
  * is ≤ 2³⁰), and bit `f` is set iff `E(f) > E(f+1)`. No FFT, no float
  * window — the one envelope hash any engine replays bit-for-bit.
  * Sample count must divide into the 65 frames; callers crop first
  * (loud failure otherwise). Bucket with
  * [[graft.operators.Dedup.hammingNearDup]].
  */
object AudioHash {
  val Frames = 65

  def energyHash64(pcm16le: Array[Byte]): Long = {
    require(pcm16le.length % 2 == 0,
      s"PCM16 needs an even byte count, got ${pcm16le.length}")
    val n = pcm16le.length / 2
    require(n > 0 && n % Frames == 0,
      s"energyHash64 needs samples % $Frames == 0, got $n — crop first")
    val frameLen = n / Frames
    val energy = new Array[Long](Frames)
    var i = 0
    while (i < n) {
      val s = ((pcm16le(2 * i) & 0xFF) | (pcm16le(2 * i + 1) << 8)).toShort
      energy(i / frameLen) += s.toLong * s.toLong
      i += 1
    }
    var hash = 0L
    var f = 0
    while (f < 64) {
      if (energy(f) > energy(f + 1)) hash |= 1L << f
      f += 1
    }
    hash
  }
}

/** [[AudioHash.energyHash64]] as a codegen'd Catalyst expression. */
case class AudioEnergyHash64(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "audio_energy_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    AudioHash.energyHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.AudioHash.energyHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[ImageHash.dhash64]] as a codegen'd Catalyst expression over a binary
  * pixel column (SURVEY.md §7.4 custom path (b) — same discipline as
  * [[MinhashSignature]]).
  */
case class DHash64(child: Expression, imgWidth: Int, imgHeight: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageHash.dhash64(input.asInstanceOf[Array[Byte]], imgWidth, imgHeight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ImageHash.dhash64($c, $imgWidth, $imgHeight)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
