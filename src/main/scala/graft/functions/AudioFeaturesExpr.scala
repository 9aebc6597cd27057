package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** REAL audio decode → fixed-width feature vector, the WAV half of the
  * round-10 "make one modality's decode real" item: `javax.sound.sampled`
  * ships with the JDK and decodes RIFF/WAVE (PCM and a-law/µ-law via
  * conversion), AIFF and AU with zero extra dependencies.
  *
  * Input: BINARY payload. Output: `array<double>` of length
  * [[AudioFeaturesExpr.Dim]] —
  *   [n_channels, sample_rate_hz, n_frames, duration_s,
  *    mean, rms, peak, zero_crossing_rate]
  * where the four signal moments are computed over channel-averaged
  * samples normalized to [-1, 1]; NULL when no JDK codec decodes the
  * payload (mp3/flac/ogg payloads keep `Multimodal.fakeEmbedding` as
  * their documented stand-in).
  *
  * Same escalation tier and scale shape as [[ImageFeaturesExpr]]: a codec
  * cannot be expressed with built-ins, the expression compiles to one
  * static call so surrounding operators stay in whole-stage codegen, and
  * the work is a per-row, state-free, driver-free map — ZERO shuffles at
  * any corpus size.
  *
  * Determinism: PCM WAV decode is bit-exact (integer samples read from the
  * container), so the features are exact and spec-pinned — MultimodalSpec
  * synthesizes known-sample WAVs with `AudioSystem.write` and asserts
  * bit-exact doubles against the same arithmetic.
  */
case class AudioFeaturesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_features expects a binary input, got ${other.simpleString}")
  }

  /** NULL for undecodable payloads over non-null input — the try_cast /
    * from_json best-effort contract, same as ImageFeaturesExpr.
    */
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    AudioFeaturesExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.AudioFeaturesExpr.compute($b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioFeaturesExpr =
    copy(child = newChild)
}

object AudioFeaturesExpr {
  val Dim = 8

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val fmt = in.getFormat
      // Normalize to signed 16-bit PCM: covers unsigned-8-bit and
      // a-law/µ-law sources through the JDK's own converters, and gives a
      // single exact integer sample path below.
      val pcmFmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        fmt.getSampleRate, 16, fmt.getChannels,
        2 * fmt.getChannels, fmt.getSampleRate, false)
      val pcm =
        if (fmt.matches(pcmFmt)) in
        else AudioSystem.getAudioInputStream(pcmFmt, in)
      val ch = pcmFmt.getChannels
      val frameBytes = pcmFmt.getFrameSize
      val data = pcm.readAllBytes()
      val nFrames = data.length / frameBytes
      if (nFrames == 0) return null
      var sum = 0.0; var sum2 = 0.0; var peak = 0.0
      var zc = 0L; var prevSign = 0
      var f = 0
      while (f < nFrames) {
        // Channel-average the frame; little-endian signed 16-bit.
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val o = f * frameBytes + 2 * c
          val s = ((data(o) & 0xff) | (data(o + 1) << 8)).toShort
          acc += s / 32768.0
          c += 1
        }
        val x = acc / ch
        sum += x; sum2 += x * x
        val ax = math.abs(x)
        if (ax > peak) peak = ax
        val sign = if (x > 0.0) 1 else if (x < 0.0) -1 else 0
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) zc += 1
          prevSign = sign
        }
        f += 1
      }
      new GenericArrayData(Array[Double](
        ch.toDouble, pcmFmt.getSampleRate.toDouble, nFrames.toDouble,
        nFrames / pcmFmt.getSampleRate.toDouble,
        sum / nFrames, math.sqrt(sum2 / nFrames), peak,
        if (nFrames > 1) zc.toDouble / (nFrames - 1) else 0.0))
    } catch { case _: Exception => null }
    finally in.close()
  }
}
