package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope): treat image/audio/video
  * payloads as opaque BINARY columns with typed metadata, and run the
  * decode / feature-extract / resize / frame-sample stages as columnar
  * transforms.
  *
  * IMAGE and AUDIO decode are REAL as of round 11: `imageFeatures` runs
  * `javax.imageio` (ships with the JDK — PNG/JPEG/GIF/BMP/WBMP need no
  * external codec) through the codegen expression
  * [[graft.functions.ImageFeaturesExpr]] and emits an exact 10-feature
  * `array<double>` (dimensions, channel means, luminance moments);
  * `audioFeatures` runs `javax.sound.sampled` (WAV/AIFF/AU) through
  * [[graft.functions.AudioFeaturesExpr]] for an exact 8-feature vector
  * (layout, rate, duration, signal moments). Both are NULL for
  * undecodable payloads. Only the modalities with no JDK codec
  * (mp3/flac/matroska) and ML-model embeddings keep the deterministic
  * `fakeEmbedding` stand-in, which preserves the binary-in /
  * dense-`array<double>`-out contract a real deployment would fill with a
  * decoder+model. Everything else is real and tested: binary schemas,
  * magic-byte sniffing, byte-range frame sampling, truncation, batch
  * shapes, and the handoff into the vector operators. All transforms are
  * expressions (built-ins plus the one documented custom decode
  * expression), so the path stays inside whole-stage codegen — no UDFs, no
  * driver-side loops, safe at any scale.
  */
object Multimodal {

  /** Container format from magic bytes (the sniff a real pipeline runs
    * before routing payloads to a decoder).
    */
  def sniffFormat(bin: Column): Column = {
    val prefix = hex(substring(bin, 1, 8)) // uppercase hex, deterministic
    when(prefix.startsWith("89504E47"), "png")
      .when(prefix.startsWith("FFD8FF"), "jpeg")
      .when(prefix.startsWith("47494638"), "gif")
      .when(prefix.startsWith("52494646"), "riff") // wav/avi/webp family
      .when(prefix.startsWith("664C6143"), "flac")
      .when(prefix.startsWith("1A45DFA3"), "matroska") // mkv/webm
      .otherwise("unknown")
  }

  /** Typed metadata struct for an opaque payload column. */
  def meta(bin: Column): Column = struct(
    length(bin).as("n_bytes"),
    sniffFormat(bin).as("format"),
    xxhash64(bin).as("checksum"),
    hex(substring(bin, 1, 8)).as("prefix_hex"))

  /** REAL image feature extraction via the JDK's ImageIO — see
    * [[graft.functions.ImageFeaturesExpr]] for the feature layout, the
    * determinism contract, and the 100 TB shape (pure map stage, zero
    * shuffles). NULL for payloads no JDK codec decodes.
    */
  def imageFeatures(bin: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.ImageFeaturesExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(bin)))

  /** REAL audio feature extraction via the JDK's javax.sound.sampled —
    * WAV/AIFF/AU; see [[graft.functions.AudioFeaturesExpr]] for the
    * feature layout and determinism contract. NULL for payloads no JDK
    * codec decodes (mp3/flac/ogg).
    */
  def audioFeatures(bin: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.AudioFeaturesExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(bin)))

  /** STUB feature extractor: deterministic pseudo-embedding in [-1, 1]^dim
    * derived from payload bytes (`xxhash64(bin, slot)` per slot). Still the
    * documented stand-in for the modalities with no JDK codec (mp3, flac,
    * matroska) and for ML-model embeddings; images and WAV-family audio
    * have the real `imageFeatures` / `audioFeatures` paths above. The
    * signature — binary in, dense `array<double>` out, one row per
    * payload — is the contract the downstream similarity operators
    * (VectorOps / llm_ann_ivf) consume.
    */
  def fakeEmbedding(bin: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (xxhash64(bin, i).cast("double") / lit(Long.MaxValue.toDouble)))

  /** Frame sampling as byte-range slices: n evenly-spaced fixed-width
    * windows over the payload (a real video pipeline samples keyframes;
    * the slicing/batching mechanics are identical).
    */
  def frameSample(bin: Column, n: Int, frameBytes: Int): Column =
    filter(
      transform(sequence(lit(0), lit(n - 1)),
        i => substring(bin, (i * greatest(length(bin) / n, lit(1)) + 1).cast("int"),
          lit(frameBytes))),
      f => length(f) > 0)

  /** Resize/truncate stub: cap payload size (a real pipeline re-encodes;
    * the byte-budget contract is the same).
    */
  def truncateBytes(bin: Column, maxBytes: Int): Column =
    substring(bin, 1, maxBytes)

  /** Full ingestion shape: opaque payloads → metadata + stub features.
    * `df` must carry `binCol`; adds `meta` struct and `embedding`.
    */
  def enrich(df: DataFrame, binCol: String, dim: Int = 16): DataFrame =
    df.withColumn("meta", meta(col(binCol)))
      .withColumn("embedding", fakeEmbedding(col(binCol), dim))

  /** Image ingestion with REAL decode: `enrich` plus an `image_features`
    * column (exact decoded features for JDK-codec payloads, NULL
    * otherwise). Kept as a separate column rather than coalesced into
    * `embedding`: the two vectors have different dimensions and different
    * provenance (decoded pixels vs deterministic stand-in), and silently
    * mixing them would poison any downstream ANN index.
    */
  def enrichImages(df: DataFrame, binCol: String, dim: Int = 16): DataFrame =
    enrich(df, binCol, dim)
      .withColumn("image_features", imageFeatures(col(binCol)))
}
