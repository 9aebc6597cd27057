package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope): treat image/audio/video
  * payloads as opaque BINARY columns with typed metadata, and run the
  * decode / feature-extract / resize / frame-sample stages as columnar
  * transforms.
  *
  * The decode step itself is STUBBED — this container has no image/audio
  * codecs (zero egress), so `fakeEmbedding` derives a deterministic
  * pseudo-feature vector from payload bytes where a real deployment would
  * call a decoder. Everything AROUND the stub is real and tested: binary
  * schemas, magic-byte sniffing, byte-range frame sampling, truncation,
  * batch shapes, and the handoff into the vector operators (the fake
  * embedding is ANN-ready `array<double>`). All transforms are built-in
  * expressions (substring/hex/xxhash64/transform), so the whole path stays
  * inside whole-stage codegen — no UDFs, no driver-side loops, safe at any
  * scale.
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

  /** STUB feature extractor: deterministic pseudo-embedding in [-1, 1]^dim
    * derived from payload bytes (`xxhash64(bin, slot)` per slot). Replace
    * with a real decoder+model in deployment; the signature — binary in,
    * dense `array<double>` out, one row per payload — is the contract the
    * downstream similarity operators (VectorOps / llm_ann_ivf) consume.
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
}
