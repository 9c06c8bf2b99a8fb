package graft.embed

import graft.vec.VectorOps

/** Text/image → unit-vector embedding, the reference's CLIP boundary
  * (`rclip_server.py:176-188`). CLIP itself is not available offline, so
  * the engine treats embedding as a pluggable port:
  *
  *   - [[DeterministicEmbedder]] — seeded token-hash unit vectors; a pure
  *     function of the input text, stable across JVMs (String.hashCode and
  *     java.util.Random are both spec-fixed). Used for tests and oracles.
  *   - `TableEmbedder` (graft.engine) — looks terms up in a precomputed
  *     word-vector table, mirroring the reference's own words.sqlite3
  *     pattern (`rclip_server.py:292-308`).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embedText(text: String): Array[Float]
  def embedImage(bytes: Array[Byte]): Array[Float]
}

/** Deterministic stand-in for CLIP: each token maps to a seeded Gaussian
  * unit vector; a text embeds as the L2-normalized sum of its token
  * vectors (the same shape as the reference's phrase estimate,
  * `rclip_server.py:314-318`).
  */
final class DeterministicEmbedder(val dim: Int = 64) extends Embedder {

  def tokenVector(token: String): Array[Float] = {
    // Stable 64-bit seed from the token (String.hashCode is spec'd; the
    // golden-ratio multiplier decorrelates nearby hashes).
    val seed = token.toLowerCase.hashCode.toLong * 0x9E3779B97F4A7C15L + dim
    val rnd = new java.util.Random(seed)
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) { v(i) = rnd.nextGaussian().toFloat; i += 1 }
    VectorOps.normalize(v)
  }

  override def embedText(text: String): Array[Float] = {
    val tokens = tokenize(text)
    if (tokens.isEmpty) new Array[Float](dim)
    else VectorOps.normalize(
      tokens.map(tokenVector).reduce(VectorOps.add))
  }

  /** Images embed from a content hash — deterministic fake for the CLIP
    * image encoder (`rclip_server.py:183-188`). */
  override def embedImage(bytes: Array[Byte]): Array[Float] = {
    val h = java.util.Arrays.hashCode(bytes)
    tokenVector(s"img:$h")
  }

  def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
}
