package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec path for the multimodal operators — `javax.imageio`
  * ships with the JDK (PNG/BMP/GIF encode+decode, zero external jars), so
  * the decode step of the image pipeline is an actual codec round-trip
  * (zlib inflate, filter reconstruction, CRC checks), not a byte-derived
  * stub. JPEG/WAV/MP4 remain stubbed in [[Multimodal.decodeFeaturesStub]]
  * because those codecs genuinely don't exist in this container.
  *
  * Determinism contract for the oracle: the synthetic corpus PNG's pixels
  * are a pure integer function of (doc_id, x, y) ([[synthPixel]]), and PNG
  * is LOSSLESS — decode(encode(pixels)) == pixels bit-for-bit regardless of
  * encoder settings — so the DuckDB oracle mirrors features computed from
  * decoded pixels by recomputing the pixel function directly, never touching
  * PNG bytes. The reference analog is the grid reader decoding real rasters
  * rather than faking them (/root/reference/functions/IO/netcdf_util.r:154-488).
  */
object PngCodec {

  /** Deterministic RGB pixel for the synthetic corpus image: linear
    * congruences mod 256 — trivially mirrored in SQL
    * (OracleSql.qMmEmbed generates the same three formulas).
    */
  def synthPixel(d: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((7 * d + 3 * x + 5 * y) % 256).toInt,
    ((11 * d + 13 * x + 17 * y) % 256).toInt,
    ((19 * d + 23 * x + 29 * y) % 256).toInt)

  /** A real, spec-valid PNG whose pixels are [[synthPixel]](docId, ·, ·). */
  def synthPng(docId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = synthPixel(docId, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded-image band features: width, height, and per-horizontal-band
    * integer sums of (r + g + b) — the pooled "global feature" shape of an
    * image embedding, kept in exact integer space so the SQL oracle is
    * bit-identical. Band of row y = y·nBands/height (floor).
    */
  final case class ImageBands(width: Int, height: Int, bandSums: Array[Long])

  def decodeBands(bytes: Array[Byte], nBands: Int): ImageBands = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](nBands)
    var y = 0
    while (y < h) {
      val band = math.min(y * nBands / h, nBands - 1)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sums(band) += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    ImageBands(w, h, sums)
  }
}
