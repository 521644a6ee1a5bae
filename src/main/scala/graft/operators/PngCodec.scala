package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

/** REAL image codec path for the multimodal operators — `javax.imageio`
  * ships with the JDK (PNG/BMP/GIF/JPEG encode+decode, zero external jars),
  * so the decode step of the image pipeline is an actual codec round-trip
  * (zlib inflate, filter reconstruction, CRC checks for PNG; huffman decode,
  * dequantization, inverse DCT, YCbCr→RGB for JPEG), not a byte-derived
  * stub. Only MP4/video remains stubbed in
  * [[Multimodal.decodeFeaturesStub]] — the JDK genuinely has no video codec.
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

  /** A real, spec-valid JPEG whose SOURCE pixels are [[synthPixel]](docId,
    * ·, ·), encoded by the JDK's own JPEG writer at an explicit quality
    * (determinism: one fixed encoder + one fixed parameter set).
    *
    * JPEG is LOSSY, so unlike [[synthPng]] the decoded pixels are not the
    * source pixels; the oracle strategy is therefore different — see
    * [[jpegRoundTrip]]: the query asserts decoded-vs-source error bounds
    * whose PASS/FAIL outcome is exactly predictable, and the SQL oracle pins
    * that outcome (plus dims and the sniffed magic) as a hard
    * rows+schema+hash gate on the real decode path.
    */
  def synthJpeg(docId: Long, w: Int, h: Int, quality: Float = 0.9f): Array[Byte] = {
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
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val os = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(os)
      writer.write(null, new IIOImage(img, null, null), p)
      os.flush()
    } finally writer.dispose()
    bos.toByteArray
  }

  /** Decoded-vs-source error metrics for a lossy payload whose source
    * pixels were [[synthPixel]](docId, ·, ·): dims, the per-pixel
    * mean-absolute-error across all channels, and the worst per-band
    * mean error of the (r+g+b) band sums (band rule as [[decodeBands]]).
    *
    * Measured on this JDK's codec at quality 0.9 over the synthetic pixel
    * field: worst per-pixel MAE ≈ 24.8, worst per-band mean error ≈ 3.8 —
    * while a broken decode (zeros, wrong plane order, garbage) reads ≈ 127
    * on both. Tolerances of 48/16 therefore separate "the real inverse-DCT
    * ran" from any failure mode by a wide margin, and the boolean outcome
    * is deterministic, i.e. SQL-oracle-able.
    */
  final case class JpegRoundTrip(width: Int, height: Int,
                                 pixelMae: Double, maxBandErr: Double)

  def jpegRoundTrip(bytes: Array[Byte], docId: Long, nBands: Int): JpegRoundTrip = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    val w = img.getWidth
    val h = img.getHeight
    // pins the supported shape: bandPixels below assumes equal-height
    // bands — with ragged bands the last band would absorb the remainder
    // rows and its error would be divided by the wrong pixel count
    require(h % nBands == 0,
      s"jpegRoundTrip requires height ($h) divisible by nBands ($nBands)")
    val decSum = new Array[Long](nBands)
    val exSum = new Array[Long](nBands)
    var totAbs = 0L
    var y = 0
    while (y < h) {
      val band = math.min(y * nBands / h, nBands - 1)
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val dr = (rgb >> 16) & 0xFF; val dg = (rgb >> 8) & 0xFF; val db = rgb & 0xFF
        val (er, eg, eb) = synthPixel(docId, x, y)
        decSum(band) += dr + dg + db
        exSum(band) += er + eg + eb
        totAbs += math.abs(dr - er) + math.abs(dg - eg) + math.abs(db - eb)
        x += 1
      }
      y += 1
    }
    val bandPixels = (w.toLong * h / nBands) * 3
    val maxBandErr = (0 until nBands)
      .map(b => math.abs(decSum(b) - exSum(b)).toDouble / bandPixels).max
    JpegRoundTrip(w, h, totAbs.toDouble / (w.toLong * h * 3), maxBandErr)
  }

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
