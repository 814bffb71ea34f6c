package graft.kernel

/** Resolution-normalization math, semantics-identical to the reference's
  * `image_utils` (/root/reference/dots_ocr/utils/image_utils.py:14-63) and
  * constants (/root/reference/dots_ocr/utils/consts.py:1-3).
  *
  * Byte-identity notes (SURVEY.md §7.4 hazard 1):
  *   - CPython `round()` is half-to-even → `math.rint`, NOT `math.round`.
  *   - All intermediate math is IEEE double, exactly as CPython's.
  */
object Geometry {
  val MinPixels: Long = 3136L
  val MaxPixels: Long = 11289600L
  val ImageFactor: Long = 28L
  /** Render clamp from /root/reference/dots_ocr/utils/doc_utils.py:34-36. */
  val MaxRenderSide: Long = 4500L
  val DefaultDpi: Int = 200

  /** Closest multiple of `factor` (ties to even) — `round_by_factor`. */
  def roundByFactor(number: Double, factor: Long): Long =
    math.rint(number / factor).toLong * factor

  /** Smallest multiple of `factor` ≥ number — `ceil_by_factor`. */
  def ceilByFactor(number: Double, factor: Long): Long =
    math.ceil(number / factor).toLong * factor

  /** Largest multiple of `factor` ≤ number — `floor_by_factor`. */
  def floorByFactor(number: Double, factor: Long): Long =
    math.floor(number / factor).toLong * factor

  final case class AspectRatioError(ratio: Double)
      extends RuntimeException(
        s"absolute aspect ratio must be smaller than 200, got $ratio")

  /** `smart_resize(height, width)` → (h_bar, w_bar); both divisible by
    * factor, pixel count within [minPixels, maxPixels], aspect preserved.
    * Mirrors /root/reference/dots_ocr/utils/image_utils.py:29-63 exactly,
    * including the max-pixels re-clamp inside the min-pixels branch. */
  def smartResize(
      height: Long,
      width: Long,
      factor: Long = ImageFactor,
      minPixels: Long = MinPixels,
      maxPixels: Long = MaxPixels): (Long, Long) = {
    val ratio = math.max(height, width).toDouble / math.min(height, width).toDouble
    if (ratio > 200) throw AspectRatioError(ratio)
    var hBar = math.max(factor, roundByFactor(height.toDouble, factor))
    var wBar = math.max(factor, roundByFactor(width.toDouble, factor))
    if (hBar * wBar > maxPixels) {
      val beta = math.sqrt((height.toDouble * width.toDouble) / maxPixels)
      hBar = math.max(factor, floorByFactor(height / beta, factor))
      wBar = math.max(factor, floorByFactor(width / beta, factor))
    } else if (hBar * wBar < minPixels) {
      val beta = math.sqrt(minPixels.toDouble / (height.toDouble * width.toDouble))
      hBar = ceilByFactor(height * beta, factor)
      wBar = ceilByFactor(width * beta, factor)
      if (hBar * wBar > maxPixels) {
        val beta2 = math.sqrt((hBar.toDouble * wBar.toDouble) / maxPixels)
        hBar = math.max(factor, floorByFactor(hBar / beta2, factor))
        wBar = math.max(factor, floorByFactor(wBar / beta2, factor))
      }
    }
    (hBar, wBar)
  }

  /** Page-raster geometry: the reference renders PDF pages at
    * `dpi/72` scale, falling back to 72 dpi when either side would exceed
    * 4500 px (/root/reference/dots_ocr/utils/doc_utils.py:20-39). PyMuPDF
    * pixmap dims are `ceil` of rect × matrix; we reproduce the dimension
    * math without rasterizing. */
  def renderedPageDims(pageWidthPts: Double, pageHeightPts: Double, dpi: Int = DefaultDpi): (Long, Long) = {
    val scale = dpi.toDouble / 72.0
    val w = math.ceil(pageWidthPts * scale).toLong
    val h = math.ceil(pageHeightPts * scale).toLong
    if (w > MaxRenderSide || h > MaxRenderSide)
      (math.ceil(pageWidthPts).toLong, math.ceil(pageHeightPts).toLong)
    else (w, h)
  }
}
