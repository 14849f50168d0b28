package graft.scratch

/** One-shot generator for the committed JPEG-luma golden
  * (`src/test/resources/golden/jpeg_luma_24x16.txt`) — the t18
  * golden-pinning pattern applied to the lossy codec path. Run after a
  * DELIBERATE codec change only; a silent drift is exactly what the
  * spec exists to catch.
  */
object GenJpegGolden {
  def main(args: Array[String]): Unit = {
    val key = "graft-jpeg-golden-v1"
    val (w, h) = (24, 16)
    val rgb = graft.ops.Multimodal.DigestPixels.bytes(key, 3 * w * h)
    val jpeg = graft.ops.Multimodal.rgbPng(w, h, rgb, format = "jpg")
    val (dw, dh, px) = graft.ops.Multimodal.decodeGray(jpeg)
    require(dw == w && dh == h)
    val out = java.nio.file.Paths.get(
      "src/test/resources/golden/jpeg_luma_24x16.txt")
    java.nio.file.Files.write(out,
      px.mkString(",").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${out.toAbsolutePath} (${px.length} lumas)")
  }
}
