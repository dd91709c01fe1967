package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{Deflater, GZIPInputStream, GZIPOutputStream}

/** JVM-side gzip kernels referenced from codegen (static calls keep
  * the expressions inside WholeStageCodegen).
  *
  * Mirrors the reference's compress policy
  * (/root/reference/watchdog/lib/compress/compress.go): BestSpeed
  * gzip, only for content > 1KiB whose extension isn't already a
  * compressed format.
  */
object GzipCodec {
  final val GzipMinLength = 1024L
  /** extensions that are already compressed (compress.go:12) */
  final val NoCompressExt = "(jpg|jpeg|gif|png|wmv|flv|zip|gz)$"

  def gzip(in: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(in.length / 2 + 64)
    val gz = new GZIPOutputStream(bos) {
      `def`.setLevel(Deflater.BEST_SPEED)
    }
    gz.write(in); gz.close()
    bos.toByteArray
  }

  def gunzip(in: Array[Byte]): Array[Byte] = {
    val gz = new GZIPInputStream(new ByteArrayInputStream(in))
    val bos = new ByteArrayOutputStream(in.length * 2 + 64)
    val buf = new Array[Byte](8192)
    var n = gz.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = gz.read(buf) }
    gz.close()
    bos.toByteArray
  }
}
