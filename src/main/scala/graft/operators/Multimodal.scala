package graft.operators

import java.security.MessageDigest

/** Multimodal (binary-column) pipeline plumbing.
  *
  * Media assets are opaque `binary` payloads + typed metadata columns,
  * processed with typed `Dataset.mapPartitions` — the Scala-native
  * equivalent of `mapInPandas`: per-PARTITION setup (codec/model
  * handle) amortized over a batch iterator of rows, so at 100 TB each
  * executor core initializes its decoder once per input split, not per
  * row, and batches stream through without materializing the partition.
  *
  * REAL here: the schemas, the typed encoders, the partition/batch
  * shape, the per-partition resource lifecycle. STUBBED here: the
  * actual media codec — this container has no image/audio libraries,
  * so `decode` is a DETERMINISTIC FAKE that derives "decoded" metadata
  * from an md5 of the payload (which also makes the whole pipeline
  * DuckDB-oracle-checkable). Swap [[FakeCodec]] for a real codec
  * binding to productionize; nothing else changes.
  */
object Multimodal {

  /** An opaque media asset: id + modality tag + raw bytes. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  /** "Decoded" header metadata (what a real codec would parse). */
  final case class Decoded(asset_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, checksum: String)

  /** Fixed-shape per-asset features: 8-bucket byte histogram (what a
    * real pipeline would get from a vision/audio model) + a
    * stride-16 "frame sample" digest.
    */
  final case class Features(asset_id: Long, f0: Long, f1: Long, f2: Long,
                            f3: Long, f4: Long, f5: Long, f6: Long, f7: Long,
                            sample_md5: String)

  /** The stub codec. A real implementation would wrap e.g. libjpeg /
    * ffmpeg here; the deterministic fake keeps every downstream number
    * reproducible in SQL (md5-derived).
    */
  final class FakeCodec {
    private val md = MessageDigest.getInstance("MD5")

    def md5Hex(bytes: Array[Byte]): String = {
      md.reset()
      md.digest(bytes).map("%02x".format(_)).mkString
    }

    /** FAKE decode: "parses" width/height from the content digest. */
    def decode(a: Asset): Decoded = {
      val hex = md5Hex(a.payload)
      val width = 16 + Integer.parseInt(hex.substring(0, 4), 16) % 1024
      val height = 16 + Integer.parseInt(hex.substring(4, 8), 16) % 1024
      Decoded(a.asset_id, a.kind, a.payload.length, width, height, hex)
    }

    /** FAKE feature extraction: 8-bucket byte histogram over explicit
      * ASCII classes (a-e, f-j, k-o, p-t, u-z, space, digit, other —
      * classes chosen so the oracle can mirror them as regex counts)
      * and a stride-16 byte sample digest ("frame sampling").
      */
    def features(a: Asset): Features = {
      val h = new Array[Long](8)
      var i = 0
      while (i < a.payload.length) {
        val b = a.payload(i)
        val bucket =
          if (b >= 'a' && b <= 'e') 0
          else if (b >= 'f' && b <= 'j') 1
          else if (b >= 'k' && b <= 'o') 2
          else if (b >= 'p' && b <= 't') 3
          else if (b >= 'u' && b <= 'z') 4
          else if (b == ' ') 5
          else if (b >= '0' && b <= '9') 6
          else 7
        h(bucket) += 1
        i += 1
      }
      val sampled = Array.range(0, a.payload.length, 16).map(a.payload(_))
      Features(a.asset_id, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7),
        md5Hex(sampled))
    }
  }
}
