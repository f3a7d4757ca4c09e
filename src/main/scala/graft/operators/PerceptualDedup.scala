package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared banded perceptual-dup rule for 64-bit difference hashes
  * (images: [[graft.functions.BmpDhash]]; audio:
  * [[graft.functions.WavEnergyHash]]): a probe row is a duplicate when
  * its hash is within `maxDist` Hamming of ANY standing row, or of a
  * probe peer with a SMALLER id (d34's first-arrival rule). One
  * definition consumed by both the declared incremental batch query
  * (d83) and the streaming ingest gate ([[graft.streaming
  * .StreamImageDedup]]) — the two cannot drift.
  *
  * Candidate generation is 4×16-bit banding, EXACT by pigeonhole for
  * `maxDist` < 4: every qualifying pair shares an intact band, so the
  * bit_count verify loses nothing. NULL hashes (unparseable assets)
  * produce NULL band keys and never match — callers decide what
  * pass-through means for them. The hamming operands ride null-tolerant
  * coalesce so constraint inference cannot push an isnotnull(decode)
  * filter below the callers' materialization barriers (d78's planning
  * lesson, pinned there).
  *
  * Input frames carry (id: bigint, hash: bigint nullable); only those
  * two columns shuffle — 16 bytes a row at any corpus size.
  */
object PerceptualDedup {

  private def bandsOf(h: DataFrame): DataFrame =
    h.select(col("id"), col("hash"),
      posexplode(expr(
        "transform(sequence(0, 3), t -> shiftright(hash, t * 16) & 65535L)"))
        .as(Seq("band", "key")))

  /** Distinct ids of `probe` rows the rule marks duplicate. */
  def dupIds(probe: DataFrame, standing: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 4,
      s"banded exactness needs maxDist < 4 (bands), got $maxDist")
    val pb = bandsOf(probe)
    val sb = bandsOf(standing)
    val ok = s"bit_count(coalesce(d.hash, 0L) ^ coalesce(s.hash, 0L))" +
      s" <= $maxDist"
    val vsStanding = pb.as("d")
      .join(sb.as("s"),
        col("d.band") === col("s.band") && col("d.key") === col("s.key"))
      .filter(expr(ok))
      .select(col("d.id"))
    val inProbe = pb.as("d")
      .join(pb.as("s"),
        col("d.band") === col("s.band") && col("d.key") === col("s.key") &&
          col("s.id") < col("d.id"))
      .filter(expr(ok))
      .select(col("d.id"))
    vsStanding.unionByName(inProbe).distinct()
  }
}
