package graft.tools

import graft.operators.Avi
import graft.queries.QueryHelpers

/** Pin generator for the q_media_mjpeg_frames oracle: builds each of the
  * 12 MJPEG fixture classes (QueryHelpers.mjpegClassBytes — the SAME
  * builder the fixture uses, so the two cannot drift), decodes through
  * the production path (Avi.parseAvi + decodeMjpegFrameStats), and prints
  * the SQL VALUES rows the oracle embeds as literals. JPEG is lossy, so
  * the decoded stats cannot be formula-replayed — the pins, regenerated
  * with `sbt "runMain graft.tools.MjpegOraclePin"`, are the decode
  * contract for the JDK in use (deterministic per JDK codec).
  *
  * AviSpec re-derives these pins on the RUNNING JDK and compares them to
  * the oracle literals, so a JDK/codec upgrade self-diagnoses as "codec
  * changed — regenerate pins" in the spec run instead of surfacing as an
  * opaque gate hash mismatch that looks like an operator regression
  * (r19 ADVICE).
  */
object MjpegOraclePin {

  /** (cls, frame_idx, px_sum, x_moment, y_moment) for all 12 fixture
    * classes, decoded by the JVM running THIS call.
    */
  def pins(): Seq[(Int, Int, Long, Long, Long)] =
    (0 until 12).flatMap { cls =>
      val bytes = QueryHelpers.mjpegClassBytes(cls.toLong)
      val (meta, frames) = Avi.parseAvi(bytes).getOrElse(
        sys.error(s"class $cls: synthesized AVI failed to parse"))
      require(meta.compression == Avi.MjpgFourcc, s"class $cls: not MJPG")
      frames.zipWithIndex.map { case (fb, i) =>
        val (s, xm, ym) = Avi
          .decodeMjpegFrameStats(fb, meta.width.toInt, meta.height.toInt)
          .getOrElse(sys.error(s"class $cls frame $i: JPEG decode failed"))
        (cls, i, s, xm, ym)
      }
    }

  def main(args: Array[String]): Unit =
    pins().foreach { case (cls, i, s, xm, ym) =>
      println(s"($cls, $i, $s, $xm, $ym),")
    }
}
