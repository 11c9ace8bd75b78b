package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Money, TextFunctions => TF, VectorFunctions => VF}
import graft.ml.{Heuristic, IntentModel, Recommender, Undersample}
import graft.operators.{AbTest, AsOfJoin, Association, Attribution, Autocorrelation, Avi, Changepoint, Churn, Collocations, Components, Concentration, Cuped, Decontaminate, Dedup, Dispersion, Diversity, Dsir, Featurize, GmmReplay, GopherFilter, GroupCap, HashSplit, IntervalOverlap, IvfReplay, KMeansReplay, LmScore, Mixture, Multimodal, Packing, Pareto, Paths, PiiScrub, QuantileNormalize, RankTest, Repetition, RepetitionCoverage, Rfm, SemanticDedup, SessionConf, Sessionize, Similarity, SourceProfile, Streaks, Tempo, Wavelet, WeightedSample}
import graft.oracles.SharedCtes._
import graft.queries.QueryHelpers._
import graft.sources.Tables
import graft.streaming.SessionWindows

/** One domain section of the SparkEntry.queries map — moved
  * verbatim (keys included) in the r18 split; SparkEntry.queries
  * is the ordered concatenation of the domain objects.
  */
private[graft] object QueriesMultimodal {
  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- multimodal binary-column plumbing (decode step stubbed) ----
    "q_media_meta" -> { (s, d) =>
      Multimodal.mediaMeta(Multimodal.toMediaTable(Tables(s, d).documents))
    },
    // REAL mp4 container metadata via the ISO BMFF box walker: the video
    // rows' fixtures are minimal-but-real mp4 byte streams synthesized
    // from (doc_id, n_chars) — ftyp/moov/mvhd/tkhd boxes the parser must
    // WALK to recover brand/timescale/duration/dimensions; odd doc_ids
    // are truncated mid-ftyp and must come back ok=false with null
    // metadata (bounds-check proof). The oracle predicts both outcomes
    // from the synthesis formulas — a byte-replay twin.
    "q_media_mp4_meta" -> { (s, d) =>
      import s.implicits._
      val vids = Tables(s, d).documents
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
        .as[(Long, Long)]
      val media = vids.map { case (id, nc) =>
        val full = Multimodal.synthMp4(
          brand = "mp42",
          timescale = 600 + (id % 5) * 100,
          duration = nc * 100,
          width = (160 + (id % 32) * 8).toInt,
          height = (90 + (id % 18) * 16).toInt)
        (id, if (id % 2 == 1) full.take(20) else full)
      }.toDF("doc_id", "content")
      Multimodal.mp4Meta(media)
    },
    // REAL video FRAME DECODE, codec-free (operators.Avi): RIFF
    // hdrl/strl/movi walk + uncompressed-DIB bottom-up stride-padded
    // BGR24 frame grids. Fixtures are formula-synthesized real AVIs
    // (odd widths ⇒ 3 pad bytes per row on every file); odd doc_ids are
    // truncated mid-header and must come back ok=false with null
    // metadata (bounds-check proof). Oracles predict both outcomes from
    // the synthesis formulas — byte-replay twins.
    "q_media_avi_meta" -> { (s, d) => Avi.aviMeta(aviFixture(s, d)) },
    // per decoded frame: exact-integer pixel sum + x/y moments — the
    // moments flip under a stride or bottom-up mistake (a plain sum is
    // orientation-invariant), so the oracle pins the DECODE, not just
    // the walk; corrupt rows contribute no frames
    "q_media_avi_frames" -> { (s, d) => Avi.frameStats(aviFixture(s, d)) },
    "q_media_features" -> { (s, d) =>
      val feats = Multimodal.extractFeatures(Multimodal.toMediaTable(Tables(s, d).documents))
      feats.select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
    },
    "q_media_frames" -> { (s, d) =>
      Multimodal.sampleFrames(Multimodal.toMediaTable(Tables(s, d).documents))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    },
    // the image RESIZE plumbing oracled through a lossless round-trip:
    // 4×4 gray image from the first 16 content bytes → real PNG encode →
    // real ImageIO decode → nearest-neighbor 2×2 resize → the four samples
    // must equal bytes 0/2/8/10 exactly (PNG is lossless), so the DuckDB
    // hex replay checks the actual codec + resample per row
    "q_media_resize" -> { (s, d) =>
      Multimodal.resizeSample(Multimodal.toMediaTable(Tables(s, d).documents))
    },
    // dHash perceptual-hash bands per media row (8×9 block grid → 64
    // difference bits → 4×16-bit bands). Image rows dispatch to the real
    // javax.imageio pixel dHash (MultimodalSpec); the driver tables'
    // stand-in bytes fall back to the byte-fold grid, which the oracle
    // replays exactly from the hex dump — all-integer arithmetic
    "q_media_phash" -> { (s, d) =>
      Multimodal.phash(Multimodal.toMediaTable(Tables(s, d).documents))
        .select(col("doc_id"), col("media_type"),
          posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    },
    // perceptual near-dup pairs by pigeonhole banding (the simhashPairs
    // shape on media): planted 1-byte-perturbed twins under negated ids
    // (multiples of 3 only, so pmod/% agree on the media_type dispatch)
    // land within Hamming 2 of their originals — the pairs output proves
    // band-bucket candidates + exact verification end to end
    "q_media_phash_neardup" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id").isin(3, 6, 9))
        .select((-col("doc_id")).as("doc_id"), concat(col("text"), lit("!")).as("text"))
      Multimodal.phashNearDupPairs(Multimodal.toMediaTable(docs.unionByName(planted)))
    },
    // UniMax budget allocation (operators.Unimax): the epoch-capped
    // uniform mixture — one epoch's worth of total chars distributed as
    // uniformly as the 2-epoch caps allow. The waterfill's closed
    // relational form (capped set is a prefix of the cap-ascending order)
    // makes the whole allocation exact BIGINT window arithmetic. The
    // budget probe is a 1-row bounded collect.
    "q_unimax_alloc" -> { (s, d) =>
      val docs = Tables(s, d).documents
      val total = docs.agg(sum(col("n_chars").cast("long"))).collect()(0).getLong(0)
      graft.operators.Unimax.allocate(docs, budget = total, maxEpochs = 2)
    },
    // ---- winnowing fingerprints (MOSS) — position-aware local dedup ----
    // per-doc fingerprint profile over the whole corpus: count, distinct
    // hashes, checksum — the compact audit of the persisted fingerprint
    // table (full fingerprints oracled on the subset below)
    "q_winnow_stats" -> { (s, d) =>
      graft.operators.Winnow.fingerprints(Tables(s, d).documents)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fps"),
          countDistinct(col("fp_hash")).as("n_hashes"),
          sum(col("fp_hash")).as("fp_sum"))
    },
    // full (hash, position) fingerprints for the doc_id<50 subset — every
    // selected window minimum hash-matched against the SQL replay
    "q_winnow_fp_subset" -> { (s, d) =>
      graft.operators.Winnow.fingerprints(Tables(s, d).documents.filter(col("doc_id") < 50))
    },
    // candidate pairs by shared fingerprint hashes: planted 200-char prefix
    // copies under negated ids share a long normalized run, so the
    // winnowing guarantee (>=1 shared fingerprint per >= w+k-1 = 12 shared
    // chars) makes their recovery structural, not probabilistic
    "q_winnow_pairs" -> { (s, d) =>
      val docs = Tables(s, d).documents.select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id").isin(2, 5, 8))
        .select((-col("doc_id")).as("doc_id"), substring(col("text"), 1, 200).as("text"))
      graft.operators.Winnow.candidatePairs(
        graft.operators.Winnow.fingerprints(docs.unionByName(planted)))
    },
    // dHash over the REAL decoded video frames (operators.Avi.framePhash):
    // 9×8 nearest-neighbor gray resample of each BGR24 grid → 64
    // difference bits → 4×16-bit bands (the q_media_phash shape, so video
    // frames join the image near-dup banding join). The oracle replays
    // the resample + gray + bit packing from the pixel formula — every
    // step integer, so a resample or orientation mistake flips the hash
    "q_media_avi_phash" -> { (s, d) =>
      graft.operators.Avi.framePhash(aviFixture(s, d))
    },
    // REAL compressed-frame video decode: MJPG-fourcc AVI, each movi
    // chunk a baseline JPEG the JDK reader decodes (operators.Avi MJPG
    // dispatch) — the codec the JDK actually ships, closing the
    // compressed-video stub down to inter-frame codecs (H.264/VP9).
    // Fixture classes are (doc_id/3) mod 12 byte streams; the oracle joins
    // each class to its PINNED decoded stats (tools.MjpegOraclePin — JPEG
    // is lossy so formula replay is impossible; the pins are the decode
    // contract). Truncated rows ((doc_id/3) % 7 = 1) contribute nothing.
    "q_media_mjpeg_frames" -> { (s, d) => Avi.frameStats(mjpegFixture(s, d)) },
  )
}
