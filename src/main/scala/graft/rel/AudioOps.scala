package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, row_number, sum}
import graft.mm.AudioCodec
import Q.tbl

/** Audio-modality operators: real WAV payloads decoded with the JDK's
  * `javax.sound.sampled` RIFF codec.
  *
  * Each doc carries a real WAV clip (encoded executor-side from the
  * closed-form per-sample formula in [[graft.mm.AudioCodec]]); every
  * mm_audio_* output is computed from the DECODED samples. The DuckDB oracles
  * re-derive the same values from the formula alone (no codec), so a hash
  * match proves the decode path is real. The payload column is bytes and the
  * formula is never consulted after encoding.
  *
  * Scale shape: one narrow scan of `documents`, a single mapPartitions per
  * query (embarrassingly parallel, no shuffle before the final aggregation-
  * free projection) — the same per-row codec cost profile a 100 TB audio
  * corpus has.
  */
object AudioOps {

  /** documents -> (doc_id, real WAV bytes): the opaque binary column every
    * decode query below starts from.
    */
  private def wavPayloads(s: SparkSession, d: String) = {
    import s.implicits._
    // spread before the per-row codec work (guide §2.5) — see Q.spreadSmallScan
    Q.spreadSmallScan(tbl(s, d, "documents").select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => (id, AudioCodec.synthWav(id))))
  }

  /** Shared SQL: the per-sample relation of the synthetic audio corpus.
    * MUST stay in sync with graft.mm.AudioCodec's formula constants.
    */
  private val MM_SIG_CTES = """
    mm_au AS (
      SELECT d.doc_id,
             CAST(1 + d.doc_id % 2 AS BIGINT) AS ch,
             CAST(400 + d.doc_id % 211 AS BIGINT) AS nf,
             ti.i AS i, tc.c AS c
      FROM documents d, range(0, 611) ti(i), range(0, 2) tc(c)
      WHERE ti.i < 400 + d.doc_id % 211 AND tc.c < 1 + d.doc_id % 2),
    mm_sig AS (
      SELECT doc_id, ch, nf, i, c,
             ((i * 7 + c * 11 + doc_id * 13) % 4096) - 2048 AS v
      FROM mm_au)"""

  /** Decode metadata + full-clip sums from the decoded samples. */
  def audioMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    wavPayloads(s, d)
      .mapPartitions(_.map { case (id, wav) =>
        val p = AudioCodec.decode(wav)
        var sum = 0L; var sumAbs = 0L
        var i = 0
        while (i < p.data.length) {
          sum += p.data(i); sumAbs += math.abs(p.data(i)); i += 1
        }
        (id, p.channels.toLong, p.frames.toLong,
          p.frames.toLong * 1000 / AudioCodec.SampleRate, sum, sumAbs)
      })
      .toDF("doc_id", "n_channels", "n_frames", "dur_ms", "sum_s", "sum_abs")
  }

  private val MM_AUDIO_META_SQL = s"""
    WITH $MM_SIG_CTES
    SELECT doc_id, any_value(ch) AS n_channels, any_value(nf) AS n_frames,
           any_value(nf * 1000 // 8000) AS dur_ms,
           CAST(sum(v) AS BIGINT) AS sum_s,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs
    FROM mm_sig GROUP BY doc_id"""

  /** Windowed features from the decoded samples: per (doc, channel, 20 ms
    * window) integer energy and zero-crossing count. Long-form rows — the
    * shape a feature store ingests.
    */
  def audioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val win = 160 // 20 ms at 8 kHz
    wavPayloads(s, d)
      .mapPartitions(_.flatMap { case (id, wav) =>
        val p = AudioCodec.decode(wav)
        val nWin = (p.frames + win - 1) / win
        val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        var c = 0
        while (c < p.channels) {
          var w = 0
          while (w < nWin) {
            var energy = 0L; var zc = 0L
            val end = math.min((w + 1) * win, p.frames)
            var i = w * win
            while (i < end) {
              val v = p.data(i * p.channels + c)
              energy += v.toLong * v
              // within-window crossings only (no cross-window pairs)
              if (i > w * win && p.data((i - 1) * p.channels + c).toLong * v < 0) zc += 1
              i += 1
            }
            rows += ((id, c.toLong, w.toLong, energy, zc))
            w += 1
          }
          c += 1
        }
        rows.iterator
      })
      .toDF("doc_id", "chan", "win", "energy", "zc")
  }

  private val MM_AUDIO_FEATURES_SQL = s"""
    WITH $MM_SIG_CTES,
    lagd AS (
      SELECT doc_id, c, i, v,
             lag(v) OVER (PARTITION BY doc_id, c ORDER BY i) AS pv
      FROM mm_sig)
    SELECT doc_id, c AS chan, i // 160 AS win,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(count(*) FILTER (WHERE i % 160 <> 0 AND pv * v < 0) AS BIGINT) AS zc
    FROM lagd GROUP BY doc_id, c, win"""

  /** Acoustic fingerprint from the decoded samples — the energy-delta bit
    * string (the simplest Chromaprint/Shazam family member): 20-sample
    * (2.5 ms) window energies per channel, one bit per window boundary
    * (set when energy rose), packed LSB-first into a long. Up to 31
    * windows per clip here, so the fingerprint fits one positive BIGINT;
    * pure integer arithmetic, so the oracle rebuilds the identical bits
    * from the formula while Spark computes them from the REAL WAV decode.
    * Pairing downstream is bit_count(xor) banding (mm_phash_pairs).
    */
  def audioFingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val win = 20
    wavPayloads(s, d)
      .mapPartitions(_.flatMap { case (id, wav) =>
        val p = AudioCodec.decode(wav)
        val nWin = (p.frames + win - 1) / win
        (0 until p.channels).iterator.map { c =>
          val e = new Array[Long](nWin)
          var i = 0
          while (i < p.frames) {
            val v = p.data(i * p.channels + c).toLong
            e(i / win) += v * v
            i += 1
          }
          var fp = 0L
          var w = 1
          while (w < nWin) {
            if (e(w) > e(w - 1)) fp |= 1L << (w - 1)
            w += 1
          }
          (id, c.toLong, nWin.toLong, fp)
        }
      })
      .toDF("doc_id", "chan", "n_wins", "fp")
  }

  private val MM_AUDIO_FP_SQL = s"""
    WITH $MM_SIG_CTES,
    we AS (
      SELECT doc_id, c, i // 20 AS win, CAST(sum(v * v) AS BIGINT) AS e
      FROM mm_sig GROUP BY doc_id, c, i // 20),
    ld AS (
      SELECT doc_id, c, win, e,
             lag(e) OVER (PARTITION BY doc_id, c ORDER BY win) AS pe
      FROM we)
    SELECT doc_id, c AS chan, CAST(count(*) AS BIGINT) AS n_wins,
           CAST(coalesce(sum(CASE WHEN pe IS NOT NULL AND e > pe
                                  THEN (CAST(1 AS BIGINT) << CAST(win - 1 AS INTEGER))
                             END), 0) AS BIGINT) AS fp
    FROM ld GROUP BY doc_id, c"""

  /** Real resample: decode, decimate by 2, RE-ENCODE to WAV (the write-back
    * a resampling job performs), decode the re-encoded bytes, and summarize
    * from the second decode — a frame-alignment mistake in either codec pass
    * breaks the hash.
    */
  def audioResample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    wavPayloads(s, d)
      .mapPartitions(_.map { case (id, wav) =>
        val half = AudioCodec.decode(
          AudioCodec.encode(AudioCodec.decimate(AudioCodec.decode(wav), 2)))
        var sum2 = 0L; var energy2 = 0L
        var i = 0
        while (i < half.data.length) {
          val v = half.data(i); sum2 += v; energy2 += v.toLong * v; i += 1
        }
        (id, half.frames.toLong, sum2, energy2)
      })
      .toDF("doc_id", "n2", "sum2", "energy2")
  }

  private val MM_AUDIO_RESAMPLE_SQL = s"""
    WITH $MM_SIG_CTES
    SELECT doc_id, any_value((nf + 1) // 2) AS n2,
           CAST(sum(CASE WHEN i % 2 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum2,
           CAST(sum(CASE WHEN i % 2 = 0 THEN v * v ELSE 0 END) AS BIGINT) AS energy2
    FROM mm_sig GROUP BY doc_id"""

  /** Streaming twin of mm_audio_meta: the documents table is replayed as a
    * file-source stream, each microbatch encodes + decodes real WAV payloads
    * executor-side (append mode, stateless — the decode is per-row, so the
    * streaming plan needs no state store at all), and the memory sink's
    * table is gated by the SAME DuckDB oracle as the batch query.
    */
  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def audioMetaStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    val qn = "st_mm_audio_sink_" + sinkCounter.incrementAndGet()
    val out = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val p = AudioCodec.decode(AudioCodec.synthWav(id))
        var sum = 0L; var sumAbs = 0L
        var i = 0
        while (i < p.data.length) {
          sum += p.data(i); sumAbs += math.abs(p.data(i)); i += 1
        }
        (id, p.channels.toLong, p.frames.toLong,
          p.frames.toLong * 1000 / AudioCodec.SampleRate, sum, sumAbs)
      })
      .toDF("doc_id", "n_channels", "n_frames", "dur_ms", "sum_s", "sum_abs")
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName(qn).start()
    try query.processAllAvailable()
    finally query.stop()
    s.table(qn)
  }

  /** A/V mux demux: one binary column carrying BOTH modalities as tagged
    * length-prefixed segments; demux dispatches each segment to its real
    * codec (PNG via ImageIO, WAV via the RIFF reader) and summarizes from
    * the decoded data. The oracle re-derives every segment from the two
    * closed-form formulas, so the hash gate breaks on any container-offset
    * or cross-modal dispatch mistake.
    */
  def muxDemux(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.mm.{ImageCodec, MuxCodec}
    Q.spreadSmallScan(tbl(s, d, "documents").select(col("doc_id"))).as[Long]
      .mapPartitions(_.flatMap { id =>
        MuxCodec.demux(MuxCodec.synthMux(id)).map { case (k, kind, payload) =>
          if (kind == MuxCodec.KindVideo) {
            val dec = ImageCodec.decode(payload)
            val (sr, _, _) = ImageCodec.channelSums(dec)
            (id, k.toLong, "v", dec.w.toLong * dec.h, sr)
          } else {
            val p = AudioCodec.decode(payload)
            var sum = 0L; var i = 0
            while (i < p.data.length) { sum += p.data(i); i += 1 }
            (id, k.toLong, "a", p.data.length.toLong, sum)
          }
        }
      })
      .toDF("doc_id", "seg_idx", "kind", "elems", "msum")
  }

  private val MM_MUX_SQL = s"""
    WITH segs AS (
      SELECT d.doc_id, kk.k FROM documents d, range(0, 7) kk(k)
      WHERE kk.k < 2 + d.doc_id % 5),
    vseg AS (
      SELECT doc_id, k, doc_id + 997 * k AS fs FROM segs WHERE k % 2 = 0),
    vpx AS (
      SELECT doc_id, k, fs,
             CAST(16 + fs % 17 AS BIGINT) AS w,
             CAST(16 + fs % 13 AS BIGINT) AS h,
             tx.x AS x, ty.y AS y
      FROM vseg, range(0, 32) tx(x), range(0, 28) ty(y)
      WHERE tx.x < 16 + fs % 17 AND ty.y < 16 + fs % 13),
    vout AS (
      SELECT doc_id, k AS seg_idx, 'v' AS kind,
             any_value(w * h) AS elems,
             CAST(sum(${graft.mm.ImageCodec.rSql("fs")}) AS BIGINT) AS msum
      FROM vpx GROUP BY doc_id, k),
    aseg AS (
      SELECT doc_id, k, doc_id + 131 * k AS es FROM segs WHERE k % 2 = 1),
    apx AS (
      SELECT doc_id, k, es,
             CAST(1 + es % 2 AS BIGINT) AS ch,
             CAST(400 + es % 211 AS BIGINT) AS nf,
             ti.i AS i, tc.c AS c
      FROM aseg, range(0, 611) ti(i), range(0, 2) tc(c)
      WHERE ti.i < 400 + es % 211 AND tc.c < 1 + es % 2),
    aout AS (
      SELECT doc_id, k AS seg_idx, 'a' AS kind,
             any_value(nf * ch) AS elems,
             CAST(sum(((i * 7 + c * 11 + es * 13) % 4096) - 2048) AS BIGINT)
               AS msum
      FROM apx GROUP BY doc_id, k)
    SELECT * FROM vout UNION ALL SELECT * FROM aout"""

  /** Streaming twin of mm_mux_demux: the same tagged-container demux with
    * both codecs, per microbatch, append mode, same oracle — stateless
    * per-row decode needs no state store even inside the streaming plan.
    */
  def muxDemuxStream(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.mm.{ImageCodec, MuxCodec}
    val schema = s.read.parquet(s"$d/documents.parquet").schema
    val qn = "st_mm_mux_sink_" + sinkCounter.incrementAndGet()
    val out = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        MuxCodec.demux(MuxCodec.synthMux(id)).map { case (k, kind, payload) =>
          if (kind == MuxCodec.KindVideo) {
            val dec = ImageCodec.decode(payload)
            val (sr, _, _) = ImageCodec.channelSums(dec)
            (id, k.toLong, "v", dec.w.toLong * dec.h, sr)
          } else {
            val p = AudioCodec.decode(payload)
            var sum = 0L; var i = 0
            while (i < p.data.length) { sum += p.data(i); i += 1 }
            (id, k.toLong, "a", p.data.length.toLong, sum)
          }
        }
      })
      .toDF("doc_id", "seg_idx", "kind", "elems", "msum")
    val query = out.writeStream.outputMode("append")
      .format("memory").queryName(qn).start()
    try query.processAllAvailable()
    finally query.stop()
    s.table(qn)
  }

  /** Activity segmentation (VAD shape) over the decoded windows: a window
    * is ACTIVE when its energy exceeds the clip-channel mean (compared by
    * exact cross-multiplication — no ratio), and activity runs merge by
    * the gaps-and-islands rule (island id = win - row_number, pure
    * integers). Per (clip, channel): segment count, longest run, active
    * windows — the silence-split statistics an audio curation pipeline
    * keys on. Spark derives energies from the REAL WAV decode
    * (audioFeatures), the oracle from the synthesis formula, so the
    * segmentation pins the codec path end-to-end.
    */
  def audioVad(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = audioFeatures(s, d)
    val tot = feats.groupBy("doc_id", "chan")
      .agg(sum("energy").as("te"), count(lit(1)).as("nw"))
    val active = feats.join(tot, Seq("doc_id", "chan"))
      .filter(col("energy") * col("nw") > col("te"))
    val w = Window.partitionBy("doc_id", "chan").orderBy("win")
    active
      .withColumn("grp", col("win") - row_number().over(w))
      .groupBy("doc_id", "chan", "grp").agg(count(lit(1)).as("len"))
      .groupBy("doc_id", "chan")
      .agg(count(lit(1)).as("n_segments"), max("len").as("longest"),
        sum("len").as("active_windows"))
  }

  private val MM_AUDIO_VAD_SQL = s"""
    WITH $MM_SIG_CTES,
    feats AS (
      SELECT doc_id, c AS chan, i // 160 AS win,
             CAST(sum(v * v) AS BIGINT) AS energy
      FROM mm_sig GROUP BY 1, 2, 3),
    tot AS (
      SELECT doc_id, chan, CAST(sum(energy) AS BIGINT) AS te,
             count(*) AS nw
      FROM feats GROUP BY 1, 2),
    active AS (
      SELECT f.doc_id, f.chan, f.win,
             f.win - row_number() OVER (PARTITION BY f.doc_id, f.chan
                                        ORDER BY f.win) AS grp
      FROM feats f JOIN tot t ON f.doc_id = t.doc_id AND f.chan = t.chan
      WHERE f.energy * t.nw > t.te),
    runs AS (
      SELECT doc_id, chan, grp, count(*) AS len
      FROM active GROUP BY 1, 2, 3)
    SELECT doc_id, chan, count(*) AS n_segments,
           CAST(max(len) AS BIGINT) AS longest,
           CAST(sum(len) AS BIGINT) AS active_windows
    FROM runs GROUP BY 1, 2"""

  def all: Seq[Q] = Seq(
    Q("mm_audio_vad", audioVad, Some(MM_AUDIO_VAD_SQL)),
    Q("mm_mux_demux", muxDemux, Some(MM_MUX_SQL)),
    Q("st_mm_mux", muxDemuxStream, Some(MM_MUX_SQL)),
    Q("mm_audio_meta", audioMeta, Some(MM_AUDIO_META_SQL)),
    Q("st_mm_audio", audioMetaStream, Some(MM_AUDIO_META_SQL)),
    Q("mm_audio_features", audioFeatures, Some(MM_AUDIO_FEATURES_SQL)),
    Q("mm_audio_fp", audioFingerprint, Some(MM_AUDIO_FP_SQL)),
    Q("mm_audio_resample", audioResample, Some(MM_AUDIO_RESAMPLE_SQL))
  )
}
