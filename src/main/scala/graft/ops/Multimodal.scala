package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `BINARY` columns with typed metadata, decoded /
  * feature-extracted in distributed batches via `mapPartitions`.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration,
  * decoder plug-point) is real and tested; the *decoder itself* is a
  * STUB — this container has no image/audio codecs, so [[StubDecoder]]
  * produces deterministic fake features from the raw bytes. Swap in a
  * real decoder (JNI/javacpp ffmpeg, ImageIO, ...) behind the same
  * trait for production.
  */
object Multimodal {

  /** One decoded media record. `features` is the stand-in for the
    * resize/frame-sample/embedding output of a real decoder. */
  final case class Decoded(
      format: String,
      nBytes: Long,
      width: Int,
      height: Int,
      feat0: Long)

  /** Decoder plug-point. Implementations must be deterministic per byte
    * array (Spark may re-execute partitions on retry). */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Decoded
  }

  /** Batched decoder plug-point — the Scala analogue of a Pandas UDF's
    * `mapInPandas` contract: the engine hands the decoder whole batches
    * (amortizing per-call overhead for codecs that vectorize — GPU
    * decoders, JNI ffmpeg calls) and streams batches per partition.
    * Must return exactly one [[Decoded]] per input, in order. */
  trait BatchMediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[Decoded]
  }

  /** STUB: deterministic pseudo-decode from the raw bytes only.
    * Sniffs a few real magic numbers so the format column exercises the
    * dispatch path, then fabricates dimensions/features. */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): Decoded = {
      val fmt =
        if (bytes.length >= 3 && bytes(0) == 0xFF.toByte &&
          bytes(1) == 0xD8.toByte) "jpeg"
        else if (bytes.length >= 4 && bytes(0) == 0x89.toByte &&
          bytes(1) == 'P'.toByte) "png"
        else "raw"
      Decoded(
        format = fmt,
        nBytes = bytes.length.toLong,
        width = (bytes.length % 640).toInt,
        height = (bytes.length % 480).toInt,
        feat0 = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong)
    }
  }

  /** REAL decoder for the formats the JDK ships codecs for (PNG, JPEG,
    * GIF, BMP) — `javax.imageio`, no external dependency. Proves the
    * [[MediaDecoder]]/[[BatchMediaDecoder]] plug-point against an actual
    * codec: images decode to their true pixel dimensions and `feat0` is
    * the top-left pixel's ARGB value (a stand-in for real feature
    * extraction). Bytes no installed reader accepts decode to
    * `("raw", 0, 0)` — a production pipeline routes those to an
    * ffmpeg-class decoder behind the same trait. Deterministic per byte
    * array, as the trait requires (ImageIO decoding is pure). */
  object ImageIoDecoder extends MediaDecoder with BatchMediaDecoder {
    def decode(bytes: Array[Byte]): Decoded = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) Decoded("raw", bytes.length.toLong, 0, 0, 0L)
      else {
        val fmt =
          if (bytes.length >= 2 && bytes(0) == 0xFF.toByte &&
            bytes(1) == 0xD8.toByte) "jpeg"
          else if (bytes.length >= 2 && bytes(0) == 0x89.toByte &&
            bytes(1) == 'P'.toByte) "png"
          else if (bytes.length >= 2 && bytes(0) == 'G'.toByte &&
            bytes(1) == 'I'.toByte) "gif"
          else if (bytes.length >= 2 && bytes(0) == 'B'.toByte &&
            bytes(1) == 'M'.toByte) "bmp"
          else "image"
        Decoded(fmt, bytes.length.toLong, img.getWidth, img.getHeight,
          img.getRGB(0, 0) & 0xFFFFFFFFL)
      }
    }
    def decodeBatch(batch: Seq[Array[Byte]]): Seq[Decoded] = batch.map(decode)
  }

  /** Aspect-preserving integer resize of decoded dimensions into a
    * target box — the metadata half of a real resize stage (the pixel
    * work belongs to the per-partition decoder; the dimension math is
    * pure Catalyst integer arithmetic, codegen'd and oracle-exact).
    * Degenerate inputs (w/h <= 0) map to (0, 0). */
  def resizeStage(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val w = col("width")
    val h = col("height")
    decoded
      .withColumn("out_w",
        when(w <= 0 || h <= 0, lit(0))
          .when(w * targetH <= h * targetW, expr(s"(width * $targetH) div height"))
          .otherwise(lit(targetW)).cast("int"))
      .withColumn("out_h",
        when(w <= 0 || h <= 0, lit(0))
          .when(w * targetH <= h * targetW, lit(targetH))
          .otherwise(expr(s"(height * $targetW) div width")).cast("int"))
  }

  /** Frame sampling over a binary "video" column: the blob is treated as
    * `floor(n_bytes / frameSize)` fixed-size frames, every `stride`-th
    * frame is sampled, and each sampled frame gets a content
    * fingerprint. One exploded row per sampled frame — the exact shape
    * a real ffmpeg frame-sampler feeds downstream (the fingerprint is
    * md5 over the frame's hex image, computable bit-identically by the
    * oracle, which cannot slice raw blobs). Pure Catalyst: sequence +
    * explode + substring, no UDF. */
  /** m11: CROSS-VIDEO DUPLICATE-CLIP detection — the segment-level
    * dedup a video corpus needs that whole-file hashing (m09) and
    * whole-image pHash (m04) both miss: a clip re-broadcast inside a
    * longer video (syndicated footage, intro slates, reaction
    * re-uploads) shares a RUN of frames at a constant time offset
    * while the containers, lengths and surrounding content all
    * differ.
    *
    * Detection over [[frameSample]]'s per-frame fingerprints:
    * fingerprint-equal frames across two videos become match points
    * (one equi-join on frame_fp — never all-pairs), and within each
    * (pair, index-offset) group the classic gaps-and-islands
    * construction (idx/stride − row_number) finds maximal runs of
    * CONSECUTIVE sampled frames — a shared clip is a long island at
    * one offset, while incidental frame collisions scatter. Emitted:
    * video pairs with their total match count and longest aligned
    * run, gated at `minRun` (a 3-frame aligned run at stride 2 spans
    * 6 frame slots — far past coincidence).
    *
    * The operator is PURE — it examines only the blobs it is given
    * (the test-corpus re-broadcast derivation lives in
    * [[graft.queries.PipelineQueries.clipDedup]], exactly as m09
    * keeps [[payloadDedup]] pure and derives its containers in
    * `PipelineQueries.containerDedup`). Scale: frames explode
    * map-side, the join is fp-keyed, islands windows partition by
    * (pair, offset) — nothing quadratic in the corpus, only in
    * per-fingerprint collision fan-out. */
  def clipDedup(df: DataFrame, id: Column, blob: Column,
      frameSize: Int = 64, stride: Int = 2, minRun: Int = 3): DataFrame = {
    val frames = frameSample(df.select(id.as("doc_id"),
        blob.cast("binary").as("blob")),
      col("doc_id"), col("blob"), frameSize, stride)
    val m = frames.as("a").join(frames.as("b"),
        col("a.frame_fp") === col("b.frame_fp") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        col("a.frame_idx").as("ia"), col("b.frame_idx").as("ib"))
      .distinct()
      .withColumn("off", col("ia") - col("ib"))
    val wIsl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("da"), col("db"), col("off")).orderBy(col("ia"))
    val runs = m
      .withColumn("isl", expr(s"ia div $stride") -
        row_number().over(wIsl))
      .groupBy(col("da"), col("db"), col("off"), col("isl"))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col("da"), col("db"))
      .agg(sum(col("run")).as("n_matches"),
        max(col("run")).as("longest_run"))
      .filter(col("longest_run") >= minRun)
  }

  def frameSample(df: DataFrame, id: Column, blob: Column,
      frameSize: Int = 64, stride: Int = 2): DataFrame = {
    val nFrames = (length(blob) / frameSize).cast("long")
    val idxs = when(nFrames > 0,
      sequence(lit(0L), nFrames - 1L, lit(stride.toLong)))
      .otherwise(array().cast("array<bigint>"))
    df.select(id.cast("long").as("id"), hex(blob).as("hx"),
        explode(idxs).as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        md5(substring(col("hx"),
          (col("frame_idx") * (frameSize * 2) + 1).cast("int"),
          lit(frameSize * 2)).cast("binary")).as("frame_fp"))
  }

  /** Perceptual-hash near-dup pairing over media blobs — block-mean
    * hashing (Yang et al., "Block Mean Value Based Image Perceptual
    * Hashing", public; the aHash family): the signal is cut into
    * `nBits` equal blocks, bit b = (block-b mean >= global mean), and
    * blobs whose hashes sit within `maxHamming` are near-duplicate
    * media. The mean comparison is an exact integer cross-multiply
    * (`sum_b · n >= total · cnt_b` — no float division), so the hash
    * is bit-identical in any engine; 48 bits keeps every `1 << b`
    * positive in int64 on both engines (the s16 discipline).
    *
    * Pairing reuses the SimHash discipline (d06): 8 bands of 6 bits,
    * candidates from a band equi-join — with maxHamming <= 7, ANY
    * true pair has an untouched band (pigeonhole), so banding is
    * EXACT, never a recall trade — then the exact xor+popcount
    * verify. At fixture scale the "pixels" are the blob's codepoints;
    * a production pipeline computes the same blocks from decoded
    * pixels inside the [[BatchMediaDecoder]] plug-point and feeds the
    * identical banding/pairing plan. Scale shape: the hash is one
    * explode + two keyed aggregations per blob (map-side partials);
    * candidates come from the band equi-join, never an all-pairs
    * scan. */
  def phashPairs(df: DataFrame, text: Column, id: Column,
      nBits: Int = 48, bands: Int = 8, maxHamming: Int = 7): DataFrame = {
    require(maxHamming < bands, "pigeonhole-exact banding needs maxHamming < bands")
    require(nBits % bands == 0 && nBits < 63, s"nBits=$nBits")
    require(nBits == 48, "the graft_phash kernel is fixed at 48 bits")
    val bandBits = nBits / bands
    val mask = (1L << bandBits) - 1L
    // Signature stage: the native one-pass kernel (map-only inside
    // whole-stage codegen) instead of a per-character posexplode
    // through two aggregations — bit-identical to [[phashDeclarative]]
    // (spec-pinned); empty media dropped exactly as the exploded form
    // did implicitly (no block rows -> no signature row).
    graft.plans.GraftExtensions.register(df.sparkSession)
    val ph = df.select(id.cast("long").as("mid"), text.as("t"))
      .filter(length(col("t")) > 0)
      .select(col("mid"), call_function("graft_phash", col("t")).as("h"))
    val banded = ph.select(col("mid"), col("h"),
      explode(expr(s"sequence(0, ${bands - 1})")).as("band"))
      .withColumn("bv",
        expr(s"(h >> CAST(band * $bandBits AS INT)) & $mask"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.mid") < col("b.mid"))
      .select(col("a.mid").as("da"), col("b.mid").as("db"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
    cand
      .select(col("da"), col("db"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The pre-kernel relational block-mean hash — kept as the parity
    * reference [[graft.functions.PHashOps.compute]] is spec-checked
    * against (and what the DuckDB oracle mirrors). */
  private[graft] def phashDeclarative(df: DataFrame, text: Column,
      id: Column): DataFrame = {
    val cps = df.select(id.cast("long").as("mid"), text.as("t"))
      .select(col("mid"), length(col("t")).as("n"),
        posexplode(expr(
          "transform(sequence(1, length(t)), i -> ascii(substr(t, i, 1)))"))
          .as(Seq("p0", "c")))
    val blocks = cps
      .select(col("mid"), col("n"), expr("(p0 * 48) div n").as("b"),
        col("c"))
      .groupBy(col("mid"), col("b"))
      .agg(first(col("n")).as("n"), count(lit(1)).as("cnt"),
        sum(col("c")).as("s"))
    val totals = blocks.groupBy(col("mid"))
      .agg(sum(col("s")).as("ts"), sum(col("cnt")).as("tn"))
    blocks.join(totals, Seq("mid"))
      .groupBy(col("mid"))
      .agg(sum(when(col("s") * col("tn") >= col("ts") * col("cnt"),
        expr("CAST(1 AS BIGINT) << CAST(b AS INT)")).otherwise(lit(0L)))
        .as("h"))
  }

  /** m05: cross-modal alignment scoring + filtering — the CLIP-score
    * curation step of multimodal training data (Schuhmann et al. 2021,
    * LAION, public): each media blob is paired with its caption's
    * embedding, an alignment score is computed between the media's
    * feature vector and the caption vector, and pairs below threshold
    * are flagged for drop. The VISION ENCODER IS A STUB — a
    * deterministic md5-derived 64-dim vector of centered int16s from
    * the blob's content fingerprint (the
    * [[graft.ops.Vectors.planeCoef]] convention per-row, 16-bit so the
    * 64-term int64 dot against a µ-scaled caption vector cannot
    * overflow), standing where a GPU encoder (batched Pandas-UDF /
    * `mapInPandas`, one model instance per partition as
    * [[decodeBatched]] does for decoders) would emit real features.
    * Everything AROUND the stub is the real pipeline: pairing is an
    * id equi-join (media and captions co-shard by the join key — no
    * broadcast needed at any corpus size since both sides scale
    * together), scoring is map-side exact int64-dot cosine, and the
    * keep flag is an ordinary pushdown-able predicate downstream
    * stages filter on.
    *
    * Output: (doc_id, clip_score, keep). */
  def clipScoreFilter(media: DataFrame, captions: DataFrame, id: Column,
      blob: Column, capId: Column, capEmb: Column, dims: Int = 64,
      minScore: Double = 0.0): DataFrame = {
    import graft.ops.Vectors
    val m = media.select(id.cast("long").as("mid"), md5(blob).as("fp"))
      .withColumn("miv", transform(sequence(lit(0), lit(dims - 1)),
        d => conv(substring(md5(concat(col("fp"), lit("_"),
          d.cast("string"))), 1, 4), 16, 10).cast("long")
          - lit(32768L)))
      .withColumn("mn2", Vectors.idot(col("miv"), col("miv")))
    val c = Vectors.prepared(captions, capId, capEmb)
    m.join(c, col("mid") === col("vid"))
      .select(col("mid").as("doc_id"),
        Vectors.cosineFromInts(Vectors.idot(col("miv"), col("iv")),
          col("mn2"), col("n2")).as("clip_score"))
      .withColumn("keep", col("clip_score") >= lit(minScore))
  }

  /** Shared per-doc frame prelude for [[audioSegments]] and
    * [[shotBoundaries]]: codepoint energies (the deterministic decoder
    * stand-in) folded into per-frame (energy, count) arrays plus blob
    * totals — every step a per-row HOF, nothing shuffles. The final
    * explode(array(struct(…))) is a deliberate PROJECTION BARRIER: a
    * Generate node cannot be collapsed into downstream projections,
    * so `es`/`cs`/`ts`/`tn` become real attributes evaluated ONCE per
    * row. Without it, CollapseProject inlines the whole per-codepoint
    * transform chain into EVERY downstream array reference, and HOF
    * lambdas evaluate interpreted with no common-subexpression
    * elimination — each element_at re-scanned the blob per iteration
    * (measured 4-10× on m07/m14). Still map-only: explode of a
    * 1-element array is row-preserving, no shuffle. */
  private def framed(df: DataFrame, text: Column, id: Column,
      frameChars: Int): DataFrame =
    df.select(id.cast("long").as("id"), text.as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("cps", expr(
        "transform(sequence(1, length(t)), " +
          "i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))"))
      .withColumn("es", expr(
        s"transform(sequence(0, (length(t)-1) div $frameChars), " +
          s"f -> aggregate(slice(cps, f*$frameChars+1, $frameChars), " +
          "CAST(0 AS BIGINT), (a, c) -> a + c))"))
      .withColumn("cs", expr(
        s"transform(sequence(0, (length(t)-1) div $frameChars), " +
          s"f -> CAST(size(slice(cps, f*$frameChars+1, $frameChars)) " +
          "AS BIGINT))"))
      .withColumn("ts", expr("aggregate(es, CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("tn", length(col("t")).cast("long"))
      .select(col("id"), col("t"),
        explode(array(struct(col("es"), col("cs"), col("ts"), col("tn"))))
          .as("__m"))
      .select(col("id"), col("t"), col("__m.es").as("es"),
        col("__m.cs").as("cs"), col("__m.ts").as("ts"),
        col("__m.tn").as("tn"))

  /** m12: LOUDNESS NORMALIZATION GAIN — the per-clip gain table audio
    * preprocessing writes before mixing corpora recorded at different
    * levels: normalize every clip's mean energy to the CORPUS mean.
    * gain = (corpus mean energy per sample) / (clip mean energy per
    * sample) = (E·n_clip)/(N·e_clip), emitted in exact milli units by
    * one cross-multiplied integer division — no float loudness
    * anywhere, so the table is engine-exact. The decoder stand-in is
    * the suite's frame model (energy = codepoint sum); per-clip sums
    * are one map-only HOF pass, corpus totals one aggregate,
    * DECIMAL(38,0) keeps the cross product exact at any corpus size
    * (loud on overflow past 10³⁸). */
  def loudnessGain(df: DataFrame, text: Column, id: Column): DataFrame = {
    val per = df.select(id.cast("long").as("doc_id"), text.as("t"))
      .filter(length(col("t")) > 0)
      .select(col("doc_id"), length(col("t")).cast("long").as("n_cp"),
        expr("aggregate(transform(sequence(1, length(t)), " +
          "i -> CAST(ascii(substr(t, i, 1)) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (a, c) -> a + c)").as("energy"))
    val tot = per.agg(sum(col("n_cp")).as("nn"),
      sum(col("energy")).as("ee"))
    per.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_cp"), col("energy"),
        expr("CAST((CAST(ee AS DECIMAL(38,0)) * n_cp * 1000) div " +
          "(CAST(nn AS DECIMAL(38,0)) * energy) AS BIGINT)")
          .as("gain_milli"))
  }

  /** m06: voice-activity-style segmentation of audio blobs — the
    * speech-curation step that cuts a recording into voiced segments
    * before transcription/alignment (WebRTC-VAD / Silero class). The
    * blob is framed (`frameChars` codepoints ≈ a 10 ms PCM frame), each
    * frame gets an ENERGY (sum of codepoint values — the deterministic
    * stand-in for mean-square amplitude; a real decoder emits true
    * frame energies through the [[BatchMediaDecoder]] plug-point and
    * feeds the identical segmentation), a frame is VOICED iff its mean
    * energy >= the blob's global mean (exact integer cross-multiply,
    * the m04 discipline — no float division), and maximal runs of >=
    * `minFrames` consecutive voiced frames become segments.
    *
    * The whole operator is MAP-ONLY: framing, energies, and the
    * island-finding run as HOFs over per-row arrays (the run fold is
    * one linear `aggregate` with a (segments, open-run) accumulator),
    * then segments explode. Nothing shuffles at any corpus size; each
    * blob's work is linear in its length.
    *
    * Output: one row per segment — (id, seg_id, start_frame,
    * end_frame, n_frames). Blobs with no qualifying run emit nothing. */
  def audioSegments(df: DataFrame, text: Column, id: Column,
      frameChars: Int = 64, minFrames: Int = 2): DataFrame = {
    val segType = "array<struct<s:bigint,e:bigint>>"
    framed(df, text, id, frameChars)
      .withColumn("vo", expr(
        "transform(sequence(0, size(es)-1), " +
          "f -> element_at(es, f+1) * tn >= ts * element_at(cs, f+1))"))
      .withColumn("segs", expr(
        s"""aggregate(
           sequence(0, size(vo)-1),
           named_struct('segs', CAST(array() AS $segType),
                        'cur', CAST(-1 AS BIGINT)),
           (acc, f) -> IF(element_at(vo, f+1),
             named_struct('segs', acc.segs,
               'cur', IF(acc.cur < 0, CAST(f AS BIGINT), acc.cur)),
             named_struct('segs',
               IF(acc.cur >= 0,
                 concat(acc.segs,
                   array(named_struct('s', acc.cur,
                     'e', CAST(f-1 AS BIGINT)))),
                 acc.segs),
               'cur', CAST(-1 AS BIGINT))),
           acc -> IF(acc.cur >= 0,
             concat(acc.segs, array(named_struct('s', acc.cur,
               'e', CAST(size(vo)-1 AS BIGINT)))),
             acc.segs))"""))
      .select(col("id"), posexplode(expr(
        s"filter(segs, x -> x.e - x.s + 1 >= $minFrames)"))
        .as(Seq("p", "sg")))
      .select(col("id"), (col("p") + 1).cast("long").as("seg_id"),
        col("sg.s").as("start_frame"), col("sg.e").as("end_frame"),
        (col("sg.e") - col("sg.s") + lit(1L)).as("n_frames"))
  }

  /** m07: shot-boundary detection — the scene-cut segmentation video
    * curation runs before keyframe sampling (a cut = an abrupt
    * inter-frame change; the fixed-stride sampling of [[frameSample]]
    * oversamples static shots and misses short ones). Frame f starts a
    * new shot iff its mean differs from frame f-1's mean by more than
    * 1/`denom` of the blob's global mean — evaluated as the fully
    * cross-multiplied |e_f·c_{f-1} − e_{f-1}·c_f| · tn · denom >
    * ts · c_f · c_{f-1}, so the cut decision is pure int64 arithmetic
    * (no float means) and engine-exact. CHANGE detection, where
    * [[audioSegments]] is LEVEL detection: a loud-to-louder transition
    * cuts here but never changes VAD state.
    *
    * Map-only like m06: the frame prelude and the boundary filter are
    * per-row HOFs; boundaries explode. Output: (id, frame_idx) per
    * cut, frame_idx >= 1. */
  def shotBoundaries(df: DataFrame, text: Column, id: Column,
      frameChars: Int = 64, denom: Int = 16): DataFrame =
    framed(df, text, id, frameChars)
      .select(col("id"), explode(expr(
        s"""IF(size(es) >= 2,
           filter(sequence(CAST(1 AS BIGINT), CAST(size(es)-1 AS BIGINT)),
             f -> abs(element_at(es, CAST(f+1 AS INT)) *
                      element_at(cs, CAST(f AS INT)) -
                      element_at(es, CAST(f AS INT)) *
                      element_at(cs, CAST(f+1 AS INT)))
                    * tn * $denom >
                  ts * element_at(cs, CAST(f+1 AS INT)) *
                       element_at(cs, CAST(f AS INT))),
           CAST(array() AS array<bigint>))"""))
        .as("frame_idx"))

  /** m14: KEYFRAME SELECTION — per video, the single most
    * representative "thumbnail" frame: the frame with the LARGEST
    * change from its predecessor (the standard max-inter-frame-delta
    * heuristic; a static video's frame 1 wins by convention since all
    * deltas tie at 0 and ties break earliest). The score is the
    * frame-size-weighted cross-multiplied mean delta
    * |e_f·c_{f−1} − e_{f−1}·c_f| (= |mean_f − mean_{f−1}|·c_f·c_{f−1},
    * a pure int64 — no float means, engine-exact; interior frames all
    * share c = frameChars so the weighting only affects the final
    * short frame). The argmax folds INSIDE the row as a HOF
    * `aggregate` over the per-frame arrays — map-only, zero shuffle,
    * no per-frame explosion (the m06/m07 discipline); single-frame
    * videos are skipped (no delta exists). */
  def keyframes(df: DataFrame, text: Column, id: Column,
      frameChars: Int = 64): DataFrame = {
    // The per-frame (energy, count) pairs explode from ONE arrays_zip
    // reference, so the per-codepoint frame chain evaluates once per
    // doc — lambda-side argmax variants (element_at inside transform /
    // fold, or array_max + array_position) measured 3-4x slower
    // because every array reference re-evaluates the inlined chain
    // per iteration (the q67 expression-duplication lesson). The lag
    // window partitions per doc (never global) and the argmax is a
    // codegen'd max_by over struct ordering — (score, −f) max picks
    // the highest delta, earliest frame on ties — with map-side
    // partial max, so the shuffle carries one row per (doc,
    // partition).
    val wd = Window.partitionBy(col("id")).orderBy(col("f"))
    framed(df, text, id, frameChars)
      .filter(size(col("es")) >= 2)
      .select(col("id"),
        posexplode(arrays_zip(col("es"), col("cs"))).as(Seq("f", "fc")))
      .select(col("id"), col("f").cast("long").as("f"),
        col("fc.es").as("e"), col("fc.cs").as("c"))
      .withColumn("pe", lag(col("e"), 1).over(wd))
      .withColumn("pc", lag(col("c"), 1).over(wd))
      .filter(col("pe").isNotNull)
      .select(col("id"), col("f"),
        abs(col("e") * col("pc") - col("pe") * col("c")).as("s"))
      .groupBy(col("id"))
      .agg(max_by(col("f"), struct(col("s").as("s"),
          (-col("f")).as("nf"))).as("keyframe_idx"),
        max(col("s")).as("score"))
  }

  /** m13: FRAME-SAMPLING COVERAGE — does fixed-stride keyframe
    * sampling (m04's policy) actually see every shot (m07's
    * segmentation)? Per stride, the fraction of shots containing at
    * least one sampled frame — the measured answer to "is stride
    * sampling missing short shots", which static-stride pipelines
    * assume away. Coverage of shot [a, b] under stride s is the pure
    * integer test ⌊b/s⌋ ≥ ⌈a/s⌉ — no frame explosion, no per-frame
    * join; shots come from the proven cut detector plus one per-doc
    * lead window. */
  def sampleCoverage(df: DataFrame, text: Column, id: Column,
      frameChars: Int = 64, denom: Int = 16,
      strides: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cuts = shotBoundaries(df, text, id, frameChars, denom)
    val nf = df.select(id.cast("long").as("id"), text.as("t"))
      .filter(length(col("t")) > 0)
      .select(col("id"),
        (expr(s"(length(t) - 1) div $frameChars") + 1L).as("nf"))
    val starts = nf.select(col("id"), lit(0L).as("a"))
      .unionByName(cuts.select(col("id"), col("frame_idx").as("a")))
    val w = Window.partitionBy(col("id")).orderBy(col("a"))
    val shots = starts.join(nf, Seq("id"))
      .withColumn("b",
        coalesce(lead(col("a"), 1).over(w) - 1L, col("nf") - 1L))
    shots.crossJoin(broadcast(
        strides.map(_.toLong).toDF("stride")))
      .groupBy(col("stride"))
      .agg(count(lit(1)).as("n_shots"),
        sum(when(expr("b div stride") >=
          expr("(a + stride - 1) div stride"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("stride"), col("n_shots"), col("covered"),
        (col("covered").cast("double") / col("n_shots").cast("double"))
          .as("coverage"))
  }

  /** Decode a binary column in distributed batches: one decoder instance
    * per partition (decoders are usually expensive to initialize —
    * mirror of the Pandas-UDF batch pattern), rows streamed through it.
    * Output: (id, format, n_bytes, width, height, feat0). */
  def decodeBatch(df: DataFrame, id: Column, blob: Column,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val in = df.select(id.cast("long").as("id"), blob.as("blob"))
    val enc = Encoders.product[(Long, String, Long, Int, Int, Long)]
    in.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        // per-partition decoder init happens here (stub is stateless)
        val d = decoder
        rows.map { case (i, bytes) =>
          val r = d.decode(if (bytes == null) Array.emptyByteArray else bytes)
          (i, r.format, r.nBytes, r.width, r.height, r.feat0)
        }
      }(enc)
      .toDF("id", "format", "n_bytes", "width", "height", "feat0")
  }

  /** Batched variant: rows grouped into `batchSize` chunks per
    * partition, each chunk handed to the decoder whole — the
    * `mapInPandas` batch shape. Output schema identical to
    * [[decodeBatch]]. */
  def decodeBatched(df: DataFrame, id: Column, blob: Column,
      decoder: BatchMediaDecoder, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1)
    val in = df.select(id.cast("long").as("id"), blob.as("blob"))
    val enc = Encoders.product[(Long, String, Long, Int, Int, Long)]
    in.as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        val d = decoder
        rows.grouped(batchSize).flatMap { chunk =>
          val decoded = d.decodeBatch(chunk.map { case (_, b) =>
            if (b == null) Array.emptyByteArray else b
          })
          require(decoded.length == chunk.length,
            s"decoder returned ${decoded.length} results for ${chunk.length} inputs")
          chunk.iterator.zip(decoded.iterator).map { case ((i, _), r) =>
            (i, r.format, r.nBytes, r.width, r.height, r.feat0)
          }
        }
      }(enc)
      .toDF("id", "format", "n_bytes", "width", "height", "feat0")
  }

  /** m08: media INTEGRITY gate — the transfer-damage triage every
    * multimodal ingest runs before wasting decoder cycles: each
    * payload arrives with origin-declared metadata (length +
    * checksum), and the gate classifies `truncated` (payload shorter
    * than declared — the partial-download signature), `corrupted`
    * (length intact, checksum mismatch — bit-rot / re-encode), or
    * `ok`, rolled up per source with the byte-loss total. Map-only:
    * length and md5 are per-row Catalyst expressions, the rollup is
    * one source-sized exchange. Character-length semantics here (the
    * fixture payload rides a string column); a byte-domain deployment
    * swaps `length` for `octet_length` on the binary column — same
    * plan. */
  def integrityGate(df: DataFrame, payload: Column, declaredLen: Column,
      declaredMd5: Column, source: Column): DataFrame =
    df.select(source.as("source"),
        declaredLen.as("dl"), length(payload).as("al"),
        (md5(payload) === declaredMd5).as("sumOk"))
      .withColumn("status",
        when(col("al") < col("dl"), "truncated")
          .when(!col("sumOk"), "corrupted")
          .otherwise("ok"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("dl") - col("al")).as("chars_lost"))

  /** m09: CONTAINER-INVARIANT media dedup — the re-encode case whole-
    * file hashing cannot catch: the same payload re-wrapped in a
    * different container (RIFF→MP4 remux, EXIF rewrite) changes every
    * byte-level file hash while the media content is identical. The
    * operator fingerprints the PAYLOAD REGION (bytes after the
    * `headerLen`-byte container header) separately from the whole
    * file, and reports each multi-copy payload group: copy count,
    * distinct whole-file hashes (== copy count exactly when every
    * copy is a distinct re-encode — the "file dedup finds nothing
    * here" evidence), distinct containers, and the canonical keeper.
    * Map-only per blob (substr + two hashes), one payload-keyed
    * exchange — d01's exact-dedup shape moved inside the container
    * boundary. */
  def payloadDedup(media: DataFrame, id: Column, blob: Column,
      headerLen: Int): DataFrame =
    media.select(id.cast("long").as("id"),
        md5(blob).as("file_fp"),
        md5(blob.substr(lit(headerLen + 1),
          length(blob) - lit(headerLen))).as("payload_fp"),
        blob.substr(lit(1), lit(headerLen)).cast("string").as("hdr"))
      .groupBy(col("payload_fp"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("file_fp")).as("n_distinct_files"),
        countDistinct(col("hdr")).as("n_containers"),
        min(col("id")).as("keep_id"))
      .filter(col("n_copies") >= 2L)

  /** m10: ASPECT-RATIO bucketing + fixed-size batch packing — the
    * SDXL-style training-batch layout: images batch only with
    * same-shaped images (mixed ratios in one batch force destructive
    * square crops), so each decoded item snaps to the NEAREST of a
    * pinned ratio ladder (thousandths; ties to the smaller ratio —
    * exact integer |ar − b| compare via struct-ordered array_min) and
    * packs into deterministic `batchSize` batches in id order within
    * its bucket. Output is one row per packed batch with its fill and
    * ratio spread — the fill of each bucket's LAST batch is the
    * padding waste a bucket-ladder designer tunes against. Degenerate
    * dims drop (m02's rule). Scale: one bucket-keyed exchange; the
    * per-bucket window parallelizes across buckets (swap in
    * [[graft.ops.Ranks.rankedCumsum]] per bucket if a single ratio
    * dominates a trillion-image corpus). */
  def arBuckets(decoded: DataFrame, batchSize: Int = 8,
      ladderMilli: Seq[Long] =
        Seq(250L, 500L, 750L, 1000L, 1333L, 1500L, 2000L, 3000L))
      : DataFrame = {
    val d = decoded.filter(col("width") > 0 && col("height") > 0)
      .withColumn("ar", expr("(width * 1000) div height").cast("long"))
      .withColumn("bucket_milli",
        array_min(array(ladderMilli.map(b =>
          struct(abs(col("ar") - lit(b)).as("d"), lit(b).as("b"))): _*))
          .getField("b"))
    val w = Window.partitionBy(col("bucket_milli")).orderBy(col("id"))
    d.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", expr(s"(rn - 1) div $batchSize"))
      .groupBy(col("bucket_milli"), col("batch_id"))
      .agg(count(lit(1)).as("n_in_batch"),
        min(col("ar")).as("ar_min"), max(col("ar")).as("ar_max"))
  }

  /** m15: TRANSCRIPT-TO-FRAME ALIGNMENT — map each word of a blob's
    * transcript to the frame (the [[framed]] grid: `frameChars`
    * codepoints per frame) containing its first codepoint: the
    * forced-alignment stand-in that produces subtitle spans /
    * training pairs (frame clip, words) from a (media, transcript)
    * row, with a real aligner slotting in through the same
    * [[BatchMediaDecoder]] plug-point the other m-ops defer to. A
    * word's start offset is the exact prefix sum of the preceding
    * words' lengths + the joining single spaces — pure integers, so
    * the table is engine-exact. Per-doc window only (doc-bounded,
    * the m14 shape); one groupBy (doc, frame) rollup. */
  def transcriptFrames(df: DataFrame, text: Column, id: Column,
      frameChars: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    df.select(id.cast("long").as("doc_id"),
        posexplode(split(text, " ")).as(Seq("pos", "w")))
      .withColumn("start",
        coalesce(sum(length(col("w")).cast("long") + 1L).over(w),
          lit(0L)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        expr(s"start div $frameChars").as("frame"))
      .groupBy(col("doc_id"), col("frame"))
      .agg(count(lit(1)).as("n_words"),
        min(col("pos")).cast("long").as("first_word_pos"))
  }
}
