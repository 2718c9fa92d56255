package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q179 — PCM amplitude census: the first BODY-touching decode (r14
  * verdict Next #7). q124/q174 proved the header economics (fixed-slice
  * column parse, JVM-codec residue); the next rung of real multimodal
  * decode reads PAYLOAD BYTES — here the 16-bit little-endian PCM
  * samples of synthesized WAV files, folded into an amplitude census
  * (sample count, Σ|amplitude|, max |amplitude|) — with the same
  * column-bulk / JVM-residue discipline:
  *
  *   - the column lane hexes a FIXED slice (44-byte header +
  *     [[SliceSamples]] samples), reads the data-chunk length from the
  *     header bytes, and — when the whole body fits the slice — folds
  *     the samples with in-row `aggregate` lambdas over `conv` byte
  *     reads: map-side, no JVM calls, a 100 MB payload ships 76 bytes;
  *   - payloads whose body exceeds the slice are honest-NULL in the
  *     column lane and ESCALATE to the stateful JVM codec
  *     ([[PcmCodec.decode]], mapPartitions) — which alone walks
  *     unbounded bodies; the escalation filter bounds its input to
  *     exactly the residue rows (spec-pinned).
  *
  * Fixture: every doc becomes a REAL 44-byte RIFF/WAVE container
  * (fmt + data chunks, true LE fields) holding n = 4 + hash%28 samples
  * u_i = (v·31 + i·2654435761) mod 2¹⁶ — so the ORACLE never parses
  * bytes: it recomputes the planted samples arithmetically (the q174
  * discipline), and the hash match proves the byte path — header
  * offsets, LE decode, sign handling, lane split, JVM fold — recovers
  * exactly what was planted. |signed| of u: u < 2¹⁵ → u, else 2¹⁶ − u.
  *
  * Scale shape: one corpus pass, map-side synthesis and parse, the
  * escalated residue rides a filtered mapPartitions (iterator state,
  * no shuffle), one ≤2-row final rollup (per-lane partials combined in
  * one aggregate). */
object PcmDecode {

  /** Samples the column slice carries; bodies longer than this escalate. */
  val SliceSamples = 16

  /** Header (44) + slice samples, in bytes. */
  val SliceBytes: Int = 44 + 2 * SliceSamples

  /** The stateful JVM lane: RIFF/WAVE walk + full-body PCM fold.
    * Returns (n_samples, sum_abs, max_abs); None on anything that is
    * not a complete little-endian 16-bit PCM WAV. */
  object PcmCodec {
    private def le(b: Array[Byte], off: Int, n: Int): Long =
      (0 until n).map(k => (b(off + k) & 0xffL) << (8 * k)).sum

    def decode(b: Array[Byte]): Option[(Long, Long, Long)] = {
      if (b.length < 44) return None
      if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
      if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
      if (!(b(36) == 'd' && b(37) == 'a' && b(38) == 't' && b(39) == 'a')) return None
      val dlen = le(b, 40, 4)
      if (dlen % 2 != 0 || 44 + dlen > b.length) return None
      val n = (dlen / 2).toInt
      var i = 0
      var sum = 0L
      var mx = 0L
      while (i < n) {
        val u = le(b, 44 + 2 * i, 2)
        val a = if (u >= 32768) 65536 - u else u
        sum += a
        if (a > mx) mx = a
        i += 1
      }
      Some((n.toLong, sum, mx))
    }
  }

  // ------------------------------------------------------------- fixture

  /** (doc_id, media): real WAV containers with planted PCM bodies. */
  private[graft] def fixturePcmMedia(docs: DataFrame): DataFrame = {
    def hv(off: Int) = TextOps.hexVal("h", off, duck = false)
    val leHexSample =
      "concat(lpad(hex(((v2 * 31 + i * 2654435761) % 65536) % 256), 2, '0'), " +
        "lpad(hex((v2 * 31 + i * 2654435761) % 65536 div 256), 2, '0'))"
    docs
      .withColumn("h", md5(concat(lit("pcm|"), col("doc_id"))))
      .withColumn("v1", expr(hv(1))).withColumn("v2", expr(hv(9)))
      .withColumn("n", expr("CAST(4 + v1 % 28 AS BIGINT)"))
      .withColumn("dlen", expr("2 * n"))
      .withColumn("pcm", expr(
        s"array_join(transform(sequence(0, CAST(n AS INT) - 1), i -> $leHexSample), '')"))
      .withColumn("media", expr(
        s"unhex('52494646' || ${HeaderDims.leHex("36 + dlen", 4, duck = false)} || " +
          "'57415645666d74201000000001000100' || '44ac0000' || '88580100' || " +
          s"'02001000' || '64617461' || ${HeaderDims.leHex("dlen", 4, duck = false)} || pcm)"))
      .select(col("doc_id"), col("media"))
  }

  // ------------------------------------------------------------ the parse

  /** The column lane over any (media: binary) frame: (…, n_samples,
    * col_sum_abs, col_max_abs) — stats NULL when the body exceeds the
    * slice (the escalation trigger) or the container does not parse. */
  private[graft] def parsedPcm(media: DataFrame): DataFrame = {
    def b(o: String) = HeaderDims.beVal("hx", o, 1, duck = false)
    val le16 = s"(${b("45 + 2 * i")} + 256 * ${b("46 + 2 * i")})"
    val absExpr = s"(CASE WHEN $le16 >= 32768 THEN 65536 - $le16 ELSE $le16 END)"
    val isWav = "substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' " +
      "AND substr(hx, 73, 8) = '64617461'"
    media
      .withColumn("hx", lower(hex(expr(s"substring(media, 1, $SliceBytes)"))))
      // dlen parity gate: PcmCodec.decode rejects odd dlen (a 16-bit PCM
      // body is an even byte count by construction), so the column lane
      // must agree that an odd-dlen container is invalid — without the
      // `% 2 = 0` condition the two lanes disagreed on what a valid
      // container IS for malformed non-fixture input (r15 advice). NULL
      // here lands the container in n_payloads only, exactly where the
      // JVM codec's honest None would land it; no escalation is needed
      // because the parity test already IS the JVM lane's verdict.
      .withColumn("n_samples", expr(
        s"CASE WHEN $isWav AND (${HeaderDims.leVal("hx", 41, 4, duck = false)}) % 2 = 0 " +
          s"THEN (${HeaderDims.leVal("hx", 41, 4, duck = false)}) div 2 END"))
      .withColumn("col_sum_abs", expr(
        // lower bound 1: sequence(0, n-1) DESCENDS for n = 0 (Spark
        // fills start>stop with step -1) — a zero-sample container must
        // escalate to the JVM fold (which answers (0,0,0)), never read
        // garbage offsets
        s"CASE WHEN n_samples BETWEEN 1 AND $SliceSamples THEN " +
          s"aggregate(sequence(0, CAST(n_samples AS INT) - 1), 0L, (acc, i) -> acc + $absExpr) END"))
      .withColumn("col_max_abs", expr(
        s"CASE WHEN n_samples BETWEEN 1 AND $SliceSamples THEN " +
          s"aggregate(sequence(0, CAST(n_samples AS INT) - 1), 0L, (acc, i) -> greatest(acc, $absExpr)) END"))
  }

  /** The composed two-lane census — ONE row: (n_payloads, n_col, n_jvm,
    * n_samples, sum_abs, max_abs). */
  def pcmCensusOf(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val parsed = Tables.swapPersist("q179_parsed", parsedPcm(media))
    // the residue: parse-positive containers whose body exceeds the
    // slice (col stats NULL). Bytes ride ONLY these rows into the codec.
    val escalated = parsed
      .filter(col("n_samples").isNotNull && col("col_sum_abs").isNull)
      .select(col("media")).as[Array[Byte]]
      .mapPartitions { it =>
        it.map { bytes =>
          PcmCodec.decode(bytes) match {
            case Some((n, s, m)) => (1L, n, s, m)
            case None => (0L, 0L, 0L, 0L)
          }
        }
      }.toDF("ok", "n", "s", "m")
      .agg(coalesce(sum(col("ok")), lit(0L)).as("n_jvm"),
        coalesce(sum(col("n")), lit(0L)).as("jvm_n"),
        coalesce(sum(col("s")), lit(0L)).as("jvm_sum"),
        coalesce(max(col("m")), lit(0L)).as("jvm_max"))
    val colSide = parsed.agg(
      count(lit(1)).as("n_payloads"),
      count(col("col_sum_abs")).as("n_col"),
      coalesce(sum(when(col("col_sum_abs").isNotNull, col("n_samples"))), lit(0L)).as("col_n"),
      coalesce(sum(col("col_sum_abs")), lit(0L)).as("col_sum"),
      // max gated EXACTLY like the sum: a truncated container whose header
      // claims an in-slice dlen reads NULL col_sum_abs (conv('') is NULL →
      // the lambda fold nulls out, the row escalates, the JVM codec
      // honestly returns None) but can leave a non-NULL PARTIAL
      // col_max_abs — greatest() skips NULLs mid-fold — so an ungated max
      // would count garbage from a payload belonging to neither lane
      // (r15 advice).
      coalesce(max(when(col("col_sum_abs").isNotNull, col("col_max_abs"))), lit(0L)).as("col_max"))
    colSide.crossJoin(broadcast(escalated))
      .select(col("n_payloads"), col("n_col"), col("n_jvm"),
        (col("col_n") + col("jvm_n")).as("n_samples"),
        (col("col_sum") + col("jvm_sum")).as("sum_abs"),
        greatest(col("col_max"), col("jvm_max")).as("max_abs"))
  }

  // ---------------------------------------------------------------- q179
  def q179(spark: SparkSession, sfDir: String): DataFrame =
    pcmCensusOf(fixturePcmMedia(Tables.table(spark, sfDir, "documents")))

  /** Arithmetic oracle — recomputes the planted samples, never parsing
    * a byte: the hash match IS the proof the byte path (LE fields, sign
    * handling, lane split, JVM fold) recovers the plant exactly. */
  private val q179Sql = {
    def hv(off: Int) = TextOps.hexVal("h", off, duck = true)
    s"""WITH hsh AS (SELECT md5('pcm|' || doc_id) AS h FROM documents),
       |g AS (SELECT 4 + ${hv(1)} % 28 AS n, ${hv(9)} AS v2 FROM hsh),
       |s AS (SELECT n, unnest(list_transform(range(0, CAST(n AS INT)),
       |               i -> (v2 * 31 + i * 2654435761) % 65536)) AS u
       |      FROM g),
       |a AS (SELECT CASE WHEN u >= 32768 THEN 65536 - u ELSE u END AS ab FROM s)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_payloads,
       |       (SELECT CAST(count(*) AS BIGINT) FROM g WHERE n <= $SliceSamples) AS n_col,
       |       (SELECT CAST(count(*) AS BIGINT) FROM g WHERE n > $SliceSamples) AS n_jvm,
       |       (SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) FROM g) AS n_samples,
       |       (SELECT CAST(COALESCE(sum(ab), 0) AS BIGINT) FROM a) AS sum_abs,
       |       (SELECT CAST(COALESCE(max(ab), 0) AS BIGINT) FROM a) AS max_abs""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q179_pcm_census", q179, Some(q179Sql)))
}
