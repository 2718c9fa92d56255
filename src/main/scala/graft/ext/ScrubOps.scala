package graft.ext

import graft.oracle.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy / content scrubbing operators for a training-data pipeline:
  * PII redaction (q49) and line-level boilerplate removal (q50). Both are
  * the standard pre-training curation steps (C4/CCNet-style) that sit
  * between raw ingestion and the dedup/quality family in [[CurationOps]].
  *
  * Scale posture: q49 is PURE map-side (regex count + replace inside one
  * projection — zero exchanges at any corpus size); q50's only full-corpus
  * exchange is the line-frequency aggregation, and the boilerplate set it
  * produces is small BY CONSTRUCTION (lines with df ≥ K number at most
  * |corpus_lines|/K), so the removal itself is a broadcast anti-join.
  */
object ScrubOps {

  // ---------------------------------------------------------------- q49
  /** PII redaction — count and mask emails, IPv4 addresses, and SSN-ish
    * ID tokens. Patterns deliberately use only the regex subset with
    * identical semantics in Java's engine (Spark) and RE2 (DuckDB/Go —
    * what a real scrubber's cross-language contract must survive):
    * character classes, bounded repetition, `\b` ASCII word boundaries;
    * no backreferences or lookaround (RE2 has neither).
    *
    * Each (label, pattern, replacement) is applied in order; replacement
    * tokens contain no characters matchable by later patterns, so the
    * chain is order-insensitive in effect. Output carries per-pattern
    * match counts, the md5 of the scrubbed text (cheap equality witness
    * for the full redacted corpus), and the character delta. */
  val defaultPiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ipv4", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    ("idnum", """\b[A-Z]{2}\d{6}\b""", "<ID>"))

  /** The scrub as a COLUMN (fold of regexp_replace) — shared by q49 and
    * the composed curation DAG (q52) so the redaction cannot drift. */
  private[graft] def piiCleanCol(c: org.apache.spark.sql.Column,
      patterns: Seq[(String, String, String)] = defaultPiiPatterns): org.apache.spark.sql.Column =
    patterns.foldLeft(c) { case (cc, (_, pat, repl)) => regexp_replace(cc, lit(pat), lit(repl)) }

  /** Total PII match count as a column (sum over patterns). */
  private[graft] def piiCountCol(c: org.apache.spark.sql.Column,
      patterns: Seq[(String, String, String)] = defaultPiiPatterns): org.apache.spark.sql.Column =
    patterns.map { case (_, pat, _) => regexp_count(c, lit(pat)).cast("long") }.reduce(_ + _)

  /** General form over any (doc_id, text) frame. One projection: counts
    * are `regexp_count`, the scrub is a fold of `regexp_replace` — all
    * codegen'd string expressions, zero exchanges. */
  def piiScrubOf(docs: DataFrame,
                 patterns: Seq[(String, String, String)] = defaultPiiPatterns): DataFrame = {
    val scrubbed = piiCleanCol(col("text"), patterns)
    val counts = patterns.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name")
    }
    docs.select(
      (col("doc_id") +: counts :+ col("text") :+ scrubbed.as("clean_text")): _*)
      .select(
        (col("doc_id") +: patterns.map(p => col(s"n_${p._1}")) :+
          md5(col("clean_text")).as("clean_hash") :+
          (length(col("clean_text")) - length(col("text"))).cast("long").as("chars_delta")): _*)
  }

  /** Fixture PII planting: the synthetic corpus has no PII, so fixture
    * bindings (q49, q52) plant it deterministically (id-derived emails /
    * IPs / badge numbers on residue-class subsets) — the SAME concat runs
    * in the oracle, so the regex engines are compared on real matches, not
    * on all-zero counts. Keeps every input column; only `text` changes. */
  private[graft] def plantPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", concat(
      col("text"),
      when(col("doc_id") % 3 =!= 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 4 === 1,
        concat(lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 2,
        concat(lit(" badge AB"), lpad((col("doc_id") % 1000000).cast("string"), 6, "0")))
        .otherwise(lit(""))))

  /** DuckDB text of the same planting (`text || CASE … END`) and of the
    * 3-pattern scrub / total-count — shared between q49Sql and q52's
    * oracle so the two cannot drift. */
  private[graft] val plantSql: String = {
    """text ||
      |    CASE WHEN doc_id % 3 != 0
      |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 4 = 1
      |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
      |         ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 2
      |         THEN ' badge AB' || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
      |         ELSE '' END""".stripMargin
  }

  private[graft] def scrubSql(c: String): String =
    defaultPiiPatterns.foldLeft(c) { case (acc, (_, pat, repl)) =>
      s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }

  private[graft] def countSql(c: String): String =
    defaultPiiPatterns
      .map { case (_, pat, _) => s"len(regexp_extract_all($c, '$pat'))" }
      .mkString("CAST(", " + ", " AS BIGINT)")

  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    piiScrubOf(plantPii(Tables.table(spark, sfDir, "documents"))
      .select(col("doc_id"), col("text")))

  private val q49Sql = {
    val Seq(email, ipv4, idnum) = defaultPiiPatterns.map(_._2)
    s"""WITH planted AS (
       |  SELECT doc_id, $plantSql AS text
       |  FROM documents),
       |scrubbed AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
       |         CAST(len(regexp_extract_all(text, '$ipv4')) AS BIGINT) AS n_ipv4,
       |         CAST(len(regexp_extract_all(text, '$idnum')) AS BIGINT) AS n_idnum,
       |         ${scrubSql("text")} AS clean_text,
       |         text AS orig
       |  FROM planted)
       |SELECT doc_id, n_email, n_ipv4, n_idnum, md5(clean_text) AS clean_hash,
       |       CAST(length(clean_text) - length(orig) AS BIGINT) AS chars_delta
       |FROM scrubbed""".stripMargin
  }

  // ---------------------------------------------------------------- q50
  /** Line-level boilerplate removal — the CCNet/C4 rule: a LINE that
    * repeats across ≥ `minDf` distinct documents is boilerplate (nav
    * bars, cookie banners, footers) and is dropped from every document;
    * documents are reassembled in original line order.
    *
    * Scale shape: the line stream is aggregated ONCE by line value to
    * get document frequencies (map-side partial counts over the
    * (doc, line)-distinct stream); lines crossing the threshold form a
    * set that is small by construction (≤ |corpus_lines|/minDf) and is
    * BROADCAST for the anti-join — the corpus itself is never shuffled
    * by line value a second time. The per-document reassembly groupBy is
    * the one unavoidable full exchange (keyed by doc_id, map-side
    * partials on the collect). Ordering is restored engine-portably by
    * sorting the collected (pos, line) structs, not by relying on
    * collect order. */
  def boilerplateRemoveOf(docLines: DataFrame, minDf: Long): DataFrame =
    removeLines(docLines, boilerSet(docLines).filter(col("df") >= minDf))

  /** Share-based threshold: boilerplate when df ≥ nDocs·num/den (integer
    * cross-multiply; the doc count is a 1-row broadcast, never a collect)
    * — the form that stays calibrated across corpus sizes. */
  def boilerplateRemoveByShare(docLines: DataFrame,
                               num: Long = 1L, den: Long = 20L): DataFrame = {
    val nDocs = docLines.agg(count(lit(1)).as("nd"))
    removeLines(docLines, boilerSet(docLines).crossJoin(broadcast(nDocs))
      .filter(col("df") * den >= col("nd") * num))
  }

  /** Distinct-document frequency per line value — ONE aggregation over the
    * (doc, line)-deduped stream. */
  private def boilerSet(docLines: DataFrame): DataFrame =
    docLines.select(col("doc_id"), explode(col("lines")).as("line"))
      .distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("df"))

  private def removeLines(docLines: DataFrame, boiler: DataFrame): DataFrame = {
    val lines = docLines.select(col("doc_id"),
      posexplode(col("lines")).as(Seq("pos", "line")))
    lines
      .join(broadcast(boiler.select(col("line").as("bline"))),
        col("line") === col("bline"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("pos"), col("line"))).as("kept"))
      .select(col("doc_id"),
        expr("transform(array_sort(kept), s -> s.line)").as("kept_lines"))
      .select(col("doc_id"),
        size(col("kept_lines")).cast("long").as("n_kept"),
        md5(array_join(col("kept_lines"), "\n")).as("clean_hash"))
  }

  /** Fixture binding: the corpus has no newlines, so "lines" are 8-word
    * chunks (deterministic in both engines), plus PLANTED footer lines on
    * residue-class subsets — natural 8-word chunks of random text are
    * (near-)unique, so what crosses the 5%-of-docs threshold is exactly
    * the planted boilerplate, at every SF. Docs whose every line is
    * boilerplate drop out (the CCNet behavior); the fixture's natural
    * chunks keep every doc present. */
  def boilerplateRemove(spark: SparkSession, sfDir: String): DataFrame =
    boilerplateRemoveByShare(plantedLines(Tables.table(spark, sfDir, "documents")))

  private[graft] def plantedLines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), expr(
        "transform(sequence(0, CAST(ceil(size(ws) / 8.0) AS INT) - 1), " +
          "i -> array_join(slice(ws, i * 8 + 1, 8), ' '))").as("chunks"))
      .select(col("doc_id"), concat(col("chunks"),
        when(col("doc_id") % 4 =!= 3, array(lit("subscribe to our newsletter today")))
          .otherwise(typedLit(Seq.empty[String])),
        when(col("doc_id") % 7 === 0, array(lit("all rights reserved worldwide")))
          .otherwise(typedLit(Seq.empty[String]))).as("lines"))

  private val q50Sql =
    """WITH docsw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |chunked AS (
      |  SELECT doc_id, list_transform(range(CAST(ceil(len(ws) / 8.0) AS INT)),
      |           i -> array_to_string(ws[i * 8 + 1 : i * 8 + 8], ' ')) AS chunks
      |  FROM docsw),
      |withfoot AS (
      |  SELECT doc_id, list_concat(list_concat(chunks,
      |           CASE WHEN doc_id % 4 != 3
      |                THEN ['subscribe to our newsletter today'] ELSE [] END),
      |           CASE WHEN doc_id % 7 = 0
      |                THEN ['all rights reserved worldwide'] ELSE [] END) AS lines
      |  FROM chunked),
      |exploded AS (
      |  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
      |    SELECT doc_id,
      |           unnest(list_transform(lines, (x, i) -> {'pos': i, 'line': x})) AS u
      |    FROM withfoot)),
      |nd AS (SELECT count(*) AS nd FROM withfoot),
      |boiler AS (
      |  SELECT line FROM (
      |    SELECT line, count(DISTINCT doc_id) AS df FROM exploded GROUP BY line)
      |  CROSS JOIN nd WHERE df * 20 >= nd * 1),
      |kept AS (
      |  SELECT doc_id, pos, line FROM exploded
      |  WHERE line NOT IN (SELECT line FROM boiler))
      |SELECT doc_id, count(*) AS n_kept,
      |       md5(array_to_string(list(line ORDER BY pos), chr(10))) AS clean_hash
      |FROM kept GROUP BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q49_pii_scrub", piiScrub, Some(q49Sql)),
    QueryDef("q50_boilerplate_remove", boilerplateRemove, Some(q50Sql))
  )
}
