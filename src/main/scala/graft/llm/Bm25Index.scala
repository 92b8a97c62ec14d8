package graft.llm

import graft.meta.{PartitionSpec, Schema}
import graft.meta.expr.Exprs
import graft.table.{Changelog, EncryptionManager, FileIO, IceTable,
  MergeOnRead, PlaintextEncryptionManager, TableOperations}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index: the LEXICAL twin of [[IvfIndex]] — a
  * graft TABLE of postings `(term, doc, tf, dl)` partitioned by
  * `bucket(term)`, so a query batch is a partition+metrics-pruned scan of
  * ONLY its terms' buckets instead of the tokenize-everything pass the
  * one-shot [[TextOps.bm25]] pays per call. Corpus statistics (doc count,
  * total token count) ride as table properties; document frequency is
  * derived from the matched postings themselves (df is per-term-global, so
  * the pruned scan sees every posting of each query term).
  *
  * Scoring is IDENTICAL to [[TextOps.bm25]] (same tokenizer, same Robertson
  * idf, same length normalization, rounded to 4) — LlmSpec pins the two
  * row-for-row equal, and the llm_bm25_index gate entry replays the same
  * DuckDB oracle as the one-shot op.
  *
  * Maintenance mirrors the ANN index: [[Bm25Index.buildFrom]] records the
  * corpus snapshot, [[Bm25Index.refresh]] catches up incrementally —
  * append-only ranges append postings + adjust stats in ONE atomic
  * transaction; DML ranges reduce the row-level CHANGELOG to one net
  * change per doc and apply it as equality deletes on the doc column +
  * fresh postings in ONE snapshot (strictly-older-sequence semantics make
  * the commit idempotent under crash-replay). The eq deletes then cost the
  * standard merge-on-read read tax until maintenance runs —
  * `convert_equality_deletes` / `rewrite_position_delete_files` /
  * compaction are exactly the tools that cap it (the composition is the
  * point: index maintenance is just table maintenance).
  *
  * 100 TB shape: build is one tokenize+aggregate pass (the exchange
  * carries (doc, term) partials, map-side combined); a query batch scans
  * `terms × bucket-fraction` of the postings, never the corpus; refresh
  * work is bounded by CHANGED docs. The reference has no retrieval
  * surface at all — this is training-data-pipeline scope (dedup oracles,
  * contamination checks, hybrid retrieval via [[Similarity.rrfFuse]]).
  */
final class Bm25Index private (val table: IceTable) {
  import Bm25Index._

  private def prop(k: String): String = table.meta.properties(k)
  def docCount: Long = prop(DocCountProp).toLong
  def totalTokens: Long = prop(TotalTokensProp).toLong

  /** BM25 top-k per query row. `queries` carries (id, text); the distinct
    * query TERMS (retrieval-sized — bounded by the query batch, never the
    * corpus) drive an IN-filter that prunes the postings scan by term
    * bucket, term min/max metrics, and parquet row groups. For a
    * corpus-scale query TABLE use [[queryJoin]] — this path collects the
    * batch's term set to the driver for the prune. */
  def query(queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0 && k1 >= 0 && b >= 0 && b <= 1, "bad BM25 parameters")
    val qTerms = queryTerms(queries, queryIdCol, queryTextCol)
    val terms = qTerms.select(TermCol).distinct().collect()
      .map(_.getString(0)).toSeq
    if (terms.isEmpty || docCount == 0L) return emptyResult()
    val matched = table.newScan()
      .filter(Exprs.in(TermCol, terms: _*)).toDF
    rankMatched(matched, qTerms, k, k1, b, broadcastSides = true)
  }

  /** Batch lexical-retrieval JOIN (r13): table-to-table BM25 — every row
    * of a query TABLE gets its top-k corpus docs, with NO driver term
    * collect (the lexical twin of [[IvfIndex.knnJoin]]). [[query]]'s
    * IN-filter prune is right for retrieval-sized batches, but a
    * corpus-scale batch's term set would be a corpus-scale driver collect
    * — and covers most term buckets anyway. So queryJoin reads the
    * postings ONCE and equi-joins them to the batch's (query, term)
    * pairs, end to end distributed.
    *
    * Exchange shape (honest): one full postings scan, semi-joined to the
    * batch's distinct terms; document frequency derives from the matched
    * postings (per-term-global — every posting of a matched term
    * survives the semi join); the postings⋈(query,term) equi-join
    * shuffles on `term` — stopword-heavy batches skew on hot terms (AQE's
    * skew split absorbs it; upstream stopword removal helps more); the
    * per-(query, doc) score fold is one exchange; the ranking is the
    * bounded map-side top-k heap — no window, no full sort, no driver
    * state. Scores are IDENTICAL to [[query]]'s (same fold, same
    * rounding): LlmSpec pins row-for-row equality on the same batch, and
    * the llm_bm25_join gate entry replays the one-shot DuckDB oracle. */
  def queryJoin(queries: DataFrame, queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0 && k1 >= 0 && b >= 0 && b <= 1, "bad BM25 parameters")
    if (docCount == 0L) return emptyResult()
    val qTerms = queryTerms(queries, queryIdCol, queryTextCol)
    val matched = table.toDF
      .join(qTerms.select(TermCol).distinct(), Seq(TermCol), "left_semi")
    rankMatched(matched, qTerms, k, k1, b, broadcastSides = false)
  }

  /** Distinct (query_id, term) pairs of the batch. */
  private def queryTerms(queries: DataFrame, queryIdCol: String,
      queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol).as("query_id"),
        explode(nonEmptyTokens(col(queryTextCol))).as(TermCol))
      .distinct()

  /** The shared scoring fold: Robertson idf × saturated tf, summed per
    * (query, doc), rounded to 4, ranked by the bounded top-k heap.
    * `broadcastSides` marks the retrieval-batch shape (qTerms and the
    * per-term df table are tiny → broadcast); queryJoin leaves both as
    * shuffle joins on `term`. */
  private def rankMatched(matched: DataFrame, qTerms: DataFrame, k: Int,
      k1: Double, b: Double, broadcastSides: Boolean): DataFrame = {
    val n = docCount.toDouble
    // exact long-sum / count division (the one-shot op's Spark avg
    // accumulates in double; both match the oracle at the rounded scale)
    val avgdl = math.max(totalTokens.toDouble / docCount, 1e-9)
    val dfByTerm = matched.groupBy(TermCol).agg(count(lit(1)).as("_gf_df"))
    def side(d: DataFrame) = if (broadcastSides) broadcast(d) else d
    val scored = matched
      .join(side(qTerms), Seq(TermCol))
      .join(side(dfByTerm), Seq(TermCol))
      .select(col("query_id"), col(DocCol),
        (log(lit(1.0) + (lit(n) - col("_gf_df") + 0.5) / (col("_gf_df") + 0.5)) *
          (col(TfCol) * (k1 + 1.0)) /
          (col(TfCol) + lit(k1) * (lit(1.0 - b) +
            lit(b) * col(DlCol) / lit(avgdl))))
          .as("_gf_s"))
      .groupBy("query_id", DocCol)
      .agg(round(sum("_gf_s"), 4).as("sim"))
      .select(col("query_id"), col(DocCol).as("neighbor_id"), col("sim"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"),
        col("sim").as("score"))
  }

  private def emptyResult(): DataFrame =
    table.spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType))))
}

object Bm25Index {
  val TermCol = "term"
  val DocCol = "doc"
  val TfCol = "tf"
  val DlCol = "dl"
  val DocCountProp = "bm25.doc-count"
  val TotalTokensProp = "bm25.total-tokens"
  val NBucketsProp = "bm25.n-buckets"
  val IdColProp = "bm25.id-col"
  val TextColProp = "bm25.text-col"
  val CorpusLocProp = "bm25.corpus-location"
  val CorpusSnapProp = "bm25.corpus-snapshot-id"

  private val VersionPrefix = "ix-v"
  private def committedMarker(dir: String) = s"$dir/bm25.committed"

  /** Same tokenizer as [[TextOps.bm25]] — the score-parity contract. */
  private def nonEmptyTokens(c: org.apache.spark.sql.Column) =
    filter(TextOps.tokens(c), t => t =!= "")

  /** Postings of a corpus frame: one row per (doc, term) with the term
    * frequency and the doc's token length. Zero-token docs emit no
    * postings (they still count in the stored corpus stats). */
  private def postingsOf(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus
      .select(col(idCol).cast("long").as(DocCol),
        nonEmptyTokens(col(textCol)).as("_gf_ts"))
      .select(col(DocCol), explode(col("_gf_ts")).as(TermCol),
        size(col("_gf_ts")).as(DlCol))
      .groupBy(DocCol, TermCol, DlCol)
      .agg(count(lit(1)).as(TfCol))
      .select(col(TermCol), col(DocCol), col(TfCol), col(DlCol))

  /** (doc count, total tokens) of a corpus frame — exact long arithmetic. */
  private def statsOf(corpus: DataFrame, textCol: String): (Long, Long) = {
    val r = corpus.agg(count(lit(1)),
      coalesce(sum(size(nonEmptyTokens(col(textCol)))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def versionDirs(io: FileIO, location: String): Seq[(Int, String)] =
    if (!io.exists(location)) Nil
    else io.list(location).filter(_.isDirectory).flatMap { st =>
      st.getPath.getName.stripPrefix(VersionPrefix).toIntOption
        .filter(_ => st.getPath.getName.startsWith(VersionPrefix))
        .map(_ -> st.getPath.toString)
    }

  private def currentDir(io: FileIO, location: String): Option[String] =
    versionDirs(io, location)
      .filter { case (_, dir) => io.exists(committedMarker(dir)) }
      .sortBy(-_._1).headOption.map(_._2)

  /** Build (or replace) the index at `location`. Crash-atomic publish —
    * the [[IvfIndex]] protocol: a fresh immutable `ix-v{N}` directory,
    * committed by a create-new marker; readers only load marker-bearing
    * versions, so a crash leaves the previous index current. */
  def build(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, location: String, nBuckets: Int = 32,
      encryption: EncryptionManager = PlaintextEncryptionManager): Bm25Index =
    buildWith(spark, corpus, idCol, textCol, location, nBuckets, Map.empty,
      encryption)

  /** [[build]] from a graft TABLE, snapshot-pinned so [[refresh]] can plan
    * exactly the delta (same provenance contract as `IvfIndex.buildFrom`). */
  def buildFrom(spark: SparkSession, corpus: IceTable, idCol: String,
      textCol: String, location: String, nBuckets: Int = 32): Bm25Index =
    corpus.meta.currentSnapshotId match {
      case Some(id) => buildWith(spark,
        corpus.newScan().useSnapshot(id).toDF, idCol, textCol, location,
        nBuckets,
        Map(CorpusLocProp -> corpus.location, CorpusSnapProp -> id.toString),
        corpus.io.encryption)
      case None =>
        buildWith(spark, corpus.toDF, idCol, textCol, location, nBuckets,
          Map.empty, corpus.io.encryption)
    }

  private def buildWith(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, location: String, nBuckets: Int,
      extraProps: Map[String, String],
      enc: EncryptionManager = PlaintextEncryptionManager): Bm25Index = {
    require(nBuckets >= 1, s"bad bucket count $nBuckets")
    val (nDocs, totTokens) = statsOf(corpus, textCol)
    val posts = postingsOf(corpus, idCol, textCol)
    // an index over an ENCRYPTED corpus is keyed under the same manager
    // automatically (buildFrom): postings ARE corpus content — term
    // strings reconstruct documents almost verbatim
    val io = new FileIO(spark.sparkContext.hadoopConfiguration, enc,
      enc != PlaintextEncryptionManager)
    val existing = versionDirs(io, location)
    val next = (0 +: existing.map(_._1)).max + 1
    val target = s"$location/$VersionPrefix$next"
    val schema = Schema.fresh(posts.schema)
    val spec = PartitionSpec.builderFor(schema).bucket(TermCol, nBuckets).build()
    try {
      val t = IceTable.createWith(spark, new TableOperations(target, io),
        schema, spec,
        properties = Map(DocCountProp -> nDocs.toString,
          TotalTokensProp -> totTokens.toString,
          NBucketsProp -> nBuckets.toString,
          IdColProp -> idCol, TextColProp -> textCol,
          // many bucket partitions per append: fanout avoids a sort
          graft.meta.model.TableProperties.FanoutEnabled -> "true")
          ++ extraProps)
      t.append(posts)
      if (!io.writeAtomic(committedMarker(target), "committed"))
        throw new IllegalStateException(
          s"Concurrent build committed $target first")
    } catch {
      case e: Throwable => io.deleteRecursive(target); throw e
    }
    existing.foreach { case (_, dir) =>
      io.delete(committedMarker(dir))
      io.deleteRecursive(dir)
    }
    load(spark, location, enc)
  }

  /** Load the index; a KEYED index (built from an encrypted corpus) needs
    * the same manager — a plaintext handle refuses its sealed metadata. */
  def load(spark: SparkSession, location: String,
      encryption: EncryptionManager = PlaintextEncryptionManager): Bm25Index = {
    val io = new FileIO(spark.sparkContext.hadoopConfiguration, encryption,
      encryption != PlaintextEncryptionManager)
    val dir = currentDir(io, location).getOrElse(
      throw new graft.table.NoSuchTableException(s"No BM25 index at $location"))
    new Bm25Index(IceTable.loadWith(spark, new TableOperations(dir, io)))
  }

  /** Outcome of [[refresh]]: docs appended/upserted incrementally, docs
    * net-deleted, whether a full rebuild replaced the index. */
  final case class RefreshResult(index: Bm25Index, upserted: Long,
      deleted: Long, rebuilt: Boolean)

  /** Catch the index up with its corpus table. Append-only ranges: one
    * postings append + stats/watermark advance in ONE atomic transaction.
    * Ranges with deletes/overwrites: the row-level changelog reduced to
    * one net change per doc — equality deletes on the doc column retire
    * every stale posting of changed docs (deleted docs included, NO index
    * scan: eq deletes match by value at read), fresh postings append in
    * the SAME snapshot, stats adjust from the changelog's own old/new
    * text (the delete half of a CoW update carries the pre-image). The
    * watermark advances in a second commit; a crash between them
    * CONVERGES on rerun — the replayed eq delete kills the prior
    * attempt's appended postings (strictly-older-sequence) before
    * re-appending. Falls back to a full rebuild when the changelog
    * refuses the range (expired/rolled-back watermark) or the changed-doc
    * share exceeds `maxChangedShare`. */
  def refresh(spark: SparkSession, corpus: IceTable, location: String,
      maxChangedShare: Double = 0.5): RefreshResult = {
    val idx = load(spark, location, corpus.io.encryption)
    val props = idx.table.meta.properties
    val recorded = props.get(CorpusSnapProp).map(_.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"Index at $location records no corpus snapshot — build it with " +
          "Bm25Index.buildFrom(corpus) to enable incremental refresh"))
    val current = corpus.meta.currentSnapshotId.getOrElse(recorded)
    if (current == recorded) return RefreshResult(idx, 0L, 0L, rebuilt = false)
    val (idCol, textCol) = (props.get(IdColProp), props.get(TextColProp)) match {
      case (Some(i), Some(t)) => (i, t)
      case _ => corpusCols(corpus) // pre-props index: infer from the schema
    }
    val nBuckets = props(NBucketsProp).toInt
    def rebuild(): RefreshResult = RefreshResult(
      buildFrom(spark, corpus, idCol, textCol, location, nBuckets),
      0L, 0L, rebuilt = true)
    val delta =
      try corpus.appendsBetween(recorded, current, skipDeleteSnapshots = false)
      catch {
        case _: graft.table.ValidationException =>
          return changelogRefresh(spark, corpus, idx, location, idCol,
            textCol, recorded, current, maxChangedShare).getOrElse(rebuild())
        case _: IllegalArgumentException => return rebuild()
      }
    val (nNew, tokNew) = statsOf(delta, textCol)
    if (nNew == 0) {
      idx.table.updateProperties(Map(CorpusSnapProp -> current.toString))
      return RefreshResult(idx, 0L, 0L, rebuilt = false)
    }
    idx.table.newTransaction()
      .append(postingsOf(delta, idCol, textCol))
      .updateProperties(Map(
        DocCountProp -> (idx.docCount + nNew).toString,
        TotalTokensProp -> (idx.totalTokens + tokNew).toString,
        CorpusSnapProp -> current.toString,
        CorpusLocProp -> corpus.location))
      .commit()
    RefreshResult(load(spark, location, corpus.io.encryption), nNew, 0L,
      rebuilt = false)
  }

  /** The (id, text) column names the index was built over — recovered from
    * the corpus schema: the index stores postings, not column names, so
    * the corpus table must still expose exactly one string text column
    * and one integral id column for refresh to re-tokenize the delta. */
  private def corpusCols(corpus: IceTable): (String, String) = {
    val fields = corpus.schema.struct.fields
    val texts = fields.filter(_.dataType ==
      org.apache.spark.sql.types.StringType).map(_.name)
    val ids = fields.filter(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType).map(_.name)
    require(texts.length >= 1 && ids.length >= 1,
      s"cannot infer (id, text) columns from ${fields.map(_.name).mkString(",")}")
    (ids.head, texts.head)
  }

  private def changelogRefresh(spark: SparkSession, corpus: IceTable,
      idx: Bm25Index, location: String, idCol: String, textCol: String,
      recorded: Long, current: Long,
      maxChangedShare: Double): Option[RefreshResult] = {
    val ch =
      try Changelog.changes(corpus, Some(recorded), Some(current))
      catch {
        case _: IllegalArgumentException => return None
        case _: graft.table.ValidationException => return None
      }
    // net change per doc: first change's pre-image (a doc that existed
    // before the range surfaces first as a DELETE — the delete half of a
    // CoW update carries the old row) + last change's post-image (insert
    // wins a same-ordinal delete+insert pair)
    val ins = (col(Changelog.ChangeTypeCol) === Changelog.Insert).cast("int")
    val net = ch.select(col(idCol).cast("long").as(DocCol),
        struct(col(Changelog.OrdinalCol), ins.as("_ins"),
          size(nonEmptyTokens(col(textCol))).as("_dl"),
          col(textCol).as("_text")).as("_c"))
      .groupBy(DocCol)
      .agg(
        min_by(col("_c"), struct(col("_c." + Changelog.OrdinalCol),
          col("_c._ins"))).as("_first"),
        max_by(col("_c"), struct(col("_c." + Changelog.OrdinalCol),
          col("_c._ins"))).as("_last"))
      .select(col(DocCol),
        (col("_first._ins") === 0).as("_existed"),
        col("_first._dl").as("_old_dl"),
        (col("_last._ins") === 1).as("_exists"),
        col("_last._dl").as("_new_dl"),
        col("_last._text").as("_new_text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = net.agg(
        count(lit(1)),
        coalesce(sum(when(col("_existed"), 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("_exists"), 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("_existed"), col("_old_dl").cast("long"))
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("_exists"), col("_new_dl").cast("long"))
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(col("_existed") && !col("_exists"), 1L)
          .otherwise(0L)), lit(0L))).head()
      val (changed, existed, exists, oldTok, newTok, deleted) =
        (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3),
          agg.getLong(4), agg.getLong(5))
      if (changed == 0) {
        idx.table.updateProperties(Map(CorpusSnapProp -> current.toString))
        return Some(RefreshResult(idx, 0L, 0L, rebuilt = false))
      }
      if (idx.docCount > 0 &&
          changed.toDouble / idx.docCount > maxChangedShare) return None
      // ONE snapshot: eq deletes on doc retire every stale posting of the
      // changed docs; fresh postings of the post-image docs append.
      // Deletes cover ALL changed docs, not just _existed ones: a crash
      // after this commit replays the same range, and docs INSERTED inside
      // it now have first-attempt postings that must retire before the
      // rerun re-appends them (an eq delete on a doc with no postings is a
      // harmless no-op, so replay converges for inserts too).
      val eqKeys = net.select(col(DocCol))
      val fresh = postingsOf(
        net.filter(col("_exists"))
          .select(col(DocCol).as(idCol), col("_new_text").as(textCol)),
        idCol, textCol)
      MergeOnRead.deleteAndAppend(idx.table, Seq(DocCol), eqKeys, fresh,
        Map("bm25-refresh-changed-docs" -> changed.toString))
      idx.table.updateProperties(Map(
        DocCountProp -> (idx.docCount + exists - existed).toString,
        TotalTokensProp -> (idx.totalTokens + newTok - oldTok).toString,
        CorpusSnapProp -> current.toString,
        CorpusLocProp -> corpus.location))
      Some(RefreshResult(load(spark, location, corpus.io.encryption),
        exists, deleted, rebuilt = false))
    } finally net.unpersist()
  }
}
