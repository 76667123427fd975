package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mention detection + entity-link scoring over the page table (north
  * star: gazetteer mentions with TF-IDF/context-window scoring, emitting
  * candidate (subj, pred, obj) triples).
  *
  * Plan shape at scale:
  *  1. `mapPartitions` scan: broadcast trie, one pass per document →
  *     flat mention rows `(doc_id, entity, tf)` — no shuffle;
  *  2. document frequency: one hash-agg on `entity` (tiny, dictionary
  *     cardinality) → broadcast back;
  *  3. score = tf · ln(N/df) as a Column expression;
  *  4. triples via `select`s/unions — everything downstream of the
  *     opaque scan stays relational so Catalyst can optimize it.
  */
object MentionScan {

  /** (doc_id, entity, tf) — one row per (document, gazetteer entity). */
  def mentions(pages: DataFrame, gazetteer: Gazetteer): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    pages.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val trie = bc.value
        it.flatMap { case (docId, text) =>
          trie.countMatches(text).map { case (ent, tf) => (docId, ent, tf.toLong) }
        }
      }
      .toDF("doc_id", "entity", "tf")
  }

  /** Per-document sorted entity set, emitted directly from the scan —
    * mentions of one document never leave the task that extracted them,
    * so co-occurrence needs no doc-keyed shuffle at all (the set IS the
    * co-occurrence unit). This is the scale path: the only shuffle left
    * downstream is the dictionary-sized pair aggregation.
    */
  def mentionSets(pages: DataFrame, gazetteer: Gazetteer): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    pages.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val trie = bc.value
        it.map { case (docId, text) =>
          (docId, trie.countMatches(text).keys.toSeq
            .sorted(graft.model.CodePoint.ordering))
        }
      }
      .toDF("doc_id", "es")
  }

  /** Co-occurrence from per-doc sets: in-row ordered-pair expansion →
    * map-side-combined count over ≤|gazetteer|² groups.
    */
  def coOccurrenceFromSets(sets: DataFrame): DataFrame =
    sets
      .select(explode(expr(
        """flatten(transform(es, (x, i) ->
          |  transform(slice(es, i + 2, size(es)),
          |    y -> named_struct('e1', x, 'e2', y))))""".stripMargin)).as("p"))
      .groupBy(col("p.e1").as("e1"), col("p.e2").as("e2"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        concat(lit("urn:ent:"), col("e1")).as("s"),
        lit(CoOccursPred).as("p"),
        concat(lit("urn:ent:"), col("e2")).as("o"),
        col("n_docs"))

  /** Partition-fused co-occurrence — the 100 TB fast path. The explode
    * formulation above is fully declarative but materializes one row per
    * (doc, entity-pair): ~45 string-struct rows/doc through the hash
    * aggregate, which profiling showed dominating the front end (≈4.5 s
    * of the 8.3 s full pipeline at local[32], REP=512). Since the pair
    * histogram is dictionary-sized, each partition can accumulate it in
    * a primitive LongMap keyed by `i*K + j` over broadcast entity
    * indices and emit ≤ K²/2 partial rows — the shuffle carries
    * per-partition partials instead of per-document pairs. Same output
    * as [[coOccurrenceFromSets]] (equivalence ScalaTested): indices are
    * assigned in lexicographic entity order, so (e1 < e2) pairing is
    * preserved.
    */
  def coOccurrenceFused(sets: DataFrame, entities: Seq[String]): DataFrame = {
    val spark = sets.sparkSession
    import spark.implicits._
    val sorted = entities.sorted(graft.model.CodePoint.ordering).toArray
    val k = sorted.length
    val bcIdx = spark.sparkContext.broadcast(sorted.zipWithIndex.toMap)
    val partials = sets.select(col("es")).as[Seq[String]]
      .mapPartitions { it =>
        val idx = bcIdx.value
        val counts = new scala.collection.mutable.LongMap[Long]()
        val buf = new Array[Int](k)
        for (es <- it) {
          var n = 0
          es.foreach { e =>
            val i = idx.getOrElse(e, -1)
            if (i >= 0) { buf(n) = i; n += 1 }
          }
          java.util.Arrays.sort(buf, 0, n)
          var i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              val key = buf(i).toLong * k + buf(j)
              counts(key) = counts.getOrElse(key, 0L) + 1L
              j += 1
            }
            i += 1
          }
        }
        counts.iterator
      }
      .toDF("key", "cnt")
    val dict = typedLit(sorted.toSeq)
    partials.groupBy("key").agg(sum("cnt").as("n_docs"))
      .select(
        concat(lit("urn:ent:"),
          element_at(dict, (col("key") / k).cast("int") + 1)).as("s"),
        lit(CoOccursPred).as("p"),
        concat(lit("urn:ent:"),
          element_at(dict, (col("key") % k).cast("int") + 1)).as("o"),
        col("n_docs"))
  }

  /** Index-typed variant of [[coOccurrenceFused]] for scans that already
    * dictionary-encode entities (`es` = array<int> of entity indices in
    * lexicographic entity order): no per-doc string lookups, int pair
    * keys end-to-end. */
  def coOccurrenceFusedIdx(setsIdx: DataFrame, entities: Seq[String]): DataFrame = {
    val sorted = entities.sorted(graft.model.CodePoint.ordering)
    restoreCoOccurStrings(coOccurrencePairsIdx(setsIdx, sorted.length), sorted)
  }

  /** Fused pair histogram kept in the index domain: `(e1, e2, n_docs)`
    * with e1 < e2 as Int dictionary positions — the form the canonical
    * pipeline feeds to connected components so the CC shuffles carry
    * 4-byte keys instead of `urn:ent:` strings (round-3 verdict #5).
    * Indices are assigned in lexicographic entity order, so numeric
    * min/ordering over indices ≡ string ordering over entity URIs — CC
    * labels restore to exactly the string-path labels.
    */
  def coOccurrencePairsIdx(setsIdx: DataFrame, k: Int): DataFrame = {
    val spark = setsIdx.sparkSession
    import spark.implicits._
    val partials = setsIdx.select(col("es")).as[Seq[Int]]
      .mapPartitions { it =>
        val counts = new scala.collection.mutable.LongMap[Long]()
        for (es <- it) {
          val n = es.length
          var i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              val key = es(i).toLong * k + es(j)
              counts(key) = counts.getOrElse(key, 0L) + 1L
              j += 1
            }
            i += 1
          }
        }
        counts.iterator
      }
      .toDF("key", "cnt")
    partials.groupBy("key").agg(sum("cnt").as("n_docs"))
      .select((col("key") / k).cast("int").as("e1"),
        (col("key") % k).cast("int").as("e2"), col("n_docs"))
  }

  /** Dictionary restore for [[coOccurrencePairsIdx]] output → the
    * (s, p, o, n_docs) triple form. */
  def restoreCoOccurStrings(pairsIdx: DataFrame,
                            sortedEntities: Seq[String]): DataFrame = {
    val dict = typedLit(sortedEntities)
    pairsIdx.select(
      concat(lit("urn:ent:"), element_at(dict, col("e1") + 1)).as("s"),
      lit(CoOccursPred).as("p"),
      concat(lit("urn:ent:"), element_at(dict, col("e2") + 1)).as("o"),
      col("n_docs"))
  }

  /** Dictionary-encoded mention scan: `(doc_id, e, tf)` with `e` the
    * entity's position in the lexicographically-sorted gazetteer — the
    * production form of [[mentions]] (round-3 verdict #5): everything
    * between the scan and the final string restore (co-occurrence
    * histogram, CC edges, stats joins) runs on ints.
    */
  def mentionsIdx(pages: DataFrame, gazetteer: Gazetteer): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    val bcIdx = spark.sparkContext.broadcast(
      gazetteer.entityList.sorted(graft.model.CodePoint.ordering)
        .zipWithIndex.toMap)
    pages.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val trie = bc.value
        val idx = bcIdx.value
        it.flatMap { case (docId, text) =>
          trie.countMatches(text).map { case (ent, tf) =>
            (docId, idx(ent), tf.toLong) }
        }
      }
      .toDF("doc_id", "e", "tf")
  }

  /** [[mentionsIdx]] carrying one extra long payload column (e.g. the
    * crawl age derived from `warc_ts`) through the scan task — mentions
    * of a document never leave the task that extracted them, so
    * per-entity TEMPORAL aggregates (first/last seen, active days) need
    * no doc-keyed join against the corpus at all; the only shuffle is
    * the dictionary-sized groupBy(e).
    */
  def mentionsIdxWith(pages: DataFrame, payload: org.apache.spark.sql.Column,
      gazetteer: Gazetteer): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(gazetteer)
    val bcIdx = spark.sparkContext.broadcast(
      gazetteer.entityList.sorted(graft.model.CodePoint.ordering)
        .zipWithIndex.toMap)
    pages.select(col("doc_id"), payload.cast("long").as("payload"),
        col("text")).as[(Long, Long, String)]
      .mapPartitions { it =>
        val trie = bc.value
        val idx = bcIdx.value
        it.flatMap { case (docId, p, text) =>
          trie.countMatches(text).map { case (ent, tf) =>
            (docId, p, idx(ent), tf.toLong) }
        }
      }
      .toDF("doc_id", "payload", "e", "tf")
  }

  /** TF-IDF link score per mention: `tf * ln(nDocs / df)`. The df side is
    * dictionary-sized → broadcast join.
    */
  def scored(mentionsDf: DataFrame, nDocs: Long): DataFrame = {
    val df = mentionsDf.groupBy("entity").agg(count(lit(1)).as("df"))
    mentionsDf
      .join(broadcast(df), Seq("entity"))
      .withColumn("score", col("tf") * log(lit(nDocs.toDouble) / col("df")))
  }

  /** Context-window mention features (the north star's "context-window
    * entity-link scoring" side): per (doc, entity), tf plus `ctx` = the
    * number of OTHER gazetteer tokens within ±`window` token positions of
    * each occurrence, summed over occurrences — a link-coherence signal
    * (mentions surrounded by known entities are likelier true links).
    * One per-partition pass (two-pointer over the sorted occurrence
    * positions, O(tokens + mentions·density)), no shuffle; integer
    * outputs so the DuckDB oracle replays it exactly.
    *
    * Token semantics mirror the oracle: split on single spaces keeping
    * empties (`split(" ", -1)` ≡ DuckDB `string_split(text, ' ')`), which
    * on this gazetteer equals the trie's word-boundary counts
    * (asserted in MentionScanSpec).
    */
  def mentionContexts(pages: DataFrame, entities: Seq[String],
                      window: Int): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(entities.toSet)
    pages.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val gaz = bc.value
        it.flatMap { case (docId, text) =>
          val toks = text.split(" ", -1)
          val idx = new collection.mutable.ArrayBuffer[Int]()
          var i = 0
          while (i < toks.length) { if (gaz(toks(i))) idx += i; i += 1 }
          val perEnt = collection.mutable.HashMap.empty[String, (Long, Long)]
          var a = 0
          while (a < idx.length) {
            val p = idx(a)
            var c = 0L
            var b = a - 1
            while (b >= 0 && p - idx(b) <= window) { c += 1; b -= 1 }
            b = a + 1
            while (b < idx.length && idx(b) - p <= window) { c += 1; b += 1 }
            val e = toks(p)
            val (tf0, cx0) = perEnt.getOrElse(e, (0L, 0L))
            perEnt.update(e, (tf0 + 1, cx0 + c))
            a += 1
          }
          perEnt.iterator.map { case (e, (tf, cx)) => (docId, e, tf, cx) }
        }
      }.toDF("doc_id", "entity", "tf", "ctx")
  }

  /** Combined entity-link score: TF-IDF × a context-coherence boost,
    * `tf·ln(N/df) · (1 + ctx/(2·window·tf))` — the boost is the mean
    * fraction of the surrounding window occupied by other gazetteer
    * entities (∈ [1, 2]). Float formula is ScalaTested (not DuckDB-
    * oracled — cross-engine ln parity is not guaranteed); the integer
    * (tf, ctx, df) core is what `kg_mentions_ctx` hash-checks.
    */
  def scoredWithContext(ctxDf: DataFrame, nDocs: Long,
                        window: Int): DataFrame = {
    val df = ctxDf.groupBy("entity").agg(count(lit(1)).as("df"))
    ctxDf
      .join(broadcast(df), Seq("entity"))
      .withColumn("score",
        col("tf") * log(lit(nDocs.toDouble) / col("df")) *
          (lit(1.0) + col("ctx") / (lit(2.0 * window) * col("tf"))))
  }

  /** Candidate triples from scored mentions:
    *  - (page url, mentions, entity) per mention,
    *  - (entity, coOccursWith, entity) for entity pairs co-mentioned in a
    *    document (undirected, emitted with e1 < e2).
    * Predicates use the synthetic namespace `urn:graft:`.
    */
  val MentionsPred = "urn:graft:mentions"
  /** Subject prefix of document nodes in mention triples. */
  val DocUriPrefix = "urn:doc:"
  val CoOccursPred = "urn:graft:coOccursWith"

  /** [[coOccurrenceTriples]] computed through the fused histogram — same
    * output (minus nothing: identical (s, p, o, n_docs) rows), one
    * doc-keyed set gather then partition-local pair counting instead of
    * the per-pair explode. The kg_cooccur / kg_canonical DuckDB oracles
    * validate this path end-to-end.
    */
  def coOccurrenceTriplesFused(mentionsDf: DataFrame,
                               entities: Seq[String]): DataFrame = {
    val sets = mentionsDf.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("entity"))).as("es"))
    coOccurrenceFused(sets, entities)
  }

  def mentionTriples(mentionsDf: DataFrame): DataFrame =
    mentionsDf.select(
      concat(lit("urn:doc:"), col("doc_id")).as("s"),
      lit(MentionsPred).as("p"),
      concat(lit("urn:ent:"), col("entity")).as("o"))

  def coOccurrenceTriples(mentionsDf: DataFrame): DataFrame = {
    // Scale note: the naive formulation is a self-join on doc_id — two
    // full sorts of the mention table plus an O(pairs) join output.
    // Entity sets per document are tiny (gazetteer-bounded), so instead:
    // one groupBy(doc) to gather the per-doc set, then generate ordered
    // pairs *inside the row* (codegen'd array transform) and feed the
    // dictionary-sized pair aggregation, which combines map-side. One
    // shuffle of |mentions| rows total; no join.
    val sets = mentionsDf.groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("entity"))).as("es"))
    sets
      .select(explode(expr(
        """flatten(transform(es, (x, i) ->
          |  transform(slice(es, i + 2, size(es)),
          |    y -> named_struct('e1', x, 'e2', y))))""".stripMargin)).as("p"))
      .groupBy(col("p.e1").as("e1"), col("p.e2").as("e2"))
      .agg(count(lit(1)).as("n_docs"))
      .select(
        concat(lit("urn:ent:"), col("e1")).as("s"),
        lit(CoOccursPred).as("p"),
        concat(lit("urn:ent:"), col("e2")).as("o"),
        col("n_docs"))
  }
}
