package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** The whole curation pipeline, chained the way a user would run it
  * on a real corpus: normalize → quality-classify → decontaminate →
  * exact+near dedup → temperature mix → BPE chunk → pack → verify
  * global invariants. Each operator has its own oracle/specs; this
  * suite checks they COMPOSE — schemas line up, nothing silently
  * drops or duplicates, and the final packed corpus respects every
  * upstream contract at once.
  */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("full curation pipeline composes: clean, deduped, decontaminated, mixed, chunked, packed") {
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    val nRaw = raw.count()

    // 1. canonical text normalization
    val normed = TextOps.normalizeText(raw, "text")
      .drop("text").withColumnRenamed("text_norm", "text")
      .select($"doc_id", $"text", $"lang")

    // 2. trained quality classifier: planted junk docs share a spam
    //    vocabulary (shared tokens = the learnable signal; a one-off
    //    token per doc would need many more full-batch epochs)
    val spam = "buy cheap pills now click here free money winner prize "
    val junk = (1 to 60).map(i => (100000L + i, (spam * 5) + i, "en")).toDF("doc_id", "text", "lang")
    val corpus = normed.unionByName(junk)
    val labeled = normed.select($"text", lit(1.0).as("label"))
      .unionByName(junk.select($"text", lit(0.0).as("label")))
    val w = ClassifierOps.trainTextClassifier(labeled, "text", "label", dim = 1 << 14, epochs = 30)
    val classed = corpus.withColumn("q", ClassifierOps.score($"text", w, 1 << 14))
      .filter($"q" > 0.5).drop("q")
    assert(classed.filter($"doc_id" > 100000L).count() === 0, "junk docs survived the classifier")
    assert(classed.count() === nRaw, "real docs were dropped by the classifier")

    // 3. benchmark decontamination: an "eval set" made of 5 real docs
    //    must remove exactly their copies
    val eval = normed.filter($"doc_id" < 5).select($"text")
    val decon = DedupOps.decontaminate(classed, eval, "text", "doc_id",
      expectedEvalShingles = 1000L)
    assert(decon.filter($"doc_id" < 5).count() === 0, "contaminated docs leaked")

    // 4. dedup: exact first, then near-dup survivors (planted twin
    //    must collapse)
    val twin = decon.filter($"doc_id" === 10L)
      .select(lit(200000L).as("doc_id"), $"text", $"lang")
    val withTwin = decon.unionByName(twin)
    val deduped = DedupOps.dedupAll(withTwin, "doc_id", "text")
    // exactly one of the twin pair survives (the corpus also has
    // genuine near-dups among real docs — those may drop too)
    assert(deduped.filter($"doc_id".isin(10L, 200000L)).count() === 1, "twin pair did not collapse to one")
    assert(deduped.count() < withTwin.count())
    assert(deduped.select("doc_id").distinct().count() === deduped.count())

    // 5. temperature mixing across languages
    val mixed = MixOps.temperatureSample(deduped, "lang", "doc_id", alpha = 0.5, targetFraction = 0.8)
    val nMixed = mixed.count()
    assert(nMixed > 0 && nMixed < deduped.count())

    // 6. BPE chunking at token boundaries, then FFD packing
    val codec = TokenizerOps.trainBpe(mixed, "text", vocabSize = 400)
    val chunks = TokenizerOps.chunkByTokens(mixed, "doc_id", "text", codec, maxTokens = 128)
      .withColumn("piece_id", $"doc_id" * 10000L + $"chunk_id")
    val packed = MixOps.packSequences(chunks, "piece_id", "n_tokens", maxTokens = 128L)
    // every chunk packed exactly once, no multi-doc bin over budget
    assert(packed.count() === chunks.count())
    val over = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("c"))
      .filter($"t" > 128L && $"c" > 1).count()
    assert(over === 0, "packing violated the token budget")
    // token mass is conserved chunks → packed
    val chunkTok = chunks.agg(sum("n_tokens")).head().getLong(0)
    val packedTok = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(chunkTok === packedTok)

    // 7. the whole pipeline is deterministic: rerun the sampled set
    val mixed2 = MixOps.temperatureSample(deduped, "lang", "doc_id", alpha = 0.5, targetFraction = 0.8)
    assert(mixed.select("doc_id").as[Long].collect().sorted.toSeq ===
      mixed2.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
