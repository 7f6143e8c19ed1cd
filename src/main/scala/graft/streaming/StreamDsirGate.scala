package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Streaming DSIR quality gate — model-based admission at the ingest
  * edge: score every arriving document against a FROZEN hashed-ngram
  * importance model ([[Curation.writeDsirModel]]'s artifact, collected
  * once to a bounded array literal) and admit only documents whose
  * importance leans target (`iw_micro >= minMicro`).
  *
  * The scorer is a pure projection-local fold ([[Curation.dsirScoreMicro]])
  * — no join, no shuffle, NO STATE — so exactly like the
  * decontamination gate, the batch filter IS the streaming plan:
  * `streaming` and `batch` build the same expression tree, and
  * stream == batch holds by construction (spec'd anyway). At 100 TB
  * ingest this is the cheapest possible model-based filter: one map
  * over arrivals, model refreshes are a new artifact + gate restart.
  */
object StreamDsirGate {

  case class Doc(doc_id: Long, text: String)

  /** Batch twin: (doc_id, iw_micro) for admitted documents. */
  def batch(docs: DataFrame, textCol: String, idCol: String,
      lrMicro: Array[Long], salt: String = "graft",
      minMicro: Long = 1L): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        Curation.dsirScoreMicro(col(textCol), lrMicro, salt)
          .as("iw_micro"))
      .where(col("iw_micro") >= minMicro)

  /** The stateless gate on a stream: the batch plan, unchanged. */
  def streaming(docs: Dataset[Doc], lrMicro: Array[Long],
      salt: String = "graft", minMicro: Long = 1L): DataFrame =
    batch(docs.toDF(), "text", "doc_id", lrMicro, salt, minMicro)
}
