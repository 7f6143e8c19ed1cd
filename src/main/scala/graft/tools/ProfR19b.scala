package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** Round-19 inner split of the q264 pack→write→read chain and the
  * appendTokens coverage cost (the ProfR19 headline slices, one level
  * down). */
object ProfR19b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    var last = System.nanoTime()
    def mark(name: String): Unit = {
      val now = System.nanoTime()
      println(f"PROF $name%-46s ${(now - last) / 1e9}%8.3f s")
      last = now
    }
    val root0 = "/tmp/graft_prof_r19b"

    (1 to 2).foreach { rep =>
      println(s"== q264 inner (rep $rep)")
      val _ = new java.io.File(root0) // roots overwritten per rep
      val pc = graft.SparkEntry.punctCorpus(spark, sfDir)
      val mpath = s"$root0/capmodel"
      last = System.nanoTime()
      val merges = graft.operators.Tokenizer.bpeMerges(pc, "text",
        merges = 8, byteFallback = true).orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.Tokenizer.writeBpeModel(spark, mpath, merges,
        byteFallback = true)
      val model = graft.operators.Tokenizer.readBpeModel(spark, mpath)
      graft.operators.Tokenizer.writeBpeVocab(spark, mpath,
        graft.operators.Tokenizer.bpeVocabulary(pc, "text",
          model.merges, unicode = model.unicode,
          byteFallback = model.byteFallback),
        specials = Seq("eos"))
      val vocab = graft.operators.Tokenizer.readBpeVocab(spark, mpath)
      val eosId = graft.operators.Tokenizer.readBpeSpecials(spark, mpath)
        .validateAgainst(vocab).eos
      mark("q264.learn_and_artifacts(all)")
      val counts = graft.operators.Tokenizer
        .bpeTokenCounts(pc, "text", "doc_id", model.merges,
          unicode = model.unicode, byteFallback = model.byteFallback)
        .select(col("doc_id"), col("n_tokens"))
      val root = s"$root0/capstream"
      graft.streaming.StreamShardLayout.initLayout(spark, root)
      mark("q264.initLayout")
      (0L to 1L).foreach { b =>
        val part = counts.where(pmod(col("doc_id"), lit(2)) === b)
        val a = graft.streaming.StreamShardLayout.appendIncrement(
          part, root, "doc_id", "n_tokens", shardWeight = 5000L,
          batchId = b)
        mark(s"q264.$b.appendIncrement")
        // split appendTokens: encode stream built once here to time
        // the encode alone (the product call re-derives it internally)
        val ids = graft.operators.Tokenizer
          .bpeEncodeIds(pc.where(pmod(col("doc_id"), lit(2)) === b),
            "text", "doc_id", model.merges, vocab,
            unicode = model.unicode, byteFallback = model.byteFallback)
          .where(col("token_id").isNotNull)
          .select(col("doc_id"), col("pos"),
            col("token_id").cast("string").as("token"))
        ids.write.mode("overwrite").format("noop").save()
        mark(s"q264.$b.encode_ids_noop(1x encode)")
        graft.streaming.StreamShardLayout.appendTokens(ids, a, root,
          batchId = b)
        mark(s"q264.$b.appendTokens(product: 2x encode)")
      }
      // inner pack split
      val packed = graft.streaming.StreamShardLayout
        .packLandedShards(spark, root, seqLen = 64L,
          sep = Some(eosId.toString))
      packed.write.mode("overwrite").format("noop").save()
      mark("q264.packLandedShards_noop(verify+pack)")
      val packedNv = graft.streaming.StreamShardLayout
        .packLandedShards(spark, root, seqLen = 64L,
          sep = Some(eosId.toString), verifyCoverage = false)
      packedNv.write.mode("overwrite").format("noop").save()
      mark("q264.packLandedShards_noop(noverify)")
      val seqs = Sampling.packSequences(packed, groupCol = Some("shard"))
      seqs.write.mode("overwrite").format("noop").save()
      mark("q264.packSequences_noop(pack+seqagg)")
      val path = s"$root0/capseq"
      Sampling.writeSequences(seqs, path, groupCol = Some("shard"))
      mark("q264.writeSequences(cut+write+readback+meta)")
      Sampling.readSequences(spark, path).write.mode("overwrite")
        .format("noop").save()
      mark("q264.readSequences_noop(verify+read)")
      Dedup.releaseIntermediates()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
