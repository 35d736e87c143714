package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the round-16 q_text_bigram digest transplant: the
  * round-15 diagnosis named the (id, gram-string) shuffle as the
  * 4.65×/decade term and the q_decon_report md5-key fix as the
  * pattern; this tool alternates the OLD string-keyed formulation
  * (inlined below, the pre-round-16 bigramLogProb) against the NEW
  * digest-keyed operator on the same corpus so the comparison cannot
  * be poisoned by host drift between windows (min-of-reps, B,A
  * alternation — the RankAb protocol).
  *
  * Run: SPARK_GRAFT_SF_DIR=.data/sf10full sbt "runMain graft.tools.BigramAb [reps]"
  */
object BigramAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lambda = 0.7

    // the pre-round-16 formulation, verbatim: gram STRINGS through the
    // (id, gram) aggregate, the gram-frequency aggregate, and the three
    // frequency joins (substring_index recovers the unigram keys)
    def oldForm(df: DataFrame): DataFrame = {
      val low = lower(trim(col("text")))
      val toks = df.select(col("doc_id"), explode(split(low, "\\s+")).as("__tok"))
      val uniFreq = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__uc"))
      val total = df.select(sum(size(split(low, "\\s+")).cast("double")).as("__n"))
      val grams = df
        .select(col("doc_id"), split(low, "\\s+").as("__toks"))
        .filter(size(col("__toks")) >= 2)
        .select(col("doc_id"), col("__toks"),
          explode(sequence(lit(1), size(col("__toks")) - 1)).as("__i"))
        .select(col("doc_id"),
          concat(element_at(col("__toks"), col("__i")), lit(" "),
            element_at(col("__toks"), col("__i") + 1)).as("__g"))
      val docGrams = grams.groupBy(col("doc_id"), col("__g"))
        .agg(count(lit(1)).as("__m"))
      val gramFreq = docGrams.groupBy(col("__g")).agg(sum(col("__m")).as("__gc"))
      val scored = docGrams
        .join(gramFreq, Seq("__g"))
        .withColumn("__pw", substring_index(col("__g"), " ", 1))
        .withColumn("__cw", substring_index(col("__g"), " ", -1))
        .join(uniFreq.select(col("__tok").as("__pw"), col("__uc").as("__pc")), Seq("__pw"))
        .join(uniFreq.select(col("__tok").as("__cw"), col("__uc").as("__cc")), Seq("__cw"))
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(round((sum(col("__m") * log(
            lit(lambda) * (col("__gc") / col("__pc")) +
            lit(1.0 - lambda) * (col("__cc") / col("__n")))) /
            sum(col("__m"))), 4).as("lm_logprob"),
          sum(col("__m")).cast("long").as("n_bigrams"))
      df.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
    }

    def runOnce(newForm: Boolean): Double = {
      val t0 = System.nanoTime()
      val out =
        if (newForm)
          graft.ops.TextAnalysis.bigramLogProb(docs, "text", "doc_id")
        else oldForm(docs)
      out.orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      dt
    }

    runOnce(newForm = false); runOnce(newForm = true) // warm both paths
    val olds = scala.collection.mutable.ArrayBuffer[Double]()
    val news = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      olds += runOnce(newForm = false)
      news += runOnce(newForm = true)
    }
    def show(xs: Seq[Double]) =
      xs.map(x => f"$x%.2f").mkString(" ") + f"  min=${xs.min}%.2f"
    println(s"[bigramab] B string-keyed (r15 shape): ${show(olds.toSeq)}")
    println(s"[bigramab] A digest-keyed (r16 shape): ${show(news.toSeq)}")
    spark.stop()
  }
}
