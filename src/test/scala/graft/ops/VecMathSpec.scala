package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity

/** The native CosineSimilarity / SignBucket expressions must be
  * BIT-identical to the declarative higher-order-function forms they
  * replaced — the DuckDB oracles were frozen against the latter.
  */
class VecMathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vecs(seed: Long, n: Int, dim: Int): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  test("native cosine is bit-identical to the aggregate/zip_with form") {
    import spark.implicits._
    val rows = vecs(42L, 64, 19).zip(vecs(7L, 64, 19))
    val df = rows.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val got = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      val n = r.getDouble(0); val h = r.getDouble(1)
      assert(java.lang.Double.doubleToLongBits(n) === java.lang.Double.doubleToLongBits(h),
        s"native=$n hof=$h")
    }
  }

  test("native rp_bucket is bit-identical to the per-plane HOF form") {
    import spark.implicits._
    val data = vecs(23L, 80, 64) ++
      Seq(Seq.fill(64)(0f)) ++          // all-zero: every dot == 0.0, no bit
      Seq(vecs(5L, 1, 32).head)         // wrong length: HOF null dots -> 0
    val df = data.toDF("a").select(col("a").cast("array<float>").as("a"))
    val got = df.select(
      Similarity.rpBucket(col("a")).as("native"),
      Similarity.rpBucketHof(col("a")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"native=${r.get(0)} hof=${r.get(1)}")
    }
    // buckets must actually spread (planes mix all dims)
    assert(got.map(_.getLong(0)).distinct.length > 10)
  }

  test("native sign bucket matches the element_at form") {
    import spark.implicits._
    // include exact zeros: bit must NOT be set for 0f (strict > 0)
    val data = vecs(11L, 40, 12).map(v => v.updated(3, 0f))
    val df = data.toDF("a").select(col("a").cast("array<float>").as("a"))
    val legacy = (0 until 8).map { d =>
      when(element_at(col("a"), d + 1) > 0f, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ + _)
    val got = df.select(
      Similarity.signBucket(col("a"), 8).as("native"), legacy.as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("native token codes match the nested-HOF form") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox", "  leading and trailing  ", "", " ", "one",
      "double  space", "punct, included! here?", "a b c d e f g h i j")
    val df = texts.toDF("text")
    val got = df.select(
      graft.ext.TextStats.tokenCodesOf(col("text")).as("native"),
      graft.ext.TextStats.tokenCodesHof(
        graft.ext.TextStats.tokens(col("text"))).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("native simhash16 and fingerprint match the HOF forms") {
    import spark.implicits._
    val texts = Seq("the quick brown fox jumps", "over the lazy dog",
      "alpha beta alpha beta gamma", "single")
    val df = texts.toDF("text")
    val got = df.select(
      graft.ext.Dedup.simhash16(graft.ext.Dedup.tokenSet(col("text"))).as("s_n"),
      graft.ext.Dedup.simhash16Hof(graft.ext.Dedup.tokenSet(col("text"))).as("s_h"),
      graft.ext.TextStats.fingerprint(col("text")).as("f_n"),
      graft.ext.TextStats.fingerprintHof(col("text")).as("f_h")).collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("native gram_codes matches the shifted zip_with chain (incl. null tails)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val texts = Seq("", "one", "a b", "a b c d e", "x x x x x x x x") ++
      (0 until 30).map(_ => (0 until rnd.nextInt(12))
        .map(_ => s"w${rnd.nextInt(6)}").mkString(" "))
    val df = texts.toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val codes = graft.ext.TextStats.tokenCodesOf(col("text"))
      val got = df.select(
        org.apache.spark.sql.graft.GraftColumns.gramCodes(codes, n).as("native"),
        graft.ext.Dedup.chainCodesHof(codes, n).as("hof")).collect()
      got.foreach { r =>
        // null tails and hashed values must agree position by position
        assert(r.getSeq[Any](0) === r.getSeq[Any](1), s"n=$n")
      }
    }
  }

  test("native vocab_stats == staged-HOF counts on random and edge docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val docs = (Seq("", " ", "solo", "x x x x", "  padded  doc  ") ++
      (0 until 80).map(_ =>
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val native = graft.ext.TextStats.vocabRichness(df, "text")
      .select("doc_id", "n_tokens", "n_types", "n_hapax")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val hof = graft.ext.TextStats.vocabRichnessHof(df, "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(native === hof)
  }

  test("native repetition_stats == the retired UDF on random and hostile docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff", "a b") // "a b" never a token
    val docs = (Seq("", " ", "solo", "x x x x", "  padded  doc  ",
      "a b a b a", "same same same") ++
      (0 until 100).map(_ =>
        Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(6))).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val native = df.select($"doc_id",
      graft.ext.TextStats.repetitionStats($"text").as("r"))
      .select($"doc_id", $"r.n_tokens", $"r.n_distinct", $"r.top_tok_freq",
        $"r.top_bigram_freq")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val udf = df.select($"doc_id",
      graft.ext.TextStats.repetitionStatsUdf($"text").as("r"))
      .select($"doc_id", $"r._1", $"r._2", $"r._3", $"r._4")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(native === udf)
    // NULL text rides the coalesce: zero row, not a null struct
    val nullRow = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(graft.ext.TextStats.repetitionStats($"text").as("r"))
      .select($"r.n_tokens", $"r.n_distinct").as[(Long, Long)].head()
    assert(nullRow === ((0L, 0L)))
  }

  test("vocab_stats is registered as a SQL function") {
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    import spark.implicits._
    Seq((1L, "a b a")).toDF("id", "t").createOrReplaceTempView("vs_t")
    val r = spark.sql(
      "SELECT vocab_stats(t).n_tokens AS n, vocab_stats(t).n_hapax AS h FROM vs_t")
      .as[(Long, Long)].head()
    assert(r === ((3L, 1L)))
  }

  test("cosine of a vector with itself is 1.0 within 1 ulp") {
    import spark.implicits._
    val df = vecs(3L, 10, 33).toDF("a").select(col("a").cast("array<float>").as("a"))
    df.select(Similarity.cosine(col("a"), col("a")).as("c")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    }
  }
}
