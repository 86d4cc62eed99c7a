package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}

/** The SQL frontend must be the SAME implementation as the Column API: every
  * registered function is checked value-equal against its Scala counterpart,
  * and both registration routes (config-time extension injection, live-
  * session registry) are exercised.
  */
class GraftFunctionsSpec extends SparkSpec {

  private lazy val registered: SparkSession = { // live-session route
    GraftFunctions.register(spark)
    spark
  }

  test("extension injection registers functions at session build") {
    spark.range(1).count() // force the shared SparkContext up first
    // a sibling session over the same SparkContext, built WITH the extension
    // (both active and default must be cleared or getOrCreate reuses them)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // .withExtensions is the same injection path as the static conf
      // `spark.sql.extensions=graft.GraftExtensions` (which must be set
      // BEFORE the SparkContext exists and so can't be exercised against
      // this suite's shared context)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT graft_hash60('abc') AS h").collect().head.getLong(0)
      val want = s2.range(1)
        .select(HashFunctions.portableHash60(lit("abc"))).collect().head.getLong(0)
      assert(r == want)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("SQL and Column frontends agree on the text/hash surface") {
    import registered.implicits._
    val df = Seq((1L, "The quick brown fox, and the lazy dog! 42 times."),
      (2L, "der die das und ist nicht ein eine mit für"))
      .toDF("id", "t")
    df.createOrReplaceTempView("fx")

    val viaSql = registered.sql(
      """SELECT id, graft_hash60(t) AS h60, graft_seeded_hash(t, 3) AS hs,
           graft_fingerprint(t) AS fp, graft_norm_text(t) AS norm,
           graft_token_count(t) AS ntok, graft_subword_count(t) AS nsub,
           graft_lang_id(t) AS lang, graft_scrub_pii(t) AS scrubbed,
           graft_minhash(t, 8, 2) AS mh
         FROM fx ORDER BY id""").collect()
    val viaCol = df.select(col("id"),
      HashFunctions.portableHash60(col("t")).as("h60"),
      HashFunctions.portableSeededHash(col("t"), 3).as("hs"),
      TextFunctions.portableFingerprint(col("t")).as("fp"),
      TextFunctions.normalizeForDedup(col("t")).as("norm"),
      TextFunctions.tokenCount(col("t")).as("ntok"),
      TextFunctions.subwordCount(col("t")).as("nsub"),
      TextFunctions.langIdHeuristic(col("t")).as("lang"),
      TextFunctions.scrubPii(col("t")).as("scrubbed"),
      HashFunctions.minhashSignature(
        TextFunctions.normalizeForDedup(col("t")), 8, 2).as("mh"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("SQL media fingerprints and blocklist/interval kernels match the Column API") {
    import registered.implicits._
    val px = Array.tabulate(9 * 8)(i => ((i * 31) % 256).toByte)
    val pcm = Array.tabulate(65 * 2 * 2)(i => ((i * 17) % 256).toByte)
    val df = Seq((1L, px, pcm, "the fox and the dog", 10L, 30L))
      .toDF("id", "px", "pcm", "t", "s", "e")
    df.createOrReplaceTempView("media_fx")
    val viaSql = registered.sql(
      """SELECT graft_dhash64(px, 9, 8) AS dh,
           graft_audio_energy_hash64(pcm) AS ah,
           graft_blocklist_total(t, 'the|fox') AS bl,
           graft_interval_overlap(s, e, 20, 50) AS ov,
           graft_interval_contains(s, e, 25) AS inn
         FROM media_fx""").collect().head
    assert(viaSql.getLong(0) ===
      graft.expressions.ImageHash.dhash64(px, 9, 8))
    assert(viaSql.getLong(1) ===
      graft.expressions.AudioHash.energyHash64(pcm))
    assert(viaSql.getLong(2) === 3L) // 'the' twice + 'fox' once
    assert(viaSql.getLong(3) === 10L) // [10,30) ∩ [20,50) = [20,30)
    assert(viaSql.getBoolean(4))
  }

  test("SQL vector and geometry kernels match the Column API") {
    import registered.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vx")
    val viaSql = registered.sql(
      """SELECT graft_vec_dot(a, b) AS d, graft_vec_cosine(a, b) AS c,
           graft_point_in_polygon(0.5D, 0.5D,
             array(struct(0.0D AS x, 0.0D AS y), struct(1.0D AS x, 0.0D AS y),
                   struct(1.0D AS x, 1.0D AS y), struct(0.0D AS x, 1.0D AS y)))
             AS inside,
           graft_distance(0.0D, 0.0D, 3.0D, 4.0D) AS dist
         FROM vx""").collect().head
    val viaCol = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.cosine(col("a"), col("b")).as("c")).collect().head
    assert(viaSql.getDouble(0) == viaCol.getDouble(0))
    assert(viaSql.getDouble(1) == viaCol.getDouble(1))
    assert(viaSql.getBoolean(2))
    assert(viaSql.getDouble(3) == 5.0)
  }

  test("SQL random projection matches the Column API exactly") {
    import registered.implicits._
    val df = Seq(Tuple1(Array.tabulate(16)(i => 0.25f * (i - 7)))).toDF("v")
    df.createOrReplaceTempView("jl")
    val viaSql = registered.sql(
      "SELECT graft_random_project(v, 8, 16, 11) AS p FROM jl")
      .collect().head.getSeq[Double](0)
    val viaCol = df.select(
      VectorFunctions.randomProject(col("v"), 8, 16, 11).as("p"))
      .collect().head.getSeq[Double](0)
    assert(viaSql == viaCol && viaSql.length == 8)
  }

  test("SQL time functions match the Column API") {
    val viaSql = registered.sql(
      """SELECT graft_harp_ts(3600.5D) AS ts,
           graft_ts_harp(graft_harp_ts(3600.5D)) AS rt,
           graft_chunk_start(timestamp'2024-01-02 13:47:09') AS cs""")
      .collect().head
    assert(viaSql.getDouble(1) == 3600.5)
    assert(viaSql.getTimestamp(2) ==
      java.sql.Timestamp.valueOf("2024-01-02 13:00:00"))
  }

  test("plan-time parameters must be literals") {
    import registered.implicits._
    Seq(("x", 2)).toDF("t", "k").createOrReplaceTempView("bad")
    val e = intercept[Exception] {
      registered.sql("SELECT graft_minhash(t, k, 2) FROM bad").collect()
    }
    assert(e.getMessage.contains("INT literal"))
  }
}
