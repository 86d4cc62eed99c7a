package graft

import org.apache.spark.sql.functions._

import graft.functions.{GeometryFunctions, HashFunctions, StatsFunctions,
  TextFunctions, VectorFunctions}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("pointInPolygon: unit square membership incl. outside points") {
    val square = array(
      struct(lit(0.0).as("x"), lit(0.0).as("y")),
      struct(lit(1.0).as("x"), lit(0.0).as("y")),
      struct(lit(1.0).as("x"), lit(1.0).as("y")),
      struct(lit(0.0).as("x"), lit(1.0).as("y")))
    val pts = Seq((0.5, 0.5, true), (1.5, 0.5, false), (-0.1, 0.5, false),
      (0.5, 1.5, false), (0.25, 0.75, true)).toDF("x", "y", "want")
    val bad = pts.withColumn("got",
        GeometryFunctions.pointInPolygon(col("x"), col("y"), square))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("pointInPolygon: concave polygon (L-shape)") {
    val ell = array(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0),
      (1.0, 4.0), (0.0, 4.0)).map { case (x, y) =>
      struct(lit(x).as("x"), lit(y).as("y")) }: _*)
    val pts = Seq((0.5, 3.0, true), (2.0, 0.5, true), (3.0, 3.0, false))
      .toDF("x", "y", "want")
    val bad = pts.withColumn("got",
        GeometryFunctions.pointInPolygon(col("x"), col("y"), ell))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("dictUuid is key-order independent (sorted-dict MD5 semantics)") {
    val r = spark.range(1).select(
      HashFunctions.dictUuid(lit("b") -> lit(2), lit("a") -> lit(1)).as("h1"),
      HashFunctions.dictUuid(lit("a") -> lit(1), lit("b") -> lit(2)).as("h2")).head()
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0).matches("[0-9a-f]{32}"))
  }

  test("configHash: equal groups hash equal, different groups differ") {
    val df = Seq(("g1", "k1", "v1"), ("g1", "k2", "v2"),
      ("g2", "k2", "v2"), ("g2", "k1", "v1"), // same pairs, other row order
      ("g3", "k1", "CHANGED")).toDF("g", "k", "v")
    val hashes = df.groupBy("g").agg(HashFunctions.configHash(col("k"), col("v")).as("h"))
      .orderBy("g").select("h").as[String].collect()
    assert(hashes(0) == hashes(1) && hashes(0) != hashes(2))
  }

  test("columnStats excludes NaN/inf from count/min/max/mean") {
    val df = Seq(1.0, 2.0, Double.NaN, Double.PositiveInfinity, 3.0).toDF("v")
    val r = df.agg(StatsFunctions.columnStats(col("v")).as("s"))
      .select("s.count", "s.min", "s.max", "s.mean").head()
    assert(r.getLong(0) == 3 && r.getDouble(1) == 1.0 &&
      r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0)
  }

  test("regression recovers a known line with r2=1") {
    val df = (1 to 100).map(i => (i.toDouble, 3.5 * i + 7.25)).toDF("x", "y")
    val r = df.agg(StatsFunctions.regression(col("y"), col("x")).as("m"))
      .select("m.slope", "m.intercept", "m.r2", "m.n").head()
    assert(math.abs(r.getDouble(0) - 3.5) < 1e-9)
    assert(math.abs(r.getDouble(1) - 7.25) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    assert(r.getLong(3) == 100)
  }

  test("tokenCount/subwordCount/shingles basics") {
    val r = Seq("Hello, world! 42 times").toDF("t").select(
      TextFunctions.tokenCount(col("t")).as("n"),
      TextFunctions.subwordCount(col("t")).as("sw"),
      TextFunctions.shingles(col("t"), 2).as("sh")).head()
    assert(r.getInt(0) == 4)
    // Hello , world ! 42 times -> 6 subword tokens
    assert(r.getInt(1) == 6)
    val sh = r.getSeq[String](2).toSet
    assert(sh == Set("hello world", "world 42", "42 times"))
  }

  test("langIdHeuristic labels clear-cut texts") {
    val rows = Seq(
      "the cat sat on the mat and it was happy",
      "der Hund ist nicht mit der Katze",
      "le chat est dans la maison pour le jour",
      "xyzzy plugh 12345").toDF("t")
      .select(TextFunctions.langIdHeuristic(col("t")).as("l"))
      .as[String].collect()
    assert(rows.sameElements(Array("en", "de", "fr", "und")))
  }

  test("normalizeForDedup collapses case/punct/whitespace") {
    val r = Seq("  Hello,   WORLD!!  ").toDF("t")
      .select(TextFunctions.normalizeForDedup(col("t"))).as[String].head()
    assert(r == "hello world")
  }

  test("vector dot/norm/cosine incl. zero-vector null safety") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f),
      Array(0.0f, 0.0f, 0.0f))).toDF("a", "b", "z")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("dot"),
      VectorFunctions.l2Norm(col("a")).as("na"),
      VectorFunctions.cosine(col("a"), col("b")).as("cos_parallel"),
      VectorFunctions.cosine(col("a"), col("z")).as("cos_zero")).head()
    assert(r.getDouble(0) == 18.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.isNullAt(3))
  }

  test("simhashBucket: identical vectors always collide; is deterministic") {
    val df = Seq((1, Array(0.3f, -1.2f, 0.7f, 2.2f)),
      (2, Array(0.3f, -1.2f, 0.7f, 2.2f))).toDF("id", "v")
    val buckets = df.select(
        VectorFunctions.simhashBucket(col("v"), nBits = 16, seed = 7).as("b"))
      .as[Long].collect()
    assert(buckets(0) == buckets(1))
    val again = df.select(
        VectorFunctions.simhashBucket(col("v"), nBits = 16, seed = 7).as("b"))
      .as[Long].collect()
    assert(buckets.sameElements(again))
  }

  test("portableHash60/28: pinned cross-engine contract values") {
    // the portable hash IS a wire contract: any engine computing
    // CAST(hex(md5(x)[1..15]) AS int64) must reproduce these exact values
    // (DuckDB oracles rely on it). Pinned against independently computed
    // md5 digests: md5('abc') = 900150983cd24fb0d6963f7d28e17f72, etc.
    val df = Seq("abc", "", "graft").toDF("s")
    val rows = df.select(
      HashFunctions.portableHash60(col("s")).as("h60"),
      HashFunctions.portableHash60b(col("s")).as("h60b"),
      HashFunctions.portableHash28(col("s")).as("h28"),
      HashFunctions.portableSeededHash(col("s"), 3).as("h3"))
      .collect()
    // seeded member 3 = (h60 + 3*h60b) mod 2^60 — full-width step
    // (see HashFunctions scaladoc for why narrow steps are forbidden)
    val expected = Seq(
      (648541476951500027L, 966413511088281591L, 14063167L, 89017496395803872L),
      (955282973525019424L, 1051591172516971559L, 82411529L, 651291977255393173L),
      (466617675313949775L, 166237039987768099L, 220522875L, 965328795277254072L))
    rows.zip(expected).foreach { case (r, (h60, h60b, h28, seeded3)) =>
      assert(r.getLong(0) == h60)
      assert(r.getLong(1) == h60b)
      assert(r.getLong(2) == h28)
      assert(r.getLong(3) == seeded3)
      assert(seeded3 == ((h60 + 3 * h60b) & ((1L << 60) - 1)))
    }
  }

  test("hyperplanes: pinned portable Rademacher contract; seeds vary the family") {
    // same wire-contract discipline as portableHash60: any engine deriving
    // signs from md5("seed:bit:component") must reproduce these planes
    val p = VectorFunctions.hyperplanes(nBits = 2, dim = 4, seed = 42)
    assert(p(0).toSeq == Seq(1.0f, 1.0f, 1.0f, 1.0f))
    assert(p(1).toSeq == Seq(-1.0f, 1.0f, -1.0f, 1.0f))
    assert(p.flatten.forall(v => v == 1.0f || v == -1.0f))
    // distinct seeds give distinct planes (a degenerate family would
    // collapse every LSH table to the same bucketing)
    val q = VectorFunctions.hyperplanes(nBits = 2, dim = 4, seed = 43)
    assert(p.flatten.toSeq != q.flatten.toSeq)
  }

  test("scrubPii masks URLs then emails; countMatches counts them") {
    val df = Seq(
      "mail me at jo.doe+x@lab.example.org or see https://ex.org/a?b=1 now",
      "no pii here").toDF("t")
    val out = df.select(
      TextFunctions.scrubPii(col("t")).as("s"),
      TextFunctions.countMatches(col("t"), TextFunctions.EmailPattern).as("e"),
      TextFunctions.countMatches(col("t"), TextFunctions.UrlPattern).as("u"))
      .collect()
    assert(out(0).getString(0) == "mail me at <EMAIL> or see <URL> now")
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1)
    assert(out(1).getString(0) == "no pii here")
    assert(out(1).getInt(1) == 0 && out(1).getInt(2) == 0)
  }
}
