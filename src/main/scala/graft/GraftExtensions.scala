package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.{GraftColumnBridge, GraftRegistryBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL surface for the graft function library: every Column-level operator —
  * including the custom codegen'd Catalyst expressions (portable hashes,
  * vector kernels, fused MinHash) — callable from `spark.sql("...")` by name.
  *
  * Production route: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) — functions are injected at
  * session build, exactly how Spark extension libraries ship their SQL
  * surface. For a session you didn't build (notebook/REPL),
  * [[GraftFunctions.register]] adds them to the live session's registry.
  *
  * The builders go through the same Column combinators as the Scala API, so
  * SQL and DataFrame calls produce IDENTICAL expression trees — one
  * implementation, two frontends (pinned by GraftFunctionsSpec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}

object GraftFunctions {

  private def toCol(e: Expression): Column = GraftColumnBridge.column(e)
  // EAGER conversion — a builder's return value goes straight into the
  // analyzer, so no lazy ColumnNodeExpression wrappers may remain (see
  // GraftColumnBridge.eagerExpression).
  private def toExpr(c: Column): Expression = GraftColumnBridge.eagerExpression(c)

  private def lift(name: String, arity: Int)(
      f: Seq[Column] => Column): (String, Seq[Expression] => Expression) =
    name -> { exprs =>
      require(exprs.length == arity,
        s"$name expects $arity argument(s), got ${exprs.length}")
      toExpr(f(exprs.map(toCol)))
    }

  /** Plan-time INT parameter (seed counts, shingle widths): must be a
    * literal — these select a codegen kernel shape, they are not data. */
  private def intLit(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an INT literal, got ${other.sql}")
  }

  /** Plan-time LONG parameter (bucket bounds): INT or BIGINT literal. */
  private def longLit(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got ${other.sql}")
  }

  /** Plan-time STRING parameter (dictionaries): must be a literal — it
    * builds a broadcast automaton at plan time, it is not data. */
  private def strLit(e: Expression, fn: String, pos: Int): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a STRING literal, got ${other.sql}")
  }

  /** name → expression builder, in one place so the config-time injection
    * and the live-session registration cannot drift apart. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq[
      (String, Seq[Expression] => Expression)](
    // raw Catalyst kernels under their original SQL names (SURVEY.md §7.4
    // custom path (b)); no implicit cast — string/array inputs required
    "vec_dot" -> { exprs =>
      require(exprs.length == 2, "vec_dot takes exactly 2 arguments")
      graft.expressions.VecDot(exprs(0), exprs(1))
    },
    "vec_cosine" -> { exprs =>
      require(exprs.length == 2, "vec_cosine takes exactly 2 arguments")
      graft.expressions.VecCosine(exprs(0), exprs(1))
    },
    "portable_hash60" -> { exprs =>
      require(exprs.length == 1, "portable_hash60 takes exactly 1 argument")
      graft.expressions.PortableHash60(exprs.head)
    },
    "portable_hash28" -> { exprs =>
      require(exprs.length == 1, "portable_hash28 takes exactly 1 argument")
      graft.expressions.PortableHash28(exprs.head)
    },
    // portable hashing (the oracle-replayable md5 family; casts to string)
    lift("graft_hash60", 1) { case Seq(c) => HashFunctions.portableHash60(c) },
    lift("graft_hash60b", 1) { case Seq(c) => HashFunctions.portableHash60b(c) },
    "graft_seeded_hash" -> { exprs =>
      require(exprs.length == 2, s"graft_seeded_hash expects 2 arguments")
      toExpr(HashFunctions.portableSeededHash(toCol(exprs.head),
        intLit(exprs(1), "graft_seeded_hash", 1)))
    },
    // text analysis
    lift("graft_norm_text", 1) { case Seq(c) => TextFunctions.normalizeForDedup(c) },
    lift("graft_fingerprint", 1) { case Seq(c) => TextFunctions.portableFingerprint(c) },
    lift("graft_token_count", 1) { case Seq(c) => TextFunctions.tokenCount(c) },
    lift("graft_subword_count", 1) { case Seq(c) => TextFunctions.subwordCount(c) },
    lift("graft_lang_id", 1) { case Seq(c) => TextFunctions.langIdHeuristic(c) },
    lift("graft_scrub_pii", 1) { case Seq(c) => TextFunctions.scrubPii(c) },
    lift("graft_quality", 1) { case Seq(c) => TextFunctions.qualityFeatures(c) },
    "graft_minhash" -> { exprs =>
      require(exprs.length == 3,
        "graft_minhash expects (text, numHashes, shingleN)")
      toExpr(HashFunctions.minhashSignature(
        TextFunctions.normalizeForDedup(toCol(exprs.head)),
        intLit(exprs(1), "graft_minhash", 1), intLit(exprs(2), "graft_minhash", 2)))
    },
    // vector kernels (codegen'd Catalyst expressions)
    lift("graft_vec_dot", 2) { case Seq(a, b) => VectorFunctions.dot(a, b) },
    lift("graft_vec_cosine", 2) { case Seq(a, b) => VectorFunctions.cosine(a, b) },
    // geometry
    lift("graft_point_in_polygon", 3) { case Seq(x, y, v) =>
      GeometryFunctions.pointInPolygon(x, y, v) },
    lift("graft_distance", 4) { case Seq(x, y, tx, ty) =>
      GeometryFunctions.euclidean(x, y, tx, ty) },
    // acquisition time
    lift("graft_harp_ts", 1) { case Seq(c) => TimeFunctions.harpToTimestamp(c) },
    lift("graft_ts_harp", 1) { case Seq(c) => TimeFunctions.timestampToHarp(c) },
    lift("graft_chunk_start", 1) { case Seq(c) => TimeFunctions.chunkStart(c) },
    // sketches (the KMV aggregate is returned UNWRAPPED — the analyzer
    // wraps AggregateFunctions in AggregateExpression itself)
    "graft_kmv_minhashes" -> { exprs =>
      require(exprs.length == 2, "graft_kmv_minhashes expects (hashed_long, k)")
      graft.expressions.KmvMinHashes(exprs.head,
        intLit(exprs(1), "graft_kmv_minhashes", 1))
    },
    "graft_kmv_estimate" -> { exprs =>
      require(exprs.length == 2, "graft_kmv_estimate expects (sketch, k)")
      toExpr(SketchFunctions.kmvEstimate(toCol(exprs.head),
        intLit(exprs(1), "graft_kmv_estimate", 1)))
    },
    "graft_cm_buckets" -> { exprs =>
      require(exprs.length == 3, "graft_cm_buckets expects (key, depth, width)")
      toExpr(graft.operators.Sketch.cmBuckets(toCol(exprs.head),
        intLit(exprs(1), "graft_cm_buckets", 1),
        intLit(exprs(2), "graft_cm_buckets", 2)))
    },
    // JL random projection (portable ±1 planes; see VectorFunctions)
    "graft_random_project" -> { exprs =>
      require(exprs.length == 4,
        "graft_random_project expects (vec, outDim, dim, seed)")
      toExpr(VectorFunctions.randomProject(toCol(exprs.head),
        intLit(exprs(1), "graft_random_project", 1),
        intLit(exprs(2), "graft_random_project", 2),
        intLit(exprs(3), "graft_random_project", 3)))
    },
    // z-order layout (the Morton curve; see sources/Layout)
    "graft_morton2" -> { exprs =>
      require(exprs.length == 3, "graft_morton2 expects (a, b, bits)")
      toExpr(graft.sources.Layout.morton2(toCol(exprs(0)), toCol(exprs(1)),
        intLit(exprs(2), "graft_morton2", 2)))
    },
    "graft_morton_bucket" -> { exprs =>
      require(exprs.length == 4, "graft_morton_bucket expects (c, lo, hi, bits)")
      toExpr(graft.sources.Layout.mortonBucket(toCol(exprs.head),
        longLit(exprs(1), "graft_morton_bucket", 1),
        longLit(exprs(2), "graft_morton_bucket", 2),
        intLit(exprs(3), "graft_morton_bucket", 3)))
    },

    // round-10 operator families on the SQL surface (VERDICT r10 #7):
    // interval-set algebra's scalar kernels and the Aho-Corasick blocklist
    lift("graft_interval_overlap", 4) { case Seq(s1, e1, s2, e2) =>
      // half-open [s, e) overlap length, 0 when disjoint — the kernel
      // behind operators/Intervals' sweeps and J4's bucketed join
      import org.apache.spark.sql.functions.{greatest, least, lit}
      greatest(lit(0L), least(e1, e2).cast("long") -
        greatest(s1, s2).cast("long"))
    },
    lift("graft_interval_contains", 3) { case Seq(s, e, p) =>
      // point-in-validity (J3's kernel): s <= p < e
      p >= s && p < e
    },
    "graft_dhash64" -> { exprs =>
      require(exprs.length == 3, "graft_dhash64 expects (pixels, w, h)")
      graft.expressions.DHash64(exprs(0),
        intLit(exprs(1), "graft_dhash64", 1),
        intLit(exprs(2), "graft_dhash64", 2))
    },
    "graft_audio_energy_hash64" -> { exprs =>
      require(exprs.length == 1,
        "graft_audio_energy_hash64 expects (pcm16le)")
      graft.expressions.AudioEnergyHash64(exprs.head)
    },
    "graft_blocklist_total" -> { exprs =>
      require(exprs.length == 2,
        "graft_blocklist_total expects (text, 'term|term|...')")
      val terms = strLit(exprs(1), "graft_blocklist_total", 1)
        .split('|').toSeq
      import org.apache.spark.sql.functions.{aggregate, lit}
      // total whole-word occurrences over the normalized text — one
      // Aho-Corasick scan regardless of dictionary size (map-only)
      toExpr(aggregate(
        graft.operators.Blocklist.hits(toCol(exprs(0)), terms),
        lit(0), (acc, h) => acc + h.getField("n_hits")).cast("long"))
    })

  /** Config-time injection (`spark.sql.extensions=graft.GraftExtensions`). */
  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftFunctions", name), builder))
    }

  /** Live-session registration for sessions built without the extension. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftRegistryBridge.register(spark, name, builder)
    }
}
