package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / nearest-predecessor join (SURVEY.md J5/W4).
  *
  * Reference semantics: `reindex(method="pad")` — carry the most recent right
  * row forward onto each left timestamp (reference
  * `aeon/dj_pipeline/tracking.py:319-320` wheel-state pad onto position
  * timestamps; `aeon/dj_pipeline/utils/load_metadata.py:686-693`
  * MAX(epoch_start) < t previous-epoch lookup).
  *
  * Spark has no native as-of join, so this composes one from a union timeline
  * + `last(..., ignoreNulls)` window — a single shuffle on `keys`, sorted once,
  * fully codegen'd. At 100 TB the shuffle is keyed (per subject/device), so the
  * state per partition is one group's timeline — no skew beyond the data's own.
  *
  * Tie behavior: a right row at exactly the left timestamp IS matched
  * (backward-inclusive, matching pandas `merge_asof` default).
  */
object AsOfJoin {

  /** @param left       probe side; every row is preserved
    * @param right      build side; its latest row at-or-before each left time is appended
    * @param leftTime   event-time column name on `left`
    * @param rightTime  event-time column name on `right`
    * @param keys       equi-partitioning keys present on BOTH sides. Must be
    *                   non-empty: an empty key set would drag BOTH inputs
    *                   through one partition's global window — the classic
    *                   silent scale killer. For a genuinely unkeyed as-of at
    *                   the presentation edge use [[backwardGlobal]], which
    *                   says so in the caller's code.
    * @param valueCols  right columns to carry (default: all non-key columns,
    *                   including `rightTime` — the matched right timestamp is
    *                   part of the as-of result, as in pandas merge_asof;
    *                   names must not collide with left columns)
    */
  def backward(left: DataFrame, right: DataFrame,
               leftTime: String, rightTime: String,
               keys: Seq[String],
               valueCols: Seq[String] = Seq.empty): DataFrame = {
    require(keys.nonEmpty,
      "AsOfJoin.backward needs partitioning keys (the sort-merge window " +
        "shuffles on them); an unkeyed as-of runs in ONE partition — if " +
        "that is really what you want, call backwardGlobal")
    backwardImpl(left, right, leftTime, rightTime, keys, valueCols)
  }

  /** Unkeyed [[backward]]: the whole merged input sorts in ONE partition —
    * correct, and fine for presentation-edge frames (a device's config
    * history, a session summary), but never for corpus-scale inputs. The
    * separate name makes the single-partition choice explicit at the call
    * site instead of an accident of an empty default.
    */
  def backwardGlobal(left: DataFrame, right: DataFrame,
                     leftTime: String, rightTime: String,
                     valueCols: Seq[String] = Seq.empty): DataFrame =
    backwardImpl(left, right, leftTime, rightTime, Seq.empty, valueCols)

  private def backwardImpl(left: DataFrame, right: DataFrame,
                           leftTime: String, rightTime: String,
                           keys: Seq[String],
                           valueCols: Seq[String]): DataFrame = {
    val values =
      if (valueCols.nonEmpty) valueCols
      else right.columns.toSeq.diff(keys)

    val leftCols = left.columns.toSeq
    // Tag: right rows sort BEFORE left rows at equal timestamps so an exact
    // tie is visible to the left row (backward-inclusive).
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select((Seq(col("__t"), col("__side")) ++
        keys.map(col) ++
        leftCols.diff(keys).map(col) ++
        values.map(v => lit(null).cast(right.schema(v).dataType).as(s"__v_$v"))): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select((Seq(col("__t"), col("__side")) ++
        keys.map(col) ++
        leftCols.diff(keys).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        values.map(v => col(v).as(s"__v_$v"))): _*)

    val w = (if (keys.nonEmpty) Window.partitionBy(keys.map(col): _*) else Window.partitionBy())
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val padded = taggedLeft.unionByName(taggedRight)
      .select(col("*") +: values.map(v =>
        last(col(s"__v_$v"), ignoreNulls = true).over(w).as(s"__p_$v")): _*)

    padded.filter(col("__side") === 1)
      .select((keys ++ leftCols.diff(keys)).map(col) ++
        values.map(v => col(s"__p_$v").as(v)): _*)
  }
}
