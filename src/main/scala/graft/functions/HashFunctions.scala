package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing (SURVEY.md A7, §2.8 Hash/UUID).
  *
  * Reference: `dict_to_uuid` = MD5 over sorted key/value strings — param-set
  * hashes, stream hashes, config-change detection
  * (`aeon/dj_pipeline/utils/hashing.py:7-13`,
  * `utils/load_metadata.py:780-788`).
  */
object HashFunctions {

  /** MD5 hex of `k1=v1|k2=v2|...` with pairs pre-sorted by key — the
    * row-level analogue of `dict_to_uuid`. Pass (key, value) column pairs.
    */
  def dictUuid(pairs: (Column, Column)*): Column = {
    val entries = array(pairs.map { case (k, v) =>
      concat_ws("=", k.cast("string"), v.cast("string"))
    }: _*)
    md5(concat_ws("|", sort_array(entries)))
  }

  /** Aggregate form: MD5 over all (k, v) rows of a group, sorted — detects
    * device-config changes between epochs (`load_metadata.py:780-788`).
    * Use inside `groupBy(...).agg(configHash($"k", $"v"))`.
    */
  def configHash(k: Column, v: Column): Column =
    md5(concat_ws("|",
      sort_array(collect_list(concat_ws("=", k.cast("string"), v.cast("string"))))))
}
