package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Path/FileMeta column functions mirroring Watchdog.GetFileMeta
  * (/root/reference/watchdog/watchdog.go:330-390) and the fsnotify
  * rule filters (/root/reference/watchdog/lib/fsnotify/fsnotify.go:
  * 186-200). Pure built-in expressions — fully codegen'd, pushdown-
  * friendly.
  */
object PathFns {

  /** Directory part of a path (GetFileMeta's subdir before
    * root-trimming).
    */
  def folder(path: Column): Column = regexp_replace(path, "/[^/]*$", "")

  /** Last path segment (fi.Name()). */
  def filename(path: Column): Column = regexp_extract(path, "([^/]+)$", 1)

  /** Lower-cased extension including the dot (filepath.Ext +
    * ToLower, watchdog.go:381).
    */
  def ext(path: Column): Column = lower(regexp_extract(path, "(\\.[^./]+)$", 1))

  /** Directory nesting depth = number of separators. */
  def depth(path: Column): Column =
    (length(path) - length(regexp_replace(path, "/", ""))).cast(LongType)

  /** fsnotify.CheckIfMatch: empty or ".*" pattern matches all. */
  def matchesPattern(path: Column, pattern: String): Column =
    if (pattern.isEmpty || pattern == ".*") lit(true) else path.rlike(pattern)

  /** fsnotify.CheckIfIgnore: empty ignore matches nothing. */
  def ignored(path: Column, ignores: String): Column =
    if (ignores.isEmpty) lit(false) else path.rlike(ignores)

  /** Rule filter: pattern ∧ ¬ignore ∧ depth ≤ maxNesting (0 = ∞). */
  def ruleFilter(path: Column, pattern: String, ignores: String,
      maxNesting: Long): Column = {
    val base = matchesPattern(path, pattern) && !ignored(path, ignores)
    if (maxNesting == 0) base else base && depth(path) <= maxNesting
  }

  /** BSI.convert2Time (/root/reference/plugins/BSI.go:60-77): the last
    * 23 chars of a test id are `YYYY-MM-DD_HH_MM_SS_mmm`; parse to a
    * timestamp.
    */
  def bsiTestIdTime(testId: Column): Column = {
    val tail = substring(testId, -23, 23)
    to_timestamp(
      regexp_replace(tail,
        "^(\\d{4}-\\d{2}-\\d{2})_(\\d{2})_(\\d{2})_(\\d{2})_(\\d{3})$",
        "$1 $2:$3:$4.$5"),
      "yyyy-MM-dd HH:mm:ss.SSS")
  }

  /** Kafka message key (handler/kafka.go:352-358):
    * `folder/name`, or `folder/pack/name` for zip-entry records.
    */
  def kafkaKey(folder: Column, pack: Column, name: Column): Column =
    concat(folder, lit("/"),
      when(pack === "", name).otherwise(concat(pack, lit("/"), name)))
}
